package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transitive near-dup consolidation (SURVEY §2.D): connected components
  * over the UNION of the dedup families' pair sets — the stage every
  * pairwise dedup run needs before it can drop rows consistently. A
  * pairwise policy ("lower doc_id of each pair wins") is ill-defined on
  * chains: A~B and B~C with A≁C can drop B twice or keep both B and C
  * depending on pair order. Components make the policy total: one
  * survivor (the minimum doc_id) per component, everything else drops.
  *
  * Algorithm: iterative min-label propagation with POINTER JUMPING over
  * the undirected pair graph — each sweep is one hash join (edge ⋈
  * label) plus one min aggregate plus a label→label-of-label self-join
  * (path halving, the trick behind the large-star/small-star family —
  * Kiveris et al., "Connected Components in MapReduce and Beyond"),
  * giving O(log diameter) convergence instead of O(diameter). Two
  * sweeps run between eager checkpoints, so a k-sweep run never builds
  * a 2^k plan while the fixed per-snapshot costs amortize.
  *
  * Scale notes (100 TB posture):
  *  - The graph is the PAIR set (∝ near-dup volume), not the corpus —
  *    labels/edges shuffle doc_id+label longs only, never text.
  *  - Near-dup components are shallow (dup clusters are cliques-ish),
  *    so iterations stay low single-digit; the pointer jump keeps even
  *    adversarial deep chains at O(log n) sweeps.
  *  - Convergence is detected distributively: labels are non-increasing
  *    per node, so an unchanged DECIMAL label sum (one tiny aggregate,
  *    overflow-safe for arbitrary long ids) IS the fixpoint; nothing
  *    proportional to the corpus ever reaches the driver.
  */
object Components {

  /** Min-label connected components over an undirected pair list.
    *
    * @param pairs columns (i, j) — one row per undirected edge
    * @return (doc_id, component) where component = min doc_id reachable
    */
  def connectedComponents(pairs: DataFrame, maxSweeps: Int = 25): DataFrame = {
    val s = pairs.sparkSession
    val sc = s.sparkContext
    if (sc.getCheckpointDir.isEmpty) {
      // same rule as GraphTraversal.bfs: a silent driver-local default
      // would strand checkpoint partitions on per-executor /tmp on a
      // real cluster — refuse there, self-install only under local[*]
      require(sc.master.startsWith("local"),
        "connectedComponents needs sparkContext.setCheckpointDir pointing " +
          "at shared storage (HDFS/S3) on a non-local master")
      sc.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString)
    }
    // label/frontier frames are tiny next to the shuffle partitioning
    // that produces them; narrow-coalesce before each disk snapshot
    val par = math.max(2, sc.defaultParallelism / 4)
    val p = pairs.select(col("i"), col("j")).distinct()
    val edges = p
      .union(p.select(col("j").as("i"), col("i").as("j")))
      .toDF("src", "dst")
      .cache() // re-joined every sweep
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .coalesce(par)
      .checkpoint() // eager: flat lineage from sweep 0
    // Convergence detection: labels are NON-INCREASING per node (the min
    // always includes the node's own current label, and a pointer jump
    // replaces a label with that label's own ≤ label), so the label SUM
    // strictly decreases until the fixpoint — one tiny aggregate per
    // iteration instead of a new-vs-old join+count. DECIMAL sum: ids can
    // be arbitrary longs at corpus scale; a long sum could overflow.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head()
        .getDecimal(0)
    var prevSum = labelSum(labels)
    if (prevSum == null) prevSum = java.math.BigDecimal.ZERO // empty graph
    var converged = prevSum == java.math.BigDecimal.ZERO && labels.isEmpty
    var iter = 0
    val maxIters = math.max(1, (maxSweeps + 1) / 2)
    while (!converged && iter < maxIters) {
      iter += 1
      // Two sweeps per disk snapshot, each sweep = edge propagation +
      // POINTER JUMP (label := label-of-label, path-halving): the jump
      // makes convergence O(log diameter) instead of O(diameter), and
      // batching two sweeps between checkpoints amortizes the fixed
      // per-iteration costs (cache fill, snapshot write, convergence
      // aggregate) that dominate on the shallow graphs dedup produces.
      // Lineage depth stays bounded at two sweeps — the checkpoint
      // truncates it before plans can compound.
      var l = labels
      for (_ <- 0 until 2) {
        val prop = edges
          .join(l.select(col("node").as("src"), col("label")), "src")
          .select(col("dst").as("node"), col("label"))
        val m = l.union(prop)
          .groupBy(col("node")).agg(min(col("label")).as("label"))
        // label values are always live node ids, so the lookup is total;
        // left+coalesce only guards the empty frame
        l = m.join(
            m.select(col("node").as("label"), col("label").as("plabel")),
            Seq("label"), "left")
          .select(col("node"), coalesce(col("plabel"), col("label")).as("label"))
      }
      val staged = l.coalesce(par).cache() // checkpoint(eager) runs a
      // count job AND a write job — without this cache the whole
      // iteration recomputes for the write
      val next = staged.checkpoint()
      staged.unpersist(blocking = false) // disk snapshot owns the data
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
    }
    require(converged,
      s"connectedComponents did not converge within $maxIters iterations " +
        s"(2 sweeps + pointer jumps each) — raise maxSweeps")
    edges.unpersist(blocking = false)
    labels.select(col("node").as("doc_id"), col("label").as("component"))
  }

  /** Per-doc component membership over the union of the three pairwise
    * dedup families (MinHash-LSH ∪ SimHash-banded ∪ winnowing-overlap —
    * the same operators the registry checks standalone, composed rather
    * than re-implemented). Emits (doc_id, component, csize); the
    * component id doubles as the survivor policy (min doc_id wins). */
  def dDupComponents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val mh = Dedup.dMinhashLsh(s, dir).select($"i", $"j")
    val sp = Dedup.dSimhashPairs(s, dir).select($"i", $"j")
    val wn = Dedup.dWinnowOverlap(s, dir).select($"i", $"j")
    val lab = connectedComponents(mh.union(sp).union(wn))
    val sizes = lab.groupBy($"component").agg(count(lit(1)).as("csize"))
    // sizes ∝ component count ≤ pair-node count: tiny, broadcastable by
    // size-based planning — no hint needed
    lab.join(sizes, "component")
      .select($"doc_id", $"component", $"csize".cast("bigint").as("csize"))
      .orderBy($"component", $"doc_id")
  }

  /** DuckDB oracle: the three pair queries verbatim as subqueries, then
    * a recursive label-flood — every node accumulates the labels of all
    * nodes that reach it; MIN per node = the component id. UNION (not
    * UNION ALL) recursion terminates at the (node × label) fixpoint. */
  val dDupComponentsSql: String =
    s"""WITH RECURSIVE
       mhp AS (SELECT i, j FROM (${Dedup.dMinhashLshSql}) mh_sub),
       shp AS (SELECT i, j FROM (${Dedup.dSimhashPairsSql}) sh_sub),
       wnp AS (SELECT i, j FROM (${Dedup.dWinnowOverlapSql}) wn_sub),
       prs AS (SELECT i, j FROM mhp UNION
               SELECT i, j FROM shp UNION
               SELECT i, j FROM wnp),
       edges AS (SELECT i AS src, j AS dst FROM prs UNION
                 SELECT j, i FROM prs),
       cc(node, label) AS (
         SELECT DISTINCT src, src FROM edges
         UNION
         SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.node = e.src),
       lab AS (SELECT node, MIN(label) AS component FROM cc GROUP BY node),
       sizes AS (SELECT component, COUNT(*) AS csize FROM lab
                 GROUP BY component)
       SELECT l.node AS doc_id, l.component,
         CAST(s.csize AS BIGINT) AS csize
       FROM lab l JOIN sizes s ON l.component = s.component
       ORDER BY l.component, doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d_dup_components" -> (dDupComponents _))

  val oracle: Map[String, String] = Map(
    "d_dup_components" -> dDupComponentsSql)
}
