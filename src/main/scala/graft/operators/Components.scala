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
  * Algorithm: iterative min-label propagation over the undirected pair
  * graph — each sweep is one hash join (edge ⋈ label) plus one min
  * aggregate, the same distributed shape as [[GraphTraversal.bfs]], and
  * each sweep's labels are eagerly checkpointed so a k-sweep run never
  * builds a 2^k plan. Converges in O(component diameter) sweeps.
  *
  * Scale notes (100 TB posture):
  *  - The graph is the PAIR set (∝ near-dup volume), not the corpus —
  *    labels/edges shuffle doc_id+label longs only, never text.
  *  - Near-dup components are shallow (dup clusters are cliques-ish;
  *    diameter rarely exceeds a few hops), so the sweep count stays
  *    single-digit. For adversarial high-diameter graphs the
  *    alternating large-star/small-star variant (Kiveris et al.,
  *    "Connected Components in MapReduce and Beyond") converges in
  *    O(log n) sweeps with the same per-sweep join shape — swap the
  *    propagation step if corpus telemetry ever shows deep chains.
  *  - Convergence is detected distributively (count of labels that
  *    still decreased this sweep); nothing proportional to the corpus
  *    ever reaches the driver.
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
    var changed = 1L
    var sweep = 0
    while (changed > 0 && sweep < maxSweeps) {
      sweep += 1
      val prop = edges
        .join(labels.select(col("node").as("src"), col("label")), "src")
        .select(col("dst").as("node"), col("label"))
      val staged = labels.union(prop)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .coalesce(par)
        .cache() // checkpoint(eager) runs a count job AND a write job —
      // without this cache the whole sweep recomputes for the write
      val next = staged.checkpoint()
      staged.unpersist(blocking = false) // disk snapshot owns the data
      // labels only ever decrease (min of a set containing the old
      // label), so "still moving" is exactly "strictly smaller"
      changed = next.as("n")
        .join(labels.as("o"), col("n.node") === col("o.node"))
        .filter(col("n.label") < col("o.label"))
        .count()
      labels = next
    }
    require(changed == 0L,
      s"connectedComponents did not converge within $maxSweeps sweeps — " +
        "component diameter exceeds the bound; raise maxSweeps or switch " +
        "to the large-star/small-star propagation step")
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
