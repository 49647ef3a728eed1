package graft.operators

import org.apache.hadoop.fs.Path
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
  * giving O(log diameter) convergence instead of O(diameter).
  *
  * Materialization discipline (the round-7 28 s → ~9 s fix): each
  * sweep's min-aggregate frame `m` AND its jumped output are
  * snapshotted to tiny parquet writes and read back — without a
  * materialization boundary on `m`, the pointer-jump self-join plus
  * the snapshot job recomputed the whole sweep chain 4-6×, and a
  * `.cache()` boundary (tried first) pinned the aggregate's full
  * shuffle-partition fan-out because cached-plan materialization skips
  * AQE partition coalescing. Parquet snapshots (a) truncate lineage
  * like `checkpoint` but with a single job instead of checkpoint's
  * count+write pair, and (b) give this code ownership of the files:
  * each snapshot is deleted as soon as it is superseded, so a bench
  * loop never accumulates per-iteration disk garbage (round-7 left
  * every checkpoint on disk for the JVM's lifetime). Convergence is
  * checked after EVERY sweep — the round-7 two-sweep batch paid one
  * full extra sweep after the fixpoint.
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
  *  - Snapshots live under the session checkpoint dir when one is set
  *    (shared storage on a real cluster); the local-temp fallback is
  *    refused off local[*] masters, same rule as GraphTraversal.bfs.
  */
object Components {

  /** Min-label connected components over an undirected pair list.
    *
    * @param pairs columns (i, j) — one row per undirected edge
    * @return (doc_id, component) where component = min doc_id reachable
    */
  def connectedComponents(pairs: DataFrame, maxSweeps: Int = 25): DataFrame =
    connectedComponentsWithStats(pairs, maxSweeps)._1

  /** As [[connectedComponents]], also returning the number of sweeps the
    * loop ran before the label sum fixed — pinned by ComponentsSpec so a
    * materialization change can never silently alter the algorithm. */
  def connectedComponentsWithStats(pairs: DataFrame, maxSweeps: Int = 25)
      : (DataFrame, Int) = {
    val s = pairs.sparkSession
    val sc = s.sparkContext
    // snapshot root: the session checkpoint dir if the caller set one
    // (shared storage on a real cluster), else a self-installed local
    // temp dir — refused off local[*], where executor-local /tmp would
    // strand the files
    val root = sc.getCheckpointDir.getOrElse {
      require(sc.master.startsWith("local"),
        "connectedComponents needs sparkContext.setCheckpointDir pointing " +
          "at shared storage (HDFS/S3) on a non-local master")
      java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    }
    val runDir = s"$root/cc-${java.util.UUID.randomUUID().toString.take(12)}"
    val fs = new Path(runDir).getFileSystem(sc.hadoopConfiguration)
    // the FINAL snapshot backs the returned (lazy) DataFrame, so it can
    // only be reclaimed at JVM exit; everything else is deleted eagerly
    // inside the loop
    fs.deleteOnExit(new Path(runDir))
    // label frames are tiny next to the shuffle partitioning that
    // produces them; narrow-coalesce before each snapshot
    val par = math.max(2, sc.defaultParallelism / 4)
    def snapshot(df: DataFrame, name: String): DataFrame = {
      val p = s"$runDir/$name"
      df.coalesce(par).write.mode("overwrite").parquet(p)
      s.read.parquet(p)
    }
    val p = pairs.select(col("i"), col("j")).distinct()
    val edges = p
      .union(p.select(col("j").as("i"), col("i").as("j")))
      .toDF("src", "dst")
      .cache() // re-joined every sweep
    try {
      // sweep-0 labels = node ids; cached, not snapshotted — it is read
      // by the sweep-0 label sum plus twice inside sweep 1's plan, and a
      // cache serves those for one distinct's cost without the parquet
      // write+read round-trip a snapshot would add
      var labels = edges.select(col("src").as("node")).distinct()
        .withColumn("label", col("node"))
        .cache()
      // Convergence detection: labels are NON-INCREASING per node (the
      // min always includes the node's own current label, and a pointer
      // jump replaces a label with that label's own ≤ label), so the
      // label SUM strictly decreases until the fixpoint — one tiny
      // aggregate per sweep instead of a new-vs-old join+count. DECIMAL
      // sum: ids can be arbitrary longs at corpus scale; a long sum
      // could overflow.
      def labelSum(df: DataFrame): java.math.BigDecimal = {
        val v = df.agg(sum(col("label").cast("decimal(38,0)"))).head()
          .getDecimal(0)
        if (v == null) java.math.BigDecimal.ZERO else v // empty graph
      }
      var prevSum = labelSum(labels)
      var converged = prevSum == java.math.BigDecimal.ZERO && labels.isEmpty
      var sweep = 0
      while (!converged && sweep < maxSweeps) {
        sweep += 1
        val prop = edges
          .join(labels.select(col("node").as("src"), col("label")), "src")
          .select(col("dst").as("node"), col("label"))
        // snapshotted, not cached: the pointer jump self-joins this
        // frame and would otherwise recompute it, and a .cache() here
        // pins the aggregate's full shuffle-partition fan-out (cached
        // plan materialization skips AQE partition coalescing) — the
        // tiny parquet round-trip keeps every stage AQE-coalesced
        val m = snapshot(
          labels.union(prop)
            .groupBy(col("node")).agg(min(col("label")).as("label")),
          s"m_$sweep")
        // label values are always live node ids, so the lookup is total;
        // left+coalesce only guards the empty frame
        val jumped = m.join(
            m.select(col("node").as("label"), col("label").as("plabel")),
            Seq("label"), "left")
          .select(col("node"),
            coalesce(col("plabel"), col("label")).as("label"))
        val next = snapshot(jumped, s"sweep_$sweep")
        // no-op after sweep 1 (parquet-backed frames hold no cache);
        // releases the sweep-0 label cache once it is superseded
        labels.unpersist(blocking = false)
        fs.delete(new Path(s"$runDir/m_$sweep"), true)
        fs.delete(new Path(s"$runDir/sweep_${sweep - 1}"), true)
        val nextSum = labelSum(next)
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
        labels = next
      }
      require(converged,
        s"connectedComponents did not converge within $maxSweeps sweeps " +
          "(propagation + pointer jump each) — raise maxSweeps")
      // empty-graph path only: the loop never superseded the cached
      // sweep-0 frame (after any sweep, labels is parquet-backed and
      // this is a no-op)
      labels.unpersist(blocking = false)
      (labels.select(col("node").as("doc_id"), col("label").as("component")),
        sweep)
    } finally {
      edges.unpersist(blocking = false)
    }
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
