package graft

import graft.operators.Components
import org.apache.spark.sql.functions._

/** Transitive near-dup clustering: min-label connected components over
  * planted pair graphs plus the composed registry query. */
class ComponentsSpec extends SparkSuite {

  import spark.implicits._

  test("planted A~B~C chain lands in ONE component with ONE survivor") {
    // A~B, B~C but A≁C — exactly the case a pairwise keep-lowest policy
    // mishandles; a second disjoint pair proves components don't bleed
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("i", "j")
    val (lab, sweeps) = Components.connectedComponentsWithStats(pairs)
    val got = lab.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component"))
      .toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val survivors = got.groupBy(_._2).map { case (c, m) => c -> m.keys.min }
    assert(survivors == Map(1L -> 1L, 10L -> 10L),
      "survivor of each component is its min doc_id")
    // one propagating sweep + one fixpoint-confirming sweep — pinned so
    // a materialization change (caching, snapshot format) can never
    // silently alter the algorithm
    assert(sweeps == 2, s"chain graph should converge in 2 sweeps, ran $sweeps")
  }

  test("deep path graph needs multiple sweeps and still converges") {
    // path 1-2-3-…-9: diameter 8, so single-sweep propagation is wrong
    // and the loop must iterate; min label must still flood to the end
    val pairs = (1L until 9L).map(k => (k, k + 1)).toDF("i", "j")
    val (lab, sweeps) = Components.connectedComponentsWithStats(pairs)
    val got = lab.collect()
    assert(got.length == 9)
    assert(got.forall(_.getAs[Long]("component") == 1L))
    // pointer jumping covers diameter 8 in 3 propagating sweeps (vs 8
    // without the jump) + 1 confirming sweep
    assert(sweeps == 4, s"diameter-8 path should converge in 4 sweeps, ran $sweeps")
  }

  test("empty pair set yields empty components without looping forever") {
    val pairs = Seq.empty[(Long, Long)].toDF("i", "j")
    assert(Components.connectedComponents(pairs).count() == 0L)
  }

  test("d_dup_components covers every pair endpoint consistently") {
    val df = Components.dDupComponents(spark, sfDir).cache()
    val byDoc = df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("component"), r.getAs[Long]("csize")))
      .toMap
    // every doc in any family's pair list appears, and both endpoints of
    // every pair share a component (the defining property of the closure)
    val fams = Seq(
      graft.operators.Dedup.dMinhashLsh(spark, sfDir),
      graft.operators.Dedup.dSimhashPairs(spark, sfDir),
      graft.operators.Dedup.dWinnowOverlap(spark, sfDir))
    val pairRows = fams.flatMap(_.select(col("i"), col("j")).collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"))))
    assert(pairRows.nonEmpty, "families must surface pairs at this sf")
    pairRows.foreach { case (i, j) =>
      assert(byDoc.contains(i) && byDoc.contains(j))
      assert(byDoc(i)._1 == byDoc(j)._1,
        s"pair ($i,$j) split across components")
    }
    // component id is a member (the survivor) and csize counts members
    val sizes = df.groupBy(col("component")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("component") -> r.getAs[Long]("n"))
      .toMap
    byDoc.foreach { case (_, (comp, csize)) =>
      assert(byDoc.contains(comp), s"component id $comp is not a member")
      assert(byDoc(comp)._1 == comp, "survivor labels itself")
      assert(sizes(comp) == csize)
    }
    df.unpersist(blocking = false)
  }

  test("components leave no cached blocks behind (snapshotted sweeps)") {
    // scoped to the CC core: the composed dDupComponents keeps its pair
    // generators' load-bearing caches alive inside the returned lazy
    // plan, which is their documented contract
    spark.catalog.clearCache()
    val pairs = (1L until 5L).map(k => (k, k + 1)).toDF("i", "j")
    Components.connectedComponents(pairs).collect()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "all sweep caches and the edge cache must be released")
  }

  test("superseded sweep snapshots are deleted eagerly, not at JVM exit") {
    // a bench loop runs CC dozens of times in one JVM — per-sweep disk
    // residue must be bounded at ONE live snapshot per run (round 7 left
    // every checkpoint on disk for the JVM's lifetime)
    val pairs = (1L until 9L).map(k => (k, k + 1)).toDF("i", "j")
    val (lab, sweeps) = Components.connectedComponentsWithStats(pairs)
    lab.collect()
    assert(sweeps > 1, "needs a multi-sweep run to observe deletion")
    // the returned frame is parquet-backed: its one live snapshot dir is
    // the run dir's sole surviving child
    val snapFile = lab.inputFiles.headOption.getOrElse(
      fail("components result should be parquet-backed"))
    val runDir = new java.io.File(new java.net.URI(snapFile))
      .getParentFile.getParentFile
    val children = runDir.listFiles().map(_.getName).toSet
    assert(children == Set(s"sweep_$sweeps"),
      s"only the final snapshot may survive the run, found $children")
  }
}
