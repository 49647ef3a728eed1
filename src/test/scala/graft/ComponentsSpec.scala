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
    val got = Components.connectedComponents(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component"))
      .toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val survivors = got.groupBy(_._2).map { case (c, m) => c -> m.keys.min }
    assert(survivors == Map(1L -> 1L, 10L -> 10L),
      "survivor of each component is its min doc_id")
  }

  test("deep path graph needs multiple sweeps and still converges") {
    // path 1-2-3-…-9: diameter 8, so single-sweep propagation is wrong
    // and the loop must iterate; min label must still flood to the end
    val pairs = (1L until 9L).map(k => (k, k + 1)).toDF("i", "j")
    val got = Components.connectedComponents(pairs).collect()
    assert(got.length == 9)
    assert(got.forall(_.getAs[Long]("component") == 1L))
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

  test("components leave no cached blocks behind (checkpointed sweeps)") {
    // scoped to the CC core: the composed dDupComponents keeps its pair
    // generators' load-bearing caches alive inside the returned lazy
    // plan, which is their documented contract
    spark.catalog.clearCache()
    val pairs = (1L until 5L).map(k => (k, k + 1)).toDF("i", "j")
    Components.connectedComponents(pairs).collect()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "all sweep caches and the edge cache must be released")
  }
}
