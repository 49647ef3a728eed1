package graft

import graft.operators.{RecallQueries, RelationalQueries, Similarity}

/** Physical-plan shape assertions — the scale posture as executable
  * checks. If a refactor drops a pushed filter, un-broadcasts a dim, or
  * turns top-k into a global sort, these fail before any benchmark
  * notices. */
class PlanShapeSpec extends SparkSuite {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1: filter and projection pushed to the parquet scan") {
    val p = plan(RelationalQueries.q1PricingSummary(spark, sfDir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_orderkey"), "scan should prune unused columns")
    assert(p.contains("HashAggregate"), "expect partial+final hash aggregation")
  }

  test("q3: dims broadcast, top-10 is TakeOrderedAndProject not a global sort") {
    val p = plan(RelationalQueries.q3ShippingPriority(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q5: six-way join uses broadcasts for every dim side") {
    val p = plan(RelationalQueries.q5LocalSupplier(spark, sfDir))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      "region/nation/customer/supplier should all broadcast")
  }

  test("r4: top-k memory search compiles to TakeOrderedAndProject over a pruned scan") {
    val p = plan(RecallQueries.r4TopkMemory(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("lang"), "unused columns must be pruned")
  }

  test("cosine topk: probe broadcast, single corpus scan, no cartesian blowup") {
    val p = plan(Similarity.sCosineTopk(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("Broadcast"), "probe side should broadcast")
  }

  test("whole-stage codegen covers the relational aggregation path") {
    // AQE shows codegen spans only in the finalized plan — execute first
    val df = RelationalQueries.q1PricingSummary(spark, sfDir)
    df.collect()
    val p = plan(df)
    assert(p.contains("isFinalPlan=true"))
    // compact tree marks WholeStageCodegen stages as "*(n)"
    assert(p.contains("*(1)") && p.contains("partial_sum"),
      "expect codegen'd partial aggregation before the exchange")
  }
}
