package graft

import graft.operators.{AdvancedQueries, RecallQueries, RelationalQueries, Similarity}
import org.apache.spark.sql.functions.{col, count, lit, sum}

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

  /** Broadcast hints rendered into the optimized logical plan — an
    * SF-proportional side (customer/supplier/part) must never carry one,
    * or a 100× scale-up turns the hint into an executor OOM instead of a
    * graceful sort-merge flip. */
  private def hintCount(df: org.apache.spark.sql.DataFrame): Int =
    "strategy=broadcast".r.findAllIn(df.queryExecution.optimizedPlan.toString).size

  test("q3: customer broadcasts by size (no hint), top-10 is TakeOrderedAndProject") {
    val df = RelationalQueries.q3ShippingPriority(spark, sfDir)
    assert(hintCount(df) === 0, "q3 must not hint its SF-scaled customer side")
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"),
      "size-based planning should still broadcast small customer at test SF")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q5: only bounded region/nation are hinted; supplier/customer by size") {
    val df = RelationalQueries.q5LocalSupplier(spark, sfDir)
    assert(hintCount(df) === 2,
      "exactly region+nation may carry broadcast hints — never SF-scaled supplier/customer")
    assert("BroadcastHashJoin".r.findAllIn(plan(df)).size >= 4,
      "at test SF size-based planning should still broadcast all four dim sides")
  }

  test("q7/q10/q14: no broadcast hints on SF-scaled supplier/customer/part sides") {
    // q7's two inner nation joins are the only allowed hints
    assert(hintCount(AdvancedQueries.q7NationTrade(spark, sfDir)) === 2,
      "q7 may hint only its two bounded nation sides")
    assert(hintCount(AdvancedQueries.q10ReturnedRevenue(spark, sfDir)) === 0,
      "q10 must not hint customer")
    assert(hintCount(AdvancedQueries.q14TypeShare(spark, sfDir)) === 0,
      "q14 must not hint part")
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

  test("q7 at sf0.1: AQE broadcasts the unhinted dims at runtime; only fact⋈fact sort-merges") {
    // static planning is conservative about join-output stats, so the
    // enriched supplier/customer sides may plan as sort-merge — the
    // contract is that AQE flips them to broadcast once actual sizes are
    // known, leaving only lineitem⋈orders shuffling
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = AdvancedQueries.q7NationTrade(spark, "/root/testdata/sf0.1")
    df.collect()
    val finalPlan = df.queryExecution.executedPlan
      .asInstanceOf[AdaptiveSparkPlanExec].executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(finalPlan).size >= 3,
      "AQE should broadcast nation + both enriched dim sides")
    assert("SortMergeJoin".r.findAllIn(finalPlan).size <= 1,
      "only lineitem JOIN orders may sort-merge at sf0.1")
  }

  test("repetition stats: pruned scan, cached tokenization feeds the explode") {
    import graft.operators.TextAnalysis
    val p = plan(TextAnalysis.tRepetitionStats(spark, sfDir))
    assert(!p.contains("n_chars") && !p.contains("source#"),
      "scan should read only doc_id + text")
    // the cache boundary is what stops the Generate's pushed-down
    // not-empty predicate from inlining the O(tokens²) re-tokenization
    assert(p.contains("InMemoryTableScan"),
      "tokenize/gram projection must be pinned behind a cache boundary")
  }

  test("shard pack: running sum shuffles by writer key, never one global partition") {
    import graft.operators.Sampling
    val df = Sampling.dShardPack(spark, sfDir)
    val p = plan(df)
    assert(p.contains("Window"), "expect a window for the running token sum")
    assert(p.contains("hashpartitioning(writer"),
      "window must partition by writer — a global running sum would be SinglePartition")
    assert(!p.contains("SinglePartition"), "no stage may collapse to one partition")
  }

  test("semantic dedup: equi-join on cell key, no cartesian anywhere") {
    val p = plan(Similarity.sSemanticDedup(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "within-cell pairing must stay an equi-join on the cell key")
  }

  test("dpp drive: fact partitions pruned at runtime by the dim filter") {
    val df = graft.sources.Catalog.qDppEvents(spark, sfDir)
    val p = plan(df)
    assert(p.contains("dynamicpruning"),
      "fact scan must carry a dynamicpruningexpression PartitionFilter — " +
        "without it every day's partition is read and the dim filter " +
        "only drops rows post-scan")
    assert(p.contains("BroadcastHashJoin"),
      "tiny day-dim must broadcast (DPP reuses its exchange for free)")
    // the pruning must actually bite: fewer partition dirs read than
    // exist. AQE hides scans inside query stages, so this half runs the
    // same drive with AQE off — the registry query itself stays AQE-on.
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df2 = graft.sources.Catalog.qDppEvents(spark, sfDir)
      df2.collect()
      val factScan = df2.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.metadata.get("Location").exists(_.contains("events_by_day"))
          => s
      }.headOption
      assert(factScan.nonEmpty, "no FileSourceScanExec over events_by_day")
      val read = factScan.get.metrics("numPartitions").value
      val total = spark.table(
          graft.sources.Catalog.dppTableName(spark, sfDir))
        .select("day_id").distinct().count()
      assert(read > 0 && read < total,
        s"DPP read $read of $total partitions — expected a strict subset")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("runtime bloom-filter pruning reaches the fact side of a selective shuffle join") {
    // The row-level counterpart of DPP for NON-partitioned joins: a
    // selective dim side should inject a bloom filter into the fact
    // scan so non-joining rows die before the shuffle. Thresholds are
    // sized for clusters (10 GB application side), so this pins the
    // MECHANISM at test SF by scoping them down — at 100 TB the
    // defaults fire on their own. Broadcast is disabled in-scope: a
    // broadcast join already row-prunes via the hash relation, so the
    // bloom path only matters (and only injects) for shuffle joins.
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val orders = graft.sources.Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val lineitem = graft.sources.Tables.load(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val joined = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.toLowerCase.contains("bloomfilter"),
        "selective dim side must inject a runtime bloom filter into the " +
          "fact scan when the join shuffles")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "the scoped conf must have produced a shuffle join")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("q_bloom_join registry query: executes under the bloom regime, restores confs") {
    // The registry-timed twin of the mechanism test above: the query
    // itself requires a bloom filter in its executed plan (it would
    // throw otherwise — a silent fallback to the unpruned join can
    // never be what the bench times), runs eagerly inside its conf
    // scope, and must leave the session confs exactly as it found them
    // (a leaked autoBroadcastJoinThreshold=-1 would un-broadcast every
    // subsequent query in the session).
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val before = keys.map(spark.conf.get(_))
    val out = AdvancedQueries.qBloomJoin(spark, sfDir).collect()
    assert(keys.map(spark.conf.get(_)) == before,
      "qBloomJoin must restore every conf it scopes")
    assert(out.nonEmpty && out.length <= 3,
      "expected one row per l_returnflag value")
    assert(out.map(_.getString(0)).toSeq == out.map(_.getString(0)).toSeq.sorted,
      "result must keep its total order after the eager collect round-trip")
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
