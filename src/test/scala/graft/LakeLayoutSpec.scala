package graft

import graft.sources.LakeLayout
import org.apache.spark.sql.functions._

class LakeLayoutSpec extends SparkSuite {

  lazy val lakePath: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-lake").toString
    LakeLayout.writeEventsPartitioned(spark, sfDir, dir)
    dir
  }

  test("partitioned write produces one directory per event date, bounded files") {
    val dirs = new java.io.File(lakePath).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_date="))
    assert(dirs.length >= 28 && dirs.length <= 31, s"got ${dirs.length} partitions")
    dirs.foreach { d =>
      val files = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"${d.getName} has $files files, want 1")
    }
  }

  test("single-day read prunes partitions at the FileIndex (PartitionFilters)") {
    val df = LakeLayout.readDay(spark, lakePath, "2024-01-15")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_date"),
      "date filter must be a partition filter, not a data filter")
    val n = df.count()
    assert(n > 0)
    // cross-check against the unpartitioned source
    val expected = graft.sources.Tables.load(spark, sfDir, "events")
      .filter(to_date(timestamp_micros(expr("ts div 1000"))) === lit("2024-01-15"))
      .count()
    assert(n == expected)
  }

  test("matching bucketed tables join with no exchange and no sort") {
    import graft.sources.{LakeLayout, Tables}
    LakeLayout.writeBucketed(
      Tables.load(spark, sfDir, "orders"), "b_orders", "o_orderkey", 4)
    LakeLayout.writeBucketed(
      Tables.load(spark, sfDir, "lineitem")
        .withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem",
      "o_orderkey", 4)
    // tiny test tables would broadcast (which also skips bucketing) —
    // force the shuffle-join path the assertion is about
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() ==
        Tables.load(spark, sfDir, "lineitem").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("round-trip preserves every event exactly once") {
    val written = spark.read.parquet(lakePath).count()
    val source = graft.sources.Tables.load(spark, sfDir, "events").count()
    assert(written == source)
  }
}
