package graft

import graft.sources.Tables
import graft.streaming.EventsStream
import org.apache.spark.sql.functions._

/** The events time-unit contract (Tables.eventsTsIsMicros +
  * normalizeEventsTs): the testdata generator has emitted both
  * TIMESTAMP(MICROS) and raw-INT64-nanos footers across rounds, and a
  * wrong guess is a silent ×1000 error in every derived timestamp, so
  * the probe must (a) scale µs sources to the ns contract, (b) fail
  * loudly on empty/absent dirs instead of defaulting, and (c) re-probe
  * when a path's contents change inside one JVM. */
class TablesSpec extends SparkSuite {

  /** Stage the sf0.001 events into a temp sfDir in the given unit.
    * `micros=true` writes a real TIMESTAMP(MICROS) footer (TimestampType
    * column + outputTimestampType=TIMESTAMP_MICROS — the pandas/pyarrow
    * generator shape); `micros=false` writes the raw INT64 ns shape. */
  private def stage(dir: java.nio.file.Path, micros: Boolean): Unit = {
    val ns = Tables.load(spark, sfDir, "events")
    val out =
      if (micros) ns.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else ns
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType",
        "TIMESTAMP_MICROS")
      out.coalesce(1).write.mode("overwrite")
        .parquet(dir.resolve("events.parquet").toString)
    } finally prev.foreach(
      spark.conf.set("spark.sql.parquet.outputTimestampType", _))
  }

  test("TIMESTAMP(MICROS) events load to the ns contract (×1000 scaling)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ev-us")
    stage(tmp, micros = true)
    val got = Tables.load(spark, tmp.toString, "events")
      .select(col("event_id"), col("ts"))
    // expected: the ns fixture truncated to µs precision then rescaled —
    // exactly what a µs footer can carry
    val want = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), (expr("ts div 1000") * lit(1000L)).as("want_ts"))
    val bad = got.join(want, "event_id")
      .filter(col("ts") =!= col("want_ts")).count()
    assert(bad == 0, s"$bad events off the ns contract after µs load")
    assert(got.count() == want.count())
  }

  test("streaming source over a µs-footer dir matches the ns fixture") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ev-us-stream")
    stage(tmp, micros = true)
    val q = EventsStream.runToMemory(
      EventsStream.source(spark, s"$tmp/events.parquet")
        .select(col("event_id"), col("ts"), col("event_time")),
      "us_src", "append")
    try {
      val got = spark.table("us_src").select(col("event_id"), col("ts"))
      val want = Tables.load(spark, sfDir, "events")
        .select(col("event_id"),
          (expr("ts div 1000") * lit(1000L)).as("want_ts"))
      assert(got.count() == want.count())
      val bad = got.join(want, "event_id")
        .filter(col("ts") =!= col("want_ts")).count()
      assert(bad == 0, s"$bad streamed events off the ns contract")
    } finally q.stop()
  }

  test("probe fails loudly on an empty watch dir and an absent path") {
    val empty = java.nio.file.Files.createTempDirectory("graft-ev-empty")
    val e = intercept[IllegalArgumentException] {
      Tables.eventsTsIsMicros(spark, empty.toString)
    }
    assert(e.getMessage.contains("no data files"))
    intercept[java.io.FileNotFoundException] {
      Tables.eventsTsIsMicros(spark, empty.resolve("nope").toString)
    }
  }

  test("unit probe re-fires when the same path is re-staged in another unit") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ev-restage")
    val evDir = s"$tmp/events.parquet"
    stage(tmp, micros = false)
    assert(!Tables.eventsTsIsMicros(spark, evDir))
    stage(tmp, micros = true)
    assert(Tables.eventsTsIsMicros(spark, evDir),
      "stale cached unit served after the path was re-generated")
  }
}
