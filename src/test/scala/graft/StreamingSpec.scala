package graft

import graft.operators.RelationalQueries
import graft.streaming.EventsStream

/** Structured Streaming slice: drive the finite parquet source through
  * the streaming queries and check against the batch twins. */
class StreamingSpec extends SparkSuite {

  /** The file stream source watches a directory — stage the single
    * events.parquet into one. */
  lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming hourly agg matches the batch hourly rollup per emitted window") {
    // Append mode + watermark: a window only emits once the watermark
    // passes its end, so the trailing window(s) of a finite source stay
    // in state and never emit — compare per-window, not grand totals.
    val src = EventsStream.source(spark, eventsDir)
    val q = EventsStream.runToMemory(EventsStream.hourlyByType(src), "hourly", "append")
    try {
      val streamed = spark.sql(
        """SELECT CAST(unix_timestamp(window_start) AS BIGINT) AS h,
                  CAST(sum(n_events) AS BIGINT) AS n
           FROM hourly GROUP BY 1""").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = RelationalQueries.qHourlyEvents(spark, sfDir).collect()
        .map(r => r.getAs[Long]("hour_epoch") -> r.getAs[Long]("n_events")).toMap
      assert(streamed.nonEmpty, "no windows emitted")
      // every emitted window must match its batch twin exactly
      streamed.foreach { case (h, n) => assert(batch(h) == n, s"hour $h") }
      // and only trailing windows may be withheld
      val unemitted = batch.keySet -- streamed.keySet
      val horizon = batch.keySet.max - 3600 // last window + watermark slack
      assert(unemitted.forall(_ >= horizon), s"non-trailing window missing: $unemitted")
    } finally q.stop()
  }

  test("sliding window emits more window rows than tumbling") {
    val src = EventsStream.source(spark, eventsDir)
    val qt = EventsStream.runToMemory(EventsStream.hourlyByType(src), "tumb", "append")
    val qs = EventsStream.runToMemory(EventsStream.slidingByType(src), "slide", "append")
    try {
      val nT = spark.sql("SELECT count(*) FROM tumb").collect().head.getLong(0)
      val nS = spark.sql("SELECT count(*) FROM slide").collect().head.getLong(0)
      assert(nS > nT, s"sliding=$nS tumbling=$nT")
    } finally { qt.stop(); qs.stop() }
  }

  test("watermarked dedup preserves distinct event_ids") {
    val src = EventsStream.source(spark, eventsDir)
    val q = EventsStream.runToMemory(EventsStream.dedupEvents(src), "dedup", "append")
    try {
      val n = spark.sql("SELECT count(*) FROM dedup").collect().head.getLong(0)
      val distinctIds = spark.sql(
        "SELECT count(DISTINCT event_id) FROM dedup").collect().head.getLong(0)
      assert(n == distinctIds)
      assert(n == 1000) // sf0.001 events are already unique
    } finally q.stop()
  }

  test("stream-stream interval join matches the equivalent batch join") {
    import org.apache.spark.sql.functions._
    val src = EventsStream.source(spark, eventsDir)
    val q = EventsStream.runToMemory(
      EventsStream.purchasesWithRecentClicks(src), "ssjoin", "append")
    try {
      val streamed = spark.sql(
        "SELECT count(*) FROM ssjoin").collect().head.getLong(0)
      val ev = graft.sources.Tables.load(spark, sfDir, "events")
        .withColumn("t", expr("ts div 1000"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("u"), col("t").as("pt"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("t").as("ct"))
      val batch = p.join(c, col("u") === col("cu") &&
        col("ct") <= col("pt") &&
        col("ct") >= col("pt") - lit(30L * 60L * 1000000L)).count()
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(streamed > 0, "no joined pairs — data window assumption broken")
    } finally q.stop()
  }

  test("session memory state matches the batch sessionization") {
    val src = EventsStream.source(spark, eventsDir)
    val q = EventsStream.runToMemory(
      EventsStream.sessionMemory(spark, src), "sessions", outputMode = "update")
    try {
      // last update per user carries the final running totals
      val streamed = spark.sql(
        """SELECT user_id, max(n_events) AS n_events, max(n_sessions) AS n_sessions
           FROM sessions GROUP BY user_id""").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      val batch = RelationalQueries.qSessionizeEvents(spark, sfDir).collect()
        .map(r => (r.getAs[Long]("user_id"),
          (r.getAs[Long]("n_events"), r.getAs[Long]("n_sessions")))).toMap
      assert(streamed.keySet == batch.keySet)
      val mismatches = batch.filter { case (u, v) => streamed(u) != v }
      assert(mismatches.isEmpty, s"first mismatches: ${mismatches.take(3)}")
    } finally q.stop()
  }
}
