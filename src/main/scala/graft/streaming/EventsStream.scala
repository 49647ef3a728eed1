package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming slice over the `events` table (SURVEY §7.2
  * step 7): readStream → event-time transforms → windowed aggregation
  * with watermark, plus watermarked dedup for at-least-once sources.
  *
  * `ts` arrives as raw epoch-nanoseconds (see [[graft.sources.Tables]]);
  * event time is derived as a microsecond timestamp. Watermark = 10 min:
  * state for a window is dropped once the watermark passes its end, so
  * state size is bounded by (window span / slide) × key cardinality —
  * the property that keeps this runnable forever on a cluster.
  */
object EventsStream {

  /** Streaming source over a DIRECTORY of events parquet files with the
    * declared schema (Spark's file stream source watches a directory;
    * maxFilesPerTrigger simulates incremental arrival). */
  def source(spark: SparkSession, eventsDir: String): DataFrame =
    spark.readStream
      .schema(Tables.events)
      .option("maxFilesPerTrigger", 1)
      .parquet(eventsDir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))

  /** Tumbling 1-hour windowed aggregation with a 10-minute watermark:
    * count + sum(value) + distinct-ish user count per (window,
    * event_type). Late rows beyond the watermark are dropped. */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"),
        approx_count_distinct(col("user_id")).as("n_users_approx"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"),
        col("n_users_approx"))

  /** Sliding-window variant (1 hour window, 15 min slide). */
  def slidingByType(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "1 hour", "15 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"))

  /** Watermarked exactly-once-ish dedup on event_id: duplicates arriving
    * within the watermark horizon are dropped; state is GC'd past it. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** P4 session/repeat memory (SURVEY §2.C): per-user state maintained
    * with mapGroupsWithState — running event count and gap-based session
    * count survive across micro-batches. Production hardening: switch
    * NoTimeout to EventTimeTimeout so idle users' state is GC'd at the
    * watermark; state then stays bounded by the active-user set. */
  final case class UserState(lastNs: Long, nEvents: Long, nSessions: Long)
  final case class UserSessions(user_id: Long, n_events: Long, n_sessions: Long)

  def sessionMemory(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapNs = 1800L * 1000000000L
    events.selectExpr("user_id", "ts")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(Long.MinValue, 0L, 0L))
          var last = prev.lastNs
          var n = prev.nEvents
          var sessions = prev.nSessions
          // late events (older than the carried state) are DROPPED, not
          // applied — applying them would regress `last` and corrupt gap
          // math for every subsequent on-time event. Production variant:
          // EventTimeTimeout + watermark instead of silent drop.
          rows.toSeq.sortBy(_._2).foreach { case (_, ns) =>
            if (last == Long.MinValue || ns > last) {
              if (last == Long.MinValue || ns - last > gapNs) sessions += 1
              last = ns
              n += 1
            }
          }
          val next = UserState(last, n, sessions)
          state.update(next)
          UserSessions(user, n, sessions)
      }
      .toDF()
  }

  /** Stream-stream interval join: purchases enriched with the same
    * user's clicks from the preceding 30 minutes. Both sides carry
    * watermarks so the join state is GC'd once event time passes the
    * interval — the property that bounds state on an unbounded run.
    * (Batch twin: the keyed range join `AdvancedQueries.qRangePairs`.) */
  def purchasesWithRecentClicks(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("event_time").as("p_time"))
      .withWatermark("p_time", "10 minutes")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("event_time").as("c_time"))
      .withWatermark("c_time", "40 minutes")
    purchases.join(clicks,
      expr("""p_user = c_user AND
              c_time BETWEEN p_time - INTERVAL 30 MINUTES AND p_time"""))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("click_id"), col("p_time"), col("c_time"))
  }

  /** Run a streaming query to a named in-memory sink and block until the
    * (finite, file-backed) source drains — the local test harness for a
    * pipeline that runs unbounded in production. */
  def runToMemory(df: DataFrame, name: String,
      outputMode: String): StreamingQuery = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q
  }
}
