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
    * count survive across micro-batches.
    *
    * State GC: EventTimeTimeout. A user's state carries a timeout at
    * (last activity + session gap); once the WATERMARK passes it, the
    * next trigger emits the final totals one last time and REMOVES the
    * state — so state size is bounded by the watermark-recent active-user
    * set, not by every user ever seen (the property that keeps an
    * unbounded run alive). A user returning after GC starts a fresh
    * activity epoch. */
  final case class UserState(lastNs: Long, nEvents: Long, nSessions: Long)
  final case class UserSessions(user_id: Long, n_events: Long, n_sessions: Long)

  val SessionGapNs: Long = 1800L * 1000000000L

  def sessionMemory(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val gapNs = SessionGapNs
    events
      .withWatermark("event_time", "10 minutes")
      // event_time stays in the projection so the watermark attribute
      // survives into the stateful operator's child plan
      .selectExpr("user_id", "ts", "event_time")
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            // idle past watermark + gap: final emit, then drop the state
            val fin = state.get
            state.remove()
            UserSessions(user, fin.nEvents, fin.nSessions)
          } else {
            val prev = state.getOption.getOrElse(UserState(Long.MinValue, 0L, 0L))
            var last = prev.lastNs
            var n = prev.nEvents
            var sessions = prev.nSessions
            // events older than the carried state are DROPPED, not
            // applied — applying them would regress `last` and corrupt
            // gap math for every subsequent on-time event (the watermark
            // already filters rows older than its horizon upstream).
            rows.toSeq.sortBy(_._2).foreach { case (_, ns, _) =>
              if (last == Long.MinValue || ns > last) {
                if (last == Long.MinValue || ns - last > gapNs) sessions += 1
                last = ns
                n += 1
              }
            }
            state.update(UserState(last, n, sessions))
            // GC horizon: when the watermark passes last activity + gap
            // the session can no longer be extended. Timeout timestamps
            // must sit strictly above the current watermark.
            state.setTimeoutTimestamp(
              math.max(last / 1000000L + gapNs / 1000000L,
                state.getCurrentWatermarkMs + 1L))
            UserSessions(user, n, sessions)
          }
      }
      .toDF()
  }

  /** Streaming sessionization (the exact streaming twin of the batch
    * `q_sessionize_events` semantics): APPEND-mode emission of CLOSED
    * sessions via flatMapGroupsWithState. A session closes either when a
    * later event of the same user arrives past the 30-min gap (emitted
    * immediately) or when the watermark passes (last event + gap) — the
    * EventTimeTimeout path, which also removes the state, so open-session
    * state is O(active users). On a drained finite stream the emitted
    * sessions are exactly the batch sessions except each user's trailing
    * open session, which no watermark can close. */
  final case class OpenSession(startNs: Long, lastNs: Long, nEvents: Long)
  final case class ClosedSession(user_id: Long, session_start_ns: Long,
      session_end_ns: Long, n_events: Long)

  def sessionizeStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapNs = SessionGapNs
    events
      .withWatermark("event_time", "10 minutes")
      .selectExpr("user_id", "ts", "event_time")
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val open = state.get
            state.remove()
            Iterator(ClosedSession(user, open.startNs, open.lastNs, open.nEvents))
          } else {
            val closed = scala.collection.mutable.Buffer.empty[ClosedSession]
            var open = state.getOption.orNull
            rows.toSeq.sortBy(_._2).foreach { case (_, ns, _) =>
              open match {
                case null =>
                  open = OpenSession(ns, ns, 1L)
                case o if ns <= o.lastNs => // stale/dup row: ignore
                case o if ns - o.lastNs > gapNs =>
                  closed += ClosedSession(user, o.startNs, o.lastNs, o.nEvents)
                  open = OpenSession(ns, ns, 1L)
                case o =>
                  open = OpenSession(o.startNs, ns, o.nEvents + 1L)
              }
            }
            state.update(open)
            state.setTimeoutTimestamp(
              math.max(open.lastNs / 1000000L + gapNs / 1000000L,
                state.getCurrentWatermarkMs + 1L))
            closed.iterator
          }
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
