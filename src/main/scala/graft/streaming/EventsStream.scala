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
  def source(spark: SparkSession, eventsDir: String): DataFrame = {
    // the stream's declared LongType schema surfaces the raw INT64; the
    // footer's time unit decides whether it is µs or the contract's ns
    // (batch footer peek at the already-staged dir — see Tables)
    val isMicros = Tables.eventsTsIsMicros(spark, eventsDir)
    Tables.normalizeEventsTs(
      spark.readStream
        .schema(Tables.events)
        .option("maxFilesPerTrigger", 1)
        .parquet(eventsDir), isMicros)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
  }

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

  /** One not-yet-released session interval held in state. */
  final case class OpenSession(startNs: Long, lastNs: Long, nEvents: Long)
  final case class ClosedSession(user_id: Long, session_start_ns: Long,
      session_end_ns: Long, n_events: Long)
  final case class UserSessions(user_id: Long, n_events: Long, n_sessions: Long)
  /** sessionMemory state: lifetime totals + the open session intervals. */
  final case class MemoryState(nEvents: Long, nClosed: Long,
      open: Seq[OpenSession])
  /** sessionizeStream state: just the open session intervals. */
  final case class SessionList(open: Seq[OpenSession])

  val SessionGapNs: Long = 1800L * 1000000000L

  /** Merge session intervals with incoming single-event intervals under
    * the gap rule: sort by start and fold — intervals whose start is
    * within `gap` of the accumulated end coalesce. Because this re-merges
    * the FULL held set every batch, an out-of-order event that arrives
    * within the watermark and bridges two previously-separate intervals
    * correctly collapses them (eager gap-break emission cannot do that —
    * it would have already emitted a phantom session). */
  private def mergeSessions(xs: Seq[OpenSession], gapNs: Long): Seq[OpenSession] =
    xs.sortBy(o => (o.startNs, o.lastNs)).foldLeft(List.empty[OpenSession]) {
      case (cur :: rest, next) if next.startNs - cur.lastNs <= gapNs =>
        OpenSession(cur.startNs, math.max(cur.lastNs, next.lastNs),
          cur.nEvents + next.nEvents) :: rest
      case (acc, next) => next :: acc
    }.reverse

  /** A session is releasable once the watermark passes (last + gap): no
    * event the watermark still admits can extend or merge it. */
  private def releasable(o: OpenSession, gapNs: Long, wmMs: Long): Boolean =
    o.lastNs / 1000000L + gapNs / 1000000L < wmMs

  private def nextTimeoutMs(open: Seq[OpenSession], gapNs: Long, wmMs: Long): Long =
    math.max(wmMs + 1L,
      open.map(o => o.lastNs / 1000000L + gapNs / 1000000L).min)

  /** P4 session/repeat memory (SURVEY §2.C): per-user state maintained
    * with mapGroupsWithState — running event count and gap-based session
    * count survive across micro-batches.
    *
    * Watermark-correct under disorder: state holds the OPEN session
    * intervals (not just a high-water timestamp), and every batch
    * re-merges them with the incoming events, so a late-but-in-watermark
    * event that lands inside or between held intervals updates the
    * counts exactly; the session count can legitimately DECREASE when a
    * late event bridges two intervals. Intervals are released (counted
    * as closed, dropped from state) once the watermark passes their
    * (last + gap); when nothing is left open the final totals are
    * emitted once and the state is REMOVED — state size stays bounded by
    * the watermark-recent active-user set. A user returning after GC
    * starts a fresh activity epoch. */
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
         state: GroupState[MemoryState]) =>
          val wmMs = state.getCurrentWatermarkMs
          val incoming = rows.map(t => OpenSession(t._2, t._2, 1L)).toSeq
          val prior = state.getOption.getOrElse(MemoryState(0L, 0L, Seq.empty))
          val merged = mergeSessions(prior.open ++ incoming, gapNs)
          val (released, open) = merged.partition(releasable(_, gapNs, wmMs))
          val totals = MemoryState(prior.nEvents + incoming.size,
            prior.nClosed + released.size, open)
          if (open.isEmpty) state.remove()
          else {
            state.update(totals)
            state.setTimeoutTimestamp(nextTimeoutMs(open, gapNs, wmMs))
          }
          UserSessions(user, totals.nEvents, totals.nClosed + open.size)
      }
      .toDF()
  }

  /** Streaming sessionization (the exact streaming twin of the batch
    * `q_sessionize_events` semantics): APPEND-mode emission of CLOSED
    * sessions via flatMapGroupsWithState. Sessions are emitted ONLY when
    * the watermark passes their (last + gap) — never eagerly on a gap
    * break, which would emit phantom sessions that a late-but-in-
    * watermark event could still merge. Emission also removes the
    * released intervals from state, so open state is O(sessions inside
    * the watermark horizon) per active user. On a drained finite stream
    * the emitted sessions are exactly the batch sessions except those
    * close enough to the stream's end that no watermark could release
    * them. */
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
         state: GroupState[SessionList]) =>
          val wmMs = state.getCurrentWatermarkMs
          val incoming = rows.map(t => OpenSession(t._2, t._2, 1L)).toSeq
          val prior = state.getOption.map(_.open).getOrElse(Seq.empty)
          val merged = mergeSessions(prior ++ incoming, gapNs)
          val (released, open) = merged.partition(releasable(_, gapNs, wmMs))
          if (open.isEmpty) state.remove()
          else {
            state.update(SessionList(open))
            state.setTimeoutTimestamp(nextTimeoutMs(open, gapNs, wmMs))
          }
          released.sortBy(_.startNs).iterator
            .map(o => ClosedSession(user, o.startNs, o.lastNs, o.nEvents))
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

  /** Stream-static join: streaming events enriched with a STATIC
    * per-user dimension frame (no watermark needed on the static side —
    * Spark re-plans the static relation per micro-batch, so a lake
    * table that is atomically swapped between batches is picked up).
    * The static side shuffles or broadcasts per its size, exactly as in
    * batch; streaming state holds nothing for it — the property that
    * lets a 100 TB static dim join an unbounded stream. Inner join:
    * events without a dimension row drop (the batch twin's semantics). */
  def enrichWithStatic(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(userDim, Seq("user_id"))

  /** Registry twin of [[enrichWithStatic]] with the static side served
    * THROUGH THE LAKE: the per-user purchase dimension is committed as
    * a manifest version ([[graft.sources.LakeLayout.commitLakeVersion]])
    * and resolved back via [[graft.sources.LakeLayout.readLake]], so the
    * oracle-checked plan exercises the exact read path a production
    * stream-static join uses (Spark re-plans the static relation per
    * micro-batch, picking up atomically-swapped lake versions — the
    * StreamingSpec drive pins stream/batch join parity; this query pins
    * the batch side against DuckDB). All-integer aggregates keep the
    * hash compare exact. */
  def qStreamStaticEnrich(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = graft.sources.Tables.load(s, dir, "events")
    // µs truncation: Spark reads ts as raw int64 nanoseconds while
    // DuckDB resolves the same parquet column at timestamp[µs] — the
    // sub-µs digits exist on one side only
    val dim = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_purchases"),
        min(expr("ts div 1000")).as("first_purchase_us"))
    val sc = s.sparkContext
    val root = sc.getCheckpointDir.getOrElse {
      require(sc.master.startsWith("local"),
        "qStreamStaticEnrich needs sparkContext.setCheckpointDir pointing " +
          "at shared storage (HDFS/S3) on a non-local master")
      java.nio.file.Files.createTempDirectory("graft-dim-lake").toString
    }
    val lakePath =
      s"$root/dim-${java.util.UUID.randomUUID().toString.take(12)}"
    graft.sources.LakeLayout.commitLakeVersion(dim, lakePath,
      "registry-dim", 0L, statsKey = Some("user_id"))
    val staticDim = graft.sources.LakeLayout.readLake(s, lakePath).get
    enrichWithStatic(ev, staticDim)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_enriched"),
        sum($"n_purchases").as("sum_purchases"),
        min($"first_purchase_us").as("min_first_purchase_us"))
      .orderBy($"event_type")
  }

  /** DuckDB oracle: the dimension as a subquery (the lake round-trip is
    * semantically the identity), inner join = enrichWithStatic's
    * contract. */
  val qStreamStaticEnrichSql: String =
    """WITH dim AS (
         SELECT user_id, COUNT(*) AS n_purchases,
           MIN(epoch_us(ts)) AS first_purchase_us
         FROM events WHERE event_type = 'purchase' GROUP BY user_id)
       SELECT e.event_type,
         COUNT(*) AS n_enriched,
         CAST(SUM(d.n_purchases) AS BIGINT) AS sum_purchases,
         MIN(d.first_purchase_us) AS min_first_purchase_us
       FROM events e JOIN dim d ON e.user_id = d.user_id
       GROUP BY e.event_type ORDER BY e.event_type"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_static_enrich" -> (qStreamStaticEnrich _))

  val oracle: Map[String, String] = Map(
    "q_stream_static_enrich" -> qStreamStaticEnrichSql)

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

  /** Run a streaming query to a parquet FILE sink with a checkpoint —
    * the production deployment shape: the checkpoint persists source
    * offsets, the event-time watermark, and every stateful operator's
    * store, and the file sink's commit manifest makes output atomic, so
    * a stopped query resumed from the same (checkpoint, path) pair is
    * end-to-end exactly-once across restarts (the recovery spec drives
    * exactly that: stop mid-session, restart, the open-session state
    * must carry over). Blocks until the finite source drains. */
  def runToParquet(df: DataFrame, outPath: String,
      checkpoint: String): StreamingQuery = {
    val q = df.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q
  }

  /** Streaming UPSERT into a manifest-committed parquet lake table via
    * foreachBatch — the production pattern when the sink must stay a
    * queryable TABLE (one row per key, latest version wins) rather than
    * an append log. Each micro-batch:
    *   1. collapses in-batch duplicates per key (highest `ts` wins,
    *      `event_id` tie-break — deterministic under replay);
    *   2. commits the merge FILE-GRANULARLY with
    *      [[graft.sources.LakeLayout.upsertIntoLake]]: only the files
    *      whose key range intersects the batch are rewritten
    *      (anti-join + union over their rows alone); every other file
    *      is carried into the new version BY REFERENCE. Write
    *      amplification per batch is O(batch + touched files), never
    *      O(table) — the property that lets this sink run against a
    *      100 TB table (the previous whole-table merge rewrote every
    *      byte every micro-batch). The commit point is one atomic
    *      manifest rename; readers resolving through
    *      [[graft.sources.LakeLayout.readLake]] see the old version
    *      until that instant — no missing-table window, and a crash on
    *      either side of the rename leaves a fully readable table.
    * Exactly-once across restarts: a replayed batch from the SAME
    * checkpoint whose (checkpoint, batchId) already heads the commit
    * log is skipped outright (it is the latest commit — merging it
    * again would be a no-op by idempotence, skipping it is free); a
    * replay from a FRESH checkpoint re-merges, which converges by the
    * same idempotence. Superseded versions are vacuumed down to 2
    * (reference-counted: files carried into live manifests survive the
    * versions that wrote them). `compactEveryBatches > 0` additionally
    * runs [[graft.sources.LakeLayout.compactLake]] after every Nth
    * batch — each upsert adds a few files, so the live version
    * fragments over time; periodic key-clustered rewrites re-tighten
    * the per-file key ranges (making the NEXT upserts touch few files)
    * and bound the file count without blocking readers (a compaction
    * commit between a crash and its replay is harmless: the replayed
    * merge is idempotent on the compacted table). Blocks until the
    * finite source drains (same harness shape as [[runToParquet]]). */
  /** MULTI-WRITER streaming merge sink: several independent streams
    * upsert the SAME lake table, each commit going through the
    * optimistic-concurrency protocol ([[graft.sources.LakeLayout
    * .upsertIntoLakeOcc]]) — a conflict recomputes against the new
    * snapshot at O(batch + touched files). Replay detection scans all
    * live versions ([[graft.sources.LakeLayout.lakeHasCommit]]),
    * because after a restart the latest manifest may belong to another
    * writer. No vacuum inside the loop — under concurrent writers,
    * retention runs out-of-band in a single maintenance role (the
    * vacuum contract). `writerId` must be stable across restarts of
    * the same logical writer (it is the provenance key). */
  def runUpsertToLakeOcc(updates: DataFrame, lakePath: String,
      checkpoint: String, writerId: String,
      key: String = "user_id"): StreamingQuery = {
    import graft.sources.LakeLayout
    val q = updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        if (!LakeLayout.lakeHasCommit(s, lakePath, writerId, batchId)) {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col(key))
            .orderBy(col("ts").desc, col("event_id").desc)
          val deduped = batch
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1).drop("rn")
          LakeLayout.upsertIntoLakeOcc(s, lakePath, deduped, key,
            writerId, batchId)
          ()
        }
      }
      .start()
    q.processAllAvailable()
    q
  }

  def runUpsertToLake(updates: DataFrame, lakePath: String,
      checkpoint: String, key: String = "user_id",
      compactEveryBatches: Int = 0): StreamingQuery = {
    import graft.sources.LakeLayout
    val q = updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val alreadyCommitted = LakeLayout.latestLakeCommit(s, lakePath)
          .exists(c => c.checkpoint == checkpoint && c.batchId == batchId)
        if (!alreadyCommitted) {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col(key))
            .orderBy(col("ts").desc, col("event_id").desc)
          val deduped = batch
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1).drop("rn")
          // vacuum grace must cover the commits one batch cycle can
          // make: with compaction on, a cycle commits TWICE (merge,
          // then compact) — keep=2 after the compact would drop the
          // pre-cycle version a concurrent reader resolved moments
          // earlier (the endurance drive catches exactly this race);
          // keep=3 leaves it readable until the next cycle
          val keep = if (compactEveryBatches > 0) 3 else 2
          LakeLayout.upsertIntoLake(s, lakePath, deduped, key,
            checkpoint, batchId)
          LakeLayout.vacuumLake(s, lakePath, keep = keep)
          if (compactEveryBatches > 0 &&
              (batchId + 1) % compactEveryBatches == 0) {
            // PARTIAL compaction: consolidates only the small files the
            // recent batches added — O(recent bytes) per cycle, never
            // O(table); at-size files carry by reference
            LakeLayout.compactLakeSmallFiles(s, lakePath, key)
            LakeLayout.vacuumLake(s, lakePath, keep = keep)
          }
        }
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Stream-vs-batch parity accounting for the sessionize drive:
    * `onlyStream`/`onlyBatch` are exact row-multiset differences and
    * must both be 0. */
  final case class SessionizeDriveReport(nStreamed: Long, nReleasable: Long,
      nWithheld: Long, onlyStream: Long, onlyBatch: Long) {
    def parity: Boolean = onlyStream == 0 && onlyBatch == 0
  }

  /** The production deployment shape, driven end to end: stage the
    * finite `events` table into a watched directory, run
    * [[sessionizeStream]] through [[runToParquet]] (file sink +
    * checkpoint), then verify the ON-DISK output against the batch
    * sessionization derived the `q_sessionize_events` way. A finite
    * stream's final watermark (max event time − 10 min) never releases
    * sessions whose (end + gap) it hasn't passed, so the batch twin is
    * split into releasable vs trailing-withheld and equality is checked
    * as an exact multiset match on the releasable part — computed with
    * distributed `exceptAll` counts, nothing session-proportional on
    * the driver. */
  def sessionizeParquetDrive(spark: SparkSession, sfDir: String,
      outDir: String, checkpoint: String): SessionizeDriveReport = {
    import org.apache.spark.sql.expressions.Window
    // the file stream source watches a directory — stage the table. The
    // driver testdata is a single file, but a directory of part files
    // (normal Spark output) must stage its data files too, not silently
    // yield an empty watched dir and a zero-session "pass".
    val watched = java.nio.file.Files.createTempDirectory("graft-events-src")
    val srcTable = java.nio.file.Paths.get(s"$sfDir/events.parquet")
    if (java.nio.file.Files.isRegularFile(srcTable))
      java.nio.file.Files.copy(srcTable, watched.resolve("events.parquet"))
    else {
      require(java.nio.file.Files.isDirectory(srcTable),
        s"events table missing: $srcTable")
      val walk = java.nio.file.Files.walk(srcTable)
      try {
        val parts = walk.filter(p =>
            java.nio.file.Files.isRegularFile(p) &&
              p.getFileName.toString.endsWith(".parquet"))
          .iterator()
        var i = 0
        var any = false
        while (parts.hasNext) {
          java.nio.file.Files.copy(parts.next(),
            watched.resolve(f"part-$i%05d.parquet"))
          i += 1; any = true
        }
        require(any, s"events table has no parquet part files: $srcTable")
      } finally walk.close()
    }
    val q = runToParquet(
      sessionizeStream(spark, source(spark, watched.toString)),
      outDir, checkpoint)
    q.stop()
    val streamed = spark.read.parquet(outDir)
      .select(col("user_id"), col("session_start_ns"),
        col("session_end_ns"), col("n_events"))
    // batch twin: per-session rows via the q_sessionize_events lag/flag
    // derivation (one window sort per user — fine at drive scale; the
    // bounded-sort-width variant exists for the adversarial case)
    val events = Tables.load(spark, sfDir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sessions = events
      .withColumn("prev_ns", lag(col("ts"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ns").isNull || col("ts") - col("prev_ns") > SessionGapNs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start_ns"),
        max(col("ts")).as("session_end_ns"),
        count(lit(1)).as("n_events"))
    // the drained stream's final watermark, in the stream's own units
    val wmMs = events.agg(max(col("ts"))).head().getLong(0) / 1000000L -
      10L * 60L * 1000L
    val releasable = sessions
      .filter(col("session_end_ns") / 1000000L + lit(SessionGapNs / 1000000L) < wmMs)
      .select(col("user_id"), col("session_start_ns"),
        col("session_end_ns"), col("n_events"))
    SessionizeDriveReport(
      nStreamed = streamed.count(),
      nReleasable = releasable.count(),
      nWithheld = sessions.count() - releasable.count(),
      onlyStream = streamed.exceptAll(releasable).count(),
      onlyBatch = releasable.exceptAll(streamed).count())
  }
}
