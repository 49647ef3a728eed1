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

  test("idle-key session state is dropped once the watermark passes last+gap") {
    import org.apache.spark.sql.functions._
    // two files, processed as two micro-batches (maxFilesPerTrigger=1):
    // user 1 is active only in file A (hour 0); file B (hour 3) advances
    // the watermark far past user 1's (last event + 30-min gap) timeout,
    // so the timeout batch must emit user 1's finals and REMOVE its state
    // — leaving only user 2's state resident.
    val dir = java.nio.file.Files.createTempDirectory("graft-gc-events")
    val h = 3600L * 1000000000L // ns per hour
    def write(name: String, userId: Long, baseNs: Long): Unit =
      spark.range(0, 5).select(
        (col("id") + userId * 1000).as("event_id"),
        (lit(baseNs) + col("id") * 60L * 1000000000L).as("ts"),
        lit(userId).as("user_id"),
        lit("click").as("event_type"),
        lit(1.0).as("value"),
        lit("{}").as("props"))
        .coalesce(1).write.parquet(s"$dir/$name")
    write("a", userId = 1L, baseNs = h)
    Thread.sleep(1100) // distinct mtimes => deterministic file order a, b
    write("b", userId = 2L, baseNs = 4 * h)
    val src = spark.readStream
      .schema(graft.sources.Tables.events)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/*")
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
    val q = EventsStream.runToMemory(
      EventsStream.sessionMemory(spark, src), "gc_sessions", outputMode = "update")
    try {
      // the timeout fires in a no-data micro-batch right after the data
      // drains — poll briefly for its progress entry
      def stateRows: Long = Option(q.lastProgress)
        .flatMap(_.stateOperators.headOption).map(_.numRowsTotal).getOrElse(-1L)
      val deadline = System.nanoTime() + 15L * 1000000000L
      while (stateRows != 1L && System.nanoTime() < deadline) {
        q.processAllAvailable(); Thread.sleep(200)
      }
      assert(stateRows == 1L,
        s"expected only user 2's state resident after GC, found $stateRows rows")
      // the timeout emission carried user 1's final totals
      val u1 = spark.sql(
        """SELECT max(n_events), max(n_sessions) FROM gc_sessions WHERE user_id = 1""")
        .collect().head
      assert(u1.getLong(0) == 5L && u1.getLong(1) == 1L)
      // post-GC return: user 1 reappears at hour 8 with THREE events — a
      // fresh activity epoch whose totals restart, never resuming the
      // dropped (5, 1) state into (8, 2)
      spark.range(0, 3).select(
          (col("id") + 9000L).as("event_id"),
          (lit(8 * h) + col("id") * 60L * 1000000000L).as("ts"),
          lit(1L).as("user_id"),
          lit("click").as("event_type"),
          lit(1.0).as("value"),
          lit("{}").as("props"))
        .coalesce(1).write.parquet(s"$dir/c")
      q.processAllAvailable()
      val epochs = spark.sql(
        """SELECT DISTINCT n_events, n_sessions FROM gc_sessions
           WHERE user_id = 1""").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(epochs.contains((3L, 1L)), s"fresh epoch totals missing: $epochs")
      assert(!epochs.exists(_._1 > 5L),
        s"dropped state must not resume into cumulative totals: $epochs")
    } finally q.stop()
  }

  test("foreachBatch lake upsert keeps one latest row per key across batches and replays") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft-upsert")
    val srcDir = s"$root/src"
    val lake = s"$root/lake"
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(srcDir))
    val m = 60L * 1000000000L
    def writeEvents(name: String, userId: Long, baseNs: Long, n: Int,
        idBase: Long): Unit =
      spark.range(0, n).select(
          (col("id") + idBase).as("event_id"),
          (lit(baseNs) + col("id") * m).as("ts"),
          lit(userId).as("user_id"),
          lit("click").as("event_type"),
          lit(1.0).as("value"),
          lit("{}").as("props"))
        .coalesce(1).write.parquet(s"$srcDir/$name")
    def runDrive(ckpt: String): Unit = {
      val src = spark.readStream.schema(graft.sources.Tables.events)
        .option("maxFilesPerTrigger", 1).parquet(s"$srcDir/*")
      val q = EventsStream.runUpsertToLake(src, lake, ckpt)
      q.stop()
    }
    // readers resolve through the manifest — the raw path holds
    // versioned data dirs plus the commit log
    def lakeRows(): Map[Long, Long] =
      graft.sources.LakeLayout.readLake(spark, lake).get
        .select(col("user_id"), col("event_id")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch a: three versions of user 7 (latest = id 102) + user 8
    writeEvents("a", userId = 7L, baseNs = m, n = 3, idBase = 100L)
    Thread.sleep(1100) // distinct mtimes => deterministic file order
    writeEvents("a8", userId = 8L, baseNs = m, n = 1, idBase = 200L)
    val ckpt1 = s"$root/ckpt1"
    runDrive(ckpt1)
    assert(lakeRows() == Map(7L -> 102L, 8L -> 200L),
      "one row per key, in-batch duplicates collapsed to the latest")
    // batch b arrives later: user 7 updated, user 9 new — resume from
    // the SAME checkpoint, only the new file is processed
    Thread.sleep(1100)
    writeEvents("b", userId = 7L, baseNs = 10L * m, n = 1, idBase = 300L)
    Thread.sleep(1100)
    writeEvents("b9", userId = 9L, baseNs = 10L * m, n = 1, idBase = 400L)
    runDrive(ckpt1)
    val afterB = lakeRows()
    assert(afterB == Map(7L -> 300L, 8L -> 200L, 9L -> 400L),
      "matched key replaced by the newer version, new keys appended")
    // full at-least-once replay (fresh checkpoint, existing lake):
    // every batch re-merges in order — idempotent, same table
    runDrive(s"$root/ckpt2")
    assert(lakeRows() == afterB, "replaying all batches must converge")
    // periodic auto-compaction: same table contents, bounded files,
    // still converges through the interleaved compaction commits
    val src2 = spark.readStream.schema(graft.sources.Tables.events)
      .option("maxFilesPerTrigger", 1).parquet(s"$srcDir/*")
    val q2 = EventsStream.runUpsertToLake(src2, s"$root/lake2",
      s"$root/ckpt3", compactEveryBatches = 2)
    q2.stop()
    val lake2 = graft.sources.LakeLayout.readLake(spark, s"$root/lake2").get
    assert(lake2.select(col("user_id"), col("event_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == afterB,
      "compacting drive must produce the same table")
    assert(lake2.inputFiles.length <= 2,
      s"compacted live version must be few files, got ${lake2.inputFiles.length}")
  }

  test("two concurrent streaming writers OCC-merge into one lake table without lost updates") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft-occ-stream")
    val lake = s"$root/lake"
    // writer w1 owns users 0-4, writer w2 owns users 10-14; 3 source
    // files each → 3 micro-batches per writer (maxFilesPerTrigger=1)
    val m = 60L * 1000000000L
    def writeSrc(writer: String, userBase: Long, b: Int): Unit =
      spark.range(0, 5).select(
          (lit(userBase * 1000 + b * 100) + col("id")).as("event_id"),
          (lit((b + 1) * m) + col("id")).as("ts"),
          (lit(userBase) + col("id")).as("user_id"),
          lit("click").as("event_type"), lit(1.0).as("value"),
          lit("{}").as("props"))
        .coalesce(1).write.parquet(s"$root/src-$writer/b$b")
    for (b <- 0 until 3) {
      writeSrc("w1", 0L, b); writeSrc("w2", 10L, b)
      Thread.sleep(1100) // distinct mtimes => deterministic batch order
    }
    val start = new java.util.concurrent.CountDownLatch(1)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq("w1", "w2").map { w =>
      new Thread(() => {
        start.await()
        try {
          val src = spark.readStream.schema(graft.sources.Tables.events)
            .option("maxFilesPerTrigger", 1).parquet(s"$root/src-$w/*")
          EventsStream.runUpsertToLakeOcc(src, lake, s"$root/ckpt-$w", w)
            .stop()
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
    assert(errors.isEmpty, s"writer failed: ${Option(errors.peek())}")
    // no lost updates: every user's final event is its writer's LAST batch
    val rows = graft.sources.LakeLayout.readLake(spark, lake).get
      .select(col("user_id"), col("event_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet == ((0L until 5L) ++ (10L until 15L)).toSet)
    (0L until 5L).foreach(u => assert(rows(u) == 200 + u,
      s"user $u must end at w1's batch-2 event, got ${rows(u)}"))
    (10L until 15L).foreach(u => assert(rows(u) == 10200 + (u - 10),
      s"user $u must end at w2's batch-2 event, got ${rows(u)}"))
    // the version chain is contiguous and carries all 6 commits
    val versions = graft.sources.LakeLayout.lakeVersions(spark, lake)
    assert(versions == (0L until 6L), s"got $versions")
    for (w <- Seq("w1", "w2"); b <- 0L until 3L)
      assert(graft.sources.LakeLayout.lakeHasCommit(spark, lake, w, b),
        s"commit ($w, $b) was lost")
  }

  test("lake endurance: 21 upsert batches with compaction under a concurrent reader") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-endure")
    val srcDir = s"$root/src"
    val lake = s"$root/lake"
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(srcDir))
    val m = 60L * 1000000000L
    // one staged file per micro-batch; mtimes set EXPLICITLY so the file
    // source processes them in order without per-file sleeps
    def stage(name: String, order: Int,
        rows: Seq[(Long, Long, Long)]): Unit = { // (event_id, ts, user_id)
      rows.toDF("event_id", "ts", "user_id")
        .select(col("event_id"), col("ts"), col("user_id"),
          lit("click").as("event_type"), lit(1.0).as("value"),
          lit("{}").as("props"))
        .coalesce(1).write.parquet(s"$srcDir/$name")
      val d = new java.io.File(s"$srcDir/$name")
      (d.listFiles() :+ d).foreach(_.setLastModified(1700000000000L + order * 4000L))
    }
    // batch 0: users 0..49; batches 1..20: update 5 contiguous users,
    // insert one brand-new user each
    val all = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    def record(rows: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] = {
      all ++= rows; rows
    }
    stage("b0", 0, record((0L until 50L).map(u => (u, m, u))))
    // odd batches UPDATE 5 contiguous existing users (+1 insert); even
    // batches are PURE INSERTS (keys beyond every file range) — the
    // class of commit that provably rewrites nothing and carries the
    // whole previous version by reference
    for (b <- 1 to 20)
      stage(s"b$b", b, record(
        if (b % 2 == 1)
          (0 until 5).map(i => (1000L + b * 10L + i, m + b * m, b * 2L + i)) :+
            (2000L + b, m + b * m, 1000L + b)
        else
          (0 until 3).map(i => (3000L + b * 10L + i, m + b * m, 1500L + b * 10L + i))))
    // concurrent reader: resolve + count in a loop for the whole drive;
    // the manifest protocol + vacuum grace must keep every resolved
    // version readable
    @volatile var done = false
    @volatile var readerError: Option[Throwable] = None
    var reads = 0L
    val reader = new Thread(() => {
      while (!done && readerError.isEmpty) {
        try {
          graft.sources.LakeLayout.readLake(spark, lake).foreach { df =>
            df.count(); reads += 1
          }
        } catch { case t: Throwable => readerError = Some(t) }
      }
    })
    reader.start()
    try {
      val src = spark.readStream.schema(graft.sources.Tables.events)
        .option("maxFilesPerTrigger", 1).parquet(s"$srcDir/*")
      val q = EventsStream.runUpsertToLake(src, lake, s"$root/ckpt",
        compactEveryBatches = 5)
      q.stop()
    } finally {
      done = true
      reader.join(30000)
    }
    assert(readerError.isEmpty,
      s"concurrent reader must never throw: ${readerError.map(_.toString)}")
    assert(reads > 0, "reader must have completed reads during the drive")
    // bounded versions and files after 21 commits + 4 compactions
    val manifests = new java.io.File(s"$lake/_commits").listFiles()
      .count(_.getName.endsWith(".manifest"))
    assert(manifests <= 3, s"vacuum must bound live versions, got $manifests")
    val dataFiles = {
      def walk(f: java.io.File): Long =
        if (f.isFile) (if (f.getName.endsWith(".parquet")) 1L else 0L)
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(s"$lake/data"))
    }
    assert(dataFiles <= 50, s"vacuum+compaction must bound files, got $dataFiles")
    // the last merge commit must carry files from the previous version
    // by reference — the file-granular property, visible in streaming
    val last2 = graft.sources.LakeLayout.lakeVersions(spark, lake).takeRight(2)
    val shared = last2.map(v =>
      graft.sources.LakeLayout.readLakeVersion(spark, lake, v)
        .inputFiles.toSet).reduce(_ intersect _)
    assert(shared.nonEmpty,
      "consecutive versions must share carried files by reference")
    // final table = batch-computed truth (latest (ts, event_id) per user)
    val want = all.groupBy(_._3).map { case (u, rows) =>
      u -> rows.maxBy(r => (r._2, r._1))._1
    }
    val got = graft.sources.LakeLayout.readLake(spark, lake).get
      .select(col("user_id"), col("event_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, "endurance drive must converge to the batch truth")
  }

  test("stream-static join enriches exactly the batch join's rows") {
    import org.apache.spark.sql.functions._
    val events = graft.sources.Tables.load(spark, sfDir, "events")
    // static dim: per-user lifetime purchase count, but only for HALF
    // the users — the inner join must drop the other half's events
    val dim = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_purchases"))
      .filter(col("user_id") % 2 === 0)
    val stagedDir = java.nio.file.Files.createTempDirectory("graft-ss-src")
    events.coalesce(1).write.mode("overwrite")
      .parquet(stagedDir.resolve("events").toString)
    val stream = spark.readStream.schema(graft.sources.Tables.events)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$stagedDir/events")
    val q = EventsStream.runToMemory(
      EventsStream.enrichWithStatic(stream, dim)
        .select(col("event_id"), col("user_id"), col("n_purchases")),
      "ss_join", "append")
    try {
      val streamed = spark.table("ss_join")
      val batch = events.join(dim, Seq("user_id"))
        .select(col("event_id"), col("user_id"), col("n_purchases"))
      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).count() == 0L &&
        batch.exceptAll(streamed).count() == 0L,
        "stream-static join must equal the batch join exactly")
    } finally q.stop()
  }

  test("streaming incremental components maintain a manifest-committed label table") {
    import org.apache.spark.sql.functions._
    import graft.streaming.LabelStream
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-labels")
    val srcDir = s"$root/src"
    val lake = s"$root/labels"
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(srcDir))
    def writePairs(name: String, ps: Seq[(Long, Long)]): Unit = {
      ps.toDF("i", "j").coalesce(1).write.parquet(s"$srcDir/$name")
      Thread.sleep(1100) // distinct mtimes => deterministic file order
    }
    // three detector batches: initial comps, then a MERGE across them,
    // then a disjoint new component
    writePairs("b0", Seq((1L, 2L), (3L, 4L)))
    writePairs("b1", Seq((2L, 3L)))
    writePairs("b2", Seq((10L, 11L)))
    def drive(ckpt: String): Unit = {
      val q = LabelStream.runIncrementalComponentsToLake(
        LabelStream.pairSource(spark, s"$srcDir/*"), lake, ckpt)
      q.stop()
    }
    def labels(): Map[Long, Long] =
      graft.sources.LakeLayout.readLake(spark, lake).get.collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component")).toMap
    drive(s"$root/ckpt1")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L)
    assert(labels() == expected,
      "streamed incremental labels must equal the full closure")
    // the batch-side truth: one-shot CC over every pair ever streamed
    val full = graft.operators.Components.connectedComponents(
        Seq((1L, 2L), (3L, 4L), (2L, 3L), (10L, 11L)).toDF("i", "j"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component")).toMap
    assert(labels() == full, "stream/batch parity on the label table")
    // full replay from a fresh checkpoint: folding known pairs into the
    // converged table is a fixpoint
    drive(s"$root/ckpt2")
    assert(labels() == expected, "replay must converge, not corrupt")
    // vacuum bounds the version history
    val manifests = new java.io.File(s"$lake/_commits").listFiles()
      .map(_.getName).count(_.endsWith(".manifest"))
    assert(manifests <= 2, s"vacuum must bound manifests, found $manifests")
  }

  test("checkpoint recovery: offsets, watermark, and open-session state survive a restart") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft-ckpt")
    val srcDir = s"$root/src"
    val outDir = s"$root/out"
    val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(srcDir))
    val h = 3600L * 1000000000L // ns per hour
    val m = 60L * 1000000000L // ns per minute
    def writeEvents(name: String, userId: Long, baseNs: Long, n: Int,
        idBase: Long): Unit =
      spark.range(0, n).select(
          (col("id") + idBase).as("event_id"),
          (lit(baseNs) + col("id") * m).as("ts"),
          lit(userId).as("user_id"),
          lit("click").as("event_type"),
          lit(1.0).as("value"),
          lit("{}").as("props"))
        .coalesce(1).write.parquet(s"$srcDir/$name")
    // explicit schema: the sink dir is legitimately EMPTY after run 1
    // (nothing releasable yet) and inference would fail on it
    val outSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id BIGINT, session_start_ns BIGINT, session_end_ns BIGINT, n_events BIGINT")
    def readOut() = spark.read.schema(outSchema).parquet(outDir)
    // The timeout batch that releases sessions runs AFTER the data
    // drains (no-data micro-batch once the watermark advances) — poll
    // for the emission, same pattern as the state-GC test above.
    def runOnce(until: () => Boolean): Unit = {
      val src = spark.readStream
        .schema(graft.sources.Tables.events)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$srcDir/*") // glob: each write lands in a subdir
        .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      val q = EventsStream.runToParquet(
        EventsStream.sessionizeStream(spark, src), outDir, ckpt)
      try {
        val deadline = System.nanoTime() + 20L * 1000000000L
        while (!until() && System.nanoTime() < deadline) {
          q.processAllAvailable(); Thread.sleep(250)
        }
      } finally q.stop()
    }
    // ---- first query instance: user 7's session is OPEN when it stops
    // (events h..h+4m; watermark h+4m-10min is far from last+gap)
    writeEvents("a", userId = 7L, baseNs = h, n = 5, idBase = 100L)
    runOnce(() => true)
    // ---- second query instance, SAME checkpoint: file b lands 20 min
    // after file a's last event — inside the 30-min gap, so it must
    // MERGE with the RECOVERED open interval, provable only if the
    // state store was restored. File c (far future) advances the
    // watermark past (last + gap) and forces the release.
    writeEvents("b", userId = 7L, baseNs = h + 24 * m, n = 5, idBase = 200L)
    Thread.sleep(1100) // distinct mtimes => deterministic file order b, c
    writeEvents("c", userId = 99L, baseNs = 5 * h, n = 1, idBase = 300L)
    runOnce(() => readOut().filter(col("user_id") === 7L).count() == 1L)
    val sessions = readOut()
      .filter(col("user_id") === 7L).collect()
    // one session, not two: lost state would emit a or b standalone
    // (and replayed offsets would emit a twice — the file-sink manifest
    // plus checkpointed offsets forbid both)
    assert(sessions.length == 1,
      s"expected ONE merged session across the restart, got ${sessions.toSeq}")
    val s0 = sessions.head
    assert(s0.getAs[Long]("session_start_ns") == h)
    assert(s0.getAs[Long]("session_end_ns") == h + 28 * m)
    assert(s0.getAs[Long]("n_events") == 10L,
      "merged session must count events from BOTH sides of the restart")
  }

  test("streaming sessionization emits exactly the non-trailing batch sessions") {
    import org.apache.spark.sql.functions._
    val src = EventsStream.source(spark, eventsDir)
    val q = EventsStream.runToMemory(
      EventsStream.sessionizeStream(spark, src), "closed_sessions", "append")
    try {
      // batch twin: per-session rows derived the q_sessionize_events way
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gap = EventsStream.SessionGapNs
      val batchSessions = graft.sources.Tables.load(spark, sfDir, "events")
        .withColumn("prev_ns", lag(col("ts"), 1).over(w))
        .withColumn("is_new",
          when(col("prev_ns").isNull || col("ts") - col("prev_ns") > gap, 1L)
            .otherwise(0L))
        .withColumn("session_id",
          sum(col("is_new")).over(w.rowsBetween(Long.MinValue, 0)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts")).as("session_start_ns"),
          max(col("ts")).as("session_end_ns"),
          count(lit(1)).as("n_events"))
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_ns")) ->
          (r.getAs[Long]("session_end_ns"), r.getAs[Long]("n_events"))).toMap
      val streamed = spark.sql(
        """SELECT user_id, session_start_ns, session_end_ns, n_events
           FROM closed_sessions""").collect()
      assert(streamed.nonEmpty, "no sessions emitted")
      streamed.foreach { r =>
        val key = (r.getLong(0), r.getLong(1))
        assert(batchSessions.contains(key), s"phantom session $key")
        assert(batchSessions(key) == (r.getLong(2), r.getLong(3)),
          s"session $key end/count mismatch")
      }
      // everything withheld must be unreleasable: the finite stream's
      // final watermark (max event time - 10 min) never passed the
      // session's (end + gap), so no emission was permitted
      val maxNs = graft.sources.Tables.load(spark, sfDir, "events")
        .agg(max(col("ts"))).collect().head.getLong(0)
      val finalWmMs = maxNs / 1000000L - 600000L
      val emitted = streamed.map(r => (r.getLong(0), r.getLong(1))).toSet
      (batchSessions.keySet -- emitted).foreach { case (u, start) =>
        val (endNs, _) = batchSessions((u, start))
        assert(endNs / 1000000L + gap / 1000000L >= finalWmMs - 1L,
          s"releasable session (user=$u, start=$start) missing from stream")
      }
    } finally q.stop()
  }

  test("late bridging event merges two held intervals instead of emitting a phantom session") {
    import org.apache.spark.sql.functions._
    // batch 1: user 7 at 12:00 and 12:36 — a 36-min gap, two intervals;
    // the operative watermark after batch 1 is 12:36 - 10min = 12:26.
    // batch 2: user 7 at 12:28, OUT OF ORDER but ABOVE that watermark
    // (so it is genuinely in-horizon, not surviving on late-filter
    // grace) and within 30 min of both intervals — true sessionization
    // is ONE session [12:00, 12:36] of 3 events.
    // batch 3: user 99 at 16:00 pushes the watermark far enough to
    // release user 7's merged session. Eager gap-break emission would
    // have emitted a phantom [12:00, 12:00] session in batch 1.
    val dir = java.nio.file.Files.createTempDirectory("graft-ooo-events")
    val h12 = 12L * 3600L * 1000000000L
    val min = 60L * 1000000000L
    def write(name: String, userId: Long, tsNs: Seq[Long]): Unit = {
      import spark.implicits._
      tsNs.zipWithIndex.map { case (ns, i) =>
        (userId * 100 + i, ns, userId, "click", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$dir/$name")
    }
    write("a", 7L, Seq(h12, h12 + 36L * min))
    Thread.sleep(1100)
    write("b", 7L, Seq(h12 + 28L * min))
    Thread.sleep(1100)
    write("c", 99L, Seq(16L * 3600L * 1000000000L))
    val src = spark.readStream
      .schema(graft.sources.Tables.events)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/*")
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
    val q = EventsStream.runToMemory(
      EventsStream.sessionizeStream(spark, src), "ooo_sessions", "append")
    try {
      val u7 = spark.sql(
        """SELECT session_start_ns, session_end_ns, n_events
           FROM ooo_sessions WHERE user_id = 7""").collect()
      assert(u7.length == 1, s"expected ONE merged session, got ${u7.toSeq}")
      assert(u7.head.getLong(0) == h12)
      assert(u7.head.getLong(1) == h12 + 36L * min)
      assert(u7.head.getLong(2) == 3L, "late bridging event must be counted")
    } finally q.stop()
  }

  test("parquet-sink sessionize drive reaches stream/batch parity on disk") {
    // the PipelineCli `stream` mode end to end: file sink + checkpoint,
    // on-disk rows an exact multiset match of the releasable batch twin
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-drive-out").toString + "/sessions"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-drive-ckpt").toString
    val r = EventsStream.sessionizeParquetDrive(spark, sfDir, outDir, ckpt)
    assert(r.nStreamed > 0, "drive emitted no sessions")
    assert(r.onlyStream == 0, s"${r.onlyStream} phantom streamed session(s)")
    assert(r.onlyBatch == 0, s"${r.onlyBatch} releasable batch session(s) missing")
    assert(r.parity)
    assert(r.nStreamed == r.nReleasable)
  }

  test("scaled (user,day) and native session_window forms equal the plain form exactly") {
    val plain = RelationalQueries.qSessionizeEvents(spark, sfDir).collect()
    val scaled = RelationalQueries.qSessionizeEventsScaled(spark, sfDir).collect()
    val native = RelationalQueries.qSessionWindowNative(spark, sfDir).collect()
    assert(plain.map(_.toString).toSeq == scaled.map(_.toString).toSeq)
    assert(plain.map(_.toString).toSeq == native.map(_.toString).toSeq)
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

  test("change-data feed streams exactly each commit's row-level changes, replay-idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.sources.LakeLayout
    import graft.streaming.CdfStream
    val root = java.nio.file.Files.createTempDirectory("graft-cdf").toString
    val table = s"$root/t"; val out = s"$root/cdf"; val ckpt = s"$root/ckpt"
    LakeLayout.commitLakeVersion(
      (0L until 6L).map(k => (k, s"v$k")).toDF("id", "v")
        .repartitionByRange(2, col("id")).sortWithinPartitions(col("id")),
      table, "w", 0L, statsKey = Some("id"))
    CdfStream.runCdfToLake(spark, table, "id", out, ckpt).stop()
    def cdfRows(): Set[(Long, String, Long, String)] =
      LakeLayout.readLake(spark, out).get.collect()
        .map(r => (r.getAs[Long]("_version"), r.getAs[String]("_change"),
          r.getAs[Long]("id"), r.getAs[String]("v"))).toSet
    val boot = (0L until 6L).map(k => (0L, "insert", k, s"v$k")).toSet
    assert(cdfRows() == boot,
      "bootstrap: the first live version feeds as a full snapshot of inserts")
    // v1: one batch updating id=1 and inserting id=10; v2: delete id=2.
    // ids 0 and 2 share id=1's file — merely COPIED rows must not emit.
    LakeLayout.upsertIntoLake(spark, table,
      Seq((1L, "V1"), (10L, "v10")).toDF("id", "v"), "id", "w", 1L)
    LakeLayout.deleteFromLake(spark, table, Seq(2L).toDF("id"), "id", "w", 2L)
    CdfStream.runCdfToLake(spark, table, "id", out, ckpt).stop()
    assert(cdfRows() == boot ++ Set(
        (1L, "update", 1L, "V1"), (1L, "insert", 10L, "v10"),
        (2L, "delete", 2L, "v2")),
      "each commit feeds exactly its changed rows with post/preimages")
    // key-level agreement with lakeDiff on every transition
    (1L to 2L).foreach { v =>
      val diff = LakeLayout.lakeDiff(spark, table, v - 1, v, "id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(cdfRows().filter(_._1 == v).map(t => (t._3, t._2)) == diff,
        s"v$v feed disagrees with lakeDiff")
    }
    // restart from the SAME checkpoint after one more commit: the new
    // version feeds once, nothing already fed duplicates
    LakeLayout.upsertIntoLake(spark, table,
      Seq((0L, "V0")).toDF("id", "v"), "id", "w", 3L)
    CdfStream.runCdfToLake(spark, table, "id", out, ckpt).stop()
    val all = LakeLayout.readLake(spark, out).get
    assert(all.count() == all.distinct().count(),
      "restart from the same checkpoint must not duplicate change rows")
    assert(cdfRows().filter(_._1 == 3L) == Set((3L, "update", 0L, "V0")))
    // a compaction (v4) must feed NOTHING — not even an empty log
    // version — while the change after it (v5) still feeds normally
    assert(LakeLayout.compactLake(spark, table, "id") == 4L)
    LakeLayout.upsertIntoLake(spark, table,
      Seq((3L, "V3")).toDF("id", "v"), "id", "w", 5L)
    CdfStream.runCdfToLake(spark, table, "id", out, ckpt).stop()
    assert(cdfRows().filter(_._1 == 4L).isEmpty,
      "compact versions must not emit change rows")
    assert(!LakeLayout.lakeHasCommit(spark, out, "cdf", 4L),
      "compact versions must not append a log version at all")
    assert(cdfRows().filter(_._1 == 5L) == Set((5L, "update", 3L, "V3")),
      "changes after a skipped compact version must still feed")
  }
}
