package graft

import graft.sources.LakeLayout
import graft.operators.IncrementalAgg
import org.apache.spark.sql.functions._

/** Merge-on-read deletes (deletion vectors). The copy-on-write delete
  * rewrites every file whose key range intersects a delete key —
  * O(touched bytes); for scattered keys (the GDPR single-user shape)
  * that can approach O(table) per delete. [[LakeLayout.deleteFromLakeDv]]
  * writes the keys once as a tiny sidecar and re-points manifest
  * entries — O(deleted keys) — and every reader applies the vector
  * through the single read choke point. These specs pin: zero data
  * bytes rewritten, read equivalence (snapshots AND pruned ranges),
  * vector merging, re-insert via upsert, compaction materialization,
  * CDF/incremental-agg correctness across a dv commit, vacuum
  * reference-counting of sidecars, and the OCC interplay. */
class DvDeleteSpec extends SparkSuite {
  import spark.implicits._

  /** 400 keys over 4 range-partitioned files, value = id*3, group = id%7. */
  private def freshTable(): String = {
    val t = java.nio.file.Files.createTempDirectory("graft-dv").toString
    LakeLayout.commitLakeVersion(
      (0L until 400L).map(k => (k, k % 7, k * 3, "base"))
        .toDF("id", "grp", "value", "tag")
        .repartitionByRange(4, col("id")).sortWithinPartitions(col("id")),
      t, "ck", 0L, statsKey = Some("id"))
    t
  }
  private val scattered = Seq(5L, 105L, 205L, 305L) // one key per file

  test("dv delete: zero data files rewritten, reads (full + pruned) apply the vector") {
    val t = freshTable()
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def bytesOf(rel: String) =
      fs.getFileStatus(new org.apache.hadoop.fs.Path(t, rel)).getLen
    val before = LakeLayout.lakeCommitAt(spark, t, 0L).files
    val beforeBytes = before.map(f => f.path -> bytesOf(f.path)).toMap

    val v = LakeLayout.deleteFromLakeDv(spark, t,
      scattered.toDF("id"), "id", "ck", 1L)
    assert(v == 1L)
    val after = LakeLayout.lakeCommitAt(spark, t, 1L).files
    // same data files, byte-untouched — the delete wrote ONLY a sidecar
    assert(after.map(_.path).sorted == before.map(_.path).sorted,
      "a dv delete must not add or remove data files")
    after.foreach(f => assert(bytesOf(f.path) == beforeBytes(f.path),
      s"data file ${f.path} must be byte-untouched"))
    // scattered keys touch every file here; all entries re-pointed
    assert(after.forall(_.dv.isDefined),
      "every affected file entry must reference the sidecar")
    val sidecarBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(t, after.head.dv.get)).getLength
    assert(sidecarBytes < beforeBytes.values.min,
      "sidecar must be tiny relative to any data file")
    // full read
    val got = LakeLayout.readLake(spark, t).get.select("id").as[Long]
      .collect().toSet
    assert(got == (0L until 400L).toSet -- scattered)
    // pruned range read over a deleted key's band
    val ranged = LakeLayout.readLakeKeyRange(spark, t, "id", 0L, 49L).get
      .select("id").as[Long].collect().toSet
    assert(ranged == (0L until 50L).toSet - 5L,
      "pruned reads must apply vectors too")
  }

  test("dv merge on second delete, re-insert via upsert clears vectors of rewritten files") {
    val t = freshTable()
    LakeLayout.deleteFromLakeDv(spark, t, Seq(5L).toDF("id"), "id", "ck", 1L)
    LakeLayout.deleteFromLakeDv(spark, t, Seq(7L).toDF("id"), "id", "ck", 2L)
    val files = LakeLayout.lakeCommitAt(spark, t, 2L).files
    // the file holding both keys points at ONE sidecar whose content
    // subsumes the first delete
    val f0 = files.find(f => f.dv.isDefined).get
    val keys = spark.read.parquet(s"$t/${f0.dv.get}").as[Long].collect().toSet
    assert(Set(5L, 7L).subsetOf(keys), s"merged sidecar must subsume both: $keys")
    val got = LakeLayout.readLake(spark, t).get.select("id").as[Long]
      .collect().toSet
    assert(got == (0L until 400L).toSet -- Set(5L, 7L))
    // re-insert: the upsert's touch set covers the file that could hold
    // key 5, so the rewrite reads dv-applied and clears its vector
    LakeLayout.upsertIntoLake(spark, t,
      Seq((5L, 5L % 7, 999L, "back")).toDF("id", "grp", "value", "tag"),
      "id", "ck", 3L)
    val back = LakeLayout.readLake(spark, t).get
      .filter($"id" === 5L).select("value", "tag").collect()
    assert(back.length == 1 && back(0).getLong(0) == 999L &&
      back(0).getString(1) == "back")
    assert(LakeLayout.readLake(spark, t).get.filter($"id" === 7L).count() == 0,
      "the untouched delete must survive the neighbour's re-insert")
    val rewritten = LakeLayout.lakeCommitAt(spark, t, 3L).files
      .filter(_.path.contains(LakeLayout.lakeCommitAt(spark, t, 3L).dataDir))
    assert(rewritten.nonEmpty && rewritten.forall(_.dv.isEmpty),
      "files rewritten by the upsert must carry no vector")
  }

  test("compaction materializes vectors; vacuum reclaims retired sidecars, keeps live ones") {
    val t = freshTable()
    LakeLayout.deleteFromLakeDv(spark, t, scattered.toDF("id"), "id", "ck", 1L)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val sidecar = LakeLayout.lakeCommitAt(spark, t, 1L).files.head.dv.get
    // live sidecar: referenced by the kept manifest, must survive vacuum
    LakeLayout.vacuumLake(spark, t, keep = 2)
    assert(fs.exists(new org.apache.hadoop.fs.Path(t, sidecar)),
      "a referenced sidecar must survive the orphan sweep")
    val want = (0L until 400L).toSet -- scattered
    // full compaction reads dv-applied and emits clean files
    LakeLayout.compactLake(spark, t, "id")
    val files = LakeLayout.latestLakeCommit(spark, t).get.files
    assert(files.forall(_.dv.isEmpty), "compaction must retire every vector")
    assert(LakeLayout.readLake(spark, t).get.select("id").as[Long]
      .collect().toSet == want)
    // with the dv version vacuumed away, the sidecar is unreferenced
    LakeLayout.vacuumLake(spark, t, keep = 1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(t, sidecar)),
      "an unreferenced sidecar must be reclaimed")
    assert(LakeLayout.readLake(spark, t).get.select("id").as[Long]
      .collect().toSet == want, "vacuum must not change the table")
  }

  test("CDF and incremental agg see a dv delete as exactly its present-key deletes") {
    val t = freshTable()
    // 7 was never deleted; 9999 was never present — only present keys emit
    LakeLayout.deleteFromLakeDv(spark, t,
      (scattered :+ 9999L).toDF("id"), "id", "ck", 1L)
    val d = graft.streaming.CdfStream.changesForVersion(spark, t, 1L, "id")
    val rows = d.collect()
    assert(rows.forall(_.getString(d.columns.indexOf("_change")) == "delete"))
    assert(rows.map(_.getLong(d.columns.indexOf("id"))).toSet == scattered.toSet,
      "change feed must emit exactly the present deleted keys")
    // incremental agg advance across the dv commit == full recompute
    val full0 = IncrementalAgg.fullAgg(
      LakeLayout.readLakeVersion(spark, t, 0L), "grp", "value")
    val adv = IncrementalAgg.advance(spark, t, full0, "grp", "value", 0L, 1L)
    val full1 = IncrementalAgg.fullAgg(
      LakeLayout.readLakeVersion(spark, t, 1L), "grp", "value")
    val a = adv.orderBy("grp").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = full1.orderBy("grp").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.sameElements(b),
      "incremental state across a dv delete must equal the full recompute")
  }

  test("OCC: dv deletes racing an upsert writer stay serializable (rebase dv guard)") {
    val t = freshTable()
    raceWriters(Seq("wD", "wU")) {
      case "wD" =>
        (0 until 2).foreach { b =>
          LakeLayout.deleteFromLakeDvOcc(spark, t,
            Seq(10L + b, 110L + b, 210L + b, 310L + b).toDF("id"), "id",
            "wD", b.toLong, maxAttempts = 16)
        }
      case _ =>
        (0 until 2).foreach { b =>
          LakeLayout.upsertIntoLakeOcc(spark, t,
            (200L until 240L).map(k => (k, k % 7, k * 5 + b, s"u$b"))
              .toDF("id", "grp", "value", "tag"),
            "id", "wU", b.toLong, maxAttempts = 16)
        }
    }
    val versions = LakeLayout.lakeVersions(spark, t)
    assert(versions == (0L to 4L), s"all four commits must land: $versions")
    // serializable replay over id -> (value, tag), applying each commit
    // in version order
    def tableAt(v: Long): Map[Long, (Long, String)] =
      LakeLayout.readLakeVersion(spark, t, v).collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    val replayed = versions.tail.foldLeft(tableAt(0L)) { (prev, v) =>
      val c = LakeLayout.lakeCommitAt(spark, t, v)
      val expected = c.checkpoint match {
        case "wD" => prev -- Seq(10L + c.batchId, 110L + c.batchId,
          210L + c.batchId, 310L + c.batchId)
        case _ => prev ++ (200L until 240L).map(k =>
          k -> ((k * 5 + c.batchId, s"u${c.batchId}")))
      }
      val got = tableAt(v)
      assert(got == expected,
        s"version $v (${c.checkpoint}/b${c.batchId}) diverges from replay")
      got
    }
    assert(replayed.size == 400 - 8 +
      Seq(210L, 211L).count(k => replayed.contains(k)),
      "final cardinality must reflect deletes minus any re-upserted keys")
  }

  test("maintainLake: thresholds drive compaction, dv materialization, and vacuum; idle pass is a no-op") {
    // scenario 1: fragmentation triggers compaction (which also
    // materializes the small files' vectors as a side effect — at test
    // scale every file is "small")
    val t1 = freshTable()
    LakeLayout.upsertIntoLake(spark, t1,
      Seq((50L, 1L, 1L, "u")).toDF("id", "grp", "value", "tag"), "id", "ck", 1L)
    LakeLayout.upsertIntoLake(spark, t1,
      Seq((150L, 2L, 2L, "u")).toDF("id", "grp", "value", "tag"), "id", "ck", 2L)
    LakeLayout.deleteFromLakeDv(spark, t1, scattered.toDF("id"), "id", "ck", 3L)
    val want1 = LakeLayout.readLake(spark, t1).get
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val r1 = LakeLayout.maintainLake(spark, t1, "id", "maint",
      minSmallFiles = 2, smallFileMB = 1024, dvFileFraction = 0.1)
    assert(r1.compactedTo.isDefined,
      "fragmented table must trigger small-file compaction")
    assert(r1.vacuumedTo > 0, "history must shrink to retention")
    assert(LakeLayout.latestLakeCommit(spark, t1).get.files
      .forall(_.dv.isEmpty), "maintenance must retire every vector")
    assert(LakeLayout.readLake(spark, t1).get
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap == want1,
      "maintenance must not change the visible table")
    // scenario 2: a vectored but unfragmented table takes the TARGETED
    // dv-materialization path (compaction threshold not met)
    val t2 = freshTable()
    LakeLayout.deleteFromLakeDv(spark, t2, scattered.toDF("id"), "id", "ck", 1L)
    val want2 = LakeLayout.readLake(spark, t2).get
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val r2 = LakeLayout.maintainLake(spark, t2, "id", "maint",
      minSmallFiles = 999, dvFileFraction = 0.1)
    assert(r2.compactedTo.isEmpty && r2.dvMaterializedTo.isDefined,
      s"expected only the dv pass to fire, got $r2")
    assert(LakeLayout.latestLakeCommit(spark, t2).get.files
      .forall(_.dv.isEmpty), "dv pass must retire every vector")
    assert(LakeLayout.readLake(spark, t2).get
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap == want2)
    // idle pass: thresholds unmet, metadata-only decision, no commits
    val before = LakeLayout.lakeVersions(spark, t2)
    val idle = LakeLayout.maintainLake(spark, t2, "id", "maint",
      minSmallFiles = 999, dvFileFraction = 0.1)
    assert(idle.compactedTo.isEmpty && idle.dvMaterializedTo.isEmpty,
      s"idle pass must be a no-op, got $idle")
    assert(LakeLayout.lakeVersions(spark, t2) == before)
  }

  test("metadata-only COUNT(*): manifest counts == scan truth, zero data files opened on the fast path") {
    val t = freshTable()
    assert(LakeLayout.lakeRowCount(spark, t).contains(400L))
    // dv'd files fall back to a scan of JUST those files — physical
    // count 400 would be wrong, logical 396 must come back
    LakeLayout.deleteFromLakeDv(spark, t, scattered.toDF("id"), "id", "ck", 1L)
    assert(LakeLayout.lakeRowCount(spark, t).contains(396L),
      "dv files must be counted logically, not from footer metadata")
    // compaction materializes vectors -> back on the pure-metadata path
    LakeLayout.compactLake(spark, t, "id")
    assert(LakeLayout.lakeRowCount(spark, t).contains(396L))
    // PHYSICAL proof of the fast path: destroy every data byte; the
    // count still answers because no data file is opened
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    LakeLayout.latestLakeCommit(spark, t).get.files.foreach(f =>
      fs.delete(new org.apache.hadoop.fs.Path(t, f.path), false))
    assert(LakeLayout.lakeRowCount(spark, t).contains(396L),
      "metadata COUNT(*) must not touch data files")
  }

  test("maintainLake: sidecar BYTES trigger materialization even when the file fraction stays below threshold") {
    // all deletes land in ONE of the four files (keys < 100), so the
    // dv file share is pinned at 0.25 — far below the 1.1 fraction
    // threshold that can never fire. Only the byte cap can trigger.
    val t = freshTable()
    (1 to 3).foreach { i =>
      LakeLayout.deleteFromLakeDv(spark, t,
        Seq(10L * i, 10L * i + 1).toDF("id"), "id", "ck", i.toLong)
    }
    val cur = LakeLayout.latestLakeCommit(spark, t).get
    assert(cur.files.count(_.dv.isDefined) == 1 && cur.files.size == 4,
      "setup: exactly one of four files must carry a vector")
    val want = LakeLayout.readLake(spark, t).get
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // control: fraction can't fire and the byte cap is huge -> no-op
    val idle = LakeLayout.maintainLake(spark, t, "id", "maint",
      minSmallFiles = 999, dvFileFraction = 1.1,
      dvMaxSidecarBytes = Long.MaxValue)
    assert(idle.dvMaterializedTo.isEmpty,
      "below both triggers the dv pass must not fire")
    assert(LakeLayout.latestLakeCommit(spark, t).get.files
      .exists(_.dv.isDefined), "control pass must leave the vector")
    // the real trigger: sidecar bytes over a 1-byte cap
    val r = LakeLayout.maintainLake(spark, t, "id", "maint",
      minSmallFiles = 999, dvFileFraction = 1.1, dvMaxSidecarBytes = 1L)
    assert(r.dvMaterializedTo.isDefined,
      "sidecar bytes over the cap must force materialization even " +
        "below the file-fraction threshold")
    assert(LakeLayout.latestLakeCommit(spark, t).get.files
      .forall(_.dv.isEmpty), "byte-cap pass must retire every vector")
    assert(LakeLayout.readLake(spark, t).get
      .collect().map(r2 => r2.getLong(0) -> r2.getString(3)).toMap == want,
      "materialization must not change the visible table")
  }

  test("standalone orphan sweep: reclaims crash orphans on a table already at retention, never live files or young attempts") {
    val t = freshTable()
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // history is 1 version; vacuum's retention logic (keep=2) has
    // nothing to drop — exactly the low-churn shape where orphans
    // used to accumulate indefinitely
    val versionsBefore = LakeLayout.lakeVersions(spark, t)
    assert(versionsBefore == Seq(0L))
    def mkOrphan(name: String): org.apache.hadoop.fs.Path = {
      val d = new org.apache.hadoop.fs.Path(t, s"data/$name")
      fs.mkdirs(d)
      val f = new org.apache.hadoop.fs.Path(d, "part-0.parquet")
      val out = fs.create(f, true); out.write(42); out.close()
      f
    }
    // a crashed OCC attempt dir (old) and a LIVE attempt dir (young)
    val crashed = mkOrphan("v00000000000000000001-w1-occ")
    val live = mkOrphan("v00000000000000000001-w2-occ")
    val old = System.currentTimeMillis() - 7200000L
    fs.setTimes(crashed, old, old)
    fs.setTimes(crashed.getParent, old, old)
    val reclaimed = LakeLayout.sweepLakeOrphans(spark, t,
      orphanGraceMs = 3600000L)
    assert(reclaimed > 0, "the aged crash orphan must be reclaimed")
    assert(!fs.exists(crashed.getParent), "aged orphan dir must be gone")
    assert(fs.exists(live), "a young (possibly live) attempt dir must survive the grace window")
    assert(LakeLayout.lakeVersions(spark, t) == versionsBefore,
      "the sweep must never touch history")
    LakeLayout.latestLakeCommit(spark, t).get.files.foreach(f =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(t, f.path)),
        s"referenced file ${f.path} must survive every sweep"))
    // vacuum with nothing to drop now ALSO sweeps (maintainLake's doc
    // promises orphan reclamation even on low-churn tables): age the
    // remaining orphan and vacuum at keep=5
    fs.setTimes(live, old, old)
    fs.setTimes(live.getParent, old, old)
    LakeLayout.vacuumLake(spark, t, keep = 5, orphanGraceMs = 3600000L)
    assert(LakeLayout.lakeVersions(spark, t) == versionsBefore,
      "keep=5 must drop nothing")
    assert(!fs.exists(live.getParent),
      "vacuum must sweep aged orphans even when no version drops")
  }

  test("dv churn endurance: 12 alternating delete/upsert/maintain cycles track a sequential model") {
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    var model: Map[Long, String] =
      (0L until 400L).map(k => k -> "base").toMap
    var batch = 0L
    (1 to 12).foreach { i =>
      batch += 1
      i % 3 match {
        case 1 => // scattered dv delete, one key per quadrant
          val ks = Seq(3L + i, 103L + i, 203L + i, 303L + i)
          LakeLayout.deleteFromLakeDv(spark, t, ks.toDF("id"), "id", "ck", batch)
          model = model -- ks
        case 2 => // upsert a band that overlaps earlier deletes
          val band = (100L + i until 120L + i)
          LakeLayout.upsertIntoLake(spark, t,
            band.map(k => (k, k % 7, k, s"u$i")).toDF("id", "grp", "value", "tag"),
            "id", "ck", batch)
          model = model ++ band.map(k => k -> s"u$i")
        case _ => // maintenance wave: compact + materialize + vacuum
          // 1-byte sidecar cap: the endurance drive runs under the
          // BYTES trigger, so every wave exercises materialization
          LakeLayout.maintainLake(spark, t, "id", "maint",
            minSmallFiles = 2, smallFileMB = 1024, dvFileFraction = 0.1,
            dvMaxSidecarBytes = 1L)
      }
      val got = LakeLayout.readLake(spark, t).get
        .select(col("id"), col("tag")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == model, s"cycle $i diverged from the sequential model " +
        s"(sizes got=${got.size} want=${model.size})")
    }
    // metadata count stays truthful through the whole churn
    assert(LakeLayout.lakeRowCount(spark, t).contains(model.size.toLong))
  }

  /** Same raceWriters helper shape as LakeLayoutSpec (duplicated —
    * suites cannot share private helpers). */
  private def raceWriters(writerIds: Seq[String])(body: String => Unit): Unit = {
    val start = new java.util.concurrent.CountDownLatch(1)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = writerIds.map { w =>
      new Thread(() => {
        start.await()
        try body(w)
        catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join(300000))
    if (!errors.isEmpty) throw errors.peek()
  }
}
