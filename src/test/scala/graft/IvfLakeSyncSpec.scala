package graft

import graft.operators.IvfIndex
import graft.sources.LakeLayout
import org.apache.spark.sql.functions._

/** The production ingest composition, end-to-end: stream → lake (with
  * manifest provenance) → [[IvfIndex.syncFromLake]] pulls committed
  * versions into the serving index. Exactly-once is measured AT THE
  * SERVING SURFACE: a replayed micro-batch (same batchId re-delivered
  * after a crash/restart) must neither duplicate vectors in the index
  * nor change any probe result — the hazard direct [[IvfIndex.append]]
  * carries and this path closes. */
class IvfLakeSyncSpec extends SparkSuite {
  import spark.implicits._

  test("stream → lake → index is exactly-once at the serving surface: replays, crash recovery, and update corrections") {
    val lake = java.nio.file.Files
      .createTempDirectory("graft-lsync-lake").toString
    val idx = java.nio.file.Files
      .createTempDirectory("graft-lsync-idx").toString
    IvfIndex.build(spark, sfDir, idx)

    def wave(lo: Long, hi: Long) =
      graft.sources.Tables.load(spark, sfDir, "embeddings")
        .filter($"vec_id" >= lo && $"vec_id" < hi)
        .select(($"vec_id" + 1000000L).as("vec_id"), $"label",
          $"embedding")

    // the foreachBatch delivery body with lake provenance — exactly
    // the guard EventsStream.runUpsertToLake's sink runs
    def deliver(batchId: Long, lo: Long, hi: Long): Unit =
      if (!LakeLayout.lakeHasCommit(spark, lake, "vecstream", batchId))
        LakeLayout.appendToLake(spark, lake, wave(lo, hi),
          "vecstream", batchId, statsKey = Some("vec_id"))

    def dupCount(): Long = {
      val root = IvfIndex.layoutRoot(spark, idx)
      spark.read.parquet(s"$root/vectors")
        .groupBy($"vec_id").agg(count(lit(1)).as("n"))
        .filter($"n" > 1).count()
    }
    val probeRow = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .orderBy($"vec_id").limit(1).collect().head
    val pid = probeRow.getAs[Long]("vec_id")
    val pemb = probeRow.getAs[scala.collection.Seq[Float]]("embedding")
      .map(_.toDouble).toArray
    def probe(): Seq[Any] = IvfIndex.probeTopK(spark, idx, pemb, k = 5,
      excludeId = Some(pid)).collect().map(_.toSeq).toSeq

    deliver(1L, 0L, 25L)
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 1L,
      "first sync ingests the first lake version")
    val afterFirst = probe()
    assert(dupCount() == 0L)

    // REPLAY: the same batch re-delivered (crash-and-restart shape) —
    // lake provenance skips the commit, so sync sees nothing new
    deliver(1L, 0L, 25L)
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 0L,
      "a replayed batch creates no lake version, so sync is a no-op")
    assert(dupCount() == 0L, "a replayed wave must not duplicate vectors")
    assert(probe() == afterFirst, "a replay must not change serving")

    // a second batch flows through; the exact twin of the probe (from
    // batch 1) serves at sim 1.0 — the waves really are in the index
    deliver(2L, 25L, 50L)
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 1L)
    assert(dupCount() == 0L)
    val top = IvfIndex.probeTopK(spark, idx, pemb, k = 1,
      excludeId = Some(pid)).collect().head
    assert(top.getAs[Long]("vec_id") == pid + 1000000L &&
      top.getAs[Double]("sim") == 1.0,
      s"the synced twin must rank first: $top")

    // CRASH RECOVERY: lose the newest sync mark (a crash between the
    // wave's file moves and its mark) — re-sync must sweep that wave's
    // tagged files first, then redo it: no duplicates, serving unchanged
    val before = probe()
    val markDir = new org.apache.hadoop.fs.Path(s"$idx/_lakesync")
    val fs = markDir.getFileSystem(spark.sessionState.newHadoopConf())
    val marks = fs.listStatus(markDir).map(_.getPath)
      .sortBy(_.getName)
    fs.delete(marks.last, false)
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 1L,
      "recovery redoes the unmarked version")
    assert(dupCount() == 0L,
      "recovery must sweep the partial wave before redoing it")
    assert(probe() == before, "recovery must not change serving")

    // UPDATE change rows sync as versioned tombstone events plus the
    // post-image wave: the correction reaches serving on the next
    // probe — no retrain, and never two rows of one id at the surface
    LakeLayout.upsertIntoLake(spark, lake,
      wave(0L, 5L).withColumn("label", lit(99)),
      "vec_id", "fix", 100L)
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 1L,
      "an update version must sync")
    val served = IvfIndex.probeTopK(spark, idx, pemb, k = 25,
      excludeId = Some(pid)).collect()
    val twinRows = served.filter(_.getAs[Long]("vec_id") == pid + 1000000L)
    assert(twinRows.length == 1,
      s"exactly one row of an updated id may serve: ${served.toSeq}")
    assert(twinRows.head.getAs[Int]("label") == 99 &&
      twinRows.head.getAs[Double]("sim") == 1.0,
      s"the update's post-image must serve: ${twinRows.head}")
    assert(served.map(_.getAs[Long]("vec_id")).distinct.length ==
      served.length, "serving must stay duplicate-free after updates")
    // replay-idempotent, same as inserts
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 0L)
  }

  test("lake DELETE reaches every serving path via the tombstone sidecar; rebuild compacts it physically") {
    val lake = java.nio.file.Files
      .createTempDirectory("graft-tomb-lake").toString
    val idx = java.nio.file.Files
      .createTempDirectory("graft-tomb-idx").toString
    IvfIndex.build(spark, sfDir, idx)

    // a wave of exact twins (ids shifted by 1e6) flows stream → lake →
    // index, then both compressed sidecars commit, so all six serving
    // paths are live
    val probeRow = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .orderBy($"vec_id").limit(1).collect().head
    val pid = probeRow.getAs[Long]("vec_id")
    val twin = pid + 1000000L
    val pemb = probeRow.getAs[scala.collection.Seq[Float]]("embedding")
      .map(_.toDouble).toArray
    def wave(lo: Long, hi: Long) =
      graft.sources.Tables.load(spark, sfDir, "embeddings")
        .filter($"vec_id" >= lo && $"vec_id" < hi)
        .select(($"vec_id" + 1000000L).as("vec_id"), $"label", $"embedding")
    LakeLayout.appendToLake(spark, lake, wave(0L, 25L), "vecstream", 1L,
      statsKey = Some("vec_id"))
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 1L)
    IvfIndex.buildPqSidecar(spark, idx)
    IvfIndex.buildSq8Sidecar(spark, idx)

    val probes = Seq((pid, pemb)).toDF("probe_id", "embedding")
    // exhaustive widths: recall can't excuse a tombstone leak
    val wide = 100000
    def servedRows(): Map[String, Seq[(Long, Int)]] = Map(
      "raw" -> IvfIndex.probeTopK(spark, idx, pemb, k = 5,
        excludeId = Some(pid)).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"))).toSeq,
      "rawBatch" -> IvfIndex.probeTopKBatch(spark, idx, probes, k = 5,
        excludeSelf = true).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"))).toSeq,
      "adc" -> IvfIndex.probeTopKAdc(spark, idx, pemb, k = 5,
        shortlist = wide, excludeId = Some(pid)).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"))).toSeq,
      "adcBatch" -> IvfIndex.probeTopKBatchAdc(spark, idx, probes, k = 5,
        shortlist = wide, excludeSelf = true).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"))).toSeq,
      "sq8" -> IvfIndex.probeTopKSq8(spark, idx, pemb, k = 5,
        shortlist = wide, excludeId = Some(pid)).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"))).toSeq,
      "sq8Batch" -> IvfIndex.probeTopKSq8Batch(spark, idx, probes, k = 5,
        shortlist = wide, excludeSelf = true).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"))).toSeq)
    def servedIds(): Map[String, Seq[Long]] =
      servedRows().map { case (p, rows) => p -> rows.map(_._1) }
    servedIds().foreach { case (path, ids) =>
      assert(ids.headOption.contains(twin),
        s"$path must serve the synced twin first before the delete: $ids")
    }

    // UPDATE: correct the twin's label in the lake, sync — EVERY path
    // (raw/ADC/SQ8 × single/batch) serves the post-image on the next
    // probe, exactly once per id, with no retrain
    LakeLayout.upsertIntoLake(spark, lake,
      wave(0L, 1L).withColumn("label", lit(777)),
      "vec_id", "fix", 90L)
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 1L,
      "the update version must sync")
    servedRows().foreach { case (path, rows) =>
      assert(rows.headOption.map(_._1).contains(twin),
        s"$path must still serve the updated twin first: $rows")
      assert(rows.filter(_._1 == twin) == Seq((twin, 777)),
        s"$path must serve the update's post-image exactly once: $rows")
      assert(rows.map(_._1).distinct.length == rows.length,
        s"$path serves duplicate ids after the update: $rows")
    }

    // TAKEDOWN: delete the twin from the lake, sync — no serving path
    // may return it, at any width
    LakeLayout.deleteFromLake(spark, lake,
      Seq(twin).toDF("vec_id"), "vec_id", "takedown", 2L)
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 1L,
      "the delete version must sync")
    val afterDelete = servedIds()
    afterDelete.foreach { case (path, ids) =>
      assert(!ids.contains(twin),
        s"$path still serves the tombstoned id: $ids")
    }
    val health = IvfIndex.describeIvf(spark, idx).collect()(0)
    assert(health.getAs[Double]("tomb_frac") > 0.0,
      "describeIvf must report the resident tombstone fraction")

    // replay-idempotent: a second sync sees nothing new and serving is
    // byte-identical
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 0L)
    assert(servedIds() == afterDelete,
      "a replayed sync must not change serving")

    // RE-INSERT after the delete: the new row lands at a LATER lake
    // version than the tombstone event, so it serves immediately —
    // exactly once — with no rebuild (the versioned-event semantics)
    LakeLayout.appendToLake(spark, lake, wave(0L, 1L), "vecstream", 3L,
      statsKey = Some("vec_id"))
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 1L,
      "a re-insert after a delete syncs clean")
    val reTop = IvfIndex.probeTopK(spark, idx, pemb, k = 5,
      excludeId = Some(pid)).collect()
    assert(reTop.head.getAs[Long]("vec_id") == twin &&
      reTop.head.getAs[Double]("sim") == 1.0,
      s"the re-inserted twin must serve again: ${reTop.toSeq}")
    assert(reTop.count(_.getAs[Long]("vec_id") == twin) == 1,
      s"exactly one row of the re-inserted id may serve: ${reTop.toSeq}")

    // REBUILD compacts: the hidden pre-images (the original row and
    // the update's post-image, both superseded) leave the physical
    // layout, the re-inserted row carries over, and the new generation
    // starts with no tombstone sidecar
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    IvfIndex.rebuild(spark, idx)
    val root = IvfIndex.layoutRoot(spark, idx)
    assert(spark.read.parquet(s"$root/vectors")
      .filter($"vec_id" === twin).count() == 1L,
      "rebuild must compact the hidden rows and keep the re-insert")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/_tomb")),
      "the rebuilt generation must start with no tombstone sidecar")
    assert(IvfIndex.describeIvf(spark, idx).collect()(0)
      .getAs[Double]("tomb_frac") == 0.0)
    val top = IvfIndex.probeTopK(spark, idx, pemb, k = 1,
      excludeId = Some(pid)).collect().head
    assert(top.getAs[Long]("vec_id") == twin &&
      top.getAs[Double]("sim") == 1.0,
      s"the re-inserted twin must serve after compaction: $top")
  }
}
