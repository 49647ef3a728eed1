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

  test("stream → lake → index is exactly-once at the serving surface: replays, crash recovery, and update rejection") {
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

    // update/delete change rows are rejected loudly — an IVF index is
    // append-only between retrains
    LakeLayout.upsertIntoLake(spark, lake,
      wave(0L, 5L).withColumn("label", lit(99)),
      "vec_id", "fix", 100L)
    val err = intercept[IllegalArgumentException](
      IvfIndex.syncFromLake(spark, lake, idx))
    assert(err.getMessage.contains("append-only"))
  }
}
