package graft

import graft.sources.LakeLayout
import graft.streaming.CdfStream
import org.apache.spark.sql.functions._

/** CDF-consumer-vs-vacuum LAG semantics, pinned. A change-data consumer
  * lagging more than the vacuum retention finds its resume version's
  * predecessor gone; [[CdfStream.changesForVersion]] then re-feeds that
  * version as a FULL bootstrap snapshot of inserts — correct for an
  * idempotent keyed sink, never a silent gap (a vacuumed version itself
  * fails loudly, and every later version still emits). The
  * `protectFrom` consumer low-watermark on [[LakeLayout.vacuumLake]] is
  * the guard that keeps a known-lagging consumer on the cheap
  * incremental path instead. */
class CdfVacuumLagSpec extends SparkSuite {

  /** v0 base (keys 0–39, val "base"), v1 update (0–19 → "u1"),
    * v2 delete (keys ≡ 0 mod 5), v3 update (20–29 → "u3"),
    * v4 insert (100–104). */
  private def buildHistory(): String = {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft-cdflag").toString
    LakeLayout.commitLakeVersion(
      (0L until 40L).map(k => (k, "base")).toDF("id", "v")
        .repartitionByRange(2, col("id")).sortWithinPartitions(col("id")),
      t, "ck", 0L, statsKey = Some("id"))
    LakeLayout.upsertIntoLake(spark, t,
      (0L until 20L).map(k => (k, "u1")).toDF("id", "v"), "id", "ck", 1L)
    LakeLayout.deleteFromLake(spark, t,
      (0L until 40L by 5L).toDF("id"), "id", "ck", 2L)
    LakeLayout.upsertIntoLake(spark, t,
      (20L until 30L).map(k => (k, "u3")).toDF("id", "v"), "id", "ck", 3L)
    LakeLayout.upsertIntoLake(spark, t,
      (100L until 105L).map(k => (k, "ins")).toDF("id", "v"), "id", "ck", 4L)
    t
  }

  test("consumer lagging past vacuum: bootstrap re-feed flagged as inserts, no silent gap") {
    val t = buildHistory()
    // consumer processed through v1, then stalled; retention moves on
    LakeLayout.vacuumLake(spark, t, keep = 2)
    assert(LakeLayout.lakeVersions(spark, t) == Seq(3L, 4L))

    // resuming at a vacuumed version fails loudly — the consumer can
    // never be handed an empty frame for a version whose changes it
    // simply can no longer see
    intercept[IllegalArgumentException] {
      CdfStream.changesForVersion(spark, t, 2L, "id")
    }

    // the oldest LIVE version re-feeds as the documented bootstrap:
    // a full snapshot of the v3 table, every row _change='insert'
    val boot = CdfStream.changesForVersion(spark, t, 3L, "id")
    val bootRows = boot.collect()
    assert(bootRows.nonEmpty && bootRows.forall(
      _.getString(boot.columns.indexOf("_change")) == "insert"),
      "bootstrap re-feed must emit every row as an insert")
    val snap3 = LakeLayout.readLakeVersion(spark, t, 3L)
    assert(bootRows.length == snap3.count(),
      "bootstrap must be the FULL v3 snapshot — a partial feed is a " +
        "silent gap")
    // and it carries the real table state, not the change set: keys the
    // consumer last saw as deleted (v2) and not since re-upserted (v3
    // reinserts 20 and 25) are simply absent
    val bootIds = bootRows.map(_.getLong(0)).toSet
    val goneForGood = (0L until 40L by 5L).toSet -- (20L until 30L)
    assert(goneForGood.forall(!bootIds.contains(_)),
      "v2-deleted (never re-upserted) keys must not resurface in the bootstrap")
    assert(bootIds.contains(20L) && bootIds.contains(25L),
      "v3-re-upserted keys must be present in the bootstrap snapshot")

    // the NEXT version still emits as a normal incremental delta — the
    // bootstrap never cascades forward
    val d4 = CdfStream.changesForVersion(spark, t, 4L, "id")
    val d4Rows = d4.collect()
    assert(d4Rows.length == 5 && d4Rows.forall(
      _.getString(d4.columns.indexOf("_change")) == "insert"))
    assert(d4Rows.map(_.getLong(0)).toSet == (100L until 105L).toSet,
      "post-bootstrap versions must emit exactly their change set")
  }

  test("orphanGraceMs: a young unreferenced dir survives the sweep; an aged one is reclaimed") {
    val t = buildHistory()
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // simulate a LIVE OCC attempt's dir mid-publish: data written, no
    // manifest yet
    val attempt = new org.apache.hadoop.fs.Path(t, "data/v99-wX")
    fs.mkdirs(attempt)
    val f = new org.apache.hadoop.fs.Path(attempt, "part-0.parquet")
    val out = fs.create(f); out.write(Array[Byte](1, 2, 3)); out.close()
    // graceful vacuum: the young orphan is presumed live and skipped
    LakeLayout.vacuumLake(spark, t, keep = 2, orphanGraceMs = 3600000L)
    assert(fs.exists(f),
      "a young unreferenced file must survive a graceful sweep")
    assert(LakeLayout.lakeVersions(spark, t) == Seq(3L, 4L),
      "version retention is independent of the orphan grace")
    // strict vacuum (write-quiescent contract): reclaimed immediately.
    // keep=1 so a version drops — the sweep only runs when retention
    // actually moves (a no-drop vacuum is a no-op by design)
    LakeLayout.vacuumLake(spark, t, keep = 1)
    assert(!fs.exists(attempt),
      "the strict sweep must reclaim the orphan")
  }

  test("protectFrom low-watermark keeps a lagging consumer on the incremental path") {
    val t = buildHistory()
    // the slowest consumer's next-unprocessed version is 2: protect
    // v1 (= 2−1) so the delta for v2 stays computable, even at keep=1
    LakeLayout.vacuumLake(spark, t, keep = 1, protectFrom = Some(1L))
    assert(LakeLayout.lakeVersions(spark, t) == Seq(1L, 2L, 3L, 4L),
      "versions >= protectFrom must survive vacuum regardless of keep")

    // v2 now computes as a true delta: exactly the 8 deletes (keys
    // 0..39 step 5), not a 30-odd-row snapshot re-feed
    val d2 = CdfStream.changesForVersion(spark, t, 2L, "id")
    val d2Rows = d2.collect()
    assert(d2Rows.forall(
      _.getString(d2.columns.indexOf("_change")) == "delete"))
    assert(d2Rows.map(_.getLong(0)).toSet == (0L until 40L by 5L).toSet)

    // with the consumer caught up, dropping the guard reclaims history
    LakeLayout.vacuumLake(spark, t, keep = 2)
    assert(LakeLayout.lakeVersions(spark, t) == Seq(3L, 4L))
  }
}
