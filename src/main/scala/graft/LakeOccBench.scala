package graft

import graft.operators.IncrementalAgg
import graft.sources.LakeLayout
import org.apache.spark.sql.functions._

/** Measurement main behind SCALE.md's OCC + incremental-agg rows.
  * Builds a 5M-key compacted lake table, then measures:
  *  1. 20 sequential single-writer upsert batches (500 contiguous keys
  *     each) — the baseline bytes/batch and wall-clock;
  *  2. the same 20 batches as 2 CONCURRENT OCC writers (10 each, racing
  *     from one start latch) — attempts per commit and the write-
  *     amplification cost of optimistic retries;
  *  3. advancing an IncrementalAgg state across one upsert vs a full
  *     recompute of the same aggregate over the table.
  * Prints one JSON line. Run:
  * {{{ sbt 'runMain graft.LakeOccBench' }}} */
object LakeOccBench {
  def main(args: Array[String]): Unit = {
    val spark = Bench.makeSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-occ-bench").toString
    val table = s"$root/t"
    val nKeys = 5000000L
    def batchDf(lo: Long) =
      spark.range(lo, lo + 500L).select(col("id"),
        (col("id") * 3L).as("v"), lit("payload-padding-x32-....").as("p"))
    LakeLayout.commitLakeVersion(
      spark.range(0L, nKeys).select(col("id"), (col("id") * 2L).as("v"),
        lit("payload-padding-x32-....").as("p")),
      table, "seed", 0L, statsKey = Some("id"))
    LakeLayout.compactLake(spark, table, "id", targetFileMB = 1)
    def now() = System.nanoTime()
    // sequential baseline: batches land across 2 distant key regions
    // (the same regions the concurrent writers will own)
    def batchLo(w: Int, b: Int): Long =
      if (w == 0) b * 500L else nKeys / 2 + b * 500L
    val t0 = now()
    var seqBytes = 0L
    for (b <- 0 until 10; w <- 0 until 2)
      seqBytes += LakeLayout.upsertIntoLake(spark, table,
        batchDf(batchLo(w, b)), "id", "seq", 100L + b * 2 + w).bytesWritten
    val seqSec = (now() - t0) / 1e9

    // concurrent: 2 OCC writers, 10 batches each, same key regions
    val start = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[LakeLayout.LakeUpsertResult]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val t1 = now()
    val threads = (0 until 2).map { w =>
      new Thread(() => {
        start.await()
        try (0 until 10).foreach { b =>
          results.add(LakeLayout.upsertIntoLakeOcc(spark, table,
            batchDf(batchLo(w, b)), "id", s"w$w", b.toLong))
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
    val occSec = (now() - t1) / 1e9
    require(errors.isEmpty, s"OCC writer failed: ${Option(errors.peek())}")
    import scala.jdk.CollectionConverters._
    val rs = results.asScala.toSeq
    val occBytes = rs.map(_.bytesWritten).sum
    val attempts = rs.map(_.attempts).sum

    // incremental agg advance vs full recompute (state keyed on v%97)
    val vCur = LakeLayout.lakeVersions(spark, table).last
    val grouped = LakeLayout.readLake(spark, table).get
      .withColumn("g", pmod(col("v"), lit(97L)).cast("string"))
    val t2 = now()
    val full = IncrementalAgg.fullAgg(grouped, "g", "v")
    full.write.format("noop").mode("overwrite").save()
    val fullSec = (now() - t2) / 1e9
    // one more 500-key upsert, then advance across it
    LakeLayout.upsertIntoLake(spark, table, batchDf(1000000L), "id", "seq", 999L)
    val state = IncrementalAgg.fullAgg(
      LakeLayout.readLakeVersion(spark, table, vCur)
        .withColumn("g", pmod(col("v"), lit(97L)).cast("string")), "g", "v")
      .cache()
    state.count()
    val t3 = now()
    // advance reads only the change regions; group col derived the same way
    val (oldR, newR) = IncrementalAgg.changeRegions(spark, table, vCur, vCur + 1)
    val signed = newR.select(pmod(col("v"), lit(97L)).cast("string").as("g"),
        lit(1L).as("cnt"), col("v"))
      .unionByName(oldR.select(pmod(col("v"), lit(97L)).cast("string").as("g"),
        lit(-1L).as("cnt"), (-col("v")).as("v")))
    val advanced = state.unionByName(
        signed.groupBy(col("g")).agg(sum(col("cnt")).as("cnt"),
          sum(col("v")).as("total")))
      .groupBy(col("g")).agg(sum(col("cnt")).as("cnt"),
        sum(col("total")).as("total"))
      .filter(col("cnt") > 0)
    advanced.write.format("noop").mode("overwrite").save()
    val advSec = (now() - t3) / 1e9

    val tableBytes = rs.last.tableBytes
    // a rebased commit's manifest points at a data dir named for the
    // version the merge originally targeted, not the one it landed as
    val rebased = LakeLayout.lakeVersions(spark, table).count { v =>
      val c = LakeLayout.lakeCommitAt(spark, table, v)
      val m = "data/v(\\d+)-w".r.findFirstMatchIn(c.dataDir)
      m.exists(_.group(1).toLong != v)
    }
    println(s"""{"seq_sec":${Bench.f3(seqSec)},"seq_bytes":$seqBytes,""" +
      s""""occ_sec":${Bench.f3(occSec)},"occ_bytes":$occBytes,""" +
      s""""occ_commits":${rs.size},"occ_attempts":$attempts,""" +
      s""""occ_rebased":$rebased,"table_bytes":$tableBytes,""" +
      s""""full_agg_sec":${Bench.f3(fullSec)},"advance_sec":${Bench.f3(advSec)}}""")
    spark.stop()
  }
}
