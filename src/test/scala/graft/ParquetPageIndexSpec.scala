package graft

import graft.sources.LakeLayout
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** WITHIN-file pruning on the Z-ordered layout — the next decade of the
  * file-pruning idea. File-level stats pruning (manifests, round 13)
  * skips whole files; parquet's own two inner levels continue it:
  *   1. ROW-GROUP stats — chunk min/max lets the reader drop whole row
  *      groups whose key range misses the predicate band;
  *   2. PAGE column indexes (parquet column-index structures) — per-page
  *      min/max lets the reader drop pages INSIDE a surviving row group
  *      (SPARK-26345: the vectorized reader materializes only matching
  *      row ranges when `parquet.filter.columnindex.enabled`, default
  *      on, and the filter is pushed).
  * Because the layout is Z-ordered, every row group / page covers a
  * compact (user × time) rectangle, so BOTH inner levels bite on a
  * narrow user band — exactly like the file level did. The spec writes
  * deliberately small row groups/pages so all three granularities exist
  * at test SF; at 100 TB the same shape holds with 128 MB files,
  * default 128 MB row groups and 1 MB pages. */
class ParquetPageIndexSpec extends SparkSuite {

  test("narrow key band on z-ordered layout: row-group subset read, page-level finer than row groups") {
    import spark.implicits._
    val sf01 = "/root/testdata/sf0.1"
    val dir = java.nio.file.Files.createTempDirectory("graft-pageidx").toString
    // small row groups (64 KB) and pages (500 rows) so a 100k-row table
    // exhibits the full file > row-group > page hierarchy
    LakeLayout.zorderKeyed(spark, sf01)
      .repartitionByRange(4, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .write
      .option("parquet.block.size", (64 * 1024).toString)
      .option("parquet.page.size", (4 * 1024).toString)
      .option("parquet.page.row.count.limit", "500")
      .mode("overwrite").parquet(dir)

    val ev = spark.read.parquet(dir)
    val (uLo, uHi) = {
      val r = ev.agg(min($"user_id"), max($"user_id")).head()
      (r.getLong(0), r.getLong(1))
    }
    // middle ~10% user band
    val bandLo = uLo + (uHi - uLo) * 45 / 100
    val bandHi = uLo + (uHi - uLo) * 55 / 100

    // ---- ground truth from parquet metadata (parquet-mr API) ----
    val conf = spark.sessionState.newHadoopConf()
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(conf)
    val files = fs.listStatus(dirPath).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    var rgTotal = 0; var rgHit = 0; var rgHitRows = 0L; var totalRows = 0L
    var pgTotal = 0; var pgHit = 0
    def longAt(bb: java.nio.ByteBuffer): Long =
      bb.duplicate().order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    files.foreach { f =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      try reader.getFooter.getBlocks.asScala.foreach { b =>
        totalRows += b.getRowCount
        val chunk = b.getColumns.asScala
          .find(_.getPath.toDotString == "user_id").get
        val st = chunk.getStatistics
        val (lo, hi) = (st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
          st.genericGetMax.asInstanceOf[java.lang.Long].longValue)
        rgTotal += 1
        if (!(hi < bandLo || lo > bandHi)) { rgHit += 1; rgHitRows += b.getRowCount }
        val ci = reader.readColumnIndex(chunk)
        if (ci != null) {
          val mins = ci.getMinValues.asScala
          val maxs = ci.getMaxValues.asScala
          val nulls = ci.getNullPages.asScala
          mins.indices.foreach { i =>
            pgTotal += 1
            if (!nulls(i)) {
              val (plo, phi) = (longAt(mins(i)), longAt(maxs(i)))
              if (!(phi < bandLo || plo > bandHi)) pgHit += 1
            }
          }
        }
      } finally reader.close()
    }
    info(s"rows=$totalRows rowGroups hit/total=$rgHit/$rgTotal " +
      s"(rowsInHitRGs=$rgHitRows) pages hit/total=$pgHit/$pgTotal")
    assert(rgTotal >= 10 && pgTotal >= 2 * rgTotal,
      s"layout too coarse for the demonstration (rg=$rgTotal pages=$pgTotal)")
    assert(rgHit > 0 && rgHit < rgTotal,
      s"band must hit a STRICT subset of row groups ($rgHit/$rgTotal)")
    assert(pgHit > 0 && pgHit < pgTotal,
      s"band must hit a strict subset of pages ($pgHit/$pgTotal)")

    // ---- the reader actually honors both levels ----
    // vectorized scan + pushed filter: numOutputRows counts rows the
    // parquet reader MATERIALIZED (surviving row-ranges), before
    // Spark's own Filter re-evaluates
    val q = ev.filter($"user_id" >= bandLo && $"user_id" <= bandHi)
    q.collect()
    val scan = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThanOrEqual(user_id") &&
      pushed.contains("LessThanOrEqual(user_id"),
      s"band predicate must reach the parquet reader, got: $pushed")
    val materialized = scan.metrics("numOutputRows").value
    val bandRows = q.count()
    info(s"materialized=$materialized bandRows=$bandRows rgHitRows=$rgHitRows")
    assert(materialized >= bandRows,
      "scan cannot emit fewer rows than the band holds")
    assert(materialized < totalRows,
      "reader must not materialize the whole table — row-group stats " +
        "pruning is off")
    assert(materialized < rgHitRows,
      s"reader materialized $materialized rows vs $rgHitRows in " +
        "band-overlapping row groups — page-level (column index) " +
        "skipping should read strictly less than whole row groups")
  }
}
