package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-side lake layout management (the half of a data lake the read
  * path depends on): date-partitioned parquet with controlled file
  * counts, plus pruned readback.
  *
  * Scale rules encoded here:
  *  - Partition by a LOW-cardinality time key (event_date → ~365
  *    partitions/year), never by user/id (millions of tiny dirs kill
  *    the metastore and the FileIndex).
  *  - Control files-per-partition with repartition(partitionCols) before
  *    the write — otherwise every task writes to every partition and a
  *    32-task × 30-day write emits ~960 small files.
  *  - Readers filter on the partition column so pruning happens at the
  *    FileIndex level (PartitionFilters in the scan, zero data read for
  *    pruned dates).
  */
object LakeLayout {

  /** Write events date-partitioned; one file per (partition, bucket of
    * `filesPerPartition`). */
  def writeEventsPartitioned(
      spark: SparkSession,
      sfDir: String,
      outPath: String,
      filesPerPartition: Int = 1): Unit = {
    val ev = Tables.load(spark, sfDir, "events")
      .withColumn("event_date",
        to_date(timestamp_micros(expr("ts div 1000"))))
    // repartition BY (date, salt): each (date, salt) group lands in one
    // task => up to filesPerPartition files per date, and the write
    // parallelizes across dates x salts instead of funneling through
    // the hash of the date alone.
    ev.repartition(col("event_date"),
        pmod(col("event_id"), lit(filesPerPartition)))
      .write
      .partitionBy("event_date")
      .mode("overwrite")
      .parquet(outPath)
  }

  /** Read back one day; the filter must hit PartitionFilters, not data
    * filters. */
  def readDay(spark: SparkSession, path: String, day: String): DataFrame =
    spark.read.parquet(path).filter(col("event_date") === lit(day))

  /** Compact a partitioned parquet layout: rewrite each partition's
    * small files into ~targetFileMB files. The streaming ingest path
    * (one file per trigger) fragments partitions over time; compaction
    * restores scan efficiency (fewer tasks, bigger sequential reads,
    * less FileIndex pressure). Rewrites to a new path + atomic-ish swap
    * is the production pattern; here the rewrite target is explicit. */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      partitionCol: String,
      targetFileMB: Int = 128): Unit = {
    val df = spark.read.parquet(inPath)
    // Hadoop FileSystem API, not java.io.File: input files are URIs and
    // must size correctly on hdfs://s3a:// layouts, not just file://.
    // ONE listStatus RPC per distinct parent DIRECTORY (not per file),
    // summing only the files actually in the scan — glob input paths
    // resolve through df.inputFiles, and _SUCCESS/_spark_metadata or
    // stale files never inflate the size the way a recursive
    // getContentSummary over the root would.
    val hadoopConf = spark.sessionState.newHadoopConf()
    // compare by the URI path component: inputFiles renders file:///p
    // while FileStatus renders file:/p for the same file
    val inputSet = df.inputFiles
      .map(f => new org.apache.hadoop.fs.Path(f).toUri.getPath).toSet
    val bytes = df.inputFiles
      .map(f => new org.apache.hadoop.fs.Path(f).getParent)
      .distinct
      .flatMap { parent =>
        parent.getFileSystem(hadoopConf).listStatus(parent)
          .filter(st => inputSet.contains(st.getPath.toUri.getPath))
          .map(_.getLen)
      }.sum
    val nFiles = math.max(1, (bytes / (targetFileMB * 1024L * 1024L)).toInt)
    // deterministic content-hash salt (not spark_partition_id) so the
    // compacted layout is reproducible for identical input data
    df.repartition(col(partitionCol),
        pmod(xxhash64(struct(df.columns.map(col): _*)), lit(nFiles)))
      .write
      .partitionBy(partitionCol)
      .mode("overwrite")
      .parquet(outPath)
  }

  /** Upsert (MERGE) semantics over plain parquet: rows from `updates`
    * replace same-key rows in `base`; unmatched update rows are
    * inserts. Implemented as anti-join + union — one shuffle on the
    * key, no full rewrite of unmatched base partitions when the
    * downstream write is partition-aligned. (A table format with
    * transactional MERGE — Delta/Iceberg — replaces this at the storage
    * layer; the relational algebra is identical.) */
  def upsert(
      base: org.apache.spark.sql.DataFrame,
      updates: org.apache.spark.sql.DataFrame,
      key: String): org.apache.spark.sql.DataFrame = {
    require(base.columns.sameElements(updates.columns),
      "upsert requires identical schemas")
    base.join(updates.select(col(key)), Seq(key), "left_anti")
      .unionByName(updates)
  }

  /** Write a table bucketed (+sorted) by a join key into the session
    * catalog. Two tables bucketed the same way join with NO exchange and
    * NO sort — at 100 TB that removes the dominant cost of every
    * fact⋈fact join on the bucketing key (the classic orders⋈lineitem
    * case). Bucket count is a layout decision: pick ≈ cluster cores ×
    * small constant; both sides must match for the exchange to be
    * elided. */
  def writeBucketed(
      df: org.apache.spark.sql.DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
}
