package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ------------------------------------------- manifest-pointer commits
  /** One committed table version: the manifest's pointer plus the
    * (checkpoint, batchId) provenance used for exactly-once replay
    * detection. */
  final case class LakeCommit(version: Long, dataDir: String,
      checkpoint: String, batchId: Long)

  private def commitsDir(table: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(table, "_commits")
  private def versionName(v: Long): String = f"v$v%020d"

  /** Manifest-pointer table commits — the atomicity layer a plain-parquet
    * lake table needs so writers can replace the WHOLE table without a
    * visibility window (the delete-then-rename swap this replaces left
    * readers a moment with NO table, and a crash inside that moment
    * silently rebuilt the lake from one batch's keys). The protocol is
    * the Delta-log idea stripped to one pointer per version:
    *  - data for version v is written to `data/v<padded>` — never
    *    mutated once its manifest exists;
    *  - the commit POINT is one atomic rename of a tmp file to
    *    `_commits/v<padded>.manifest`, whose content names the data dir
    *    (plus (checkpoint, batchId) provenance);
    *  - readers resolve the HIGHEST manifest and read the dir it names —
    *    they see the old version until the rename lands, the new one
    *    after, never a mix and never nothing;
    *  - a crash after the data write but before the rename leaves an
    *    orphan data dir no manifest references; the retry recomputes the
    *    same next version number and overwrites it — safe because
    *    unreferenced.
    * Single-writer per table (the streaming-sink contract); the rename
    * fails loudly if two writers race the same version. */
  def latestLakeCommit(spark: SparkSession, tablePath: String): Option[LakeCommit] = {
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fs = table.getFileSystem(spark.sessionState.newHadoopConf())
    val dir = commitsDir(table)
    if (!fs.exists(dir)) None
    else {
      val versions = fs.listStatus(dir).map(_.getPath.getName)
        .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
        .map(_.stripSuffix(".manifest").stripPrefix("v").toLong)
      if (versions.isEmpty) None
      else {
        val v = versions.max
        val in = fs.open(new org.apache.hadoop.fs.Path(dir, versionName(v) + ".manifest"))
        val content =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        val lines = content.split("\n")
        Some(LakeCommit(v, lines(0), lines(1), lines(2).toLong))
      }
    }
  }

  /** The committed table, resolved through the latest manifest; None
    * before the first commit. */
  def readLake(spark: SparkSession, tablePath: String): Option[DataFrame] =
    latestLakeCommit(spark, tablePath)
      .map(c => spark.read.parquet(s"$tablePath/${c.dataDir}"))

  /** Write `df` as the next table version and atomically publish it.
    * Returns the committed version number. */
  def commitLakeVersion(df: DataFrame, tablePath: String,
      checkpoint: String, batchId: Long): Long = {
    val s = df.sparkSession
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fs = table.getFileSystem(s.sessionState.newHadoopConf())
    val v = latestLakeCommit(s, tablePath).map(_.version + 1).getOrElse(0L)
    val dataRel = s"data/${versionName(v)}"
    // overwrite: an orphan dir from a crashed previous attempt at this
    // same version is unreferenced by construction
    df.write.mode("overwrite").parquet(s"$tablePath/$dataRel")
    fs.mkdirs(commitsDir(table))
    val tmp = new org.apache.hadoop.fs.Path(commitsDir(table), s".tmp-${versionName(v)}")
    val out = fs.create(tmp, true)
    try out.write(s"$dataRel\n$checkpoint\n$batchId\n".getBytes("UTF-8"))
    finally out.close()
    val manifest =
      new org.apache.hadoop.fs.Path(commitsDir(table), versionName(v) + ".manifest")
    require(fs.rename(tmp, manifest),
      s"manifest commit lost a race: $manifest (tables are single-writer)")
    v
  }

  /** Time travel: the table AS OF a specific committed version (must
    * not have been vacuumed). The version list is the audit surface a
    * pipeline uses to pin a training run to the exact table state it
    * read. */
  def readLakeVersion(spark: SparkSession, tablePath: String,
      version: Long): DataFrame = {
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fs = table.getFileSystem(spark.sessionState.newHadoopConf())
    val manifest = new org.apache.hadoop.fs.Path(
      commitsDir(table), versionName(version) + ".manifest")
    require(fs.exists(manifest),
      s"version $version of $tablePath does not exist (or was vacuumed)")
    val in = fs.open(manifest)
    val dataRel =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.split("\n")(0)
      finally in.close()
    spark.read.parquet(s"$tablePath/$dataRel")
  }

  /** All live (un-vacuumed) version numbers, ascending. */
  def lakeVersions(spark: SparkSession, tablePath: String): Seq[Long] = {
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fs = table.getFileSystem(spark.sessionState.newHadoopConf())
    val dir = commitsDir(table)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(_.stripSuffix(".manifest").stripPrefix("v").toLong)
      .toSeq.sorted
  }

  /** Key-level diff between two committed versions: one row per changed
    * key with `change` ∈ insert/update/delete. A full-outer join on the
    * key with a row-hash comparison — one shuffle per side, no driver
    * state; `update` compares the FULL row, so any column drift counts.
    * This is the incremental-consumer contract: a downstream job
    * re-processes exactly the keys a commit touched instead of
    * re-reading the table. */
  def lakeDiff(spark: SparkSession, tablePath: String,
      fromVersion: Long, toVersion: Long, key: String): DataFrame = {
    val from = readLakeVersion(spark, tablePath, fromVersion)
    val to = readLakeVersion(spark, tablePath, toVersion)
    require(from.columns.sameElements(to.columns),
      "lakeDiff requires identical schemas across versions")
    val fromH = from.select(col(key),
      xxhash64(struct(from.columns.map(col).toIndexedSeq: _*)).as("h_from"))
    val toH = to.select(col(key),
      xxhash64(struct(to.columns.map(col).toIndexedSeq: _*)).as("h_to"))
    fromH.join(toH, Seq(key), "full_outer")
      .withColumn("change",
        when(col("h_from").isNull, lit("insert"))
          .when(col("h_to").isNull, lit("delete"))
          .when(col("h_from") =!= col("h_to"), lit("update")))
      .filter(col("change").isNotNull)
      .select(col(key), col("change"))
  }

  /** Compact the CURRENT version of a manifest-committed table into
    * ~`targetFileMB` files, key-clustered, published as a NEW version.
    * Streaming upserts commit one version per micro-batch at the
    * merge's parallelism — after thousands of batches the live version
    * is a spray of small files. Compaction rewrites it
    * `repartitionByRange(key).sortWithinPartitions(key)` (tight parquet
    * row-group min/max on the key → pushed point/range lookups skip
    * almost everything) and commits through the same atomic manifest
    * rename as any writer: readers are never blocked, never see a
    * half-compacted table, and [[lakeDiff]] between the two versions is
    * EMPTY (spec-pinned) — compaction moves bytes, not rows. Returns
    * the new version number. */
  def compactLake(spark: SparkSession, tablePath: String, key: String,
      targetFileMB: Int = 128): Long = {
    val cur = latestLakeCommit(spark, tablePath)
      .getOrElse(throw new IllegalArgumentException(
        s"compactLake: $tablePath has no committed version"))
    val df = spark.read.parquet(s"$tablePath/${cur.dataDir}")
    val hadoopConf = spark.sessionState.newHadoopConf()
    val bytes = df.inputFiles
      .map(f => new org.apache.hadoop.fs.Path(f))
      .map(p => p.getFileSystem(hadoopConf).getFileStatus(p).getLen).sum
    val nFiles = math.max(1, (bytes / (targetFileMB * 1024L * 1024L)).toInt)
    commitLakeVersion(
      df.repartitionByRange(nFiles, col(key)).sortWithinPartitions(col(key)),
      tablePath, s"compaction:${cur.version}", -1L)
  }

  /** Drop all but the newest `keep` versions: manifest first (so no new
    * reader can resolve a pointer about to dangle), then the data dir.
    * `keep ≥ 2` leaves a grace version for readers that resolved just
    * before a commit. */
  def vacuumLake(spark: SparkSession, tablePath: String, keep: Int = 2): Unit = {
    require(keep >= 1, "vacuum must keep at least the live version")
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fs = table.getFileSystem(spark.sessionState.newHadoopConf())
    val dir = commitsDir(table)
    if (fs.exists(dir)) {
      val versions = fs.listStatus(dir).map(_.getPath.getName)
        .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
        .map(_.stripSuffix(".manifest").stripPrefix("v").toLong)
        .sorted.reverse.drop(keep)
      versions.foreach { v =>
        fs.delete(new org.apache.hadoop.fs.Path(dir, versionName(v) + ".manifest"), false)
        fs.delete(new org.apache.hadoop.fs.Path(table, s"data/${versionName(v)}"), true)
      }
    }
  }

  // ------------------------------------------------------------ Z-order
  /** Spread a 16-bit value's bits across 32 bits (zeros interleaved) —
    * the classic shift-mask ladder, a pure bitwise Column expression
    * tree: five codegen'd stages, no UDF anywhere. */
  def spreadBits16(c: Column): Column = {
    val s0 = c.bitwiseAND(lit(0xFFFFL))
    val s1 = s0.bitwiseOR(shiftleft(s0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Z-order (Morton) key of two 16-bit bins: interleaved bits, `a` on
    * even positions, `b` on odd. Nearby (a, b) boxes map to compact key
    * ranges — the property multi-dimensional file/row-group pruning
    * rides on. */
  def zkey2(a: Column, b: Column): Column =
    spreadBits16(a).bitwiseOR(shiftleft(spreadBits16(b), 1))

  /** A 16-bit equi-width bin that FILLS the bin space for any column
    * range, in OVERFLOW-SAFE pure-integer math (never doubles, whose
    * 53-bit mantissa mis-rounds year-of-nanoseconds extents):
    *  - small range (< 2³¹): `(v - lo)·65535 div range` — the product
    *    stays under 2⁴⁷; a step-divide here would leave the bin space
    *    underfilled (1 500 users → 11 bits → the high Morton bits all
    *    come from the OTHER dimension and the layout degenerates to a
    *    single-column sort — measured, that is how this formula earned
    *    its CASE)
    *  - huge range (≥ 2³¹, e.g. epoch-ns): `(v - lo) div step`,
    *    `step = range div 65536 + 1` — no product, and the range being
    *    ≫ 65536 means the bins fill the space anyway.
    * SQL-expressible (CASE + div), so the oracle reproduces every bin
    * bit-exactly. */
  private def bin16Sql(v: String, lo: String, hi: String): String =
    s"""CASE WHEN $hi - $lo >= 2147483648
        THEN ($v - $lo) div (($hi - $lo) div 65536 + 1)
        ELSE (($v - $lo) * 65535) div greatest($hi - $lo, 1) END"""

  /** Events + a `zkey` column: both dimensions binned to 16 bits
    * ([[bin16Sql]]), then Morton-interleaved ([[zkey2]]). Extents come
    * from one in-plan aggregate (1-row frame, broadcast by size-based
    * planning — no driver collect). The same integer formulas are
    * reproduced verbatim by the DuckDB oracle. */
  def zorderKeyed(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val ext = ev.agg(
      min(col("user_id")).as("u_lo"), max(col("user_id")).as("u_hi"),
      min(col("ts")).as("t_lo"), max(col("ts")).as("t_hi"))
    ev.crossJoin(ext)
      .withColumn("u_bin", expr(bin16Sql("user_id", "u_lo", "u_hi")))
      .withColumn("t_bin", expr(bin16Sql("ts", "t_lo", "t_hi")))
      .withColumn("zkey", zkey2(col("u_bin"), col("t_bin")))
      .drop("u_lo", "u_hi", "t_lo", "t_hi")
  }

  /** Write events Z-ORDERED on (user_id, ts): [[zorderKeyed]], then
    * range-partition + sort by the Morton key. Each output file covers
    * a compact (user × time) rectangle, so a two-dimensional box query
    * touches few files — unlike a single-column sort, which prunes one
    * dimension and scatters the other across EVERY file. At 100 TB
    * this is the layout decision that makes (user, time) point-range
    * lookups scan gigabytes instead of the whole table: parquet
    * row-group min/max stats on user_id AND ts are both tight within a
    * file, so pushed filters skip nearly everything (file-stats
    * engines — Delta/Iceberg — additionally prune whole files from the
    * same locality). The sort is by the BOUNDED zkey, never a global
    * multi-column sort of raw values: repartitionByRange samples the
    * key, each task sorts only its slice. */
  def writeEventsZOrdered(
      spark: SparkSession,
      sfDir: String,
      outPath: String,
      files: Int = 16): Unit =
    zorderKeyed(spark, sfDir)
      .repartitionByRange(files, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .write.mode("overwrite").parquet(outPath)

  /** Oracle-checked Z-order key math: per event_type, count and exact
    * min/max/sum of the Morton keys. Any drift in the binning or the
    * five-stage bit spread breaks the hash. */
  def qZorderKeyStats(spark: SparkSession, sfDir: String): DataFrame =
    zorderKeyed(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(col("zkey")).as("zkey_min"),
        max(col("zkey")).as("zkey_max"),
        sum(col("zkey")).as("zkey_sum"))
      .orderBy(col("event_type"))

  /** The five shift-mask stages + binning, verbatim in DuckDB integer
    * SQL (`//` = integer division on BIGINTs, same truncation as
    * Spark's `div` for the non-negative operands used here). */
  val qZorderKeyStatsSql: String = {
    def spread(x: String): String = {
      val s1 = s"(($x | ($x << 8)) & 16711935)" // 0x00FF00FF
      val s2 = s"(($s1 | ($s1 << 4)) & 252645135)" // 0x0F0F0F0F
      val s3 = s"(($s2 | ($s2 << 2)) & 858993459)" // 0x33333333
      s"(($s3 | ($s3 << 1)) & 1431655765)" // 0x55555555
    }
    def bin(v: String, lo: String, hi: String): String =
      s"""CASE WHEN $hi - $lo >= 2147483648
          THEN ($v - $lo) // (($hi - $lo) // 65536 + 1)
          ELSE (($v - $lo) * 65535) // GREATEST($hi - $lo, 1) END"""
    s"""WITH ext AS (
         SELECT MIN(user_id) AS u_lo, MAX(user_id) AS u_hi,
           MIN(epoch_ns(ts)) AS t_lo, MAX(epoch_ns(ts)) AS t_hi
         FROM events),
       binned AS (
         SELECT event_type,
           ${bin("user_id", "u_lo", "u_hi")} & 65535 AS ub,
           ${bin("epoch_ns(ts)", "t_lo", "t_hi")} & 65535 AS tb
         FROM events, ext),
       keyed AS (
         SELECT event_type,
           ${spread("ub")} | (${spread("tb")} << 1) AS zkey
         FROM binned)
       SELECT event_type, COUNT(*) AS n_events,
         CAST(MIN(zkey) AS BIGINT) AS zkey_min,
         CAST(MAX(zkey) AS BIGINT) AS zkey_max,
         CAST(SUM(zkey) AS BIGINT) AS zkey_sum
       FROM keyed GROUP BY event_type ORDER BY event_type"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zorder_key_stats" -> (qZorderKeyStats _))

  val oracle: Map[String, String] = Map(
    "q_zorder_key_stats" -> qZorderKeyStatsSql)
}
