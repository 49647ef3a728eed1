package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reproducible sampling/splitting for training-data pipelines
  * (north-star mandate, SURVEY §2.D adjacents). Every assignment is a
  * pure function of the row's key via md5 — NO rand(): a re-run, a task
  * retry, or a different executor count yields byte-identical splits
  * (the same determinism rule that governs the whole engine), and the
  * oracle can recompute the assignment in DuckDB.
  *
  * Scale notes: both queries are map-side assignment + one partial
  * aggregation — no shuffle of payloads, no global sort, no sampling
  * collect. At 100 TB the split column would be written back as a
  * partition column so downstream training readers prune to their split
  * at the FileIndex.
  */
object Sampling {

  private def d(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** First hex nibble of md5(doc_id) → 16 deterministic buckets:
    * 12 train / 2 val / 2 test (75/12.5/12.5). */
  private val TrainNibbles = Seq("0", "1", "2", "3", "4", "5", "6", "7", "8", "9", "a", "b")
  private val ValNibbles = Seq("c", "d")

  /** Deterministic split assignment as a pure Column over the row key —
    * reused by [[dHashSplit]] and the end-to-end PipelineCli. */
  def splitCol(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val nib = substring(md5(key.cast("string")), 1, 1)
    when(nib.isin(TrainNibbles: _*), "train")
      .when(nib.isin(ValNibbles: _*), "val")
      .otherwise("test")
  }

  /** Deterministic train/val/test split accounting per language:
    * documents land in a split by hashing their KEY (not their position
    * or a RNG), so the split survives reshuffles and incremental
    * appends. Emits (lang, split, n_docs). */
  def dHashSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    d(s, dir)
      .withColumn("split", splitCol($"doc_id"))
      .groupBy($"lang", $"split")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"lang", $"split")
  }

  val dHashSplitSql: String = {
    val train = TrainNibbles.map(n => s"'$n'").mkString(", ")
    val vall = ValNibbles.map(n => s"'$n'").mkString(", ")
    s"""WITH a AS (
         SELECT lang,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ($train) THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ($vall) THEN 'val'
                ELSE 'test' END AS split
         FROM documents)
       SELECT lang, split, COUNT(*) AS n_docs
       FROM a GROUP BY lang, split ORDER BY lang, split"""
  }

  /** Stratified deterministic sample: ~1/`rate` of each language stratum
    * by hashing the key into `rate` buckets and keeping bucket 0 — the
    * reproducible replacement for per-stratum rand() sampling. Emits per
    * stratum the population, the sample size, and the realized rate, so
    * a drifting stratum is visible immediately. */
  val SampleBuckets = 8

  def dStratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // md5 first 4 hex chars → 16-bit int, mod buckets: deterministic and
    // oracle-portable (DuckDB parses the same hex substring)
    val bucket = expr(
      s"CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT) % $SampleBuckets")
    d(s, dir)
      .withColumn("in_sample", (bucket === 0).cast("int").cast("bigint"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"in_sample").as("n_sampled"),
        (sum($"in_sample").cast("double") / count(lit(1))).as("rate"))
      .orderBy($"lang")
  }

  val dStratifiedSampleSql: String =
    s"""WITH a AS (
         SELECT lang,
           CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % $SampleBuckets = 0
                THEN 1 ELSE 0 END AS in_sample
         FROM documents)
       SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(in_sample) AS BIGINT) AS n_sampled,
         CAST(SUM(in_sample) AS DOUBLE) / COUNT(*) AS rate
       FROM a GROUP BY lang ORDER BY lang"""

  // ------------------------------------------------- weighted source mix
  /** Deterministic weighted mixture sampling by SOURCE — the data-mixing
    * step a training pipeline runs to re-weight domains (keep 25% of a
    * low-quality crawl, all of a curated source) without an RNG: a doc
    * is kept iff its 16-bit key hash falls under its source's threshold.
    * The demo weight rule derives tiers 25/50/75/100% from the source
    * suffix (`suffix % 4`), so every tier is exercised; a real pipeline
    * supplies a weights table instead. Per-doc map-side decision, one
    * source-bounded aggregate; a re-run keeps EXACTLY the same docs
    * (hash-of-key, no rand()), which is what makes the mix auditable
    * and the downstream shards reproducible. */
  def dSourceMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h16 = expr(
      "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT)")
    val thr = expr("(CAST(substring(source, 4) AS BIGINT) % 4 + 1) * 16384")
    d(s, dir)
      .withColumn("kept", (h16 < thr).cast("int").cast("bigint"))
      .withColumn("thr", thr)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"kept").as("n_kept"),
        max($"thr").as("keep_threshold"),
        (sum($"kept").cast("double") / count(lit(1))).as("rate"))
      .orderBy($"source")
  }

  val dSourceMixSql: String =
    """WITH a AS (
         SELECT source,
           CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
                  < (CAST(substr(source, 4) AS BIGINT) % 4 + 1) * 16384
                THEN 1 ELSE 0 END AS kept,
           (CAST(substr(source, 4) AS BIGINT) % 4 + 1) * 16384 AS thr
         FROM documents)
       SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(kept) AS BIGINT) AS n_kept,
         MAX(thr) AS keep_threshold,
         CAST(SUM(kept) AS DOUBLE) / COUNT(*) AS rate
       FROM a GROUP BY source ORDER BY source"""

  // ---------------------------------------------------- shard packing
  /** Token budget per training shard and the writer fan-out. Writers
    * scale with the cluster (each packs independently — at 100 TB this
    * is hundreds of writers, one per output task); the per-writer
    * running sum is a window over docs/writers rows, so sort width per
    * partition shrinks as writers grow. A single GLOBAL running sum
    * would be one unbounded partition — the named anti-pattern. */
  val ShardTokenBudget = 2048L
  val ShardWriters = 4

  /** Greedy token-budget shard packing — the "write the corpus as ~equal
    * training shards" step of a data pipeline. Each doc is routed to a
    * deterministic writer by key hash (retry/reshuffle-safe, same rule
    * as the split), writers pack docs in doc_id order, and a doc opens a
    * new shard when the running token count crosses the budget (shard =
    * the budget-quotient of the tokens BEFORE the doc, so shard 0 always
    * starts at offset 0 and docs may straddle the boundary — greedy
    * fill, no lookahead, deterministic on both engines). Emits per-shard
    * accounting: (writer, shard, n_docs, shard_tokens, first/last doc). */
  /** Shard packing over ANY (doc_id, text) corpus — reused by the
    * registered query (whole documents table) and PipelineCli (the
    * cleaned train split). */
  def packShards(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("writer")).orderBy(col("doc_id"))
    docs
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("bigint").as("n_tokens"))
      .withColumn("writer", expr(
        s"CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT) % $ShardWriters"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("shard", expr(s"(cum - n_tokens) div $ShardTokenBudget"))
      .groupBy(col("writer"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("shard_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("writer"), col("shard"))
  }

  def dShardPack(s: SparkSession, dir: String): DataFrame =
    packShards(d(s, dir))

  val dShardPackSql: String =
    s"""WITH t AS (
         SELECT doc_id,
           CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')) AS BIGINT) AS n_tokens,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % $ShardWriters AS writer
         FROM documents),
       c AS (
         SELECT doc_id, n_tokens, writer,
           SUM(n_tokens) OVER (PARTITION BY writer ORDER BY doc_id
             ROWS UNBOUNDED PRECEDING) AS cum
         FROM t)
       SELECT writer,
         CAST((cum - n_tokens) // $ShardTokenBudget AS BIGINT) AS shard,
         COUNT(*) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
         MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       FROM c GROUP BY 1, 2 ORDER BY writer, shard"""

  // --------------------------------------------------------- split drift
  /** Two-sample Kolmogorov–Smirnov NUMERATOR between two samples of an
    * integer statistic: `max over x of |cA(x)·nB − cB(x)·nA|`, where
    * cS(x) = #rows of S with value ≤ x. The KS statistic itself is
    * `ks_num / (nA·nB)` — kept as an exact integer numerator so both
    * engines hash-match without a single floating division. Inputs are
    * one column `x`; output one row `(n_a, n_b, ks_num)`.
    *
    * Scale shape: one groupBy on the VALUE DOMAIN (distinct x), then a
    * cumulative window over those distinct values — the unbounded sort
    * is over domain cardinality (thousands of token counts), never the
    * corpus, and the heavy per-row work is a map-side aggregate. */
  def ksNumerator(a: DataFrame, b: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = a.sparkSession
    import s.implicits._
    val tagged = a.select($"x").withColumn("side", lit("a"))
      .unionByName(b.select($"x").withColumn("side", lit("b")))
    val perValue = tagged.groupBy($"x").agg(
      sum(when($"side" === "a", 1L).otherwise(0L)).as("da"),
      sum(when($"side" === "b", 1L).otherwise(0L)).as("db"))
    val w = Window.orderBy($"x").rowsBetween(Window.unboundedPreceding, 0)
    val cum = perValue
      .withColumn("ca", sum($"da").over(w))
      .withColumn("cb", sum($"db").over(w))
    val totals = tagged.groupBy().agg(
      sum(when($"side" === "a", 1L).otherwise(0L)).as("n_a"),
      sum(when($"side" === "b", 1L).otherwise(0L)).as("n_b"))
    cum.crossJoin(totals) // 1-row totals frame: broadcast
      .groupBy($"n_a", $"n_b")
      .agg(max(abs($"ca" * $"n_b" - $"cb" * $"n_a")).as("ks_num"))
      .select($"n_a", $"n_b", $"ks_num")
  }

  /** [[ksNumerator]] for UNBOUNDED value domains (raw doubles, epoch
    * timestamps — anywhere the distinct-value count can approach the
    * corpus): the cumulative sums come from a RANGE-PARTITIONED
    * two-pass instead of the single-task global window. Pass 1
    * range-partitions the per-value counts on x and aggregates one
    * subtotal row per partition; the driver prefix-sums that list
    * (bounded by the partition COUNT, never the domain) into per-
    * partition offsets. Pass 2 computes a partition-LOCAL cumulative
    * window (each task sorts only its own range) and adds the offset.
    * Output is bit-identical to [[ksNumerator]] — same oracle, pinned
    * by the agreement spec — but no task ever sees more than its range
    * slice, which is the difference between a KS gate that runs on a
    * 100 TB column and one that funnels every distinct value through
    * one task. The ranged frame is cached ONLY to pin partition ids
    * across the two passes and released before returning (the 1-row
    * result is materialized eagerly, nothing stays pinned). */
  def ksNumeratorRanged(a: DataFrame, b: DataFrame,
      partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = a.sparkSession
    import s.implicits._
    val npart =
      if (partitions > 0) partitions
      else math.max(2, s.sparkContext.defaultParallelism / 4)
    val tagged = a.select($"x").withColumn("side", lit("a"))
      .unionByName(b.select($"x").withColumn("side", lit("b")))
    val perValue = tagged.groupBy($"x").agg(
      sum(when($"side" === "a", 1L).otherwise(0L)).as("da"),
      sum(when($"side" === "b", 1L).otherwise(0L)).as("db"))
    // cached so both passes observe ONE materialization: partition ids
    // must be identical when the frame is read again in pass 2
    val ranged = perValue.repartitionByRange(npart, $"x")
      .withColumn("pid", spark_partition_id())
      .cache()
    try {
      // pass 1: one subtotal row per partition — bounded driver traffic
      val subs = ranged.groupBy($"pid")
        .agg(sum($"da").as("sa"), sum($"db").as("sb"))
        .collect().map(r => (r.getAs[Int]("pid"),
          r.getAs[Long]("sa"), r.getAs[Long]("sb")))
        .sortBy(_._1)
      if (subs.isEmpty)
        Seq.empty[(Long, Long, Long)].toDF("n_a", "n_b", "ks_num")
      else {
        val nA = subs.map(_._2).sum
        val nB = subs.map(_._3).sum
        // exclusive prefix sums: offset of partition p = totals of all
        // partitions with smaller x-ranges (range partitioning orders
        // partition ids by range)
        val offsets = subs.scanLeft((0, 0L, 0L)) {
          case ((_, ca, cb), (pid, sa, sb)) => (pid + 1, ca + sa, cb + sb)
        }.init.zip(subs).map { case ((_, offA, offB), (pid, _, _)) =>
          (pid, offA, offB)
        }
        val offDf = offsets.toSeq.toDF("pid", "off_a", "off_b")
        val w = Window.partitionBy($"pid").orderBy($"x")
          .rowsBetween(Window.unboundedPreceding, 0)
        val out = ranged
          .withColumn("la", sum($"da").over(w))
          .withColumn("lb", sum($"db").over(w))
          .join(broadcast(offDf), "pid")
          .agg(max(abs(($"la" + $"off_a") * nB - ($"lb" + $"off_b") * nA))
            .as("ks_num"))
          .select(lit(nA).as("n_a"), lit(nB).as("n_b"), $"ks_num")
        // materialize before releasing the pid-pinning cache
        val row = out.head()
        s.createDataFrame(java.util.Arrays.asList(row), out.schema)
      }
    } finally ranged.unpersist(blocking = false)
  }

  /** Distribution-drift gate between the TRAIN and VAL splits on the
    * per-doc token count — the data-quality check a pipeline runs after
    * every re-split or ingest: a hash split must NOT shift the length
    * distribution, so the KS statistic stays near 0 (a biased split —
    * e.g. by length or source — trips it; planted-drift spec proves the
    * detector fires). */
  def dSplitDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = d(s, dir).select(
      splitCol($"doc_id").as("split"),
      size(TextAnalysis.tokens($"text")).cast("bigint").as("x"))
    ksNumerator(
      docs.filter($"split" === "train").select($"x"),
      docs.filter($"split" === "val").select($"x"))
  }

  val dSplitDriftSql: String = {
    val tr = TrainNibbles.map(n => s"'$n'").mkString(", ")
    val va = ValNibbles.map(n => s"'$n'").mkString(", ")
    s"""WITH t AS (
         SELECT CASE
             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ($tr) THEN 'a'
             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ($va) THEN 'b'
             ELSE NULL END AS side,
           CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')) AS BIGINT) AS x
         FROM documents),
       tagged AS (SELECT side, x FROM t WHERE side IS NOT NULL),
       pv AS (
         SELECT x,
           SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS da,
           SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS db
         FROM tagged GROUP BY x),
       cum AS (
         SELECT x,
           SUM(da) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS ca,
           SUM(db) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cb
         FROM pv),
       tot AS (
         SELECT SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS n_a,
           SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS n_b
         FROM tagged)
       SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
         CAST(MAX(ABS(ca * n_b - cb * n_a)) AS BIGINT) AS ks_num
       FROM cum, tot GROUP BY n_a, n_b"""
  }

  /** [[dSplitDrift]] through the range-partitioned KS path — identical
    * output, identical oracle: the scale variant stays hash-checked
    * against DuckDB, and any divergence between the two cumulative
    * strategies breaks one of the twin hashes. */
  def dSplitDriftRanged(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = d(s, dir).select(
      splitCol($"doc_id").as("split"),
      size(TextAnalysis.tokens($"text")).cast("bigint").as("x"))
    ksNumeratorRanged(
      docs.filter($"split" === "train").select($"x"),
      docs.filter($"split" === "val").select($"x"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d_hash_split" -> (dHashSplit _),
    "d_stratified_sample" -> (dStratifiedSample _),
    "d_shard_pack" -> (dShardPack _),
    "d_split_drift" -> (dSplitDrift _),
    "d_split_drift_ranged" -> (dSplitDriftRanged _),
    "d_source_mix" -> (dSourceMix _))

  val oracle: Map[String, String] = Map(
    "d_hash_split" -> dHashSplitSql,
    "d_stratified_sample" -> dStratifiedSampleSql,
    "d_shard_pack" -> dShardPackSql,
    "d_split_drift" -> dSplitDriftSql,
    "d_split_drift_ranged" -> dSplitDriftSql,
    "d_source_mix" -> dSourceMixSql)
}
