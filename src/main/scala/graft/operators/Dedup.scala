package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` (north-star mandate,
  * SURVEY §2.D): exact (content-hash groupBy), word-shingle Jaccard
  * near-dup, MinHash+LSH banding, and SimHash clustering.
  *
  * Cross-engine determinism: every hash in the oracle-checked paths is
  * md5 (byte-identical hex in Spark and DuckDB; string `min` compares
  * ASCII hex lexicographically, identical in both). The Spark production
  * path would swap md5 for `xxhash64` (one 64-bit op instead of a hex
  * string) — the plan shape is unchanged, so the oracle still validates
  * the algorithm.
  *
  * Scale notes (100 TB posture):
  *  - Exact dedup: hash-groupBy shuffles only (fingerprint, doc_id) —
  *    never the text — then joins survivors back if payload is needed.
  *  - Jaccard: candidate pairs come from an inverted shingle index
  *    (join on shingle). Stop-shingles (appearing in > [[ShingleDocCap]]
  *    docs) are dropped on BOTH engines — the standard guard that keeps
  *    the self-join from going quadratic on common phrases.
  *  - MinHash: 12 hash functions / 4 bands × 3 rows — band-match
  *    probability is 1-(1-J³)⁴: ≈0.41 at J=0.5 (the scheme's 50% point
  *    is J≈0.54) but ≈1 for the J≥0.8 near-dups this corpus plants;
  *    candidates verified against true Jaccard ≥ 0.5. Signatures are fused map-side (array HOFs per
  *    doc — no explode, no aggregation shuffle); banding joins on
  *    (band, key) so only same-bucket docs ever meet; only LSH
  *    candidates are ever exploded back into rows.
  *  - SimHash: shingle-based signatures (unigram sets saturate on small
  *    vocabularies); banded Hamming pairs have exact recall at the
  *    threshold via pigeonhole band counts.
  */
object Dedup {

  val ShingleDocCap = 100
  val JaccardThreshold = 0.8
  val MinHashFns = 12
  val MinHashBandRows = 3

  private def d(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // --------------------------------------------------------- exact dedup
  /** Exact dedup accounting over the normalized-content fingerprint:
    * corpus size, distinct contents, duplicate clusters, rows removable. */
  def dExactStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fp = d(s, dir)
      .select($"doc_id", md5(TextAnalysis.normText($"text")).as("fp"))
    val clusters = fp.groupBy($"fp").agg(count(lit(1)).as("n"))
    clusters.agg(
      sum($"n").as("n_docs"),
      count(lit(1)).as("n_distinct"),
      sum(when($"n" > 1, 1L).otherwise(0L)).as("n_dup_clusters"),
      sum($"n" - 1).as("n_removable"))
  }

  val dExactStatsSql: String =
    """WITH c AS (
         SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
                COUNT(*) AS n
         FROM documents GROUP BY 1)
       SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
              COUNT(*) AS n_distinct,
              CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_clusters,
              CAST(SUM(n - 1) AS BIGINT) AS n_removable
       FROM c"""

  // ----------------------------------------------------- shingle helpers
  /** Per-doc distinct word-3-gram shingle ARRAY (doc_id, shs) — map-side
    * only, no explode. Shared by every signature family (MinHash/SimHash,
    * md5 and xxhash64 variants) so a tokenization change lands in exactly
    * one place; the DuckDB mirror is [[shinglesSqlCte]]. */
  private def withShingleArrays(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    d(s, dir)
      .select($"doc_id", TextAnalysis.tokens($"text").as("w"))
      .filter(size($"w") >= 3)
      .select($"doc_id", array_distinct(expr(
        "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"))
        .as("shs"))
  }

  /** Distinct word-3-gram shingles per doc: (doc_id, shingle), with
    * stop-shingles removed by a windowless two-pass (count per shingle,
    * filter, semi-join back). */
  private def shingles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = d(s, dir)
      .select($"doc_id", TextAnalysis.tokens($"text").as("w"))
      .filter(size($"w") >= 3)
    // Per-doc dedup with array_distinct BEFORE exploding: same result as
    // a global distinct on (doc_id, shingle) — the key includes doc_id —
    // but map-side only, no exchange of the exploded rows.
    toks.select($"doc_id",
        explode(array_distinct(expr(
          "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")))
          .as("sh"))
  }

  private val shinglesSqlCte: String =
    """toks AS (
         SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS w
         FROM documents),
       shd AS (
         SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
         FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)
         WHERE len(w) >= 3)"""

  // ------------------------------------------------------- n-gram jaccard
  /** Near-duplicate pairs by word-3-gram Jaccard ≥ 0.8 via inverted-index
    * self-join with stop-shingle capping. */
  def dNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = shingles(s, dir).cache()
    val rare = sh.groupBy($"sh").agg(count(lit(1)).as("df"))
      .filter($"df" <= ShingleDocCap)
      .select($"sh")
    val shr = sh.join(rare, "sh")
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val a = shr.select($"doc_id".as("i"), $"sh")
    val b = shr.select($"doc_id".as("j"), $"sh")
    val common = a.join(b, Seq("sh")).filter($"i" < $"j")
      .groupBy($"i", $"j").agg(count(lit(1)).as("common"))
    common
      .join(sizes.select($"doc_id".as("i"), $"n".as("ni")), "i")
      .join(sizes.select($"doc_id".as("j"), $"n".as("nj")), "j")
      .withColumn("jaccard",
        $"common".cast("double") / ($"ni" + $"nj" - $"common"))
      .filter($"jaccard" >= JaccardThreshold)
      .select($"i", $"j", $"common", $"ni", $"nj", $"jaccard")
      .orderBy($"i", $"j")
  }

  val dNgramJaccardSql: String =
    s"""WITH $shinglesSqlCte,
       rare AS (SELECT sh FROM shd GROUP BY sh HAVING COUNT(*) <= $ShingleDocCap),
       shr AS (SELECT doc_id, shd.sh FROM shd JOIN rare ON shd.sh = rare.sh),
       sizes AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY doc_id),
       pairs AS (
         SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS common
         FROM shr a JOIN shr b ON a.sh = b.sh AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
       SELECT i, j, common, sa.n AS ni, sb.n AS nj,
         CAST(common AS DOUBLE) / (sa.n + sb.n - common) AS jaccard
       FROM pairs JOIN sizes sa ON sa.doc_id = i JOIN sizes sb ON sb.doc_id = j
       WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= $JaccardThreshold
       ORDER BY i, j"""

  // ---------------------------------------------------------- minhash lsh
  /** MinHash signature (12 md5-keyed min-hashes over distinct word
    * 3-gram SHINGLES) → 4-band LSH bucketing → candidate pairs →
    * true-Jaccard verification at ≥ 0.5. One shingle scan builds all 12
    * signature columns as plain `min` aggregates.
    *
    * Shingles, not unigrams: over a small shared vocabulary unigram sets
    * are near-identical across unrelated docs, so every pair lands in
    * every bucket and LSH degenerates to the quadratic join it exists to
    * avoid. 3-gram shingles keep bucket populations proportional to real
    * near-duplication. */
  def dMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // FUSED map-side signatures: the whole MinHash signature is computed
    // per document with array higher-order functions — no shingle
    // explode, no shuffle, no aggregation. 12 hash functions come from
    // 5-hex-char slices of TWO md5s per shingle (one-permutation-hashing
    // style): 2 digest calls per shingle total, then 12 cheap substring
    // mins over the in-row array. 20-bit slices are plenty for
    // min-selection over ~10²-10³ shingles, and candidates are verified
    // against true Jaccard anyway.
    val withShingles = withShingleArrays(s, dir)
    // This cache is load-bearing twice over: (a) without it,
    // project-collapse inlines the md5 transform into EACH of the 12
    // array_min expressions below (24 digests per shingle instead of 2);
    // (b) it is the single materialized form — still in array shape,
    // one row per doc — that both the signature projection and the
    // verification explode read, so the tokenize/shingle HOF chain runs
    // exactly once per document.
    val hashed = withShingles
      .withColumn("hcats",
        transform($"shs", x => concat(md5(x), md5(concat(lit("x"), x)))))
      .cache()
    val mhCols = (0 until MinHashFns).map(h =>
      array_min(transform($"hcats", c => substring(c, h * 5 + 1, 5)))
        .as(s"mh$h"))
    val mh = hashed.select(
      (Seq($"doc_id", size($"shs").cast("bigint").as("n")) ++ mhCols): _*)
      .cache()
    val nBands = MinHashFns / MinHashBandRows
    val bandStructs = (0 until nBands).map { b =>
      val cols = (0 until MinHashBandRows).map(r => col(s"mh${b * MinHashBandRows + r}"))
      struct(lit(b).as("band"), md5(concat_ws("|", cols: _*)).as("key"))
    }
    val bands = mh.select($"doc_id", explode(array(bandStructs: _*)).as("bk"))
      .select($"doc_id", $"bk.band".as("band"), $"bk.key".as("key"))
    val cand = bands.as("a").join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.key" === $"b.key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("i"), $"b.doc_id".as("j"))
      .distinct()
      // consumed twice below (candidate-doc projection + semi filter);
      // caching stops the banding subtree from running twice
      .cache()
    verifyCandidates(hashed, mh.select($"doc_id", $"n"), cand)
  }

  /** True-Jaccard verification over LSH candidate pairs only: semi-join
    * BEFORE the shingle explode, so only the (tiny) candidate set is
    * ever exploded into rows — the rest of the corpus never leaves its
    * array form. Shared by the md5 (oracle) and xxhash64 (production)
    * MinHash variants, which therefore emit IDENTICAL (i, j, jaccard)
    * rows whenever their banding surfaces the same candidates. */
  private def verifyCandidates(docsWithShingles: DataFrame,
      sizes: DataFrame, cand: DataFrame): DataFrame = {
    // no broadcast HINT on candDocs: the candidate-doc set is
    // proportional to near-dup volume, not bounded — size-based planning
    // broadcasts it while small and flips to a shuffled semi-join when a
    // dup-heavy corpus outgrows the threshold (same rule as the TPC-H
    // dimension sides)
    val candDocs = cand.select(col("i").as("doc_id"))
      .union(cand.select(col("j").as("doc_id"))).distinct()
    val toksC = docsWithShingles
      .join(candDocs, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode(col("shs")).as("tok"))
    val common = toksC.select(col("doc_id").as("i"), col("tok"))
      .join(toksC.select(col("doc_id").as("j"), col("tok")), Seq("tok"))
      .join(cand, Seq("i", "j"), "left_semi")
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc_id").as("i"), col("n").as("ni")), "i")
      .join(sizes.select(col("doc_id").as("j"), col("n").as("nj")), "j")
      .withColumn("jaccard",
        col("common").cast("double") / (col("ni") + col("nj") - col("common")))
      .filter(col("jaccard") >= 0.5)
      .select(col("i"), col("j"), col("jaccard"))
      .orderBy(col("i"), col("j"))
  }

  /** PRODUCTION MinHash: same fused map-side plan as [[dMinhashLsh]]
    * with the portable md5-hex machinery swapped for native `xxhash64`
    * — one 64-bit hash per (shingle, function-index) instead of hex
    * digests and substring mins, and band keys are a single xxhash64
    * over the band's signature longs. No DuckDB oracle (xxhash64 is
    * Spark-local) → rows-only driver check; the cross-checking spec
    * asserts it finds EXACTLY the md5 variant's verified pairs. At
    * billions of docs the 64-bit min-hash space never saturates, unlike
    * 20-bit hex slices. */
  def dMinhashLshX64(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Cache boundary AFTER the string hash (mirrors the md5 twin's
    // `hcats`): each shingle string is xxhash64'd exactly once; the 12
    // signature functions then re-hash the cached 8-byte long — pennies
    // next to 12 string digests per shingle, and hashing (not `a*v+b`
    // arithmetic) sidesteps ANSI long-overflow semantics.
    val withShingles = withShingleArrays(s, dir)
      .withColumn("hx", transform($"shs", x => xxhash64(x)))
      .cache() // consumed by the 12 signature mins AND the verification explode
    val mhCols = (0 until MinHashFns).map(h =>
      array_min(transform($"hx", v => xxhash64(v, lit(h)))).as(s"mh$h"))
    val mh = withShingles.select(
      (Seq($"doc_id", size($"shs").cast("bigint").as("n")) ++ mhCols): _*)
      .cache()
    val nBands = MinHashFns / MinHashBandRows
    val bandStructs = (0 until nBands).map { b =>
      val cols = (0 until MinHashBandRows).map(r => col(s"mh${b * MinHashBandRows + r}"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("key"))
    }
    val bands = mh.select($"doc_id", explode(array(bandStructs: _*)).as("bk"))
      .select($"doc_id", $"bk.band".as("band"), $"bk.key".as("key"))
    val cand = bands.as("a").join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.key" === $"b.key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("i"), $"b.doc_id".as("j"))
      .distinct()
      .cache()
    verifyCandidates(withShingles, mh.select($"doc_id", $"n"), cand)
  }

  val dMinhashLshSql: String = {
    val mhCols = (0 until MinHashFns)
      .map(h => s"min(substr(hcat, ${h * 5 + 1}, 5)) AS mh$h").mkString(", ")
    val nBands = MinHashFns / MinHashBandRows
    val bandSelects = (0 until nBands).map { b =>
      val parts = (0 until MinHashBandRows)
        .map(r => s"mh${b * MinHashBandRows + r}").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($parts) AS key FROM mh"
    }.mkString(" UNION ALL ")
    s"""WITH $shinglesSqlCte,
       mtoks AS (SELECT doc_id, sh AS tok FROM shd),
       hs AS (SELECT doc_id, md5(tok) || md5('x' || tok) AS hcat FROM mtoks),
       mh AS (SELECT doc_id, $mhCols FROM hs GROUP BY doc_id),
       bands AS ($bandSelects),
       cand AS (
         SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       sizes AS (SELECT doc_id, COUNT(*) AS n FROM mtoks GROUP BY doc_id),
       common AS (
         SELECT c.i, c.j, COUNT(*) AS common
         FROM cand c
         JOIN mtoks x ON x.doc_id = c.i
         JOIN mtoks y ON y.doc_id = c.j AND y.tok = x.tok
         GROUP BY 1, 2)
       SELECT i, j, CAST(common AS DOUBLE) / (sa.n + sb.n - common) AS jaccard
       FROM common JOIN sizes sa ON sa.doc_id = i JOIN sizes sb ON sb.doc_id = j
       WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.5
       ORDER BY i, j"""
  }

  // ------------------------------------------------------------- simhash
  /** Per-doc SimHash signatures as a BIT STRING at `bits` width: bit j
    * is the sign of Σ(±1) over the doc's shingle hashes, +1 iff md5
    * nibble j ≥ 8. Used by [[dSimhashClusters]] (bits=16 — deliberately
    * small so clustering is visible at test scale, and the string form
    * is what its oracle compares); [[dSimhashPairs]] bands on the packed
    * LONG form from [[simhashSig32Long]] instead, and production widens
    * to 64-bit xxhash64 in [[dSimhashPairsX64]]. */
  private def simhashSigs(s: SparkSession, dir: String, bits: Int): DataFrame = {
    import s.implicits._
    // SHINGLES, not unigram tokens — same lesson as MinHash: over a
    // small shared vocabulary every doc has near-identical token SETS,
    // so unigram SimHash cannot discriminate (measured: 35k pairs at
    // Hamming<=3 even with 32-bit signatures). 3-gram shingles restore
    // discrimination.
    //
    // FUSED map-side (same shape as the MinHash signatures): the whole
    // signature is computed per document over the in-row shingle array —
    // no explode, no `bits`-column aggregation shuffle. Bit j is the
    // sign of Σ(±1) over shingles (+1 iff md5 hex nibble j ≥ '8'), which
    // is equivalent to 2·count_high > n; md5 hex is lowercase so the
    // one-char compare ≥ '8' covers exactly {8,9,a..f}.
    val bcols = (0 until bits).map(j =>
      when(simhashBitCond(j), "1").otherwise("0"))
    simhashHashed(s, dir, bits)
      .select($"doc_id", concat(bcols: _*).as("simhash"))
  }

  /** Packed nibble chunks shared by the signature builders: each md5's
    * first `bits` hex nibbles as 8-nibble (32-bit) integer chunks —
    * `conv` of 8 hex chars stays positive in a bigint cast, and nibble
    * j's high bit (the exact meaning of the oracle's
    * `substr(h, j+1, 1) >= '8'` on lowercase hex) becomes one
    * shift+mask. The cache boundary also keeps the md5/conv transforms
    * out of the per-bit counting passes (project-collapse would inline
    * them per pass). */
  private def simhashHashed(s: SparkSession, dir: String, bits: Int): DataFrame = {
    import s.implicits._
    val nChunks = (bits + 7) / 8
    val chunkCols = (0 until nChunks).map { k =>
      transform($"shs",
        x => conv(substring(md5(x), k * 8 + 1, 8), 16, 10).cast("long"))
        .as(s"hv$k")
    }
    withShingleArrays(s, dir)
      .select(($"doc_id" +: size($"shs").cast("bigint").as("n") +: chunkCols): _*)
      .cache()
  }

  /** Majority condition for signature bit j over the packed chunks:
    * more than half the doc's shingle hashes have nibble j ≥ 8. */
  private def simhashBitCond(j: Int): Column = {
    val (k, i) = (j / 8, j % 8)
    val cnt = aggregate(col(s"hv$k"), lit(0L),
      (acc, v) => acc + shiftright(v, 4 * (7 - i) + 3).bitwiseAND(lit(1L)))
    cnt * 2 > col("n")
  }

  /** 32-bit signature packed into ONE long (bit j of the bit-string at
    * position 31-j, so the string's band b = the long's byte 3-b): the
    * pairs query bands with shift+mask and verifies Hamming with a
    * single bit_count(xor) instead of 32 per-position string compares. */
  private def simhashSig32Long(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sig = (0 until 32).map(j =>
      when(simhashBitCond(j), lit(1L << (31 - j))).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    simhashHashed(s, dir, 32).select($"doc_id", sig.as("sig"))
  }

  def dSimhashClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    simhashSigs(s, dir, bits = 16)
      .groupBy($"simhash")
      .agg(count(lit(1)).as("n_docs"),
        min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
      .filter($"n_docs" > 1)
      .orderBy($"simhash")
  }

  val dSimhashClustersSql: String = {
    val sums = (0 until 16).map { j =>
      s"SUM(CASE WHEN substr(h, ${j + 1}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s$j"
    }.mkString(", ")
    val bits = (0 until 16)
      .map(j => s"(CASE WHEN s$j > 0 THEN '1' ELSE '0' END)").mkString(" || ")
    s"""WITH $shinglesSqlCte,
       hs AS (SELECT doc_id, md5(sh) AS h FROM shd),
       sums AS (SELECT doc_id, $sums FROM hs GROUP BY doc_id),
       sigs AS (SELECT doc_id, $bits AS simhash FROM sums)
       SELECT simhash, COUNT(*) AS n_docs,
         MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
       FROM sigs GROUP BY simhash HAVING COUNT(*) > 1
       ORDER BY simhash"""
  }

  // ------------------------------------------------------ simhash pairs
  /** Near-dup pairs by SimHash Hamming distance ≤ 3 via banded LSH over
    * 32-BIT signatures: 4 bands × 8 bits — by pigeonhole, ≤ 3 differing
    * bits leave at least one band intact, so banding has EXACT recall at
    * this threshold (no probabilistic miss). 16 bits saturates on this
    * corpus (measured: 8.7k identical-signature pairs at sf0.01); 32
    * bits makes band buckets sparse so candidates ∝ real similarity.
    * Hamming verification is 32 per-position comparisons over the
    * candidate set only. Production widens further to 64-bit xxhash64,
    * same plan. */
  def dSimhashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = simhashSig32Long(s, dir).cache()
    val bandStructs = (0 until 4).map(b =>
      struct(lit(b).as("band"),
        shiftright($"sig", 8 * (3 - b)).bitwiseAND(lit(0xFFL)).as("key")))
    val bands = sigs.select($"doc_id", $"sig",
        explode(array(bandStructs: _*)).as("bk"))
      .select($"doc_id", $"sig", $"bk.band".as("band"), $"bk.key".as("key"))
    val cand = bands.as("a").join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.key" === $"b.key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("i"), $"b.doc_id".as("j"),
        $"a.sig".as("sa"), $"b.sig".as("sb"))
      .distinct()
    cand.withColumn("hamming", bit_count($"sa".bitwiseXOR($"sb")).cast("bigint"))
      .filter($"hamming" <= 3)
      .select($"i", $"j", $"hamming")
      .orderBy($"i", $"j")
  }

  val dSimhashPairsSql: String = {
    val sums = (0 until 32).map { j =>
      s"SUM(CASE WHEN substr(h, ${j + 1}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s$j"
    }.mkString(", ")
    val bits = (0 until 32)
      .map(j => s"(CASE WHEN s$j > 0 THEN '1' ELSE '0' END)").mkString(" || ")
    val bandSelects = (0 until 4).map(b =>
      s"SELECT doc_id, simhash, $b AS band, substr(simhash, ${b * 8 + 1}, 8) AS key FROM sigs")
      .mkString(" UNION ALL ")
    val ham = (0 until 32)
      .map(p => s"(CASE WHEN substr(sa, ${p + 1}, 1) = substr(sb, ${p + 1}, 1) THEN 0 ELSE 1 END)")
      .mkString(" + ")
    s"""WITH $shinglesSqlCte,
       hs AS (SELECT doc_id, md5(sh) AS h FROM shd),
       sums AS (SELECT doc_id, $sums FROM hs GROUP BY doc_id),
       sigs AS (SELECT doc_id, $bits AS simhash FROM sums),
       bands AS ($bandSelects),
       cand AS (
         SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
                a.simhash AS sa, b.simhash AS sb
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
       SELECT i, j, CAST($ham AS BIGINT) AS hamming
       FROM cand WHERE $ham <= 3
       ORDER BY i, j"""
  }

  // ----------------------------------------------------------- registry
  // ------------------------------------------- 64-bit production simhash
  /** PRODUCTION SimHash: 64-bit signatures as a single LONG from native
    * `xxhash64` bits — no hex strings anywhere. Same fused map-side
    * shape as [[simhashSigs]]: bit j of the signature is set iff more
    * than half the doc's shingle hashes have bit j set. */
  private def simhashSig64(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashed = withShingleArrays(s, dir)
      .select($"doc_id", size($"shs").cast("bigint").as("n"),
        transform($"shs", x => xxhash64(x)).as("hs"))
      .cache() // boundary: keep the hash transform out of the 64 counting passes
    val sig = (0 until 64).map { j =>
      val cnt = aggregate($"hs", lit(0L),
        (acc, c) => acc + shiftright(c, j).bitwiseAND(lit(1L)))
      when(cnt * 2 > $"n", shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    hashed.select($"doc_id", sig.as("sig"))
  }

  /** Near-dup pairs over 64-bit signatures via banded LSH with
    * pigeonhole-EXACT recall: `maxHamming + 1` bands tile the 64 bits,
    * so ≤ maxHamming differing bits always leave at least one band
    * intact. Hamming verification is one `bit_count(xor)` per candidate
    * — no per-position string compares — and random pairs sit at
    * Hamming ≈ 32 ± 4, so a threshold of 10 admits essentially zero
    * false candidates into the verified output.
    *
    * The threshold is CORPUS-DEPENDENT, not a constant of the
    * algorithm: this corpus plants near-dups at Jaccard ≈ 0.8, which
    * lands at 64-bit Hamming up to 10 (measured), hence 11 bands of
    * 5-6 bits. A web-dedup deployment hunting 0.95+ similarity uses
    * Hamming ≤ 3 → 4 bands of 16 bits with far sparser buckets
    * (Manku et al.'s geometry); narrower targets ⇒ wider bands ⇒
    * better bucket selectivity at scale. Rows-only driver check; the
    * cross-checking spec asserts every planted pair the md5 variant
    * finds is recovered. */
  def dSimhashPairsX64(s: SparkSession, dir: String,
      maxHamming: Int = 10): DataFrame = {
    import s.implicits._
    val sigs = simhashSig64(s, dir).cache()
    val nBands = maxHamming + 1
    val base = 64 / nBands
    val widths = Seq.tabulate(nBands)(b => if (b < 64 % nBands) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _)
    val bandStructs = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftright($"sig", offsets(b))
          .bitwiseAND(lit((1L << widths(b)) - 1L)).as("key"))
    }
    val bands = sigs.select($"doc_id", $"sig",
        explode(array(bandStructs: _*)).as("bk"))
      .select($"doc_id", $"sig", $"bk.band".as("band"), $"bk.key".as("key"))
    val cand = bands.as("a").join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.key" === $"b.key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("i"), $"b.doc_id".as("j"),
        $"a.sig".as("sa"), $"b.sig".as("sb"))
      .distinct()
    cand.withColumn("hamming", bit_count($"sa".bitwiseXOR($"sb")).cast("bigint"))
      .filter($"hamming" <= maxHamming)
      .select($"i", $"j", $"hamming")
      .orderBy($"i", $"j")
  }

  // ------------------------------------------------- winnow overlap
  /** Fuzzy cross-document overlap via winnowing fingerprints (the
    * decontamination shape: find training docs sharing long runs with a
    * benchmark set). Inverted fingerprint index + doc-frequency cap —
    * the same quadratic-blowup guard as [[ShingleDocCap]] — then pairs
    * scored by shared-fingerprint count. Winnowing keeps ~1/w of the
    * shingle hashes, so the index is w× smaller than the n-gram Jaccard
    * index for the same recall of ≥(w+2)-token runs. */
  val WinnowMinShared = 3
  val WinnowFpDocCap = 100

  def dWinnowOverlap(s: SparkSession, dir: String,
      minShared: Int = WinnowMinShared,
      fpDocCap: Int = WinnowFpDocCap): DataFrame = {
    import s.implicits._
    // cache boundary: the fingerprint rows feed the doc-frequency cap
    // AND both sides of the pair join — without it the whole winnowing
    // HOF chain re-runs once per consumer (measured 4×)
    val ex = TextAnalysis.winnowFps(d(s, dir))
      .select($"doc_id", explode($"fps").as("fp"))
      .cache()
    val rare = ex.groupBy($"fp").agg(count(lit(1)).as("df"))
      .filter($"df" <= fpDocCap).select($"fp")
    val exr = ex.join(rare, "fp")
    exr.select($"doc_id".as("i"), $"fp")
      .join(exr.select($"doc_id".as("j"), $"fp"), Seq("fp"))
      .filter($"i" < $"j")
      .groupBy($"i", $"j").agg(count(lit(1)).as("shared_fps"))
      .filter($"shared_fps" >= minShared)
      .orderBy($"i", $"j")
  }

  val dWinnowOverlapSql: String =
    s"""WITH ${TextAnalysis.winnowFpsSqlCte},
       ex AS (SELECT doc_id, unnest(fps) AS fp FROM fps),
       rare AS (SELECT fp FROM ex GROUP BY fp
                HAVING COUNT(*) <= $WinnowFpDocCap),
       exr AS (SELECT doc_id, ex.fp FROM ex JOIN rare ON ex.fp = rare.fp),
       pairs AS (
         SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS shared
         FROM exr a JOIN exr b ON a.fp = b.fp AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
       SELECT i, j, CAST(shared AS BIGINT) AS shared_fps FROM pairs
       WHERE shared >= $WinnowMinShared ORDER BY i, j"""

  // --------------------------------------- cross-source contamination
  /** Cross-source contamination matrix — the audit a decontamination
    * pass starts from: for every SOURCE PAIR, how many distinct
    * winnowing fingerprints they share (which crawls/dumps leak content
    * into each other, and how badly — e.g. a benchmark set against the
    * training sources). Shape: explode fingerprints once, collapse to
    * DISTINCT (fp, source) — the frame is bounded by fingerprints ×
    * sources, and the per-fp self-join fans out at most (#sources
    * choose 2) per fingerprint, with source cardinality bounded by
    * catalog size, never the corpus. One shuffle on fp, one bounded
    * aggregate. */
  def dContaminationMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = d(s, dir)
    val e = TextAnalysis.winnowFps(docs)
      .join(docs.select($"doc_id", $"source"), "doc_id")
      .select(explode($"fps").as("fp"), $"source")
      .distinct()
    e.as("a").join(e.as("b"),
        col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(countDistinct(col("a.fp")).as("n_shared_fps"))
      .orderBy($"source_a", $"source_b")
  }

  val dContaminationMatrixSql: String =
    s"""WITH ${TextAnalysis.winnowFpsSqlCte},
       e AS (
         SELECT DISTINCT f.fp, doc.source
         FROM (SELECT doc_id, unnest(fps) AS fp FROM fps) f
         JOIN documents doc USING (doc_id)),
       p AS (
         SELECT a.fp, a.source AS source_a, b.source AS source_b
         FROM e a JOIN e b ON a.fp = b.fp AND a.source < b.source)
       SELECT source_a, source_b, COUNT(DISTINCT fp) AS n_shared_fps
       FROM p GROUP BY 1, 2 ORDER BY 1, 2"""

  // ----------------------------------------------- incremental dedup
  /** Hash-nibble partition standing in for "already ingested" (12/16 ≈
    * 75%) vs "arriving batch" — key-hash routed like every split in this
    * engine, so the partition survives reshuffles and replays. */
  private val ExistingNibbles =
    Seq("0", "1", "2", "3", "4", "5", "6", "7", "8", "9", "a", "b")

  /** Incremental near-dedup — the accounting a daily-ingest pipeline
    * runs: an arriving batch is deduplicated against the ALREADY-INGESTED
    * corpus first (any batch doc winnow-paired with an existing doc is
    * dropped), then within itself (lowest doc_id of an intra-batch pair
    * wins). Built ON TOP of [[dWinnowOverlap]]'s pair list — the
    * partition labels join onto the (tiny, ∝ near-dup volume) pair set,
    * never the other way around, so the incremental layer adds only a
    * map-side md5 per doc and two pair-sized joins to the overlap cost.
    * Exact-fingerprint is deliberately NOT the signal: this corpus
    * plants near-dups, not byte-dups (0 exact dups — measured). Emits
    * one row: (n_batch, n_dup_vs_existing, n_intra_batch_dup, n_new). */
  def dIncrementalDedup(s: SparkSession, dir: String,
      minShared: Int = WinnowMinShared,
      fpDocCap: Int = WinnowFpDocCap): DataFrame = {
    import s.implicits._
    val parts = d(s, dir).select($"doc_id",
      when(substring(md5($"doc_id".cast("string")), 1, 1)
        .isin(ExistingNibbles: _*), "existing")
        .otherwise("batch").as("part"))
    val pairs = dWinnowOverlap(s, dir, minShared, fpDocCap)
    val pp = pairs
      .join(parts.select($"doc_id".as("i"), $"part".as("pi")), "i")
      .join(parts.select($"doc_id".as("j"), $"part".as("pj")), "j")
      // tiny (∝ near-dup pairs) but expensive to produce — the winnow
      // index join would otherwise re-run for each of the three
      // accounting consumers below
      .cache()
    val dupVsExisting = pp
      .filter($"pi" === "existing" && $"pj" === "batch").select($"j".as("doc_id"))
      .union(pp.filter($"pi" === "batch" && $"pj" === "existing").select($"i".as("doc_id")))
      .distinct()
    val intraBatch = pp
      .filter($"pi" === "batch" && $"pj" === "batch").select($"j".as("doc_id"))
      .distinct()
      .join(dupVsExisting, Seq("doc_id"), "left_anti")
    val nBatch = parts.filter($"part" === "batch")
      .agg(count(lit(1)).as("n_batch"))
    nBatch.crossJoin(dupVsExisting.agg(count(lit(1)).as("n_dup_vs_existing")))
      .crossJoin(intraBatch.agg(count(lit(1)).as("n_intra_batch_dup")))
      .withColumn("n_new",
        $"n_batch" - $"n_dup_vs_existing" - $"n_intra_batch_dup")
  }

  val dIncrementalDedupSql: String = {
    val ex = ExistingNibbles.map(n => s"'$n'").mkString(", ")
    s"""WITH ${TextAnalysis.winnowFpsSqlCte},
       ex AS (SELECT doc_id, unnest(fps) AS fp FROM fps),
       rare AS (SELECT fp FROM ex GROUP BY fp
                HAVING COUNT(*) <= $WinnowFpDocCap),
       exr AS (SELECT doc_id, ex.fp FROM ex JOIN rare ON ex.fp = rare.fp),
       pairs AS (
         SELECT a.doc_id AS i, b.doc_id AS j
         FROM exr a JOIN exr b ON a.fp = b.fp AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING COUNT(*) >= $WinnowMinShared),
       parts AS (
         SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ($ex)
                THEN 'existing' ELSE 'batch' END AS part
         FROM documents),
       pp AS (
         SELECT p.i, p.j, pi.part AS pi, pj.part AS pj
         FROM pairs p
         JOIN parts pi ON p.i = pi.doc_id
         JOIN parts pj ON p.j = pj.doc_id),
       dve AS (
         SELECT j AS doc_id FROM pp WHERE pi = 'existing' AND pj = 'batch'
         UNION
         SELECT i FROM pp WHERE pi = 'batch' AND pj = 'existing'),
       ib AS (
         SELECT j AS doc_id FROM pp WHERE pi = 'batch' AND pj = 'batch'
         EXCEPT SELECT doc_id FROM dve)
       SELECT
         (SELECT COUNT(*) FROM parts WHERE part = 'batch') AS n_batch,
         (SELECT COUNT(*) FROM dve) AS n_dup_vs_existing,
         (SELECT COUNT(*) FROM ib) AS n_intra_batch_dup,
         (SELECT COUNT(*) FROM parts WHERE part = 'batch')
           - (SELECT COUNT(*) FROM dve)
           - (SELECT COUNT(*) FROM ib) AS n_new"""
  }

  // ---------------------------------------------------- cleaning funnel
  /** Minimum token count for the funnel's quality gate (corpus median is
    * ~56 tokens; 30 keeps prose-length docs, drops fragments). */
  val FunnelMinTokens = 30L

  /** The composed corpus-cleaning funnel a training pipeline runs before
    * tokenization: NEAR-dedup survivors → length-based quality gate →
    * language gate. One aggregated row of per-stage survivor counts.
    *
    * The dedup stage is TRANSITIVELY consistent: winnowing-overlap pairs
    * (the same [[dWinnowOverlap]] operator, composed rather than
    * re-implemented) are clustered with [[Components.connectedComponents]]
    * and the minimum doc_id of each component survives — the same total
    * policy `d_dup_components` checks standalone. A pairwise rule
    * ("drop every j") is ill-defined off simple pairs: on a star
    * i1~j, i2~j it keeps both i's even though they are transitive dups
    * of each other's partner, and on a chain it can drop docs whose
    * only dup-partner was itself dropped.
    * (Exact-fingerprint and tier gates are deliberately NOT the stages:
    * this corpus plants near-dups, not byte-dups, and its synthetic prose
    * is tier-uniform — the stages chosen are the ones with real
    * selectivity, each checked standalone by its own oracle query.) */
  def dCorpusFunnel(s: SparkSession, dir: String,
      overlap: Option[DataFrame] = None): DataFrame = {
    import s.implicits._
    val docs = d(s, dir).select($"doc_id", $"lang",
      size(TextAnalysis.tokens($"text")).cast("bigint").as("n_tokens"))
    // callers that already computed the (expensive) overlap pass it in;
    // the registry entry computes it fresh
    val pairs = overlap.getOrElse(dWinnowOverlap(s, dir)).select($"i", $"j")
    val dropped = Components.connectedComponents(pairs)
      .filter($"doc_id" =!= $"component")
      .select($"doc_id")
      .withColumn("is_dup", lit(1L))
    docs.join(dropped, Seq("doc_id"), "left")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when($"is_dup".isNull, 1L).otherwise(0L)).as("n_unique"),
        sum(when($"is_dup".isNull && $"n_tokens" >= FunnelMinTokens, 1L)
          .otherwise(0L)).as("n_quality"),
        sum(when($"is_dup".isNull && $"n_tokens" >= FunnelMinTokens &&
          $"lang" === "en", 1L).otherwise(0L)).as("n_final"))
  }

  val dCorpusFunnelSql: String =
    s"""WITH RECURSIVE ${TextAnalysis.winnowFpsSqlCte},
       ex AS (SELECT doc_id, unnest(fps) AS fp FROM fps),
       rare AS (SELECT fp FROM ex GROUP BY fp
                HAVING COUNT(*) <= $WinnowFpDocCap),
       exr AS (SELECT doc_id, ex.fp FROM ex JOIN rare ON ex.fp = rare.fp),
       pairs AS (
         SELECT a.doc_id AS i, b.doc_id AS j
         FROM exr a JOIN exr b ON a.fp = b.fp AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING COUNT(*) >= $WinnowMinShared),
       edges AS (SELECT i AS src, j AS dst FROM pairs UNION
                 SELECT j, i FROM pairs),
       cc(node, label) AS (
         SELECT DISTINCT src, src FROM edges
         UNION
         SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.node = e.src),
       lab AS (SELECT node, MIN(label) AS component FROM cc GROUP BY node),
       dropped AS (SELECT node AS doc_id FROM lab WHERE node <> component),
       ann AS (
         SELECT t.doc_id, d.lang, len(t.wt) AS n_tokens,
           (dr.doc_id IS NOT NULL) AS is_dup
         FROM toks t
         JOIN documents d ON t.doc_id = d.doc_id
         LEFT JOIN dropped dr ON t.doc_id = dr.doc_id)
       SELECT COUNT(*) AS n_total,
         CAST(SUM(CASE WHEN NOT is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
         CAST(SUM(CASE WHEN NOT is_dup AND n_tokens >= $FunnelMinTokens THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         CAST(SUM(CASE WHEN NOT is_dup AND n_tokens >= $FunnelMinTokens AND lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_final
       FROM ann"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d_exact_stats" -> (dExactStats _),
    "d_winnow_overlap" -> ((s: SparkSession, dir: String) => dWinnowOverlap(s, dir)),
    "d_corpus_funnel" -> ((s: SparkSession, dir: String) => dCorpusFunnel(s, dir)),
    "d_incremental_dedup" -> ((s: SparkSession, dir: String) => dIncrementalDedup(s, dir)),
    "d_ngram_jaccard" -> (dNgramJaccard _),
    "d_minhash_lsh" -> (dMinhashLsh _),
    "d_minhash_lsh_x64" -> (dMinhashLshX64 _),
    "d_simhash_clusters" -> (dSimhashClusters _),
    "d_simhash_pairs" -> (dSimhashPairs _),
    "d_simhash_pairs_x64" -> ((s: SparkSession, dir: String) => dSimhashPairsX64(s, dir)),
    "d_contamination_matrix" -> (dContaminationMatrix _))

  val oracle: Map[String, String] = Map(
    "d_exact_stats" -> dExactStatsSql,
    "d_winnow_overlap" -> dWinnowOverlapSql,
    "d_corpus_funnel" -> dCorpusFunnelSql,
    "d_incremental_dedup" -> dIncrementalDedupSql,
    "d_ngram_jaccard" -> dNgramJaccardSql,
    "d_minhash_lsh" -> dMinhashLshSql,
    "d_simhash_clusters" -> dSimhashClustersSql,
    "d_simhash_pairs" -> dSimhashPairsSql,
    "d_contamination_matrix" -> dContaminationMatrixSql)
}
