package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (north-star
  * mandate, SURVEY §2.D): token counting, quality scoring, language-ID
  * heuristic, document fingerprinting. All computed with codegen'd
  * built-ins (split / higher-order functions / md5) — no UDFs — and each
  * with a DuckDB oracle.
  *
  * Shared tokenization contract (must stay in lockstep with the oracle
  * SQL): lowercase, split on `\s+`, drop empty tokens.
  */
object TextAnalysis {

  /** English stopword probe list used by quality + lang-id scoring. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Tokens column: lowercase, whitespace-split, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  private def d(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // -------------------------------------------------------- token stats
  /** Per-source token statistics — the "token counting" operator rolled
    * up to corpus accounting (what a training-data pipeline budgets by).
    * One scan, map-side partial aggregation, 20-group shuffle. */
  def tTokenStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    d(s, dir)
      .withColumn("n_tokens", size(tokens($"text")).cast("bigint"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("total_tokens"),
        min($"n_tokens").as("min_tokens"),
        max($"n_tokens").as("max_tokens"))
      .orderBy($"source")
  }

  val tTokenStatsSql: String =
    """WITH t AS (SELECT source,
         CAST(len(list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')) AS BIGINT) AS n_tokens
       FROM documents)
       SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens
       FROM t GROUP BY source ORDER BY source"""

  // ------------------------------------------------------ quality score
  /** Per-document quality features: token count, mean token length,
    * stopword ratio, uppercase-start flag — then a rule-ordered quality
    * tier (same first-match-wins CASE contract as branch classification).
    * Ratios are plain double divisions of exact integers — deterministic
    * cross-engine without rounding. */
  def tQualityScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = tokens($"text")
    val nTok = size(toks).cast("bigint")
    // membership count of the probe list (each probe word counts once)
    val nStop = Stopwords
      .map(w => when(array_contains(toks, w), 1).otherwise(0))
      .reduce[Column](_ + _)
      .cast("bigint")
    val charLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    d(s, dir)
      .withColumn("n_tokens", nTok)
      .withColumn("n_stopword_hits", nStop)
      // explicit NULL for zero-token docs: Spark's 0.0/0 is NaN while
      // DuckDB's list_sum([])/0 is NULL — pin both engines to NULL
      .withColumn("mean_token_len",
        when($"n_tokens" === 0, lit(null))
          .otherwise(charLen.cast("double") / $"n_tokens"))
      .withColumn("stopword_ratio",
        $"n_stopword_hits".cast("double") / lit(Stopwords.size))
      .withColumn("tier",
        when($"n_tokens" < 10, "TOO_SHORT")
          .when($"stopword_ratio" >= 0.5, "NATURAL")
          .when($"mean_token_len" > 8.0, "JARGON")
          .otherwise("LIST_LIKE"))
      .select($"doc_id", $"n_tokens", $"n_stopword_hits",
        $"mean_token_len", $"stopword_ratio", $"tier")
      .orderBy($"doc_id")
  }

  val tQualityScoreSql: String = {
    val hits = Stopwords
      .map(w => s"(CASE WHEN list_contains(toks, '$w') THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH t AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS toks
         FROM documents),
       f AS (
         SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST($hits AS BIGINT) AS n_stopword_hits,
           CASE WHEN len(toks) = 0 THEN NULL
                ELSE CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
           END AS mean_token_len
         FROM t)
       SELECT doc_id, n_tokens, n_stopword_hits, mean_token_len,
         CAST(n_stopword_hits AS DOUBLE) / ${Stopwords.size} AS stopword_ratio,
         CASE WHEN n_tokens < 10 THEN 'TOO_SHORT'
              WHEN CAST(n_stopword_hits AS DOUBLE) / ${Stopwords.size} >= 0.5 THEN 'NATURAL'
              WHEN mean_token_len > 8.0 THEN 'JARGON'
              ELSE 'LIST_LIKE' END AS tier
       FROM f ORDER BY doc_id"""
  }

  // ----------------------------------------------------------- lang id
  /** N-gram/stopword language-ID heuristic: per-language probe-hit votes
    * with a deterministic argmax (tie broken by fixed language order),
    * then a confusion rollup against the labeled `lang` column. */
  val LangProbes: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "es" -> Seq("el", "la", "de", "que", "con"),
    "de" -> Seq("der", "die", "und", "ist", "mit"))

  def tLangId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = tokens($"text")
    def score(probes: Seq[String]): Column = probes
      .map(w => when(array_contains(toks, w), 1).otherwise(0))
      .reduce[Column](_ + _)
    val scored = d(s, dir)
      .withColumn("s_en", score(LangProbes(0)._2))
      .withColumn("s_es", score(LangProbes(1)._2))
      .withColumn("s_de", score(LangProbes(2)._2))
    scored
      .withColumn("guess",
        when($"s_en" === 0 && $"s_es" === 0 && $"s_de" === 0, "unknown")
          .when($"s_en" >= $"s_es" && $"s_en" >= $"s_de", "en")
          .when($"s_es" >= $"s_de", "es")
          .otherwise("de"))
      .groupBy($"lang", $"guess")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"lang", $"guess")
  }

  val tLangIdSql: String = {
    def hits(probes: Seq[String]) = probes
      .map(w => s"(CASE WHEN list_contains(toks, '$w') THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH t AS (
         SELECT lang,
           list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS toks
         FROM documents),
       sc AS (SELECT lang, ${hits(LangProbes(0)._2)} AS s_en,
                     ${hits(LangProbes(1)._2)} AS s_es,
                     ${hits(LangProbes(2)._2)} AS s_de FROM t)
       SELECT lang,
         CASE WHEN s_en = 0 AND s_es = 0 AND s_de = 0 THEN 'unknown'
              WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
              WHEN s_es >= s_de THEN 'es'
              ELSE 'de' END AS guess,
         COUNT(*) AS n_docs
       FROM sc GROUP BY 1, 2 ORDER BY lang, guess"""
  }

  // -------------------------------------------------------- fingerprint
  /** Document fingerprint: md5 over whitespace-normalized lowercase text.
    * md5 hex output is byte-identical across engines, making this the
    * portable content-hash primitive the dedup operators build on. */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  def tFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    d(s, dir)
      .select($"doc_id", md5(normText($"text")).as("fingerprint"))
      .orderBy($"doc_id")
  }

  val tFingerprintSql: String =
    """SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
       FROM documents ORDER BY doc_id"""

  // ----------------------------------------------------------- winnowing
  /** Winnowing window width (documents ≥ WinnowW+2 tokens participate). */
  val WinnowW = 4

  /** MOSS-style winnowing fingerprints (Schleimer/Wilkerson/Aiken): hash
    * every POSITIONAL word-3-gram (ordered, not deduped — winnowing
    * needs document order), then take the minimum hash of each sliding
    * window of [[WinnowW]] consecutive shingles; the distinct window
    * minima are the document's fingerprint set. Guarantees any shared
    * substring of ≥ w+2 tokens contributes a shared fingerprint — the
    * rolling local-sampling property that makes fuzzy-overlap detection
    * work at corpus scale with ~1/w of the hashes. All map-side array
    * HOFs (no explode, no shuffle before the final projection); md5 hex
    * minima compare lexicographically identically on both engines. */
  /** Core winnowing projection: (doc_id, text) → (doc_id, fps) where
    * fps is the distinct fingerprint ARRAY. Kept separate so overlap
    * detection (fingerprint-join two corpora) and the property test can
    * reuse it. */
  def winnowFps(docs: DataFrame): DataFrame = {
    val w = WinnowW
    // Cache boundary between the hash array and the window mins: without
    // it project-collapse inlines the md5 transform into EVERY window's
    // slice, recomputing the full digest array per window — O(shingles²)
    // digests per doc (measured 18 s vs ~2 s at sf0.1).
    val hashed = docs
      .select(col("doc_id"), tokens(col("text")).as("wt"))
      // BEFORE the transform: under ANSI mode a <3-token doc makes
      // sequence(0, size-3) descend and wt[i+2] throws
      // INVALID_ARRAY_INDEX (and a 0-token doc would otherwise emit
      // bogus md5('') fingerprints the oracle never sees)
      .filter(size(col("wt")) >= 3)
      .withColumn("h", expr(
        "transform(sequence(0, size(wt)-3), i -> md5(concat_ws(' ', wt[i], wt[i+1], wt[i+2])))"))
      .filter(size(col("h")) >= w)
      .select(col("doc_id"), col("h"))
      .cache()
    hashed
      .withColumn("fps", expr(
        s"array_distinct(transform(sequence(0, size(h)-$w), i -> array_min(slice(h, i+1, $w))))"))
      .select(col("doc_id"), col("fps"))
  }

  def tWinnowFingerprints(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    winnowFps(d(s, dir))
      .select($"doc_id", size($"fps").cast("bigint").as("n_fingerprints"),
        array_min($"fps").as("min_fp"), array_max($"fps").as("max_fp"))
      .filter($"doc_id" < 50)
      .orderBy($"doc_id")
  }

  /** Shared DuckDB CTE chain for winnowing fingerprints — the SQL twin
    * of [[winnowFps]], interpolated into every winnowing oracle (same
    * single-source pattern as Dedup's `shinglesSqlCte`). Yields a `fps`
    * relation of (doc_id, fps). */
  val winnowFpsSqlCte: String =
    s"""toks AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS wt
         FROM documents),
       hs AS (
         SELECT doc_id,
           list_transform(generate_series(1, len(wt) - 2),
             i -> md5(wt[i] || ' ' || wt[i+1] || ' ' || wt[i+2])) AS h
         FROM toks WHERE len(wt) >= 3),
       fps AS (
         SELECT doc_id,
           list_distinct(list_transform(generate_series(1, len(h) - ${WinnowW - 1}),
             i -> list_min(h[i:i+${WinnowW - 1}]))) AS fps
         FROM hs WHERE len(h) >= $WinnowW)"""

  val tWinnowSql: String =
    s"""WITH $winnowFpsSqlCte
       SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fingerprints,
         list_min(fps) AS min_fp, list_max(fps) AS max_fp
       FROM fps WHERE doc_id < 50 ORDER BY doc_id"""

  // --------------------------------------------------- repetition stats
  /** Gopher-style repetition thresholds (Rae et al. 2021 §A1.1 use the
    * same feature family — duplicate-n-gram fractions — as removal
    * rules). Tuned to THIS corpus's measured distribution so both flag
    * values are populated: distinct-token ratio p25 ≈ 0.36, top-bigram
    * fraction p90 ≈ 0.07 → ~22% of docs flag repetitive. */
  val RepetitionDistinctRatioMin = 0.35
  val RepetitionTopBigramFracMax = 0.1

  /** Per-document repetition features — the quality-filter family that
    * removes degenerate/boilerplate text from a training corpus:
    * distinct-token ratio (map-side `array_distinct`, no shuffle) and
    * most-frequent-bigram fraction. The bigram mode is computed by
    * explode → (doc_id, gram) partial-agg count → per-doc max: one
    * shuffle of O(tokens) rows with map-side combine — the shape that
    * survives long documents, unlike an O(grams²)/doc in-array
    * frequency scan. Ratios are plain double divisions of exact ints
    * (cross-engine deterministic); the `repetitive` flag is the ordered
    * OR of the two Gopher-ish rules. */
  def tRepetitionStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Cache boundary BEFORE the explode (the winnowing lesson): the
    // Generate's implicit `size(grams) > 0` predicate otherwise pushes
    // below this projection and INLINES the whole tokenize+gram chain —
    // and inside the gram lambda `element_at(filter(split(...)), i)`
    // re-tokenizes PER GRAM INDEX, O(tokens²)/doc (measured 13 s vs
    // 0.9 s at sf0.1). The cache pins one evaluation per row that both
    // the scalar projection and the explode read.
    val toks = d(s, dir)
      .select($"doc_id", tokens($"text").as("toks"))
      .withColumn("n_tokens", size($"toks").cast("bigint"))
      .withColumn("n_distinct", size(array_distinct($"toks")).cast("bigint"))
      // guard: sequence(1, 0) DESCENDS in Spark, so an empty/1-token doc
      // must short-circuit to an empty gram array explicitly
      .withColumn("grams",
        when(size($"toks") > 1,
          transform(sequence(lit(1), size($"toks") - 1),
            i => concat_ws(" ", element_at($"toks", i), element_at($"toks", i + 1))))
          .otherwise(array().cast("array<string>")))
      .cache()
    val topGram = toks
      .select($"doc_id", explode($"grams").as("g"))
      .groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(max($"c").as("top_bigram_n"))
    toks.join(topGram, Seq("doc_id"), "left")
      .withColumn("top_bigram_n", coalesce($"top_bigram_n", lit(0L)))
      .withColumn("distinct_ratio",
        when($"n_tokens" > 0, $"n_distinct".cast("double") / $"n_tokens")
          .otherwise(lit(1.0)))
      .withColumn("top_bigram_frac",
        when($"n_tokens" > 1, $"top_bigram_n".cast("double") / ($"n_tokens" - 1))
          .otherwise(lit(0.0)))
      .withColumn("repetitive",
        $"distinct_ratio" < RepetitionDistinctRatioMin ||
          $"top_bigram_frac" > RepetitionTopBigramFracMax)
      .select($"doc_id", $"n_tokens", $"n_distinct", $"top_bigram_n",
        $"distinct_ratio", $"top_bigram_frac", $"repetitive")
      .orderBy($"doc_id")
  }

  val tRepetitionSql: String =
    s"""WITH t AS (
         SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS toks
         FROM documents),
       b AS (
         SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           CASE WHEN len(toks) > 1 THEN
             list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])
             ELSE []::VARCHAR[] END AS grams
         FROM t),
       g AS (SELECT doc_id, unnest(grams) AS g FROM b),
       gc AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY 1, 2),
       topg AS (SELECT doc_id AS tg_id, MAX(c) AS top_bigram_n FROM gc GROUP BY 1),
       f AS (
         SELECT b.doc_id, n_tokens, n_distinct,
           CAST(COALESCE(top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
           CASE WHEN n_tokens > 0 THEN CAST(n_distinct AS DOUBLE) / n_tokens
                ELSE 1.0 END AS distinct_ratio,
           CASE WHEN n_tokens > 1 THEN CAST(COALESCE(top_bigram_n, 0) AS DOUBLE) / (n_tokens - 1)
                ELSE 0.0 END AS top_bigram_frac
         FROM b LEFT JOIN topg ON b.doc_id = topg.tg_id)
       SELECT doc_id, n_tokens, n_distinct, top_bigram_n, distinct_ratio,
         top_bigram_frac,
         distinct_ratio < $RepetitionDistinctRatioMin
           OR top_bigram_frac > $RepetitionTopBigramFracMax AS repetitive
       FROM f ORDER BY doc_id"""

  // ------------------------------------------------------- chunk windows
  /** RAG-ingestion chunk geometry: 32-token windows, stride 24 (8-token
    * overlap) — overlap preserves cross-boundary context for retrieval,
    * stride bounds the blowup to ~n/stride chunks per doc. */
  val ChunkSize = 32
  val ChunkStride = 24

  /** Fixed-size overlapping token windows per document — the chunking
    * step a retrieval/embedding pipeline runs before vectorizing (the
    * reference's corpus ingestion shape: docs → chunks → embeddings).
    * Map-side 1→N: window starts come from an integer `sequence`, the
    * chunk itself is a `slice` of the cached token array, and each chunk
    * carries an md5 fingerprint (chunk-level dedup key) plus its token
    * span. No shuffle until the final presentation sort; at 100 TB
    * chunks write straight to a chunk table partitioned like the lake
    * layout, so the sort disappears entirely. */
  def tChunkWindows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // cache boundary: doc_id/toks/n feed the start-sequence Generate AND
    // the per-chunk slice projections — same inlining hazard as the
    // repetition operator's gram chain
    val toks = d(s, dir)
      .select($"doc_id", tokens($"text").as("toks"))
      .withColumn("n", size($"toks").cast("bigint"))
      .filter($"n" > 0)
      .cache()
    toks
      .select($"doc_id", $"toks", $"n",
        posexplode(sequence(lit(0L), $"n" - 1, lit(ChunkStride.toLong))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "start_tok")
      .withColumn("chunk_idx", $"chunk_idx".cast("bigint"))
      .withColumn("chunk_toks",
        slice($"toks", ($"start_tok" + 1).cast("int"), lit(ChunkSize)))
      .select($"doc_id", $"chunk_idx", $"start_tok",
        size($"chunk_toks").cast("bigint").as("n_chunk_tokens"),
        md5(concat_ws(" ", $"chunk_toks")).as("chunk_fp"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  val tChunkWindowsSql: String =
    s"""WITH t AS (
         SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS toks,
           CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')) AS BIGINT) AS n
         FROM documents),
       st AS (
         SELECT doc_id, toks, n,
           CAST(i.gen AS BIGINT) AS start_tok,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i.gen) - 1 AS BIGINT) AS chunk_idx
         FROM t, UNNEST(generate_series(0, n - 1, $ChunkStride)) AS i(gen)
         WHERE n > 0)
       SELECT doc_id, chunk_idx, start_tok,
         CAST(len(list_slice(toks, start_tok + 1, start_tok + $ChunkSize)) AS BIGINT) AS n_chunk_tokens,
         md5(array_to_string(list_slice(toks, start_tok + 1, start_tok + $ChunkSize), ' ')) AS chunk_fp
       FROM st ORDER BY doc_id, chunk_idx"""

  // ----------------------------------------------------- vocab coverage
  /** Head size for the vocabulary-coverage report. */
  val VocabTopK = 20

  /** Vocabulary head coverage — the Zipf diagnostic a tokenizer design
    * starts from: the top-K corpus tokens by frequency with cumulative
    * counts against the total. Scale shape: map-side explode + partial
    * aggregation into one count per DISTINCT token, then a distributed
    * top-K (`orderBy.limit` plans TakeOrdered — never a global sort),
    * and the cumulative window runs over K rows only. The total rides
    * a 1-row aggregate cross-join (broadcast by size). Ties break on
    * the token string, so the head set is deterministic. */
  def tVocabCoverage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val counts = d(s, dir)
      .select(explode(tokens($"text")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("n"))
    val top = counts.orderBy($"n".desc, $"tok").limit(VocabTopK)
    val w = Window.orderBy($"n".desc, $"tok")
    top
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .withColumn("cum_n",
        sum($"n").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(counts.agg(sum($"n").as("total_n")))
      .select($"rank", $"tok", $"n", $"cum_n", $"total_n")
      .orderBy($"rank")
  }

  val tVocabCoverageSql: String =
    s"""WITH tok AS (
         SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
           x -> x != '')) AS tok
         FROM documents),
       counts AS (SELECT tok, COUNT(*) AS n FROM tok GROUP BY tok),
       top AS (SELECT tok, n FROM counts ORDER BY n DESC, tok LIMIT $VocabTopK),
       tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total_n FROM counts)
       SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS BIGINT) AS rank,
         tok, n,
         CAST(SUM(n) OVER (ORDER BY n DESC, tok ROWS UNBOUNDED PRECEDING)
           AS BIGINT) AS cum_n,
         total_n
       FROM top, tot ORDER BY rank"""

  // ---------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_repetition_stats" -> (tRepetitionStats _),
    "t_chunk_windows" -> (tChunkWindows _),
    "t_token_stats" -> (tTokenStats _),
    "t_quality_score" -> (tQualityScore _),
    "t_lang_id" -> (tLangId _),
    "t_fingerprint" -> (tFingerprint _),
    "t_winnow_fingerprints" -> (tWinnowFingerprints _),
    "t_vocab_coverage" -> (tVocabCoverage _))

  val oracle: Map[String, String] = Map(
    "t_repetition_stats" -> tRepetitionSql,
    "t_chunk_windows" -> tChunkWindowsSql,
    "t_token_stats" -> tTokenStatsSql,
    "t_quality_score" -> tQualityScoreSql,
    "t_lang_id" -> tLangIdSql,
    "t_fingerprint" -> tFingerprintSql,
    "t_winnow_fingerprints" -> tWinnowSql,
    "t_vocab_coverage" -> tVocabCoverageSql)
}
