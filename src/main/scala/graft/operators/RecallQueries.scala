package graft.operators

import graft.model.Defaults
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The recall engine's data-flow operators (R4/R7/R9/R11) lifted to the
  * relational surface over driver testdata, so the DuckDB oracle can
  * hash-check the exact semantics the orchestrator runs (SURVEY §2.A).
  *
  * `documents` stands in as the memory store; a synthetic deterministic
  * confidence `(doc_id·37 mod 100)/100` gives full coverage of both
  * sides of the 0.6 threshold on both engines (exact integer math, then
  * one double division).
  */
object RecallQueries {

  private def candidates(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .withColumn("confidence", Shared.syntheticConfidence($"doc_id"))
  }

  private val confSql = Shared.syntheticConfidenceSql

  // --------------------------------------------------------------- R4
  /** R4: guard-filter → sort desc → limit top_k → normalize projection
    * (reference `services/memory.py:25-87`). `orderBy().limit()` compiles
    * to TakeOrderedAndProject: per-partition top-k, k-row merge — the
    * 100 TB-safe shape. Threshold deliberately NOT applied (anti-pushdown
    * semantics, `memory.py:82`). */
  def r4TopkMemory(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    candidates(s, dir)
      .filter(length(trim($"text")) > 0)
      .orderBy($"confidence".desc, $"doc_id")
      .limit(Defaults.TopK)
      .select($"doc_id".as("id"), substring($"text", 1, 40).as("content"),
        $"source", $"confidence")
  }

  val r4Sql: String =
    s"""SELECT doc_id AS id, substr(text, 1, 40) AS content, source,
         $confSql AS confidence
       FROM documents WHERE len(trim(text)) > 0
       ORDER BY confidence DESC, doc_id LIMIT ${Defaults.TopK}"""

  // --------------------------------------------------------------- R7
  /** R7: term-overlap rerank (reference `services/voyage.py:54-88`) —
    * overlap of distinct query terms against the content token set,
    * `conf' = min(1.0, conf + 0.05·overlap)`, top-10. */
  val RerankQuery = "spark data window query join"

  def r7RerankBoost(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    candidates(s, dir)
      .withColumn("adj_confidence",
        Rerank.scoreColumn(RerankQuery, $"confidence", $"text"))
      .select($"doc_id", $"confidence", $"adj_confidence")
      .orderBy($"adj_confidence".desc, $"doc_id")
      .limit(10)
  }

  val r7Sql: String = {
    val terms = RerankQuery.toLowerCase.split("\\s+").distinct
    val toks = "string_split_regex(lower(text), '\\s+')"
    val overlap = terms
      .map(t => s"(CASE WHEN list_contains($toks, '$t') THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""SELECT doc_id, $confSql AS confidence,
         least(1.0, $confSql + CAST($overlap AS DOUBLE) * 0.05) AS adj_confidence
       FROM documents
       ORDER BY adj_confidence DESC, doc_id LIMIT 10"""
  }

  // --------------------------------------------------------------- R9
  /** R9+R11 per group: confidence aggregation + ordered CASE branch
    * classification (reference `orchestration/fallbacks.py:162-199`),
    * one row per source. Strict `<` keeps threshold-equal as met.
    *
    * The provider UNIVERSE (sources + a provider with no documents)
    * left-joins the aggregates so the EMPTY_SET branch is actually
    * reachable — a bare groupBy drops empty groups and could never emit
    * the reference's fallback state. */
  def r9BranchPerSource(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val aggs = candidates(s, dir)
      .groupBy($"source")
      .agg(max($"confidence").as("top_confidence"),
        count(lit(1)).as("candidate_count"))
    val universe = candidates(s, dir).select($"source").distinct()
      .unionByName(Seq("src_none").toDF("source"))
    universe.join(aggs, Seq("source"), "left")
      .withColumn("candidate_count",
        coalesce($"candidate_count", lit(0L)))
      .withColumn("top_confidence",
        coalesce($"top_confidence", lit(0.0)))
      .withColumn("branch",
        when($"candidate_count" === 0, "EMPTY_SET")
          .when($"top_confidence" < Defaults.Threshold, "LOW_CONFIDENCE")
          .otherwise("SUCCESS"))
      .withColumn("threshold_met", $"top_confidence" >= Defaults.Threshold)
      .orderBy($"source")
  }

  val r9Sql: String =
    s"""WITH aggs AS (
         SELECT source, MAX($confSql) AS top_confidence,
                COUNT(*) AS candidate_count
         FROM documents GROUP BY source),
       universe AS (
         SELECT DISTINCT source FROM documents
         UNION ALL SELECT 'src_none'),
       j AS (
         SELECT u.source,
                COALESCE(a.top_confidence, 0.0) AS top_confidence,
                CAST(COALESCE(a.candidate_count, 0) AS BIGINT) AS candidate_count
         FROM universe u LEFT JOIN aggs a ON u.source = a.source)
       SELECT source, top_confidence, candidate_count,
         CASE WHEN candidate_count = 0 THEN 'EMPTY_SET'
              WHEN top_confidence < ${Defaults.Threshold} THEN 'LOW_CONFIDENCE'
              ELSE 'SUCCESS' END AS branch,
         top_confidence >= ${Defaults.Threshold} AS threshold_met
       FROM j ORDER BY source"""

  // --------------------------------------------------------------- R11
  /** R11: global confidence summary — the single aggregate row the
    * envelope carries (reference `fallbacks.py:26-31`). */
  def r11ConfidenceSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    candidates(s, dir)
      .agg(max($"confidence").as("top_confidence"),
        count(lit(1)).as("candidate_count"))
      .withColumn("threshold_met", $"top_confidence" >= Defaults.Threshold)
  }

  val r11Sql: String =
    s"""SELECT MAX($confSql) AS top_confidence, COUNT(*) AS candidate_count,
         MAX($confSql) >= ${Defaults.Threshold} AS threshold_met
       FROM documents"""

  // --------------------------------------------------------------- R12
  /** R12 distributed envelope assembly: per source, the top-k candidates
    * packed as an ORDERED array of structs + summary fields — the
    * `collect_list(struct(...))` form of ContextPacket (reference
    * `schemas.py:25-57`, SURVEY §1.1). sort_array over (negated conf,
    * doc_id) keys gives a deterministic candidate order without relying
    * on collect_list's input ordering (which shuffles at scale). */
  def r12EnvelopePerSource(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Window top-k BEFORE collect_list so the aggregation buffer holds at
    // most top_k structs per source (collect_list over the raw group
    // would materialize the whole group — unbounded at scale). Full-group
    // summary stats ride along as unbounded window aggregates over the
    // same partitioning, so the single source-shuffle is shared.
    val bySource = org.apache.spark.sql.expressions.Window.partitionBy($"source")
    val ranked = candidates(s, dir)
      .withColumn("rn", row_number().over(
        bySource.orderBy($"confidence".desc, $"doc_id")))
      .withColumn("top_confidence", max($"confidence").over(bySource))
      .withColumn("candidate_count", count(lit(1)).over(bySource))
      .filter($"rn" <= Defaults.TopK)
    ranked
      .groupBy($"source", $"top_confidence", $"candidate_count")
      .agg(sort_array(collect_list(struct(
        $"rn", $"doc_id".as("id"), $"confidence".as("confidence"))))
        .as("sorted_top"))
      .select($"source",
        transform($"sorted_top", c =>
          struct(c.getField("id").as("id"),
            c.getField("confidence").as("confidence"))).as("candidates"),
        $"top_confidence",
        ($"top_confidence" >= Defaults.Threshold).as("threshold_met"),
        $"candidate_count")
      .orderBy($"source")
  }

  /** The verify-facing shape of R12: assemble the envelope exactly as
    * [[r12EnvelopePerSource]], then posexplode the candidate array back to
    * one scalar row per (source, rank). The explode proves the array's
    * deterministic internal ordering (pos ↔ rank), and scalar columns let
    * the driver hash-compare against a DuckDB window-top-k oracle —
    * nested arrays-of-structs don't survive its pandas sort. */
  def r12EnvelopeFlat(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    r12EnvelopePerSource(s, dir)
      .select($"source", $"top_confidence", $"threshold_met",
        $"candidate_count", posexplode($"candidates"))
      .select($"source", ($"pos" + 1).cast("bigint").as("rank"),
        $"col.id".as("id"), $"col.confidence".as("confidence"),
        $"top_confidence", $"threshold_met", $"candidate_count")
      .orderBy($"source", $"rank")
  }

  /** Driver-facing form of [[r12EnvelopePerSource]]: same envelope, with the
    * candidates array serialized to a canonical JSON string at the output
    * boundary. The driver's rows-only harness sorts results in pandas, which
    * cannot sort (or even hash-count) array-of-struct cells — round-3's
    * CORRECTNESS run proved it with a numpy `unhashable type` crash — so
    * every registered query must emit scalar columns only. Library users
    * call [[r12EnvelopePerSource]] for the true nested shape;
    * [[r12EnvelopeFlat]] remains the hash-compared scalar twin. */
  def r12EnvelopeJson(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    r12EnvelopePerSource(s, dir)
      .withColumn("candidates", to_json($"candidates"))
  }

  val r12Sql: String =
    s"""WITH ranked AS (
         SELECT source, doc_id, $confSql AS confidence,
           CAST(row_number() OVER (PARTITION BY source
             ORDER BY $confSql DESC, doc_id) AS BIGINT) AS rank,
           MAX($confSql) OVER (PARTITION BY source) AS top_confidence,
           COUNT(*) OVER (PARTITION BY source) AS candidate_count
         FROM documents)
       SELECT source, rank, doc_id AS id, confidence, top_confidence,
         top_confidence >= ${Defaults.Threshold} AS threshold_met,
         candidate_count
       FROM ranked WHERE rank <= ${Defaults.TopK}
       ORDER BY source, rank"""

  // ----------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r4_topk_memory" -> (r4TopkMemory _),
    "r7_rerank_boost" -> (r7RerankBoost _),
    "r9_branch_per_source" -> (r9BranchPerSource _),
    "r11_confidence_summary" -> (r11ConfidenceSummary _),
    // name ↔ shape: _per_source is the real nested-envelope operator,
    // registered through its JSON-serialized boundary form (rows-only —
    // the driver's pandas harness can't sort/hash array cells); _flat is
    // its posexploded scalar twin that DOES hash-compare, proving the
    // array's deterministic internal order. (Round-2 bench note:
    // r12_envelope_per_source timed the flat shape that round; from
    // round 3 the names match the shapes.)
    "r12_envelope_per_source" -> (r12EnvelopeJson _),
    "r12_envelope_flat" -> (r12EnvelopeFlat _))

  val oracle: Map[String, String] = Map(
    "r4_topk_memory" -> r4Sql,
    "r7_rerank_boost" -> r7Sql,
    "r9_branch_per_source" -> r9Sql,
    "r11_confidence_summary" -> r11Sql,
    "r12_envelope_flat" -> r12Sql)
}
