package graft.operators

import graft.model.Defaults
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Declared provider capabilities implemented natively (SURVEY §2.C):
  * P5 knowledge-base search with source filter + match_count, P6
  * weighted hybrid scoring, and the DOCUMENTED accurate-mode
  * multi-provider merge (union → dedup by id → rerank) that the
  * reference's code simplifies away (`retrieval_router.py:47-52` vs
  * `conversational-retrieval-contract.md:124-130`).
  *
  * Cross-engine determinism: all score components are rational
  * arithmetic over exact integers (no transcendentals — recency decay is
  * 1/(1+age) rather than exp(-age/τ), which libm would round differently
  * per engine); weighted sums are written in one fixed left-associative
  * expression on both sides.
  */
object HybridRetrieval {

  private def docs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .withColumn("confidence", Shared.syntheticConfidence($"doc_id"))
  }

  private val confSql = Shared.syntheticConfidenceSql

  // ---------------------------------------------------------------- P5
  /** P5: RAG knowledge-base search with source filter + match_count
    * (reference `reference/archon-workflow.md:38-57`:
    * `rag_search_knowledge_base(query, source_id, match_count=5)`).
    * = R4 top-k with a pushed source predicate. */
  def p5SourceFilteredSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .filter($"source" === "src7" && length(trim($"text")) > 0)
      .orderBy($"confidence".desc, $"doc_id")
      .limit(Defaults.TopK)
      .select($"doc_id".as("id"), $"source", $"confidence")
  }

  val p5Sql: String =
    s"""SELECT doc_id AS id, source, $confSql AS confidence
       FROM documents WHERE source = 'src7' AND len(trim(text)) > 0
       ORDER BY confidence DESC, doc_id LIMIT ${Defaults.TopK}"""

  // ---------------------------------------------------------------- P6
  /** P6: weighted hybrid rerank — confidence/recency/relevance/
    * channel-fit/success-signal weights (reference
    * `requests/ultima-second-brain-hybrid-retrieval-plan #1.md:196-202`).
    * Weights 0.3/0.2/0.3/0.1/0.1; recency is the rational decay
    * 1/(1+doc_id/500) (newest-id proxy), relevance is probe-term
    * overlap, channel fit and success signal are deterministic CASEs. */
  val HybridQuery = "spark window join"

  def p6HybridScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = TextAnalysis.tokens($"text")
    val terms = HybridQuery.toLowerCase.split("\\s+").distinct
    val overlap: Column = terms
      .map(t => when(array_contains(toks, t), 1).otherwise(0))
      .reduce[Column](_ + _)
    docs(s, dir)
      .withColumn("recency", lit(1.0) / (lit(1.0) + $"doc_id".cast("double") / 500.0))
      .withColumn("relevance", overlap.cast("double") / terms.length)
      .withColumn("channel_fit", when($"lang" === "en", 1.0).otherwise(0.3))
      .withColumn("success_signal",
        when($"source".isin("src1", "src2", "src3"), 0.8).otherwise(0.5))
      // rounded to 6dp: the weighted sum differs by 1 ulp across engines
      // (FMA contraction), which a raw hash compare would flag
      .withColumn("score",
        round($"confidence" * 0.3 + $"recency" * 0.2 + $"relevance" * 0.3 +
          $"channel_fit" * 0.1 + $"success_signal" * 0.1, 6))
      .select($"doc_id", $"score")
      .orderBy($"score".desc, $"doc_id")
      .limit(10)
  }

  val p6Sql: String = {
    val terms = HybridQuery.toLowerCase.split("\\s+").distinct
    val toks = "string_split_regex(lower(text), '\\s+')"
    val overlap = terms
      .map(t => s"(CASE WHEN list_contains($toks, '$t') THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH f AS (
         SELECT doc_id,
           $confSql AS confidence,
           1.0 / (1.0 + CAST(doc_id AS DOUBLE) / 500.0) AS recency,
           CAST($overlap AS DOUBLE) / ${terms.length} AS relevance,
           CASE WHEN lang = 'en' THEN 1.0 ELSE 0.3 END AS channel_fit,
           CASE WHEN source IN ('src1','src2','src3') THEN 0.8 ELSE 0.5 END AS success_signal
         FROM documents)
       SELECT doc_id,
         round(confidence * 0.3 + recency * 0.2 + relevance * 0.3 +
           channel_fit * 0.1 + success_signal * 0.1, 6) AS score
       FROM f ORDER BY score DESC, doc_id LIMIT 10"""
  }

  // ------------------------------------------------- accurate-mode merge
  /** Documented accurate-mode semantics: query BOTH providers, union,
    * dedup by id keeping the higher-confidence hit (provider name as the
    * deterministic tiebreak), then top-k. Providers are simulated as two
    * overlapping views of `documents` with provider-specific confidence
    * adjustments. At scale each provider scan is pruned independently
    * and the dedup window shuffles once on id. */
  def accurateMerge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = docs(s, dir)
    val provA = base.filter($"doc_id" % 2 === 0)
      .select($"doc_id", lit("mem0").as("provider"), $"confidence")
    val provB = base.filter($"doc_id" % 3 === 0)
      .select($"doc_id", lit("supabase").as("provider"),
        ($"confidence" * 0.9).as("confidence"))
    val merged = provA.unionByName(provB)
    val w = Window.partitionBy($"doc_id")
      .orderBy($"confidence".desc, $"provider")
    merged
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"doc_id", $"provider", $"confidence")
      .orderBy($"confidence".desc, $"doc_id")
      .limit(10)
  }

  val accurateMergeSql: String =
    s"""WITH a AS (
         SELECT doc_id, 'mem0' AS provider, $confSql AS confidence
         FROM documents WHERE doc_id % 2 = 0),
       b AS (
         SELECT doc_id, 'supabase' AS provider, ($confSql) * 0.9 AS confidence
         FROM documents WHERE doc_id % 3 = 0),
       m AS (SELECT * FROM a UNION ALL SELECT * FROM b),
       r AS (SELECT doc_id, provider, confidence,
               row_number() OVER (PARTITION BY doc_id ORDER BY confidence DESC, provider) AS rn
             FROM m)
       SELECT doc_id, provider, confidence FROM r WHERE rn = 1
       ORDER BY confidence DESC, doc_id LIMIT 10"""

  // ----------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p5_source_filtered_search" -> (p5SourceFilteredSearch _),
    "p6_hybrid_score" -> (p6HybridScore _),
    "p_accurate_merge" -> (accurateMerge _))

  val oracle: Map[String, String] = Map(
    "p5_source_filtered_search" -> p5Sql,
    "p6_hybrid_score" -> p6Sql,
    "p_accurate_merge" -> accurateMergeSql)
}
