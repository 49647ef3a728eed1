package graft.operators

import graft.model._
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** R4 + R5: memory search = guard → sort → limit → normalize, plus the
  * deterministic keyword-routed fixture source (reference
  * `backend/src/second_brain/services/memory.py:25-141`).
  *
  * The threshold is deliberately NOT applied at scan time — branch
  * determination downstream must see low-confidence rows
  * (`memory.py:82`, SURVEY §4 "anti-pushdown"). Encoded here by simply
  * not filtering; a test pins the semantics.
  *
  * Scale note: `orderBy(desc).limit(k)` compiles to Spark's
  * TakeOrderedAndProject — per-partition top-k then a k-row merge on the
  * driver, no full sort/shuffle — exactly the 100 TB-safe top-k shape.
  * Per-query batched top-k (many queries at once) is
  * `Window.partitionBy("query_id")` + `row_number <= k`, used by the
  * relational surface in RecallQueries.
  */
final class MemorySearch(val provider: String = Providers.Mem0) {

  /** R4. Returns (candidates, provider metadata). Sort gets an `id`
    * tiebreak beyond the reference's confidence-only stable sort, making
    * the distributed sort total (determinism mandate, SURVEY §4). */
  def searchMemories(
      source: Dataset[MemorySearchResult],
      query: String,
      topK: Int = Defaults.TopK,
      rerank: Boolean = true): (Seq[ContextCandidate], Map[String, String]) = {
    if (query == null || query.trim.isEmpty)
      return (Seq.empty, Map("provider" -> provider, "query_empty" -> "true"))

    val top = source
      .orderBy(desc("confidence"), asc("id"))
      .limit(topK)
      .collect()
      .toSeq
    val candidates = top.map(r =>
      ContextCandidate(r.id, r.content, r.source, r.confidence, r.metadata))
    val meta = Map(
      "provider" -> provider,
      "rerank_applied" ->
        (if (provider == Providers.Mem0) rerank else false).toString,
      "raw_count" -> top.size.toString)
    (candidates, meta)
  }
}

object MemorySearch {

  /** R5: deterministic keyword-routed fixture rows
    * (`memory.py:89-141`) — the mock scan the golden scenarios replay.
    * Confidence tiers: 0.85/0.72 default, 0.5 degraded, 0.45 low, 0 rows
    * empty (BASELINE.md §B). */
  def fixtureRows(query: String, provider: String): Seq[MemorySearchResult] = {
    val q = query.toLowerCase
    if (q.contains("empty") || q.contains("no candidate")) Seq.empty
    else if (q.contains("low confidence")) Seq(
      MemorySearchResult("mock-low-1", s"Low confidence result for: $query",
        provider, 0.45, Map("mock" -> "true", "low_conf" -> "true")))
    else if (q.contains("degraded")) Seq(
      MemorySearchResult("mock-degraded-1", s"Degraded result for: $query",
        provider, 0.5, Map("mock" -> "true", "degraded" -> "true")))
    else Seq(
      MemorySearchResult("mock-1", s"High confidence result for: $query",
        provider, 0.85, Map("mock" -> "true")),
      MemorySearchResult("mock-2", s"Secondary result for: $query",
        provider, 0.72, Map("mock" -> "true")))
  }

  /** Fixture source as a Dataset (test/scenario path). */
  def fixtureSource(
      spark: SparkSession,
      query: String,
      provider: String): Dataset[MemorySearchResult] = {
    import spark.implicits._
    spark.createDataset(fixtureRows(query, provider))
  }
}
