package graft.operators

import graft.model._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** R6–R8: external rerank (term-overlap scoring model of Voyage
  * `rerank-2`) with bypass guards (reference
  * `backend/src/second_brain/services/voyage.py:13-88`).
  *
  * `overlap = |distinct(query tokens) ∩ distinct(content tokens)|`,
  * `confidence' = min(1.0, confidence + 0.05·overlap)`, then sort desc +
  * take top-k.
  *
  * The scoring is exposed two ways:
  *  - [[Rerank.scoreColumn]]: a codegen-friendly Column expression
  *    (array_contains over split tokens — stays inside whole-stage
  *    codegen) for the distributed relational surface;
  *  - [[RerankService.rerank]]: the driver-side envelope path over the
  *    ≤ top_k collected candidates, replicating the bypass metadata.
  */
object Rerank {

  /** Adjusted-confidence Column for a constant query string. Distinct
    * query terms are folded into a sum of `array_contains` tests, which
    * matches Python's set-intersection semantics without depending on
    * engine-specific array-dedup behavior. */
  def scoreColumn(query: String, confidence: Column, content: Column): Column = {
    val qTerms = query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
    val toks = split(lower(content), "\\s+")
    val overlap = qTerms
      .map(t => when(array_contains(toks, t), 1).otherwise(0))
      .reduceOption(_ + _)
      .getOrElse(lit(0))
    least(lit(1.0), confidence + overlap.cast("double") * lit(Defaults.RerankBoostPerTerm))
  }

  /** Scala-side scoring for the driver envelope path — same formula. */
  def score(query: String, candidate: ContextCandidate): Double = {
    val qTerms = query.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    val cTerms = candidate.content.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    val overlap = (qTerms & cTerms).size
    math.min(1.0, candidate.confidence + overlap * Defaults.RerankBoostPerTerm)
  }
}

/** External rerank service with the reference's bypass guards
  * (`voyage.py:36-52`): disabled → `disabled`; empty → `no_candidates`;
  * single candidate → `single_candidate`; else rerank with
  * `rerank_type=external`. */
final class RerankService(
    val enabled: Boolean = true,
    val model: String = Defaults.RerankModel) {

  def rerank(
      query: String,
      candidates: Seq[ContextCandidate],
      topK: Int = Defaults.TopK): (Seq[ContextCandidate], Map[String, String]) = {
    val base = Map("rerank_type" -> RerankTypes.None_, "rerank_model" -> model)
    if (!enabled || candidates.isEmpty) {
      val reason = if (!enabled) "disabled" else "no_candidates"
      (candidates, base + ("bypass_reason" -> reason))
    } else if (candidates.size == 1) {
      (candidates, base + ("bypass_reason" -> "single_candidate"))
    } else {
      val rescored = candidates.map { c =>
        val adjusted = Rerank.score(query, c)
        (adjusted, c.copy(
          confidence = adjusted,
          metadata = c.metadata + ("rerank_adjusted" -> "true")))
      }
      // Stable sort by adjusted confidence desc (ties keep input order,
      // matching Python's stable list.sort).
      val reranked = rescored.sortBy(-_._1).map(_._2).take(topK)
      (reranked, base + ("rerank_type" -> RerankTypes.External))
    }
  }
}
