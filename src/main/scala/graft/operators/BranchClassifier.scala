package graft.operators

import graft.model._

/** R9–R11: branch classification + deterministic emitters (reference
  * `backend/src/second_brain/orchestration/fallbacks.py:21-199`).
  *
  * Rule ORDER is semantics (`fallbacks.py:180-198`): EMPTY_SET, then
  * LOW_CONFIDENCE (strict `<`, so threshold-equal counts as met —
  * scenario S017 "threshold_exact_match"), then RERANK_BYPASSED (mem0
  * only), then SUCCESS. LOW_CONFIDENCE deliberately outranks
  * RERANK_BYPASSED.
  *
  * The candidates list arriving here is already the distributed top-k
  * (≤ top_k rows), so this step is O(k) driver-side envelope assembly;
  * the relational/at-scale form of the same CASE chain lives in
  * `RecallQueries.classify` as a single codegen'd expression.
  */
object BranchClassifier {

  private def iso: String = java.time.Instant.now().toString

  def emitEmptySet(provider: String = "unknown"): (ContextPacket, NextAction) = (
    ContextPacket(Seq.empty,
      ConfidenceSummary(0.0, 0, threshold_met = false, Branches.EmptySet),
      provider, rerank_applied = false, iso),
    NextAction(Actions.Fallback,
      "No context candidates retrieved from any provider",
      Branches.EmptySet,
      Some("Ask user to rephrase query or provide more context")))

  def emitLowConfidence(
      candidates: Seq[ContextCandidate],
      topConfidence: Double,
      threshold: Double,
      provider: String = "unknown"): (ContextPacket, NextAction) = (
    ContextPacket(candidates,
      ConfidenceSummary(topConfidence, candidates.size,
        threshold_met = false, Branches.LowConfidence),
      provider, rerank_applied = false, iso),
    NextAction(Actions.Clarify,
      // Locale.ROOT: the default-locale f-interpolator would print comma
      // decimals on e.g. a German JVM, breaking determinism and parity
      String.format(java.util.Locale.ROOT,
        "Top confidence %.2f below threshold %.2f",
        Double.box(topConfidence), Double.box(threshold)),
      Branches.LowConfidence,
      Some("Request clarification on query intent or narrow scope")))

  def emitChannelMismatch(
      candidates: Seq[ContextCandidate],
      expectedChannel: String,
      provider: String = "unknown"): (ContextPacket, NextAction) = (
    ContextPacket(candidates,
      ConfidenceSummary(
        candidates.headOption.map(_.confidence).getOrElse(0.0),
        candidates.size, threshold_met = false, Branches.ChannelMismatch),
      provider, rerank_applied = false, iso),
    NextAction(Actions.Escalate,
      s"Retrieved context doesn't match expected channel: $expectedChannel",
      Branches.ChannelMismatch,
      Some("Escalate to human or trigger intent reclassification")))

  /** Quirk replicated: threshold_met compares against the HARDCODED 0.6,
    * not the request threshold (`fallbacks.py:115`, SURVEY §7.4 risk 4);
    * rerank_applied=true because provider-native rerank ran. */
  def emitRerankBypassed(
      candidates: Seq[ContextCandidate],
      provider: String = Providers.Mem0): (ContextPacket, NextAction) = {
    val top = candidates.headOption.map(_.confidence).getOrElse(0.0)
    (ContextPacket(candidates,
      ConfidenceSummary(top, candidates.size,
        threshold_met = top >= Defaults.RerankBypassedHardcodedThreshold,
        Branches.RerankBypassed),
      provider, rerank_applied = true, iso),
    NextAction(Actions.Proceed,
      "Provider-native rerank applied, external rerank bypassed per policy",
      Branches.RerankBypassed, None))
  }

  def emitSuccess(
      candidates: Seq[ContextCandidate],
      provider: String = "unknown",
      rerankApplied: Boolean = false): (ContextPacket, NextAction) = {
    val top = candidates.headOption.map(_.confidence).getOrElse(0.0)
    (ContextPacket(candidates,
      ConfidenceSummary(top, candidates.size,
        threshold_met = true, Branches.Success),
      provider, rerank_applied = rerankApplied, iso),
    NextAction(Actions.Proceed,
      s"Retrieved ${candidates.size} high-confidence candidates",
      Branches.Success, None))
  }

  /** R9: ordered classification (`fallbacks.py:162-199`). Candidates must
    * arrive sorted by confidence desc — top_confidence is `head`, not
    * max, replicating the reference's reliance on sortedness. */
  def determineBranch(
      candidates: Seq[ContextCandidate],
      threshold: Double = Defaults.Threshold,
      rerankBypassed: Boolean = false,
      provider: String = "unknown"): (ContextPacket, NextAction) = {
    if (candidates.isEmpty) emitEmptySet(provider)
    else {
      val top = candidates.head.confidence
      if (top < threshold)
        emitLowConfidence(candidates, top, threshold, provider)
      else if (rerankBypassed && provider == Providers.Mem0)
        emitRerankBypassed(candidates, provider)
      else
        emitSuccess(candidates, provider, rerankApplied = rerankBypassed)
    }
  }
}
