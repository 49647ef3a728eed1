package graft.model

/** Typed contracts of the recall engine — Spark-native re-expression of the
  * reference's Pydantic v2 models (reference
  * `backend/src/second_brain/contracts/context_packet.py:6-53`).
  *
  * Pydantic's `Field(ge=0.0, le=1.0)` bound on confidence becomes a
  * construction-time `require`; `dict[str, Any]` metadata becomes
  * `Map[String, String]` (stringification rule: values rendered with
  * `String.valueOf`, documented in SURVEY §7.4 risk 3).
  */

/** One retrieval hit (reference `context_packet.py:6-12`). */
final case class ContextCandidate(
    id: String,
    content: String,
    source: String,
    confidence: Double,
    metadata: Map[String, String]) {
  require(confidence >= 0.0 && confidence <= 1.0,
    s"confidence must be in [0,1], got $confidence")
}

/** Aggregate over candidates (reference `context_packet.py:15-21`). */
final case class ConfidenceSummary(
    top_confidence: Double,
    candidate_count: Int,
    threshold_met: Boolean,
    branch: String)

/** Result envelope (reference `context_packet.py:23-30`). Timestamp is an
  * ISO-8601 UTC string, excluded from determinism comparisons. */
final case class ContextPacket(
    candidates: Seq[ContextCandidate],
    summary: ConfidenceSummary,
    provider: String,
    rerank_applied: Boolean,
    timestamp: String)

/** Actionability verdict (reference `context_packet.py:32-37`). */
final case class NextAction(
    action: String,
    reason: String,
    branch_code: String,
    suggestion: Option[String]) {
  require(Actions.all.contains(action), s"unknown action $action")
}

/** Query object (reference `context_packet.py:40-47`). */
final case class RetrievalRequest(
    query: String,
    mode: String = Modes.Conversation,
    topK: Int = Defaults.TopK,
    threshold: Double = Defaults.Threshold,
    providerOverride: Option[String] = None) {
  require(topK >= 1, "top_k must be >= 1")
  require(threshold >= 0.0 && threshold <= 1.0, "threshold must be in [0,1]")
  require(Modes.all.contains(mode), s"unknown mode $mode")
}

/** Top-level result (reference `context_packet.py:49-53`). */
final case class RetrievalResponse(
    contextPacket: ContextPacket,
    nextAction: NextAction,
    routingMetadata: Map[String, String])

/** Provider-raw hit (reference `services/memory.py:7-14`); normalized 1:1
  * into [[ContextCandidate]] by the R4 projection. */
final case class MemorySearchResult(
    id: String,
    content: String,
    source: String,
    confidence: Double,
    metadata: Map[String, String])

/** Branch codes are a stability contract: "Branch codes never change without
  * major version" (reference
  * `docs/architecture/conversational-retrieval-contract.md:119`). */
object Branches {
  val EmptySet = "EMPTY_SET"
  val LowConfidence = "LOW_CONFIDENCE"
  val ChannelMismatch = "CHANNEL_MISMATCH"
  val RerankBypassed = "RERANK_BYPASSED"
  val Success = "SUCCESS"
  val all: Set[String] =
    Set(EmptySet, LowConfidence, ChannelMismatch, RerankBypassed, Success)
}

/** Action literals (reference `context_packet.py:33`). */
object Actions {
  val Proceed = "proceed"
  val Clarify = "clarify"
  val Fallback = "fallback"
  val Escalate = "escalate"
  val all: Set[String] = Set(Proceed, Clarify, Fallback, Escalate)
}

/** Retrieval modes (reference `context_packet.py:43`). */
object Modes {
  val Fast = "fast"
  val Accurate = "accurate"
  val Conversation = "conversation"
  val all: Set[String] = Set(Fast, Accurate, Conversation)
}

/** Provider names + status literals (reference
  * `orchestration/retrieval_router.py:5-13`). */
object Providers {
  val Mem0 = "mem0"
  val Supabase = "supabase"
  val Graphiti = "graphiti"
  val None_ = "none"
  /** Fixed priority order used by fast-mode routing
    * (reference `retrieval_router.py:33-38`). */
  val order: Seq[String] = Seq(Mem0, Supabase, Graphiti)

  val Available = "available"
  val Degraded = "degraded"
  val Unavailable = "unavailable"
}

/** Rerank type literals recorded in routing metadata
  * (reference `agents/recall.py:91-102`). */
object RerankTypes {
  val ProviderNative = "provider-native"
  val External = "external"
  val None_ = "none"
}

/** Feature flags (reference `deps.py:7-14` defaults). */
/** mem0ExternalOverride exists only to mirror the reference's
  * `mem0_external_override` flag, which the engine deliberately IGNORES
  * (Mem0 policy wins — scenario S025); provider enablement order is
  * routing policy and lives in RetrievalRouter.enabledProviders. */
final case class FeatureFlags(
    mem0Enabled: Boolean = true,
    supabaseEnabled: Boolean = true,
    graphitiEnabled: Boolean = false,
    externalRerankEnabled: Boolean = true,
    mem0ExternalOverride: Boolean = false)

/** Engine defaults (reference `deps.py:44-52`,
  * `context_packet.py:43-45`). */
object Defaults {
  val TopK = 5
  val Threshold = 0.6
  val Mode: String = Modes.Conversation
  /** Rerank boost per overlapping term, capped at 1.0
    * (reference `services/voyage.py:74`). */
  val RerankBoostPerTerm = 0.05
  /** RERANK_BYPASSED emitter's hardcoded threshold — deliberately ignores
    * the request threshold; replicated for parity (reference
    * `orchestration/fallbacks.py:115`, SURVEY §7.4 risk 4). */
  val RerankBypassedHardcodedThreshold = 0.6
  /** Default external rerank model name (reference `voyage.py:9`). */
  val RerankModel = "rerank-2"
}

/** Provider status snapshot (reference `deps.py:17-25` defaults). */
final case class ProviderStatus(status: Map[String, String] = Map(
    Providers.Mem0 -> Providers.Available,
    Providers.Supabase -> Providers.Available,
    Providers.Graphiti -> Providers.Unavailable)) {
  def of(p: String): String =
    status.getOrElse(p, Providers.Unavailable)
}
