package graft.validation

import graft.model._

/** Golden branch-scenario catalog (reference
  * `backend/src/second_brain/validation/manual_branch_scenarios.py:23-280`).
  *
  * Scenario flag/status dicts in the reference are PARTIAL — absent flags
  * fall back to defaults (mem0 on, supabase on, graphiti off, external
  * rerank on; `retrieval_router.py:63-76`, `recall.py:87`), absent
  * statuses read as unavailable. The catalog stores the resolved
  * [[FeatureFlags]]/[[ProviderStatus]] with those rules already applied.
  */
final case class BranchScenario(
    id: String,
    description: String,
    request: RetrievalRequest,
    status: ProviderStatus,
    flags: FeatureFlags,
    expectedBranch: String,
    expectedAction: String,
    expectedRerankType: String,
    tags: Set[String],
    notes: String = "")

object Scenarios {

  private def st(pairs: (String, String)*): ProviderStatus =
    ProviderStatus(pairs.toMap)

  val all: Seq[BranchScenario] = Seq(
    BranchScenario("S001", "Conversation Mem0 high confidence",
      RetrievalRequest("test high confidence query"),
      st(Providers.Mem0 -> "available", Providers.Supabase -> "available"),
      FeatureFlags(),
      Branches.RerankBypassed, Actions.Proceed, RerankTypes.ProviderNative,
      Set("smoke", "policy")),
    BranchScenario("S002", "Conversation Mem0 no candidates",
      RetrievalRequest("empty set query"),
      st(Providers.Mem0 -> "available"),
      FeatureFlags(supabaseEnabled = false),
      Branches.EmptySet, Actions.Fallback, RerankTypes.None_,
      Set("smoke", "edge")),
    BranchScenario("S003", "Conversation Mem0 low confidence",
      RetrievalRequest("low confidence query"),
      st(Providers.Mem0 -> "available"),
      FeatureFlags(),
      Branches.LowConfidence, Actions.Clarify, RerankTypes.ProviderNative,
      Set("smoke", "edge")),
    BranchScenario("S004", "Conversation Supabase high confidence",
      RetrievalRequest("supabase query"),
      st(Providers.Mem0 -> "unavailable", Providers.Supabase -> "available"),
      FeatureFlags(mem0Enabled = false),
      Branches.Success, Actions.Proceed, RerankTypes.External,
      Set("smoke")),
    BranchScenario("S022", "Rerank service disabled",
      RetrievalRequest("rerank disabled query", mode = Modes.Fast),
      st(Providers.Mem0 -> "unavailable", Providers.Supabase -> "available"),
      FeatureFlags(mem0Enabled = false, externalRerankEnabled = false),
      Branches.Success, Actions.Proceed, RerankTypes.None_,
      Set("policy")),
    BranchScenario("S025", "Mem0 external override on",
      RetrievalRequest("mem0 override query"),
      st(Providers.Mem0 -> "available"),
      FeatureFlags(mem0ExternalOverride = true),
      Branches.RerankBypassed, Actions.Proceed, RerankTypes.ProviderNative,
      Set("policy"),
      "Mem0 policy still skips external even with override flag"),
    BranchScenario("S026", "Mem0 external override off default",
      RetrievalRequest("mem0 default query"),
      st(Providers.Mem0 -> "available"),
      FeatureFlags(),
      Branches.RerankBypassed, Actions.Proceed, RerankTypes.ProviderNative,
      Set("policy")),
    BranchScenario("S015", "Mem0 degraded, Supabase available fallback",
      RetrievalRequest("degraded mem0 query"),
      st(Providers.Mem0 -> "degraded", Providers.Supabase -> "available"),
      FeatureFlags(),
      Branches.LowConfidence, Actions.Clarify, RerankTypes.None_,
      Set("degraded"),
      "Falls back to supabase when mem0 degraded, returns low confidence"),
    BranchScenario("S016", "Mem0 available, Supabase degraded",
      RetrievalRequest("mem0 primary query"),
      st(Providers.Mem0 -> "available", Providers.Supabase -> "degraded"),
      FeatureFlags(),
      Branches.RerankBypassed, Actions.Proceed, RerankTypes.ProviderNative,
      Set("degraded")),
    BranchScenario("S013", "All providers disabled",
      RetrievalRequest("no providers query"),
      st(),
      FeatureFlags(mem0Enabled = false, supabaseEnabled = false),
      Branches.EmptySet, Actions.Fallback, RerankTypes.None_,
      Set("edge")),
    BranchScenario("S014", "All providers unavailable",
      RetrievalRequest("all unavailable query"),
      st(Providers.Mem0 -> "unavailable", Providers.Supabase -> "unavailable"),
      FeatureFlags(),
      Branches.EmptySet, Actions.Fallback, RerankTypes.None_,
      Set("edge")),
    BranchScenario("S027", "Channel mismatch forced validation",
      RetrievalRequest("channel mismatch query"),
      st(Providers.Mem0 -> "available"),
      FeatureFlags(),
      Branches.ChannelMismatch, Actions.Escalate, RerankTypes.None_,
      Set("edge", "validation"),
      "Requires validation_mode=True and force_branch"),
    BranchScenario("S048", "Deterministic replay test 1",
      RetrievalRequest("deterministic test query"),
      st(Providers.Mem0 -> "available"),
      FeatureFlags(),
      Branches.RerankBypassed, Actions.Proceed, RerankTypes.ProviderNative,
      Set("policy", "deterministic")),
  )

  /** X8: point lookup (`manual_branch_scenarios.py:250-255`). */
  def byId(id: String): Option[BranchScenario] = all.find(_.id == id)

  /** X8: tag filter (`manual_branch_scenarios.py:258-260`). */
  def byTag(tag: String): Seq[BranchScenario] = all.filter(_.tags.contains(tag))
}
