package graft.operators

import graft.model._
import org.apache.spark.sql.{Dataset, SparkSession}

/** End-to-end recall composition (reference
  * `backend/src/second_brain/agents/recall.py:37-276`):
  * route (R1–R3) → scan/search (R4) → policy-gated rerank (R6–R8) →
  * classify (R9–R11) → envelope + routing metadata (R12–R13), with the
  * debug-only forced-branch hook (R14).
  *
  * The `memorySource` function maps a provider name to its candidate
  * Dataset — in production a provider-specific table scan (the routing
  * decision prunes all other sources); in tests the R5 fixture source.
  */
final class RecallOrchestrator(
    spark: SparkSession,
    memorySource: (String, String) => Dataset[MemorySearchResult],
    flags: FeatureFlags = FeatureFlags(),
    status: ProviderStatus = ProviderStatus(),
    rerankService: RerankService = new RerankService(enabled = true)) {

  private def snapshot: Map[String, String] = Map(
    "feature_flags_snapshot" -> Seq(
      s"mem0_enabled=${flags.mem0Enabled}",
      s"supabase_enabled=${flags.supabaseEnabled}",
      s"graphiti_enabled=${flags.graphitiEnabled}",
      s"external_rerank_enabled=${flags.externalRerankEnabled}",
      s"mem0_external_override=${flags.mem0ExternalOverride}").mkString(","),
    "provider_status_snapshot" ->
      status.status.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(","))

  /** R13: routing-metadata projection (`recall.py:146-162`). Quirk
    * replicated: `mode` is hardcoded to "conversation" here (the
    * reference comments "Could be from request"); the no-provider early
    * exit is the only path that reports the request mode. */
  private def routingMetadata(
      provider: String,
      skipExternalRerank: Boolean,
      rerankMeta: Map[String, String]): Map[String, String] = {
    val base = Map(
      "selected_provider" -> provider,
      "mode" -> Modes.Conversation,
      "skip_external_rerank" -> skipExternalRerank.toString,
      "rerank_type" -> rerankMeta.getOrElse("rerank_type", RerankTypes.None_))
    val reason = rerankMeta.get("rerank_bypass_reason")
      .map("rerank_bypass_reason" -> _)
    base ++ reason ++ snapshot
  }

  def run(
      request: RetrievalRequest,
      validationMode: Boolean = false,
      forceBranch: Option[String] = None): RetrievalResponse = {
    // Step 1: route (driver-side source pruning).
    val route = RetrievalRouter.route(request, status, flags)

    if (route.provider == Providers.None_) {
      val (packet, action) = BranchClassifier.emitEmptySet(Providers.None_)
      return RetrievalResponse(packet, action, Map(
        "selected_provider" -> Providers.None_,
        "mode" -> request.mode,
        "skip_external_rerank" -> "false",
        "rerank_type" -> RerankTypes.None_) ++ snapshot)
    }

    // Step 2: distributed top-k retrieval from the routed source.
    val search = new MemorySearch(route.provider)
    val (retrieved, _) = search.searchMemories(
      memorySource(route.provider, request.query), request.query,
      request.topK, rerank = !route.skipExternalRerank)

    // Step 3: external-rerank policy gate (R8) — the duplicate-rerank-
    // elimination rule (reference `retrieval-overlap-policy.md:19-58`).
    var rerankMeta: Map[String, String] = Map("rerank_type" -> RerankTypes.None_)
    var candidates = retrieved
    if (!route.skipExternalRerank && candidates.nonEmpty && flags.externalRerankEnabled) {
      val (reranked, meta) = rerankService.rerank(request.query, candidates, request.topK)
      candidates = reranked
      rerankMeta = meta
    } else if (route.skipExternalRerank) {
      rerankMeta = Map(
        "rerank_type" -> RerankTypes.ProviderNative,
        "rerank_bypass_reason" -> "mem0-default-policy")
    } else if (!flags.externalRerankEnabled && candidates.nonEmpty) {
      rerankMeta = Map(
        "rerank_type" -> RerankTypes.None_,
        "rerank_bypass_reason" -> "external_rerank_disabled")
    }

    // Step 4: classify + envelope (with R14 forced-branch debug hook).
    if (validationMode && forceBranch.isDefined) {
      val meta = routingMetadata(route.provider, route.skipExternalRerank, rerankMeta) ++
        Map("validation_mode" -> "true", "forced_branch" -> forceBranch.get)
      val (packet, action) = forceBranchOutput(
        candidates, forceBranch.get, route.provider,
        route.skipExternalRerank, request.threshold)
      RetrievalResponse(packet, action, meta)
    } else {
      val (packet, action) = BranchClassifier.determineBranch(
        candidates, request.threshold, route.skipExternalRerank, route.provider)
      RetrievalResponse(packet, action,
        routingMetadata(route.provider, route.skipExternalRerank, rerankMeta))
    }
  }

  /** R14: debug-only branch override (`recall.py:164-229`). Never on the
    * production path (gated by validationMode && forceBranch). */
  private def forceBranchOutput(
      candidates: Seq[ContextCandidate],
      forceBranch: String,
      provider: String,
      skipExternalRerank: Boolean,
      threshold: Double): (ContextPacket, NextAction) = forceBranch match {
    case Branches.EmptySet => BranchClassifier.emitEmptySet(provider)
    case Branches.LowConfidence =>
      val lowered = candidates.map(_.copy(confidence = 0.4))
      BranchClassifier.emitLowConfidence(lowered, 0.4, threshold, provider)
    case Branches.ChannelMismatch =>
      BranchClassifier.emitChannelMismatch(candidates, "test_channel", provider)
    case Branches.RerankBypassed =>
      val cs = if (candidates.nonEmpty) candidates else Seq(
        ContextCandidate("forced", "Forced rerank bypass", provider, 0.85, Map.empty))
      BranchClassifier.emitRerankBypassed(cs, provider)
    case Branches.Success =>
      val cs = if (candidates.nonEmpty) candidates else Seq(
        ContextCandidate("forced", "Forced success", provider, 0.9, Map.empty))
      BranchClassifier.emitSuccess(cs, provider, rerankApplied = skipExternalRerank)
    case _ =>
      BranchClassifier.determineBranch(candidates, threshold, skipExternalRerank, provider)
  }
}

object RecallOrchestrator {
  /** Convenience runner against the deterministic fixture source
    * (reference `recall.py:232-276` `run_recall`). */
  def runRecall(
      spark: SparkSession,
      query: String,
      mode: String = Modes.Conversation,
      topK: Int = Defaults.TopK,
      threshold: Double = Defaults.Threshold,
      providerOverride: Option[String] = None,
      flags: FeatureFlags = FeatureFlags(),
      status: ProviderStatus = ProviderStatus(),
      validationMode: Boolean = false,
      forceBranch: Option[String] = None): RetrievalResponse = {
    val orch = new RecallOrchestrator(
      spark,
      (provider, q) => MemorySearch.fixtureSource(spark, q, provider),
      flags, status)
    orch.run(
      RetrievalRequest(query, mode, topK, threshold, providerOverride),
      validationMode, forceBranch)
  }
}
