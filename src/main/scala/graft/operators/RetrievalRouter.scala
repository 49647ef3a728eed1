package graft.operators

import graft.model._

/** R1–R3: deterministic provider routing (reference
  * `backend/src/second_brain/orchestration/retrieval_router.py:16-116`).
  *
  * Pure driver-side config dispatch — no data flow, so no Catalyst. The
  * decision selects which source table/Dataset gets scanned; at cluster
  * scale this is source pruning (an entire provider scan is skipped).
  */
object RetrievalRouter {

  final case class Route(provider: String, skipExternalRerank: Boolean)

  /** R2: feature-flag gating. Order quirk replicated from the reference
    * (`retrieval_router.py:63-76`): graphiti first when enabled, then
    * mem0, then supabase — this ordering is load-bearing for `accurate`
    * mode and the degraded fallback. */
  def enabledProviders(flags: FeatureFlags): Seq[String] = {
    val b = Seq.newBuilder[String]
    if (flags.graphitiEnabled) b += Providers.Graphiti
    if (flags.mem0Enabled) b += Providers.Mem0
    if (flags.supabaseEnabled) b += Providers.Supabase
    b.result()
  }

  /** The duplicate-rerank-elimination policy: mem0 always skips the
    * external rerank (reference
    * `docs/architecture/retrieval-overlap-policy.md:19-25`). Single
    * definition shared by every routing path. */
  private def skipFor(p: String): Boolean = p == Providers.Mem0

  /** R1: mode-based deterministic selection
    * (`retrieval_router.py:16-60`). */
  def selectRoute(
      mode: String,
      available: Seq[String],
      status: ProviderStatus): Route = {
    if (available.isEmpty) return Route(Providers.None_, skipExternalRerank = false)

    val picked: Option[Route] = mode match {
      case Modes.Conversation =>
        if (available.contains(Providers.Mem0) &&
            status.of(Providers.Mem0) == Providers.Available)
          Some(Route(Providers.Mem0, skipExternalRerank = true))
        else if (available.contains(Providers.Supabase) &&
            status.of(Providers.Supabase) == Providers.Available)
          Some(Route(Providers.Supabase, skipExternalRerank = false))
        else None
      case Modes.Fast =>
        Providers.order
          .find(p => available.contains(p) && status.of(p) == Providers.Available)
          .map(p => Route(p, skipFor(p)))
      case Modes.Accurate =>
        // Documented as multi-provider merge; code simplifies to first
        // available in enabled order (`retrieval_router.py:47-52`).
        available
          .find(p => status.of(p) == Providers.Available)
          .map(p => Route(p, skipFor(p)))
      case _ => None
    }

    picked.getOrElse {
      // Fallback: first available-or-degraded in enabled order (:54-58).
      available
        .find(p => Set(Providers.Available, Providers.Degraded).contains(status.of(p)))
        .map(p => Route(p, skipFor(p)))
        .getOrElse(Route(Providers.None_, skipExternalRerank = false))
    }
  }

  /** R3: provider override honored iff enabled, else normal selection
    * (`retrieval_router.py:104-116`). Note the reference checks flag
    * membership only, not provider status — replicated. */
  def route(
      request: RetrievalRequest,
      status: ProviderStatus,
      flags: FeatureFlags): Route = {
    val enabled = enabledProviders(flags)
    request.providerOverride match {
      case Some(p) if enabled.contains(p) =>
        Route(p, skipExternalRerank = skipFor(p))
      case _ =>
        selectRoute(request.mode, enabled, status)
    }
  }
}
