package graft

import graft.model._
import graft.operators.{RetrievalRouter, RerankService, BranchClassifier}
import org.scalatest.funsuite.AnyFunSuite

/** Router policy + classification unit tests (reference
  * `tests/test_retrieval_router_policy.py`,
  * `tests/test_context_packet_contract.py:224-269`). */
class RouterPolicySpec extends AnyFunSuite {

  private val allUp = ProviderStatus()

  test("conversation mode prefers mem0 and skips external rerank") {
    val r = RetrievalRouter.route(RetrievalRequest("q"), allUp, FeatureFlags())
    assert(r.provider == Providers.Mem0 && r.skipExternalRerank)
  }

  test("fast mode picks first of fixed order mem0>supabase>graphiti") {
    val r = RetrievalRouter.route(
      RetrievalRequest("q", mode = Modes.Fast), allUp, FeatureFlags())
    assert(r.provider == Providers.Mem0)
    val r2 = RetrievalRouter.route(
      RetrievalRequest("q", mode = Modes.Fast),
      ProviderStatus(Map(Providers.Mem0 -> "unavailable",
        Providers.Supabase -> "available")), FeatureFlags())
    assert(r2.provider == Providers.Supabase && !r2.skipExternalRerank)
  }

  test("accurate mode walks enabled order (graphiti first when enabled)") {
    val r = RetrievalRouter.route(
      RetrievalRequest("q", mode = Modes.Accurate),
      ProviderStatus(Map(Providers.Graphiti -> "available",
        Providers.Mem0 -> "available")),
      FeatureFlags(graphitiEnabled = true))
    assert(r.provider == Providers.Graphiti)
  }

  test("degraded-only providers reach the available-or-degraded fallback") {
    val r = RetrievalRouter.route(
      RetrievalRequest("q"),
      ProviderStatus(Map(Providers.Mem0 -> "degraded",
        Providers.Supabase -> "degraded")), FeatureFlags())
    assert(r.provider == Providers.Mem0 && r.skipExternalRerank)
  }

  test("override honored iff flag-enabled; status is NOT checked (quirk)") {
    val r = RetrievalRouter.route(
      RetrievalRequest("q", providerOverride = Some(Providers.Supabase)),
      ProviderStatus(Map(Providers.Supabase -> "unavailable")), FeatureFlags())
    assert(r.provider == Providers.Supabase)
    val r2 = RetrievalRouter.route(
      RetrievalRequest("q", providerOverride = Some(Providers.Graphiti)),
      allUp, FeatureFlags()) // graphiti flag off → fall through
    assert(r2.provider == Providers.Mem0)
  }

  test("no enabled providers routes to none") {
    val r = RetrievalRouter.route(RetrievalRequest("q"), allUp,
      FeatureFlags(mem0Enabled = false, supabaseEnabled = false))
    assert(r.provider == Providers.None_ && !r.skipExternalRerank)
  }

  test("mem0 always implies skip_external_rerank (duplicate-rerank elimination)") {
    for (mode <- Modes.all) {
      val r = RetrievalRouter.route(
        RetrievalRequest("q", mode = mode), allUp, FeatureFlags())
      assert(r.provider != Providers.Mem0 || r.skipExternalRerank, mode)
    }
  }

  // --- rerank properties (reference formula voyage.py:74) ---

  test("property: rerank never pushes confidence above 1.0 or below input") {
    val svc = new RerankService(enabled = true)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val cs = (1 to 2 + rnd.nextInt(4)).map { i =>
        val words = Seq.fill(1 + rnd.nextInt(8))(s"w${rnd.nextInt(10)}")
        ContextCandidate(s"id-$i", words.mkString(" "), "mem0",
          rnd.nextDouble(), Map.empty)
      }
      val q = Seq.fill(1 + rnd.nextInt(5))(s"w${rnd.nextInt(10)}").mkString(" ")
      val (out, _) = svc.rerank(q, cs, topK = 5)
      out.foreach { c =>
        assert(c.confidence <= 1.0)
        val orig = cs.find(_.id == c.id).get.confidence
        assert(c.confidence >= orig - 1e-12)
      }
      // output sorted by adjusted confidence descending
      val confs = out.map(_.confidence)
      assert(confs == confs.sorted.reverse)
    }
  }

  test("rerank bypass reasons: disabled / no_candidates / single_candidate") {
    val off = new RerankService(enabled = false)
    assert(off.rerank("q", Seq(c(0.8)))._2("bypass_reason") == "disabled")
    val on = new RerankService(enabled = true)
    assert(on.rerank("q", Seq.empty)._2("bypass_reason") == "no_candidates")
    assert(on.rerank("q", Seq(c(0.8)))._2("bypass_reason") == "single_candidate")
    assert(on.rerank("q", Seq(c(0.8), c(0.7)))._2("rerank_type") == "external")
  }

  private def c(conf: Double) =
    ContextCandidate(s"c$conf", "some content", "mem0", conf, Map.empty)

  // --- branch classification ordering (fallbacks.py:180-198) ---

  test("branch rule order: empty > low-confidence > rerank-bypassed > success") {
    assert(BranchClassifier.determineBranch(Seq.empty)._1.summary.branch
      == Branches.EmptySet)
    // low confidence wins over rerank-bypassed even on the mem0 path
    assert(BranchClassifier.determineBranch(Seq(c(0.45)),
      rerankBypassed = true, provider = Providers.Mem0)._1.summary.branch
      == Branches.LowConfidence)
    assert(BranchClassifier.determineBranch(Seq(c(0.85)),
      rerankBypassed = true, provider = Providers.Mem0)._1.summary.branch
      == Branches.RerankBypassed)
    // bypassed on a non-mem0 provider is SUCCESS with rerank_applied
    val (p, _) = BranchClassifier.determineBranch(Seq(c(0.85)),
      rerankBypassed = true, provider = Providers.Supabase)
    assert(p.summary.branch == Branches.Success && p.rerank_applied)
  }

  test("threshold-equal counts as met (strict < comparison, scenario S017)") {
    val (p, _) = BranchClassifier.determineBranch(Seq(c(0.6)), threshold = 0.6)
    assert(p.summary.branch == Branches.Success)
    assert(p.summary.threshold_met)
  }

  test("RERANK_BYPASSED threshold_met uses the hardcoded 0.6, not the request threshold") {
    val (p, _) = BranchClassifier.determineBranch(Seq(c(0.7)),
      threshold = 0.65, rerankBypassed = true, provider = Providers.Mem0)
    assert(p.summary.branch == Branches.RerankBypassed)
    assert(p.summary.threshold_met) // 0.7 >= hardcoded 0.6
  }

  test("branch codes and actions are the stable contract constants") {
    assert(Branches.all == Set("EMPTY_SET", "LOW_CONFIDENCE",
      "CHANNEL_MISMATCH", "RERANK_BYPASSED", "SUCCESS"))
    assert(Actions.all == Set("proceed", "clarify", "fallback", "escalate"))
  }

  test("confidence bounds enforced at construction") {
    intercept[IllegalArgumentException] {
      ContextCandidate("x", "c", "mem0", 1.2, Map.empty)
    }
    intercept[IllegalArgumentException] { RetrievalRequest("q", topK = 0) }
  }
}
