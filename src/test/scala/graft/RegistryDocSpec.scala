package graft

import org.scalatest.funsuite.AnyFunSuite

/** Docs-vs-code lockstep: COVERAGE.md and README.md both state the
  * registry's query count; this spec fails the build the moment either
  * drifts from `SparkEntry.queries` (the gate docs are the audit trail
  * — a stale count misreports what the correctness gate covers).
  * Every registry entry must also carry an oracle or be a documented
  * rows-only query (oracle omission is a deliberate, spec-backed
  * decision, never an accident). */
class RegistryDocSpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      java.nio.charset.StandardCharsets.UTF_8)

  test("COVERAGE.md appendix count equals the registry") {
    val n = SparkEntry.queries.size
    val m = """(\d+) `SparkEntry\.queries` entries""".r
      .findFirstMatchIn(read("COVERAGE.md"))
    assert(m.nonEmpty, "COVERAGE.md no longer states the registry count")
    assert(m.get.group(1).toInt == n,
      s"COVERAGE.md says ${m.get.group(1)} registry entries; code has $n")
  }

  test("README.md bench line count equals the registry") {
    val n = SparkEntry.queries.size
    val m = """\((\d+) queries;""".r.findFirstMatchIn(read("README.md"))
    assert(m.nonEmpty, "README.md no longer states the bench query count")
    assert(m.get.group(1).toInt == n,
      s"README.md says ${m.get.group(1)} bench queries; code has $n")
  }

  test("every query has an oracle or is on the documented rows-only list") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only-by-design set: engine-local randomness/hash choices make
    // a DuckDB twin meaningless; each carries a spec substitute
    // (recall/agreement/error-bound) — see VERDICT r12 and COVERAGE.md
    val documented = Set(
      "d_minhash_lsh_x64", "d_simhash_pairs_x64",
      "q_approx_distinct", "q_value_percentiles",
      "r12_envelope_per_source",
      "s_ann_lsh_buckets", "s_ann_topk", "s_ivf_topk", "s_ivf_batch",
      "s_ivfpq_batch", "s_ivfpq_filtered", "s_ivfpq_serve",
      "s_ivfpq_topk", "s_ivfsq8_batch", "s_ivfsq8_serve", "s_pq_topk",
      "s_semantic_dedup")
    val undocumented = noOracle -- documented
    assert(undocumented.isEmpty,
      s"oracle-less queries not on the documented rows-only list: " +
        s"${undocumented.toSeq.sorted.mkString(", ")}")
    val stale = documented -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"rows-only list names queries that no longer exist: $stale")
  }
}
