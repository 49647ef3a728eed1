// Perf evidence harness for d_dup_components at sf0.1 — NOT part of the
// default suite (it pays full sf0.1 pair generation + CC, ~20-50 s).
// Run explicitly with GRAFT_PERF_SPECS=1 sbt "testOnly graft.SweepCountSpec".
package graft

import graft.operators.{Components, Dedup}
import org.apache.spark.sql.functions._

class SweepCountSpec extends SparkSuite {
  test("sf0.1 pair-gen vs CC wall-clock split (GRAFT_PERF_SPECS gated)") {
    assume(sys.env.get("GRAFT_PERF_SPECS").contains("1"),
      "set GRAFT_PERF_SPECS=1 to run the sf0.1 perf split")
    val dir = "/root/testdata/sf0.1"
    val t0 = System.nanoTime()
    val mh = Dedup.dMinhashLsh(spark, dir).select(col("i"), col("j"))
    val sp = Dedup.dSimhashPairs(spark, dir).select(col("i"), col("j"))
    val wn = Dedup.dWinnowOverlap(spark, dir).select(col("i"), col("j"))
    // cached so the cc timing below measures the CC machinery, not a
    // second run of the three pair families inside the edge cache fill
    val pairs = mh.union(sp).union(wn).cache()
    val n = pairs.count()
    val t1 = System.nanoTime()
    info(s"pair gen: ${(t1 - t0) / 1e9}s, $n pairs")
    val (lab, sweeps) = Components.connectedComponentsWithStats(pairs)
    val nn = lab.count()
    val t2 = System.nanoTime()
    info(s"cc: ${(t2 - t1) / 1e9}s, $nn nodes, $sweeps sweeps")
  }
}
