// scratch: count sweeps at sf0.1 via a temporary spec
package graft

import graft.operators.{Components, Dedup}
import org.apache.spark.sql.functions._

class SweepCountSpec extends SparkSuite {
  test("sweep count at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    val t0 = System.nanoTime()
    val mh = Dedup.dMinhashLsh(spark, dir).select(col("i"), col("j"))
    val sp = Dedup.dSimhashPairs(spark, dir).select(col("i"), col("j"))
    val wn = Dedup.dWinnowOverlap(spark, dir).select(col("i"), col("j"))
    val pairs = mh.union(sp).union(wn)
    val n = pairs.count()
    val t1 = System.nanoTime()
    info(s"pair gen: ${(t1-t0)/1e9}s, $n pairs")
    val lab = Components.connectedComponents(pairs)
    val nn = lab.count()
    val t2 = System.nanoTime()
    info(s"cc: ${(t2-t1)/1e9}s, $nn nodes")
  }
}
