package graft

import graft.operators.{ScalarQuant, Similarity}
import org.apache.spark.sql.types.{ArrayType, ByteType}

/** The SQ8 (int8 scalar quantization) serving tier
  * ([[ScalarQuant.sSq8Rerank]]): codes must really be one signed byte
  * per dimension (the 4× compression is structural), the int8
  * shortlist must hold the exact top-10 with PROVABLE margin at every
  * test SF (the contract that makes the two-stage result equal the
  * exact scan and share its DuckDB oracle), and the two-stage result
  * must equal the brute-force exact scan row for row. */
class ScalarQuantSpec extends SparkSuite {

  test("codes are array<tinyint> — one byte per dimension, 4x under float32") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val codes = ScalarQuant.sq8Codes(spark, sfDir)
    codes.select($"q").schema.head.dataType match {
      case ArrayType(ByteType, _) => ()
      case other => fail(s"SQ8 codes must be array<tinyint>, got $other")
    }
    // every code is a valid symmetric signed byte in [-127, 127]
    val bad = codes.select(explode($"q").as("c"))
      .filter($"c" > 127 || $"c" < -127).count()
    assert(bad == 0L, s"$bad out-of-range codes")
    assert(ScalarQuant.sq8Ranked(spark, sfDir).columns.toSeq ==
      Seq("vec_id", "label", "approx"))
  }

  test("the exact top-10 survives the int8 cut with >=2x margin, and the two-stage result equals the exact scan") {
    val exact = Similarity.sCosineTopk(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val ranked = ScalarQuant.sq8Ranked(spark, sfDir)
      .limit(ScalarQuant.Shortlist).collect().map(_.getLong(0))
    // margin: every exact top-10 id sits in the FIRST HALF of the
    // shortlist — the cut could halve and the result would not change
    val firstHalf = ranked.take(ScalarQuant.Shortlist / 2).toSet
    assert(exact.subsetOf(firstHalf),
      s"exact top-10 must survive half the shortlist: " +
        s"missing ${exact -- firstHalf}")

    val twoStage = ScalarQuant.sSq8Rerank(spark, sfDir).collect().toSeq
    val bruteForce = Similarity.sCosineTopk(spark, sfDir).collect().toSeq
    assert(twoStage == bruteForce,
      s"two-stage SQ8 must equal the exact scan\nsq8:   $twoStage\n" +
        s"exact: $bruteForce")
  }
}
