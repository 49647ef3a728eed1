package graft

import graft.sources.LakeLayout
import graft.sources.LakeLayout.{KeyBound, StrKey}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck pin for the StrKey band-pruning contract: manifest
  * min/max bounds are compared in UNSIGNED UTF-8 BYTE order
  * ([[KeyBound.strLeq]]) because that is Spark's (and DuckDB's binary
  * collation's) string order — java's String.compareTo disagrees on
  * supplementary characters (UTF-16 surrogates sort below U+FFFD by
  * char, above by UTF-8 byte). A pruning comparator that diverges from
  * the engine's comparator silently DROPS files whose rows the residual
  * filter would keep — wrong answers, not slow ones — so the property
  * drives adversarial keys (multi-byte UTF-8, zero-width, embedded
  * NUL, supplementary plane, prefix ties) through a committed lake and
  * asserts pruned reads equal unpruned reads for arbitrary bands. */
class StrKeyPruningPropertySpec extends SparkSuite {

  private val atoms = Seq(
    "", "a", "b", "ab", "zz", "A", "0", "f",
    "\u0000", "\u0001",   // embedded NUL / low control
    "\u00e9", "\u00df",   // 2-byte UTF-8 (e-acute, sharp s)
    "\u4e2d", "\uffe5",   // 3-byte UTF-8 (CJK, fullwidth yen)
    "\u200b",          // zero-width space
    "\ud834\udd1e",   // U+1D11E musical G clef — 4-byte UTF-8,
                          // the String.compareTo divergence case
    "\ufffd",          // replacement char — sorts ABOVE the
                          // supplementary char by UTF-16 code units,
                          // BELOW it by UTF-8 bytes
    "a\u0000b")      // prefix tie through a NUL

  private val keyGen: Gen[String] = for {
    n <- Gen.choose(1, 4)
    parts <- Gen.listOfN(n, Gen.oneOf(atoms))
  } yield parts.mkString

  private def check(prop: Prop, min: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, res.status.toString)
  }

  test("strLeq is exactly unsigned UTF-8 byte order") {
    check(Prop.forAll(keyGen, keyGen) { (a, b) =>
      val ref = java.util.Arrays.compareUnsigned(
        a.getBytes("UTF-8"), b.getBytes("UTF-8")) <= 0
      KeyBound.strLeq(a, b) == ref
    }, 500)
  }

  test("StrKey bounds survive the manifest encode/decode round-trip") {
    // bounds travel through tab-separated manifest lines URL-encoded;
    // any key the table can hold must round-trip byte-exact
    check(Prop.forAll(keyGen) { k =>
      KeyBound.decode(StrKey(k).enc).contains(StrKey(k))
    }, 500)
  }

  test("adversarial keys: pruned range reads equal unpruned reads") {
    // one committed multi-file table over the full adversarial key
    // population; each ScalaCheck case draws an arbitrary band and
    // compares the StrKey-pruned read against the unpruned filter
    import spark.implicits._
    val keys = (for (a <- atoms; b <- atoms) yield a + b).distinct
    val lake = java.nio.file.Files
      .createTempDirectory("graft-strprop").toString + "/t"
    LakeLayout.commitLakeVersion(
      keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }
        .toDF("doc_key", "id")
        .repartitionByRange(7, col("doc_key"))
        .sortWithinPartitions(col("doc_key")),
      lake, "prop", 0L, statsKey = Some("doc_key"))
    val full = LakeLayout.readLake(spark, lake).get
    check(Prop.forAll(keyGen, keyGen) { (x, y) =>
      val (lo, hi) = if (KeyBound.strLeq(x, y)) (x, y) else (y, x)
      val pruned = LakeLayout
        .readLakeKeyRangeStr(spark, lake, "doc_key", lo, hi).get
        .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
      val want = full
        .filter(col("doc_key") >= lo && col("doc_key") <= hi)
        .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
      pruned == want
    }, 40)
  }
}
