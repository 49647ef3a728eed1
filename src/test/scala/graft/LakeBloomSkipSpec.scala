package graft

import graft.sources.LakeLayout
import org.apache.spark.sql.functions._

/** Manifest-level bloom data skipping ([[LakeLayout.readLakeForKeys]]):
  * on a table whose per-file key RANGES fully overlap (hash-spread
  * ingest — the shape where min/max pruning is useless), a point
  * lookup must read a strict subset of files chosen by the per-file
  * blooms, return exactly the matching rows, survive the delta/append
  * manifest protocol, and respect deletion vectors. */
class LakeBloomSkipSpec extends SparkSuite {
  import spark.implicits._

  test("point lookups prune by bloom where ranges cannot, across appends and dv deletes") {
    val t = java.nio.file.Files
      .createTempDirectory("graft-bloom").toString + "/t"
    // 8 files, ids interleaved mod 8: every file's [min,max] spans
    // nearly the whole domain, so range pruning alone keeps all 8
    val base = (0L until 4000L).map(k => (k, s"p$k")).toDF("id", "pay")
      .repartition(8, pmod($"id", lit(8)))
    LakeLayout.commitLakeVersion(base, t, "ck", 0L,
      statsKey = Some("id"), bloomBits = 8192)
    val all = LakeLayout.lakeFilesForKeys(spark, t, Seq(24L, 137L))
    val total = 8
    assert(all.size < total,
      s"bloom must beat overlapping ranges: ${all.size} of $total files")
    assert(all.size <= 3, s"2 keys live in ≤2 files (+FP margin): ${all.size}")
    val rows = LakeLayout.readLakeForKeys(spark, t, "id", Seq(24L, 137L))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((24L, "p24"), (137L, "p137")))

    // a key that exists nowhere: the blooms reject (FP margin 1)
    assert(LakeLayout.lakeFilesForKeys(spark, t, Seq(999999L)).size <= 1,
      "an absent key must prune nearly everything")
    assert(LakeLayout.readLakeForKeys(spark, t, "id", Seq(999999L))
      .isEmpty)

    // blooms survive the DELTA manifest protocol: an appended wave
    // carries its own blooms, and lookups stay subset-scans
    LakeLayout.appendToLake(spark, t,
      (10000L until 12000L).map(k => (k, s"p$k")).toDF("id", "pay")
        .repartition(4, pmod($"id", lit(4))),
      "ck", 1L, statsKey = Some("id"), bloomBits = 8192)
    val resolved = LakeLayout.lakeFilesForKeys(spark, t, Seq(24L, 10001L))
    assert(resolved.size <= 3 && resolved.size < 12,
      s"both waves prune: ${resolved.size} of 12 files")
    assert(LakeLayout.readLakeForKeys(spark, t, "id", Seq(24L, 10001L))
      .count() == 2)

    // deletion vectors apply on the pruned read path
    LakeLayout.deleteFromLakeDv(spark, t, Seq(24L).toDF("id"),
      "id", "ck", 2L)
    val after = LakeLayout.readLakeForKeys(spark, t, "id", Seq(24L, 137L))
      .collect().map(_.getLong(0)).toSet
    assert(after == Set(137L),
      s"dv-deleted key must not resurface through the bloom path: $after")
  }

  test("string keys skip the same way, and bloom-less tables stay correct (all files candidates)") {
    val t = java.nio.file.Files
      .createTempDirectory("graft-bloom-str").toString + "/t"
    val docs = (0 until 2000).map(i => (f"doc-${i * 7 % 2000}%04d", i))
      .toDF("doc_id", "n").repartition(6, pmod($"n", lit(6)))
    LakeLayout.commitLakeVersion(docs, t, "ck", 0L,
      statsKey = Some("doc_id"), bloomBits = 8192)
    val cand = LakeLayout.lakeFilesForKeys(spark, t, Seq("doc-0042"))
    assert(cand.size <= 2, s"string key prunes: ${cand.size} of 6")
    assert(LakeLayout.readLakeForKeys(spark, t, "doc_id", Seq("doc-0042"))
      .count() == 1)

    val plain = java.nio.file.Files
      .createTempDirectory("graft-bloom-off").toString + "/t"
    LakeLayout.commitLakeVersion(docs, plain, "ck", 0L,
      statsKey = Some("doc_id"))
    // without blooms only RANGE pruning applies: every candidate is
    // bloom-less, the set is at least as large as the bloomed table's,
    // and the lookup stays correct
    val plainCand = LakeLayout.lakeFilesForKeys(spark, plain,
      Seq("doc-0042"))
    assert(plainCand.forall(_.bloom.isEmpty) &&
      plainCand.size >= cand.size,
      s"range-only pruning: ${plainCand.size} vs bloomed ${cand.size}")
    assert(LakeLayout.readLakeForKeys(spark, plain, "doc_id",
      Seq("doc-0042")).count() == 1)
  }

  test("probe literals hash through the stored column's type — a double key never wrongly prunes its owning file") {
    import spark.implicits._
    val table = java.nio.file.Files
      .createTempDirectory("graft-bloom-typed").toString + "/t"
    // DOUBLE key column: the builder blooms the column's own string
    // cast ("42.0"); a probe literal 42 must hash the same string or
    // the bloom rejects the owning file and the lookup silently
    // returns nothing (range bounds don't exist for doubles, so the
    // bloom is the sole decider)
    LakeLayout.commitLakeVersion(
      (1L to 200L).map(k => (k.toDouble, s"r$k")).toDF("dk", "v")
        .repartition(4, col("dk")),
      table, "seed", 0L, statsKey = Some("dk"), bloomBits = 1 << 12)
    val got = LakeLayout.readLakeForKeys(spark, table, "dk",
      Seq(42, 143L))
    assert(got.count() == 2,
      "int/long probe literals must find rows stored under a double key")
    assert(got.select("v").collect().map(_.getString(0)).toSet ==
      Set("r42", "r143"))
  }
}
