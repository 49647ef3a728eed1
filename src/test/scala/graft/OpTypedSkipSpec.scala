package graft

import graft.operators.IncrementalAgg
import graft.sources.{LakeLayout, Tables}
import graft.streaming.CdfStream
import org.apache.spark.sql.functions._

/** Proof that the op-typed (format:4) manifest skip actually fires: a
  * pure-`compact` span must be consumable by the change-data feed and
  * the incremental-agg maintainer WITHOUT opening — or even listing —
  * a single data file. The proof is physical, not instrumented: after
  * building the history we DELETE every data file under the table
  * (keeping only `_commits` manifests); any code path that touches
  * data bytes then throws FileNotFoundException, so a green assertion
  * is airtight. At 100 TB this skip is the difference between a
  * compaction costing its consumers O(compacted bytes) each and
  * costing them one manifest read. */
class OpTypedSkipSpec extends SparkSuite {

  test("pure-compact span: CDF + incremental agg read zero data files") {
    val root = java.nio.file.Files.createTempDirectory("graft-skip").toString
    val t = s"$root/table"
    val orders = Tables.load(spark, sfDir, "orders")
    LakeLayout.commitLakeVersion(
      orders.repartitionByRange(4, col("o_orderkey"))
        .sortWithinPartitions(col("o_orderkey")),
      t, s"$root/ckpt", 0L, statsKey = Some("o_orderkey"))
    // v1, v2: a two-commit pure-compact span
    assert(LakeLayout.compactLake(spark, t, "o_orderkey") == 1L)
    assert(LakeLayout.compactLake(spark, t, "o_orderkey") == 2L)
    assert(LakeLayout.lakeCommitAt(spark, t, 1L).op == "compact")
    assert(LakeLayout.lakeCommitAt(spark, t, 2L).op == "compact")

    // materialize the v0 state fully (collect + rebuild local) so no
    // lineage back to the soon-to-be-deleted files survives
    val state0Lazy = IncrementalAgg.fullAgg(
      LakeLayout.readLakeVersion(spark, t, 0L),
      "o_orderpriority", "o_orderkey")
    val state0Rows = state0Lazy.collect().toIndexedSeq
    val state0 = spark.createDataFrame(
      spark.sparkContext.parallelize(state0Rows), state0Lazy.schema)

    // DELETE every data file; only the _commits manifests survive
    val table = new org.apache.hadoop.fs.Path(t)
    val fs = table.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(table).foreach { st =>
      if (st.getPath.getName != "_commits") fs.delete(st.getPath, true)
    }

    // CDF over a compact version: zero rows, data-path schema, no I/O
    val cdf = CdfStream.changesForVersion(spark, t, 2L, "o_orderkey")
    assert(cdf.count() == 0)
    assert(cdf.columns.takeRight(2).toSeq == Seq("_change", "_version"))
    assert(cdf.columns.dropRight(2).toSeq == orders.columns.toSeq)
    // nullability parity with the lit()-derived data paths
    val tail = cdf.schema.fields.takeRight(2)
    assert(tail.forall(!_.nullable),
      "_change/_version must be non-nullable like the data paths")

    // advance across the pure-compact span: state passes through intact
    val adv = IncrementalAgg.advance(spark, t, state0,
      "o_orderpriority", "o_orderkey", 0L, 2L)
    val got = adv.collect().map(r =>
      (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val want = state0Rows.map(r =>
      (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == want, "pure-compact advance must be the identity")

    // control: a consumer that DOES need data bytes now fails — proves
    // the deletion actually removed them (the green runs above weren't
    // reading from some surviving copy)
    intercept[Exception] {
      LakeLayout.readLakeVersion(spark, t, 2L).count()
    }
  }
}
