package graft

import graft.operators.{IvfIndex, Similarity}
import graft.sources.LakeLayout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LIFECYCLE ENDURANCE for the serving index: many rounds of mixed
  * lake DML (inserts, updates, deletes, re-inserts) interleaved with
  * sync, compaction, a retrain, and a maintenance pass — after EVERY
  * round, full-nprobe serving must equal a brute-force scan over the
  * post-DML model state computed through the same Spark expressions
  * (exact frame equality, no float-parity slack), and the FULL visible
  * id→label set must equal the model. This is the one spec that drives
  * the whole tombstone/wave_v machinery through a long history instead
  * of a single transition. */
class IvfEnduranceSpec extends SparkSuite {
  import spark.implicits._

  test("12 lake versions of mixed DML with sync, compaction, retrain, and maintenance: serving tracks the model after every round") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-ivf-end").toString
    val lake = s"$base/lake"
    val idx = s"$base/index"
    IvfIndex.build(spark, sfDir, idx)

    val corpus = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id", $"label", $"embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("label"),
          r.getAs[scala.collection.Seq[Float]]("embedding").toSeq))
    // the driver-side model: what the index must serve
    val model = scala.collection.mutable.Map[Long, (Int, Seq[Float])](
      corpus: _*)
    val baseEmb: Map[Long, Seq[Float]] = corpus.toMap.map {
      case (id, (_, e)) => id -> e
    }
    def twinRows(ids: Seq[Long], label: Long => Int): DataFrame =
      ids.map(i => (i + 1000000L, label(i), baseEmb(i)))
        .toDF("vec_id", "label", "embedding")
        .withColumn("embedding",
          col("embedding").cast("array<float>"))

    var batch = 0L
    def nextBatch(): Long = { batch += 1; batch }
    def insert(ids: Seq[Long], label: Long => Int): Unit = {
      LakeLayout.appendToLake(spark, lake, twinRows(ids, label),
        "endurance", nextBatch(), statsKey = Some("vec_id"))
      ids.foreach(i => model(i + 1000000L) = (label(i), baseEmb(i)))
    }
    def update(ids: Seq[Long], label: Long => Int): Unit = {
      LakeLayout.upsertIntoLake(spark, lake, twinRows(ids, label),
        "vec_id", "endurance", nextBatch())
      ids.foreach(i => model(i + 1000000L) = (label(i), baseEmb(i)))
    }
    def delete(ids: Seq[Long]): Unit = {
      LakeLayout.deleteFromLake(spark, lake,
        ids.map(_ + 1000000L).toDF("vec_id"), "vec_id", "endurance",
        nextBatch())
      ids.foreach(i => model.remove(i + 1000000L))
    }

    val probeIds = Seq(0L, 17L)
    def modelDf(): DataFrame =
      model.toSeq.map { case (id, (l, e)) => (id, l, e) }
        .toDF("vec_id", "label", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>"))
    def check(tag: String): Unit = {
      graft.functions.VectorFunctions.register(spark)
      probeIds.foreach { p =>
        val pc = array(baseEmb(p).map(x => lit(x.toDouble)): _*)
        val expected = modelDf()
          .withColumn("sim", round(
            graft.functions.VectorFunctions.cosine($"embedding", pc), 3))
          .filter(!isnan($"sim") && $"sim".isNotNull)
          .select($"vec_id", $"label", $"sim")
          .orderBy($"sim".desc, $"vec_id").limit(10)
          .collect().toSeq
        val served = IvfIndex.probeTopK(spark, idx,
          baseEmb(p).map(_.toDouble).toArray, k = 10,
          nprobe = Similarity.IvfCells).collect().toSeq
        assert(served == expected,
          s"[$tag] probe $p: served $served != model $expected")
      }
      // the FULL visible set equals the model, id for id, label for
      // label — no duplicates, no leaked pre-images, no lost rows
      val all = IvfIndex.probeTopK(spark, idx,
        baseEmb(0L).map(_.toDouble).toArray, k = model.size + 50,
        nprobe = Similarity.IvfCells).collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label"))
      assert(all.length == all.map(_._1).distinct.length,
        s"[$tag] duplicate ids at the serving surface")
      val visible = all.toMap
      val expectedSet = model.toMap.map { case (id, (l, _)) => id -> l }
      assert(visible == expectedSet,
        s"[$tag] visible set diverged from the model: " +
          s"extra=${(visible.keySet -- expectedSet.keySet).toSeq.sorted}, " +
          s"missing=${(expectedSet.keySet -- visible.keySet).toSeq.sorted}, " +
          s"relabeled=${expectedSet.keySet.intersect(visible.keySet)
            .filter(k => expectedSet(k) != visible(k)).toSeq.sorted}")
    }

    // round 1-2: two insert waves
    insert(0L until 25L, _ => 1)
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 1L)
    check("r1 insert")
    insert(25L until 41L, _ => 2)
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 1L)
    check("r2 insert")
    // round 3: corrections
    update(0L until 10L, _ => 777)
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 1L)
    check("r3 update")
    // round 4: compact (tombstones from the updates become physical)
    assert(IvfIndex.compactTombstones(spark, idx))
    check("r4 compact")
    // round 5: takedowns
    delete(5L until 15L)
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 1L)
    check("r5 delete")
    // round 6: re-inserts of deleted ids + fresh corrections, two lake
    // versions pulled by ONE sync pass
    update(7L until 10L, _ => 555)
    update(20L until 25L, _ => 888)
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 2L)
    check("r6 reinsert+update")
    // round 7: full retrain mid-history (compacts and re-clusters)
    IvfIndex.rebuild(spark, idx)
    check("r7 rebuild")
    // round 8: more takedowns against the fresh generation
    delete(Seq(0L, 1L, 2L, 25L))
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 1L)
    check("r8 delete")
    // round 9: growth wave
    insert(41L until 51L, _ => 3)
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 1L)
    check("r9 insert")
    // round 10: compact again
    assert(IvfIndex.compactTombstones(spark, idx))
    check("r10 compact")
    // round 11: corrections on the newest wave
    update(41L until 46L, _ => 999)
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 1L)
    check("r11 update")
    // round 12: a measured maintenance pass closes the history — the
    // pending tombstones trip the tight threshold and compact
    val rep = IvfIndex.maintainIvf(spark, idx,
      maxSkew = 1e9, minFit = -1.0, maxTombFrac = 1e-6)
    assert(rep.compacted && !rep.rebuilt, s"$rep")
    assert(IvfIndex.describeIvf(spark, idx).collect()(0)
      .getAs[Double]("tomb_frac") == 0.0)
    check("r12 maintain")
  }
}
