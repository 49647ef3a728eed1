package graft

import graft.operators.{IvfIndex, Similarity}
import org.apache.spark.sql.functions._

/** IVF drift observability and the measured-retrain loop:
  * [[IvfIndex.describeIvf]] must (a) report balanced occupancy and
  * high model fit on a fresh build, (b) move visibly when an append
  * wave lands that the frozen centroids cannot represent — the
  * hot-cell occupancy skew AND the fit (mean cosine to assigned
  * centroid) — and (c) show fit restored after [[IvfIndex.rebuild]]
  * retrains on the index's own vectors. This is what turns the
  * frozen-centroid append path's documented graceful degradation into
  * a measured maintenance trigger instead of a cadence guess. */
class IvfDriftSpec extends SparkSuite {
  import spark.implicits._

  private def health(idx: String): (Long, Double, Double) = {
    val r = IvfIndex.describeIvf(spark, idx).collect()(0)
    (r.getAs[Long]("max_occupancy"), r.getAs[Double]("occupancy_skew"),
      r.getAs[Double]("mean_centroid_sim"))
  }

  test("describeIvf detects a drifted append wave; rebuild on index vectors restores model fit") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-drift")
      .toString
    IvfIndex.build(spark, sfDir, idx)
    val (max0, skew0, sim0) = health(idx)
    assert(sim0 > 0.0, s"fresh build must have positive mean fit: $sim0")

    // the drift wave: 200 tight perturbations of ONE direction the
    // corpus never covered (deterministic alternating pattern + tiny
    // (id, j)-dependent jitter) — the frozen model funnels all of it
    // into whichever centroid happens to be least bad
    val wave = spark.range(200).select(
      ($"id" + 800000L).as("vec_id"),
      transform(sequence(lit(0), lit(63)), j =>
        (when(pmod(j, lit(2)) === 0, lit(0.125)).otherwise(lit(-0.125)) +
          (pmod($"id" * 131 + j.cast("long") * 17, lit(11)) - 5)
            .cast("double") * 0.002).cast("float")).as("embedding"),
      lit(9).as("label"))
    IvfIndex.append(spark, idx, wave)
    val (max1, skew1, sim1) = health(idx)
    assert(max1 >= max0 + 180,
      s"the wave must concentrate in a hot cell: max $max0 -> $max1")
    assert(skew1 > skew0,
      s"occupancy skew must move on the drifted wave: $skew0 -> $skew1")
    assert(sim1 < sim0,
      s"model fit must DROP when frozen centroids can't represent the " +
        s"wave: $sim0 -> $sim1")

    // retrain on the index's own vectors (corpus + wave): the wave
    // earns a centroid of its own, so fit recovers past both earlier
    // readings; occupancy can stay wave-shaped (200 genuinely similar
    // vectors BELONG in one cell) — fit is the restoration signal
    IvfIndex.rebuild(spark, idx)
    val (_, _, sim2) = health(idx)
    assert(sim2 > sim1 && sim2 > sim0,
      s"rebuild must restore model fit: build=$sim0 drifted=$sim1 " +
        s"rebuilt=$sim2")

    // the rebuilt index still serves: a probe on the wave's direction
    // finds wave members at ~1.0 cosine through cell pruning
    val waveProbe = wave.filter($"vec_id" === 800000L)
      .select($"embedding").head()
      .getAs[scala.collection.Seq[Float]]("embedding")
      .map(_.toDouble).toArray
    val top = IvfIndex.probeTopK(spark, idx, waveProbe, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(top.nonEmpty && top.head._1 >= 800000L && top.head._2 >= 0.99,
      s"rebuilt index must serve the wave region: ${top.toSeq}")
    // (fresh-build serving parity vs the in-query IVF path stays
    // pinned by PipelineOperatorsSpec — the build path is untouched)
  }

  test("maintainIvf: healthy index is a no-op; measured drift triggers the rebuild") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-maint")
      .toString
    IvfIndex.build(spark, sfDir, idx)
    val (_, skew0, fit0) = health(idx)
    // thresholds pinned just outside the healthy reading: no trigger
    val r0 = IvfIndex.maintainIvf(spark, idx,
      maxSkew = skew0 + 1.0, minFit = fit0 - 0.05)
    assert(!r0.rebuilt, s"a healthy index must not retrain: $r0")
    // the same drift wave as above: either signal crossing triggers
    val wave = spark.range(200).select(
      ($"id" + 800000L).as("vec_id"),
      transform(sequence(lit(0), lit(63)), j =>
        (when(pmod(j, lit(2)) === 0, lit(0.125)).otherwise(lit(-0.125)) +
          (pmod($"id" * 131 + j.cast("long") * 17, lit(11)) - 5)
            .cast("double") * 0.002).cast("float")).as("embedding"),
      lit(9).as("label"))
    IvfIndex.append(spark, idx, wave)
    val r1 = IvfIndex.maintainIvf(spark, idx,
      maxSkew = skew0 + 1.0, minFit = fit0 - 0.05)
    assert(r1.rebuilt,
      s"drift past the thresholds must trigger the rebuild: $r1 " +
        s"(baseline skew=$skew0 fit=$fit0)")
    val (_, _, fit2) = health(idx)
    assert(fit2 > r1.fit,
      s"the triggered rebuild must restore fit: ${r1.fit} -> $fit2")
  }

  test("generational rebuild is atomic: grace generation serves racing readers, crash staging is invisible") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-gen")
      .toString
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def gens = fs.listStatus(new org.apache.hadoop.fs.Path(idx))
      .map(_.getPath.getName).filter(_.startsWith("g")).sorted.toSeq

    IvfIndex.build(spark, sfDir, idx)
    assert(IvfIndex.committedGen(spark, idx).contains(0L) &&
      IvfIndex.layoutRoot(spark, idx) == s"$idx/g0",
      s"build must publish generation 0, dirs=$gens")

    // a reader that resolved BEFORE the rebuild: its generation must
    // stay fully readable after one publish (the grace window)
    val preRoot = IvfIndex.layoutRoot(spark, idx)
    IvfIndex.rebuild(spark, idx)
    assert(IvfIndex.committedGen(spark, idx).contains(1L),
      s"rebuild must publish generation 1, dirs=$gens")
    assert(spark.read.parquet(s"$preRoot/centroids").count() > 0 &&
      spark.read.parquet(s"$preRoot/vectors").count() > 0,
      "the pre-rebuild generation must survive one publish as read grace")

    // crash leftover: a bare generation dir WITHOUT the marker —
    // readers never resolve it, health and serving stay on the
    // committed gen
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$idx/g2/vectors"))
    assert(IvfIndex.committedGen(spark, idx).contains(1L),
      "an unmarked generation dir must be invisible to resolution")
    val r = IvfIndex.describeIvf(spark, idx).collect()(0)
    assert(r.getAs[Long]("n_vectors") > 0L,
      s"describeIvf must read through the crash leftover, got $r")

    // the next rebuild SKIPS the leftover's number (renaming onto an
    // existing dir would nest) and publishes g3; its reclaim sweeps
    // both the leftover g2 and the beyond-grace g0, keeping g1 as
    // grace — and leaves no writer staging dirs behind
    IvfIndex.rebuild(spark, idx)
    assert(IvfIndex.committedGen(spark, idx).contains(3L), s"dirs=$gens")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/g0")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$idx/g2")) &&
      fs.exists(new org.apache.hadoop.fs.Path(s"$idx/g1")),
      s"publish must sweep leftovers and keep one grace generation, " +
        s"dirs=$gens")
    val stray = fs.listStatus(new org.apache.hadoop.fs.Path(idx))
      .map(_.getPath.getName).filter(_.contains("-stage-")).toSeq
    assert(stray.isEmpty, s"no staging dirs may survive a publish: $stray")
  }

  test("describeIvf on a missing or empty index reports a zero-health row instead of aborting maintenance") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-empty")
      .toString
    val r = IvfIndex.describeIvf(spark, idx).collect()(0)
    assert(r.getAs[Long]("n_cells") == 0L &&
      r.getAs[Long]("n_vectors") == 0L &&
      r.getAs[Double]("mean_centroid_sim") == 0.0,
      s"empty index must zero-health, got $r")
    val m = IvfIndex.maintainIvf(spark, idx)
    assert(!m.rebuilt, s"an empty index must never trigger a retrain: $m")
  }
}
