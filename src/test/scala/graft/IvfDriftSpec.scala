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

  test("generational rebuild is atomic: grace generation serves racing readers, orphan dirs are invisible and consume no number") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-gen")
      .toString
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def gens = fs.listStatus(new org.apache.hadoop.fs.Path(idx))
      .map(_.getPath.getName).filter(_.startsWith("g")).sorted.toSeq

    IvfIndex.build(spark, sfDir, idx)
    assert(IvfIndex.committedGen(spark, idx).contains(0L) &&
      IvfIndex.layoutRoot(spark, idx).startsWith(s"$idx/g0-"),
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

    // crash leftover: a renamed generation dir with NO claim (the
    // writer died between rename and claim) — readers never resolve
    // it, it consumes no number, health and serving stay on the
    // committed generation
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$idx/g2-deadbeef/vectors"))
    assert(IvfIndex.committedGen(spark, idx).contains(1L),
      "an unclaimed generation dir must be invisible to resolution")
    val r = IvfIndex.describeIvf(spark, idx).collect()(0)
    assert(r.getAs[Long]("n_vectors") > 0L,
      s"describeIvf must read through the crash leftover, got $r")

    // the next rebuild REUSES the orphan's number (claims are the only
    // number authority — a crash consumes nothing) and publishes
    // generation 2; two more publishes later the orphan and the
    // beyond-grace generations are reclaimed, one grace kept — and no
    // writer staging dirs survive
    IvfIndex.rebuild(spark, idx)
    assert(IvfIndex.committedGen(spark, idx).contains(2L), s"dirs=$gens")
    IvfIndex.rebuild(spark, idx)
    IvfIndex.rebuild(spark, idx)
    assert(IvfIndex.committedGen(spark, idx).contains(4L), s"dirs=$gens")
    val names = gens
    assert(!names.exists(_.startsWith("g0-")) &&
      !names.contains("g2-deadbeef") &&
      names.exists(_.startsWith("g3-")),
      s"publish must sweep orphans and beyond-grace generations and " +
        s"keep one grace generation, dirs=$names")
    val stray = fs.listStatus(new org.apache.hadoop.fs.Path(idx))
      .map(_.getPath.getName).filter(_.contains("-stage-")).toSeq
    assert(stray.isEmpty, s"no staging dirs may survive a publish: $stray")
  }

  test("PQ drift is measured and maintained: a drifted wave moves pq_fit/pq_tail_frac, the triggered sidecar refresh restores them, serving stays exact") {
    val idx = java.nio.file.Files.createTempDirectory("graft-pq-drift")
      .toString
    IvfIndex.build(spark, sfDir, idx)
    IvfIndex.buildPqSidecar(spark, idx)
    def pqHealth(): (Double, Double) = {
      val r = IvfIndex.describeIvf(spark, idx).collect()(0)
      (r.getAs[Double]("pq_fit"), r.getAs[Double]("pq_tail_frac"))
    }
    val (fit0, tail0) = pqHealth()
    assert(fit0 > 0.8 && tail0 == 0.0,
      s"fresh sidecar: high reconstruction fit, no tail: $fit0 / $tail0")

    // the drift wave: a direction the codebooks never trained on
    // (same construction as the centroid-drift test) — it lands as a
    // raw TAIL and drags the corpus-wide reconstruction fit down
    val wave = spark.range(200).select(
      ($"id" + 800000L).as("vec_id"),
      transform(sequence(lit(0), lit(63)), j =>
        (when(pmod(j, lit(2)) === 0, lit(0.125)).otherwise(lit(-0.125)) +
          (pmod($"id" * 131 + j.cast("long") * 17, lit(11)) - 5)
            .cast("double") * 0.002).cast("float")).as("embedding"),
      lit(9).as("label"))
    IvfIndex.append(spark, idx, wave)
    val (fit1, tail1) = pqHealth()
    assert(fit1 < fit0,
      s"quantization fit must DROP on a wave the frozen codebooks " +
        s"cannot represent: $fit0 -> $fit1")
    assert(tail1 > 0.0, s"the wave must show as raw tail: $tail1")

    // measured maintenance: thresholds pinned between the healthy and
    // drifted readings so exactly this drift triggers the sidecar
    // refresh (and only the sidecar — centroid thresholds sit loose)
    val report = IvfIndex.maintainIvf(spark, idx,
      maxSkew = 1e9, minFit = 0.0,
      minPqFit = (fit0 + fit1) / 2, maxPqTail = 1.0)
    assert(!report.rebuilt && report.sidecarRebuilt,
      s"drift must trigger the sidecar refresh, not a retrain: $report")
    val (fit2, tail2) = pqHealth()
    assert(fit2 > fit1 && tail2 == 0.0,
      s"the refresh must restore fit and absorb the tail: " +
        s"$fit1 -> $fit2, tail $tail2")

    // an idle pass after the refresh does nothing
    val idle = IvfIndex.maintainIvf(spark, idx,
      maxSkew = 1e9, minFit = 0.0,
      minPqFit = (fit0 + fit1) / 2, maxPqTail = 1.0)
    assert(!idle.rebuilt && !idle.sidecarRebuilt,
      s"a healthy index must not re-trigger maintenance: $idle")

    // and compressed serving stays exact against the raw path
    val (pid, pemb) = {
      val r = graft.sources.Tables.load(spark, sfDir, "embeddings")
        .orderBy($"vec_id").limit(1).collect().head
      (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding")
          .map(_.toDouble).toArray)
    }
    val raw = IvfIndex.probeTopK(spark, idx, pemb, k = 5,
      excludeId = Some(pid)).collect().toSeq
    val adc = IvfIndex.probeTopKAdc(spark, idx, pemb, k = 5,
      excludeId = Some(pid)).collect().toSeq
    assert(adc == raw, "serving parity must hold through maintenance")
  }

  test("pq_fit runs on a deterministic hash SAMPLE above the full-scan floor: pinned sample size, drift still visible") {
    val idx = java.nio.file.Files.createTempDirectory("graft-pq-sample")
      .toString
    IvfIndex.build(spark, sfDir, idx)
    // grow the corpus past the full-scan floor with shifted twins so a
    // maintenance tick must SAMPLE (1-in-8), never scan
    (1 to 3).foreach { i =>
      IvfIndex.append(spark, idx,
        graft.sources.Tables.load(spark, sfDir, "embeddings")
          .select(($"vec_id" + i * 100000L).as("vec_id"), $"label",
            $"embedding"))
    }
    IvfIndex.buildPqSidecar(spark, idx)
    def health(): (Double, Long, Long) = {
      val r = IvfIndex.describeIvf(spark, idx).collect()(0)
      (r.getAs[Double]("pq_fit"), r.getAs[Long]("pq_fit_sample"),
        r.getAs[Long]("n_vectors"))
    }
    val (fit0, sample0, n0) = health()
    assert(n0 >= IvfIndex.PqFitFullScanFloor,
      s"the staged corpus must cross the floor: $n0")
    assert(sample0 > 0 && sample0 < n0,
      s"the pass must sample, not scan: $sample0 of $n0")
    assert(fit0 > 0.8, s"sampled fit must still read healthy: $fit0")
    // deterministic: a second tick samples exactly the same rows
    assert(health()._2 == sample0,
      "the hash sample must be identical across ticks")
    // a drifted wave lands in the sample at its corpus-wide rate and
    // drags the SAMPLED metric down — sampling loses no drift signal
    val wave = spark.range(400).select(
      ($"id" + 800000L).as("vec_id"),
      transform(sequence(lit(0), lit(63)), j =>
        (when(pmod(j, lit(2)) === 0, lit(0.125)).otherwise(lit(-0.125)) +
          (pmod($"id" * 131 + j.cast("long") * 17, lit(11)) - 5)
            .cast("double") * 0.002).cast("float")).as("embedding"),
      lit(9).as("label"))
    IvfIndex.append(spark, idx, wave)
    val (fit1, sample1, n1) = health()
    assert(n1 == n0 + 400 && sample1 > sample0,
      s"the wave must enter the sample at its corpus rate: " +
        s"$sample0 -> $sample1")
    assert(fit1 < fit0,
      s"sampled fit must DROP on a drifted wave: $fit0 -> $fit1")
  }

  test("a centroid retrain re-derives the sidecar the previous generation carried — serving never silently decays to raw scans") {
    val idx = java.nio.file.Files.createTempDirectory("graft-pq-regen")
      .toString
    IvfIndex.build(spark, sfDir, idx)
    IvfIndex.buildPqSidecar(spark, idx)
    // force the centroid retrain (impossible thresholds) — the new
    // generation starts with NO sidecar; maintenance must rebuild it
    val report = IvfIndex.maintainIvf(spark, idx,
      maxSkew = 0.0, minFit = 2.0)
    assert(report.rebuilt && report.sidecarRebuilt,
      s"a retrain must carry the sidecar forward: $report")
    val r = IvfIndex.describeIvf(spark, idx).collect()(0)
    assert(r.getAs[Double]("pq_fit") > 0.8 &&
      r.getAs[Double]("pq_tail_frac") == 0.0,
      s"the new generation must serve compressed: $r")
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
