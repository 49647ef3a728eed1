package graft

import graft.operators.IvfIndex
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Batch serving from the persisted IVF index
  * ([[IvfIndex.probeTopKBatch]]): one distributed pass for a probe
  * FRAME must return, per probe, exactly what the per-probe
  * [[IvfIndex.probeTopK]] serving path returns (same cell ranking,
  * same tie-breaks, same rounding) — and its vectors scan must carry
  * the probed-cell union as a PARTITION filter, so batch cost stays
  * ~|cells probed|/K of the corpus instead of the corpus. */
class IvfBatchProbeSpec extends SparkSuite {
  import spark.implicits._

  test("batch probe equals per-probe serving for every probe, and the scan prunes to the probed cells") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-batch")
      .toString
    IvfIndex.build(spark, sfDir, idx)

    val probeRows = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .orderBy($"vec_id").limit(5)
      .select($"vec_id".as("probe_id"), $"embedding")
    val batch = IvfIndex.probeTopKBatch(spark, idx, probeRows,
      k = 5, nprobe = 4, excludeSelf = true)
    val got = batch.collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(3), r.getInt(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._3).toSeq).toMap

    val probes = probeRows.collect().map(r => (r.getLong(0),
      r.getAs[scala.collection.Seq[Float]]("embedding")
        .map(_.toDouble).toArray))
    assert(got.keySet == probes.map(_._1).toSet,
      s"every probe must answer: ${got.keySet}")
    probes.foreach { case (id, emb) =>
      val single = IvfIndex.probeTopK(spark, idx, emb, k = 5, nprobe = 4,
        excludeId = Some(id)).collect()
        .zipWithIndex
        .map { case (r, i) => (r.getLong(0), r.getDouble(2), i + 1) }.toSeq
      assert(got(id) == single,
        s"probe $id: batch ${got(id)} != per-probe $single")
    }

    // the executed vectors scan must prune partitions by the probed
    // cells — a full-corpus scan per batch is the plan this API exists
    // to avoid
    // (string form: the final AQE plan nests scans inside query
    // stages, out of reach of a plain collect)
    val plan = batch.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[cell#\d+ IN""".r
      .findFirstIn(plan).isDefined,
      s"the vectors scan must carry the probed-cell partition filter:\n" +
        plan.linesIterator.filter(_.contains("FileScan"))
          .mkString("\n"))
  }

  test("filtered ANN: a metadata predicate inside the probed cells equals the brute-force filtered scan at widened nprobe") {
    import graft.operators.Similarity
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-filt")
      .toString
    IvfIndex.build(spark, sfDir, idx)
    val pemb = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .filter($"vec_id" === Similarity.ProbeId)
      .select($"embedding").head()
      .getAs[scala.collection.Seq[Float]]("embedding")
      .map(_.toDouble).toArray

    // the exact filtered truth — oracle-checked in the registry
    val exact = Similarity.sFilteredTopk(spark, sfDir).collect().toSeq
    // the serving path: same predicate inside the probed cells; the
    // filter thins survivors per cell, so nprobe widens (the standard
    // filtered-ANN lever) — at full width the answers must be EQUAL
    val cells = spark.read.parquet(
      s"${IvfIndex.layoutRoot(spark, idx)}/centroids").count().toInt
    val served = IvfIndex.probeTopK(spark, idx, pemb,
      k = 10, nprobe = cells,
      excludeId = Some(Similarity.ProbeId),
      where = Some($"label" === Similarity.FilterLabel)).collect().toSeq
    assert(served == exact,
      s"filtered serving must equal the filtered scan\nivf:   $served\n" +
        s"exact: $exact")
    // at the default nprobe the filter still applies and recall stays
    // high — at least 8 of the exact top-10 inside the probed cells
    val narrow = IvfIndex.probeTopK(spark, idx, pemb,
      k = 10, excludeId = Some(Similarity.ProbeId),
      where = Some($"label" === Similarity.FilterLabel)).collect()
      .map(_.getLong(0)).toSet
    val hits = exact.map(_.getLong(0)).count(narrow.contains)
    assert(hits >= 8,
      s"default-nprobe filtered recall too low: $hits of 10")
    // every served row satisfies the predicate
    assert(narrow.nonEmpty && IvfIndex.probeTopK(spark, idx, pemb,
      k = 10, excludeId = Some(Similarity.ProbeId),
      where = Some($"label" === Similarity.FilterLabel)).collect()
      .forall(_.getInt(1) == Similarity.FilterLabel),
      "a filtered probe must never return a non-matching row")
  }

  test("batch COMPRESSED serving equals per-probe ADC serving, and its wide scan reads codes, never floats") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-badc")
      .toString
    IvfIndex.build(spark, sfDir, idx)
    IvfIndex.buildPqSidecar(spark, idx)

    val probeRows = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .orderBy($"vec_id").limit(5)
      .select($"vec_id".as("probe_id"), $"embedding")
    val batch = IvfIndex.probeTopKBatchAdc(spark, idx, probeRows,
      k = 5, nprobe = 4, excludeSelf = true)
    val got = batch.collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(3), r.getInt(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._3).toSeq).toMap

    val probes = probeRows.collect().map(r => (r.getLong(0),
      r.getAs[scala.collection.Seq[Float]]("embedding")
        .map(_.toDouble).toArray))
    assert(got.keySet == probes.map(_._1).toSet,
      s"every probe must answer: ${got.keySet}")
    probes.foreach { case (id, emb) =>
      val single = IvfIndex.probeTopKAdc(spark, idx, emb, k = 5,
        nprobe = 4, excludeId = Some(id)).collect()
        .zipWithIndex
        .map { case (r, i) => (r.getLong(0), r.getDouble(2), i + 1) }.toSeq
      assert(got(id) == single,
        s"probe $id: batch ADC ${got(id)} != per-probe ADC $single")
    }

    // the ADC stage's scan reads (vec_id, codes) from the versioned
    // pqcodes dir and must not materialize embeddings; the float read
    // is confined to the shortlist re-rank
    val plan = batch.queryExecution.executedPlan.toString
    val pqScans = plan.linesIterator.filter(_.contains("pqcodes")).toSeq
    assert(pqScans.nonEmpty, s"expected a pqcodes scan in:\n$plan")
    assert(pqScans.forall(!_.contains("embedding")),
      s"the pqcodes scan must not read embeddings:\n${pqScans.mkString("\n")}")
    // and both scans carry the probed-cell partition filter
    assert("""PartitionFilters: \[cell#\d+ IN""".r
      .findFirstIn(plan).isDefined,
      "the scans must carry the probed-cell partition filter")

    // a post-sidecar append rides the tail per probe: an exact twin
    // of each probe must surface at sim 1.0 through the BATCH path
    IvfIndex.append(spark, idx,
      graft.sources.Tables.load(spark, sfDir, "embeddings")
        .filter($"vec_id" < 5)
        .select(($"vec_id" + 2000000L).as("vec_id"), $"label",
          $"embedding"))
    val withTail = IvfIndex.probeTopKBatchAdc(spark, idx, probeRows,
      k = 1, nprobe = 4, excludeSelf = true).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    probes.foreach { case (id, _) =>
      assert(withTail(id) == ((id + 2000000L, 1.0)),
        s"probe $id: tail twin must rank first, got ${withTail(id)}")
    }
  }

  test("FILTERED batch serving equals per-probe filtered serving — raw and compressed paths") {
    import graft.operators.{ProductQuant, Similarity}
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-fbatch")
      .toString
    IvfIndex.build(spark, sfDir, idx)
    IvfIndex.buildPqSidecar(spark, idx)
    val w = Some($"label" === Similarity.FilterLabel)
    val probeRows = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .orderBy($"vec_id").limit(5)
      .select($"vec_id".as("probe_id"), $"embedding")
    val probes = probeRows.collect().map(r => (r.getLong(0),
      r.getAs[scala.collection.Seq[Float]]("embedding")
        .map(_.toDouble).toArray))

    def perProbe(rows: Array[org.apache.spark.sql.Row])
        : Map[Long, Seq[(Long, Double, Int)]] = rows
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(3), r.getInt(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._3).toSeq).toMap

    // raw batch: the predicate applies inside the probed cells
    val rawBatch = perProbe(IvfIndex.probeTopKBatch(spark, idx, probeRows,
      k = 5, nprobe = 4, excludeSelf = true, where = w).collect())
    probes.foreach { case (id, emb) =>
      val single = IvfIndex.probeTopK(spark, idx, emb, k = 5, nprobe = 4,
        excludeId = Some(id), where = w).collect().zipWithIndex
        .map { case (r, i) => (r.getLong(0), r.getDouble(2), i + 1) }.toSeq
      assert(rawBatch.getOrElse(id, Seq.empty) == single,
        s"probe $id: filtered batch ${rawBatch.get(id)} != $single")
    }

    // compressed batch: the predicate applies at the exact re-rank,
    // the shortlist widened by the ~10 % survivor rate — per-probe
    // parity with the single-probe compressed filtered path at the
    // SAME widths
    val wide = ProductQuant.RerankShortlist * 10
    val adcBatch = perProbe(IvfIndex.probeTopKBatchAdc(spark, idx,
      probeRows, k = 5, nprobe = 4, shortlist = wide,
      excludeSelf = true, where = w).collect())
    probes.foreach { case (id, emb) =>
      val single = IvfIndex.probeTopKAdc(spark, idx, emb, k = 5,
        nprobe = 4, shortlist = wide, excludeId = Some(id), where = w)
        .collect().zipWithIndex
        .map { case (r, i) => (r.getLong(0), r.getDouble(2), i + 1) }.toSeq
      assert(adcBatch.getOrElse(id, Seq.empty) == single,
        s"probe $id: filtered batch-ADC ${adcBatch.get(id)} != $single")
    }
    // every served row satisfies the predicate on both paths
    (IvfIndex.probeTopKBatch(spark, idx, probeRows, k = 5, nprobe = 4,
        excludeSelf = true, where = w).collect() ++
      IvfIndex.probeTopKBatchAdc(spark, idx, probeRows, k = 5,
        nprobe = 4, shortlist = wide, excludeSelf = true, where = w)
        .collect())
      .foreach(r => assert(r.getInt(2) == Similarity.FilterLabel,
        s"non-matching row served: $r"))
  }
}
