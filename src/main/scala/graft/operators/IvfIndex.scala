package graft.operators

import graft.functions.VectorFunctions
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index — the production serving shape for ANN at 100 TB.
  * [[Similarity.sIvfTopk]] retrains per query (fine for a benchmark,
  * wasteful for a serving fleet); here the index is built ONCE as a lake
  * layout:
  *
  *   <indexPath>/vectors/cell=<c>/...parquet   (vectors partitioned by cell)
  *   <indexPath>/centroids/...parquet          (K rows of model state)
  *
  * and every probe reads ONLY its `nprobe` nearest cells — partition
  * pruning at the FileIndex, so a probe's scan cost is
  * ~nprobe/cells of the corpus regardless of corpus size, with zero
  * training work on the query path. Centroids are deterministic
  * ([[Similarity.ivfCentroids]]'s fixed-point means), so rebuilding the
  * index on the same corpus yields byte-identical assignments. */
object IvfIndex {

  /** Nearest-centroid assignment whose PLAN SIZE is independent of K:
    * the model rides in as DATA (one broadcast row holding the packed
    * centroid array), never as K×dim literal expression nodes. The
    * literal form is fine at K=16 but production ANN wants cells ~√N
    * (thousands) × wide embeddings — millions of literal nodes, a
    * codegen/plan-size blowup. Here the argmax is a higher-order
    * `transform` + `array_max` over the broadcast array — map-side
    * only (a 1-row broadcast nested-loop join, no shuffle), with the
    * same tie-break as the literal form (array_max on (sim, cell)
    * structs: max sim, then max cell — position-independent, so the
    * packed array's order cannot matter). `centsDf` must be
    * (cell: Int, centroid: array<double>) — K rows of model state. */
  private[graft] def assignCells(vectors: DataFrame,
      centsDf: DataFrame): DataFrame = {
    val packed = broadcast(centsDf.agg(
      collect_list(struct(col("cell"), col("centroid"))).as("cents")))
    vectors.crossJoin(packed)
      .withColumn("cell",
        array_max(transform(col("cents"), c =>
          struct(
            VectorFunctions.dot(col("embedding"), c.getField("centroid"))
              .as("sim"),
            c.getField("cell").as("cell")))).getField("cell"))
      .drop("cents")
  }

  /** Train centroids and write the cell-partitioned index. */
  def build(s: SparkSession, dir: String, indexPath: String,
      cells: Int = Similarity.IvfCells,
      iters: Int = Similarity.IvfIters): Unit = {
    VectorFunctions.register(s)
    import s.implicits._
    val cents = Similarity.ivfCentroids(s, dir, cells, iters)
    val centsDf = cents.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq
      .toDF("cell", "centroid")
    assignCells(Tables.load(s, dir, "embeddings"), centsDf)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexPath/vectors")
    centsDf
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$indexPath/centroids")
  }

  /** INCREMENTAL maintenance: assign a batch of new vectors to the
    * nearest of the index's EXISTING centroids and append them
    * cell-partitioned — O(batch) per ingest wave, no retrain, no
    * rewrite of resident cells (parquet partition dirs append). The
    * growing-corpus shape: ANN serving cannot afford a full rebuild
    * per wave at 100 TB. Centroids are FROZEN, so assignment is
    * deterministic (append-then-probe equals assign-everything-at-
    * build with the same model, spec-pinned); as the data distribution
    * drifts the cell balance degrades gracefully — probes stay exact
    * within scanned cells, recall erodes only as drift moves true
    * neighbours outside nprobe cells — until a periodic [[build]]
    * re-trains, the IVF analogue of compaction. `vectors` must carry
    * the corpus schema (vec_id, label, embedding). */
  def append(s: SparkSession, indexPath: String, vectors: DataFrame): Unit = {
    VectorFunctions.register(s)
    assignCells(vectors, s.read.parquet(s"$indexPath/centroids"))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$indexPath/vectors")
  }

  /** DRIFT OBSERVABILITY — the measured trigger for the periodic
    * retrain ([[rebuild]]), so maintenance runs on imbalance, not
    * cadence. One row of index health, all bounded by K or one
    * distributed pass:
    *  - occupancy stats (min/max/mean/p50/p90, empty cells) and
    *    `occupancy_skew` = max/mean — detects HOT CELLS: an append
    *    wave the frozen model funnels into few cells makes probe costs
    *    lopsided (a probe hitting the hot cell scans far more than
    *    nprobe/cells of the corpus);
    *  - `mean_centroid_sim` — average cosine of each vector to its
    *    cell's centroid, the model-FIT signal: drift moves it down
    *    (appended vectors live far from every frozen centroid, so
    *    recall erodes — true neighbours fall outside nprobe cells),
    *    and a retrain moves it back up. Occupancy alone cannot see a
    *    wave that lands in one cell BECAUSE the model has no better
    *    centroid for it; the fit metric does.
    * The (cell → count) frame is ≤ K rows — the same bounded model
    * state [[probeTopK]] collects. */
  def describeIvf(s: SparkSession, indexPath: String): DataFrame = {
    VectorFunctions.register(s)
    import s.implicits._
    // a just-created, empty, or partially-built index reports a
    // zero-health row — an observability call must never abort the
    // maintenance pass. An EMPTY layout has no parquet files at all
    // (partitionBy of an empty frame writes no partition dirs), so the
    // reads themselves can fail schema inference — treat that as zero.
    def tryRead(path: String) =
      try Some(s.read.parquet(path))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    val centsOpt = tryRead(s"$indexPath/centroids")
    val vecsOpt = tryRead(s"$indexPath/vectors")
    val k = centsOpt.fold(0L)(_.count()).toInt
    val occ = vecsOpt.fold(Map.empty[Int, Long])(
      _.groupBy(col("cell").cast("int").as("cell"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap)
    val counts =
      if (k == 0) IndexedSeq(0L)
      else (0 until k).map(c => occ.getOrElse(c, 0L)).sorted
    val nVec = counts.sum
    val meanOcc = nVec.toDouble / math.max(1, k)
    def pct(p: Double): Long =
      counts(math.max(0, math.min(counts.size - 1, (p * k).toInt)))
    val meanSim =
      if (k == 0 || nVec == 0L) 0.0
      else Option(vecsOpt.get
        .join(broadcast(centsOpt.get), "cell")
        .agg(avg(VectorFunctions.cosine(col("embedding"), col("centroid"))))
        .head().get(0)).fold(0.0)(_.asInstanceOf[Double])
    Seq((k.toLong, nVec, counts.count(_ == 0L).toLong,
      counts.head, counts.last, meanOcc, pct(0.5), pct(0.9),
      if (meanOcc > 0) counts.last / meanOcc else 0.0, meanSim))
      .toDF("n_cells", "n_vectors", "empty_cells", "min_occupancy",
        "max_occupancy", "mean_occupancy", "p50_occupancy",
        "p90_occupancy", "occupancy_skew", "mean_centroid_sim")
  }

  /** RETRAIN in place — the IVF analogue of compaction, scheduled when
    * [[describeIvf]]'s drift metrics say so. Trains fresh centroids on
    * the index's CURRENT vectors (original corpus + every appended
    * wave — unlike [[build]], which only sees the corpus table),
    * re-assigns everything, and swaps the new layout in. Single-writer
    * maintenance (same contract as [[build]]); probes during the final
    * swap window should be drained. */
  def rebuild(s: SparkSession, indexPath: String,
      cells: Int = Similarity.IvfCells,
      iters: Int = Similarity.IvfIters): Unit = {
    VectorFunctions.register(s)
    import s.implicits._
    val vecs = s.read.parquet(s"$indexPath/vectors")
      .select("vec_id", "label", "embedding")
    val cents = Similarity.trainIvfCentroidsFrom(s,
      vecs.select($"vec_id", $"embedding"), cells, iters)
    val centsDf = cents.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq
      .toDF("cell", "centroid")
    // stage beside the live layout, then swap: the read above is lazy,
    // so the live dirs must survive until the staged writes finish
    assignCells(vecs, centsDf)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexPath/vectors_rebuild")
    centsDf.coalesce(1)
      .write.mode("overwrite").parquet(s"$indexPath/centroids_rebuild")
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    // swap via rename-aside, never delete-first: a crash mid-swap
    // leaves the old layout recoverable under *_old instead of a
    // destroyed live index; old dirs are dropped only after the new
    // layout is fully in place
    Seq("vectors", "centroids").foreach { d =>
      val live = new org.apache.hadoop.fs.Path(root, d)
      val old = new org.apache.hadoop.fs.Path(root, s"${d}_old")
      fs.delete(old, true)
      require(!fs.exists(live) || fs.rename(live, old),
        s"rebuild: setting aside live $d failed on $indexPath")
      require(fs.rename(
        new org.apache.hadoop.fs.Path(root, s"${d}_rebuild"), live),
        s"rebuild: swapping $d failed on $indexPath")
    }
    Seq("vectors_old", "centroids_old").foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(root, d), true))
  }

  /** What one [[maintainIvf]] pass saw and did. */
  final case class IvfMaintenanceReport(skew: Double, fit: Double,
      rebuilt: Boolean)

  /** ONE-CALL measured maintenance — the policy layer over
    * [[describeIvf]] + [[rebuild]], mirroring the lake's
    * `maintainLake`: retrain exactly when the measured drift says so
    * (`occupancy_skew` above `maxSkew` — hot cells make probe costs
    * lopsided — or `mean_centroid_sim` below `minFit` — the frozen
    * model no longer represents the corpus and recall erodes), never
    * on cadence. An idle pass costs one K-row aggregate and one
    * corpus-pass average; thresholds sit loose by default so only
    * genuine drift triggers the O(corpus) retrain. */
  def maintainIvf(s: SparkSession, indexPath: String,
      maxSkew: Double = 4.0, minFit: Double = 0.15,
      cells: Int = Similarity.IvfCells,
      iters: Int = Similarity.IvfIters): IvfMaintenanceReport = {
    val d = describeIvf(s, indexPath).collect()(0)
    val skew = d.getAs[Double]("occupancy_skew")
    val fit = d.getAs[Double]("mean_centroid_sim")
    val trigger = d.getAs[Long]("n_vectors") > 0 &&
      (skew > maxSkew || fit < minFit)
    if (trigger) rebuild(s, indexPath, cells, iters)
    IvfMaintenanceReport(skew, fit, trigger)
  }

  /** Serve a top-k query from the persisted index: rank cells against
    * the probe on the driver (K rows of model state), then scan ONLY the
    * nprobe nearest cell partitions with exact cosine. `excludeId` drops
    * a known self-match (parity with [[Similarity.sIvfTopk]]). */
  def probeTopK(s: SparkSession, indexPath: String, probe: Array[Double],
      k: Int = 10, nprobe: Int = Similarity.IvfProbes,
      excludeId: Option[Long] = None): DataFrame = {
    VectorFunctions.register(s)
    import s.implicits._
    val cents = s.read.parquet(s"$indexPath/centroids")
      .collect()
      .map(r => r.getAs[Int]("cell") ->
        r.getAs[scala.collection.Seq[Double]]("centroid").toArray)
      .toMap
    val n = math.sqrt(probe.map(x => x * x).sum)
    val probeU = if (n > 0) probe.map(_ / n) else probe
    val probeCells = cents.toSeq
      .map { case (i, c) => (c.zip(probeU).map { case (a, b) => a * b }.sum, i) }
      .sortBy { case (sim, i) => (-sim, i) }.take(nprobe).map(_._2)
    val pc = array(probe.map(lit): _*)
    val scanned = s.read.parquet(s"$indexPath/vectors")
      .filter($"cell".isin(probeCells: _*))
    excludeId.fold(scanned)(id => scanned.filter($"vec_id" =!= id))
      .withColumn("sim", round(VectorFunctions.cosine($"embedding", pc), 3))
      .filter(!isnan($"sim") && $"sim".isNotNull)
      .select($"vec_id", $"label", $"sim")
      .orderBy($"sim".desc, $"vec_id")
      .limit(k)
  }
}
