package graft.operators

import graft.functions.VectorFunctions
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index — the production serving shape for ANN at 100 TB.
  * [[Similarity.sIvfTopk]] retrains per query (fine for a benchmark,
  * wasteful for a serving fleet); here the index is built ONCE as a
  * GENERATIONAL lake layout:
  *
  *   <indexPath>/g<N>/vectors/cell=<c>/...parquet  (cell-partitioned)
  *   <indexPath>/g<N>/centroids/...parquet         (K rows of model state)
  *   <indexPath>/g<N>/_COMMITTED                   (atomic publish marker)
  *
  * and every probe reads ONLY its `nprobe` nearest cells — partition
  * pruning at the FileIndex, so a probe's scan cost is
  * ~nprobe/cells of the corpus regardless of corpus size, with zero
  * training work on the query path. Centroids are deterministic
  * ([[Similarity.ivfCentroids]]'s fixed-point means), so rebuilding the
  * index on the same corpus yields byte-identical assignments.
  *
  * GENERATIONS are what make [[rebuild]] atomic (the manifest-pointer
  * posture of [[graft.sources.LakeLayout]], scaled down to one marker
  * file): a generation's vectors and centroids are written fully, then
  * published by an atomic exclusive CREATE of its `_COMMITTED` marker.
  * Readers resolve the max committed generation ONCE and read both
  * dirs from it, so a probe racing a rebuild always pairs vectors with
  * the centroids that assigned them — never new vectors under old
  * centroids (the round-16 two-dir-rename hazard). Each publish keeps
  * the immediately-previous generation as read grace (a probe that
  * resolved just before the swap still completes) and reclaims older
  * ones; a crash mid-rebuild leaves an UNCOMMITTED staging dir that
  * readers never see and the next rebuild overwrites. Pre-generational
  * flat layouts (`<indexPath>/vectors`, `/centroids`) still resolve
  * when no committed generation exists. */
object IvfIndex {

  private def hp(p: String) = new org.apache.hadoop.fs.Path(p)

  private def fsOf(s: SparkSession, path: String) =
    hp(path).getFileSystem(s.sessionState.newHadoopConf())

  private val GenName = "g(\\d+)".r

  /** Max committed generation, or None for empty/legacy layouts. */
  private[graft] def committedGen(s: SparkSession,
      indexPath: String): Option[Long] = {
    val fs = fsOf(s, indexPath)
    val root = hp(indexPath)
    if (!fs.exists(root)) None
    else fs.listStatus(root).iterator
      .filter(_.isDirectory)
      .flatMap(st => st.getPath.getName match {
        case GenName(n)
          if fs.exists(new org.apache.hadoop.fs.Path(
            st.getPath, "_COMMITTED")) => Some(n.toLong)
        case _ => None
      })
      .foldLeft(Option.empty[Long])((acc, g) =>
        Some(acc.fold(g)(math.max(_, g))))
  }

  /** The dir holding the CURRENT consistent (vectors, centroids) pair:
    * the max committed generation, or the legacy flat root when none
    * exists. Resolve once per operation — both reads must come from the
    * same resolution or a racing rebuild can mix generations. */
  private[graft] def layoutRoot(s: SparkSession, indexPath: String): String =
    committedGen(s, indexPath).fold(indexPath)(g => s"$indexPath/g$g")

  /** Publish generation `gen`: atomic exclusive create of its marker
    * (fails, never corrupts, if another maintainer published first —
    * rebuild is single-writer by contract and this enforces it), then
    * reclaim everything older than the grace generation. */
  private def commitGen(s: SparkSession, indexPath: String,
      gen: Long): Unit = {
    val fs = fsOf(s, indexPath)
    fs.create(new org.apache.hadoop.fs.Path(
      hp(s"$indexPath/g$gen"), "_COMMITTED"), false).close()
    // keep {gen, gen-1}: one grace generation for in-flight readers
    fs.listStatus(hp(indexPath)).foreach { st =>
      val drop = st.getPath.getName match {
        case GenName(n) => n.toLong < gen - 1
        // legacy flat dirs are the pre-generational "generation":
        // grace them until the SECOND generational publish
        case "vectors" | "centroids" => gen >= 1
        case _ => false
      }
      if (drop) fs.delete(st.getPath, true)
    }
  }

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

  /** Train centroids and write the cell-partitioned index as a fresh
    * committed generation (atomic publish — see the object doc). */
  def build(s: SparkSession, dir: String, indexPath: String,
      cells: Int = Similarity.IvfCells,
      iters: Int = Similarity.IvfIters): Unit = {
    VectorFunctions.register(s)
    import s.implicits._
    val cents = Similarity.ivfCentroids(s, dir, cells, iters)
    val centsDf = cents.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq
      .toDF("cell", "centroid")
    val gen = committedGen(s, indexPath).fold(0L)(_ + 1L)
    assignCells(Tables.load(s, dir, "embeddings"), centsDf)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexPath/g$gen/vectors")
    centsDf
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$indexPath/g$gen/centroids")
    commitGen(s, indexPath, gen)
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
    // one resolution for both the model read and the vector write: the
    // wave must land in the SAME generation whose frozen centroids
    // assigned it (mutating a committed generation is safe exactly
    // because assignment under its own frozen model stays consistent)
    val root = layoutRoot(s, indexPath)
    assignCells(vectors, s.read.parquet(s"$root/centroids"))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$root/vectors")
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
    val root = layoutRoot(s, indexPath)
    val centsOpt = tryRead(s"$root/centroids")
    val vecsOpt = tryRead(s"$root/vectors")
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

  /** RETRAIN as a new generation — the IVF analogue of compaction,
    * scheduled when [[describeIvf]]'s drift metrics say so. Trains
    * fresh centroids on the index's CURRENT vectors (original corpus +
    * every appended wave — unlike [[build]], which only sees the
    * corpus table), re-assigns everything into generation N+1, and
    * publishes it with one atomic marker create. Probes NEVER need
    * draining: a racing reader resolved either generation N (still on
    * disk as grace until the NEXT publish) or N+1, each an internally
    * consistent (vectors, centroids) pair. A crash before the marker
    * leaves the live generation untouched and an invisible staging dir
    * the next rebuild overwrites. Rebuild itself stays single-writer
    * (the exclusive marker create fails a lost race loudly). */
  def rebuild(s: SparkSession, indexPath: String,
      cells: Int = Similarity.IvfCells,
      iters: Int = Similarity.IvfIters): Unit = {
    VectorFunctions.register(s)
    import s.implicits._
    val live = layoutRoot(s, indexPath)
    val gen = committedGen(s, indexPath).fold(0L)(_ + 1L)
    val vecs = s.read.parquet(s"$live/vectors")
      .select("vec_id", "label", "embedding")
    val cents = Similarity.trainIvfCentroidsFrom(s,
      vecs.select($"vec_id", $"embedding"), cells, iters)
    val centsDf = cents.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq
      .toDF("cell", "centroid")
    assignCells(vecs, centsDf)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexPath/g$gen/vectors")
    centsDf.coalesce(1)
      .write.mode("overwrite").parquet(s"$indexPath/g$gen/centroids")
    commitGen(s, indexPath, gen)
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
    // one resolution pins the generation for BOTH the model collect
    // and the cell scan — a rebuild landing mid-probe cannot mix them
    val root = layoutRoot(s, indexPath)
    val cents = s.read.parquet(s"$root/centroids")
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
    val scanned = s.read.parquet(s"$root/vectors")
      .filter($"cell".isin(probeCells: _*))
    excludeId.fold(scanned)(id => scanned.filter($"vec_id" =!= id))
      .withColumn("sim", round(VectorFunctions.cosine($"embedding", pc), 3))
      .filter(!isnan($"sim") && $"sim".isNotNull)
      .select($"vec_id", $"label", $"sim")
      .orderBy($"sim".desc, $"vec_id")
      .limit(k)
  }
}
