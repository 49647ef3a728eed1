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
  * file): a generation is staged into a WRITER-TAGGED hidden dir
  * (`.g<N>-stage-<writer>` — two racing maintainers can never clobber
  * each other's files), renamed whole into `g<N>`, then published by
  * an atomic exclusive CREATE of its `_COMMITTED` marker; a maintainer
  * that loses the rename discards its own staging and fails loudly
  * with the live index untouched. Readers resolve the max committed
  * generation ONCE and read both dirs from it, so a probe racing a
  * rebuild always pairs vectors with the centroids that assigned
  * them — never new vectors under old centroids. Each publish keeps
  * the previously-committed generation as read grace (a probe that
  * resolved just before the swap still completes) and reclaims older
  * ones; a crash mid-rebuild leaves an UNCOMMITTED staging dir that
  * readers never see and a later publish sweeps. Crash-leftover bare
  * `g<N>` dirs without a marker are skipped by numbering (the next
  * publish takes N+1), never renamed into. Pre-generational flat
  * layouts (`<indexPath>/vectors`, `/centroids`) still resolve when
  * no committed generation exists.
  *
  * APPEND vs REBUILD concurrency: [[append]] is the normal ingestion
  * path and may run beside a scheduled [[rebuild]] without losing
  * data. Rebuild pins its training input to an explicit FILE SNAPSHOT
  * of the live generation, then before publishing re-lists and folds
  * any files an overlapping append landed after the snapshot into the
  * new generation (assigned under the NEW centroids); a `_SOURCE`
  * manifest in each rebuilt generation records exactly which source
  * files were incorporated, and both a post-publish sweep and the
  * START of the next rebuild fold in stragglers that appended to the
  * grace generation after the cutover. The one residual window: an
  * append that resolved its generation and then stayed in flight
  * across an ENTIRE subsequent rebuild cycle can still lose its wave
  * when that generation is reclaimed two publishes later — appends
  * should complete within one rebuild period (minutes vs. the
  * scheduled-maintenance cadence). */
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

  private val StageName = "\\.g(\\d+)-stage-.*".r

  /** The next generation NUMBER: one past the max `g<N>` dir present,
    * committed or not — a crash-leftover bare dir is skipped by
    * numbering, never renamed into (renaming onto an existing dir
    * would NEST the staging inside it on HDFS semantics). */
  private def nextGen(fs: org.apache.hadoop.fs.FileSystem,
      indexPath: String): Long = {
    val root = hp(indexPath)
    if (!fs.exists(root)) 0L
    else fs.listStatus(root).iterator
      .filter(_.isDirectory)
      .flatMap(_.getPath.getName match {
        case GenName(n) => Some(n.toLong)
        case _ => None
      })
      .foldLeft(-1L)(math.max) + 1L
  }

  /** Publish a fully-staged generation: rename the writer-tagged
    * staging dir into `g<gen>` (a lost race — the destination already
    * claimed by another maintainer — discards OUR staging and fails
    * loudly; the winner's files are never touched), create the
    * `_COMMITTED` marker, then reclaim everything older than the
    * grace generation plus any stale staging dirs at or below `gen`.
    *
    * `expectLive` (set by [[rebuild]]) pins the committed generation
    * this writer derived from: if another maintainer committed in the
    * meantime, OUR generation would silently shadow theirs — and any
    * appends folded into it — so the publish re-checks the live
    * committed generation after the rename and discards itself loudly
    * on a mismatch (the dest carries no marker yet, so no probe ever
    * resolved it). This detects overlapping rebuilds even when their
    * generation NUMBERS differ; the residual window is the instants
    * between this check and the marker create, covered by the
    * single-writer contract. */
  private def publishGen(s: SparkSession, indexPath: String, gen: Long,
      stage: org.apache.hadoop.fs.Path,
      expectLive: Option[Option[Long]] = None): Unit = {
    val fs = fsOf(s, indexPath)
    val dest = hp(s"$indexPath/g$gen")
    val renamed =
      try fs.rename(stage, dest)
      catch { case _: java.io.IOException => false }
    // rename onto an existing dir NESTS src inside dest — detect the
    // nest (dest/<stageName> exists) as a lost race too
    val nested = new org.apache.hadoop.fs.Path(dest, stage.getName)
    if (!renamed || fs.exists(nested)) {
      fs.delete(if (fs.exists(nested)) nested else stage, true)
      throw new IllegalStateException(
        s"ivf publish lost the race for generation $gen of $indexPath " +
          "— rebuild is single-writer by contract; this writer's " +
          "staging was discarded and the live index is untouched")
    }
    expectLive.foreach { expected =>
      val nowLive = committedGen(s, indexPath)
      if (nowLive != expected) {
        fs.delete(dest, true)
        throw new IllegalStateException(
          s"ivf publish of generation $gen of $indexPath aborted: the " +
            s"live committed generation moved $expected -> $nowLive " +
            "since this rebuild snapshotted its source — publishing " +
            "would shadow the newer generation (and any waves folded " +
            "into it); this writer's staging was discarded and the " +
            "live index is untouched")
      }
    }
    fs.create(new org.apache.hadoop.fs.Path(dest, "_COMMITTED"), false)
      .close()
    // keep `gen` and the newest PREVIOUSLY-committed generation as
    // read grace for in-flight probes; crash-leftover bare dirs and
    // committed ancestors beyond the grace are reclaimed
    val grace = fs.listStatus(hp(indexPath)).iterator
      .filter(_.isDirectory)
      .flatMap(st => st.getPath.getName match {
        case GenName(n) if n.toLong < gen && fs.exists(
          new org.apache.hadoop.fs.Path(st.getPath, "_COMMITTED")) =>
          Some(n.toLong)
        case _ => None
      })
      .foldLeft(Option.empty[Long])((acc, g) =>
        Some(acc.fold(g)(math.max(_, g))))
    fs.listStatus(hp(indexPath)).foreach { st =>
      val drop = st.getPath.getName match {
        case GenName(n) => n.toLong != gen && !grace.contains(n.toLong)
        // a stale staging at or below `gen` is a crash leftover or a
        // lost racer; stagings ABOVE `gen` may belong to a live
        // maintainer that already saw this publish — leave them
        case StageName(n) => n.toLong <= gen
        // legacy flat dirs are the pre-generational "generation":
        // grace them until a previously-committed generation exists
        case "vectors" | "centroids" => grace.isDefined
        case _ => false
      }
      if (drop) fs.delete(st.getPath, true)
    }
  }

  /** Every data file currently under a vectors dir (qualified path
    * strings, `_`/`.`-prefixed bookkeeping skipped) — the snapshot
    * unit the rebuild/append race detection diffs on. */
  private def listVectorFiles(fs: org.apache.hadoop.fs.FileSystem,
      vecDir: String): Set[String] = {
    val p = hp(vecDir)
    if (!fs.exists(p)) Set.empty
    else {
      val base = fs.makeQualified(p)
      val it = fs.listFiles(p, true)
      val b = Set.newBuilder[String]
      while (it.hasNext) {
        val st = it.next()
        val n = st.getPath.getName
        if (st.isFile && !n.startsWith("_") && !n.startsWith(".")) {
          // the recursive listing also descends into bookkeeping trees
          // (an in-flight Spark write's _temporary/attempt dirs hold
          // files already named part-*) — a snapshot/diff that admits
          // them reads half-written footers or double-counts a wave
          // whose files reappear under their committed path, so only
          // files with no hidden ANCESTOR dir count
          var anc = st.getPath.getParent
          var hidden = false
          while (anc != null && anc != base && !hidden) {
            val an = anc.getName
            hidden = an.startsWith("_") || an.startsWith(".")
            anc = anc.getParent
          }
          if (!hidden) b += st.getPath.toString
        }
      }
      b.result()
    }
  }

  /** Read EXACTLY the given files of a cell-partitioned vectors dir
    * (basePath keeps the `cell` partition column derivable), projected
    * to the corpus schema — the pinned-snapshot read that makes
    * fold-in diffs exact: a file is either in the snapshot (read once)
    * or in a later diff (folded once), never both. */
  private def readVectorFiles(s: SparkSession, vecDir: String,
      files: Iterable[String]): DataFrame =
    s.read
      .option("basePath", vecDir)
      .parquet(files.toSeq.sorted: _*)
      .select("vec_id", "label", "embedding")

  /** Assign `files` (vectors that landed in `srcVecDir` outside a
    * rebuild's snapshot) under `centsDf` and append them into
    * `destVecDir` — the fold-in step of the append/rebuild protocol. */
  private def foldIn(s: SparkSession, srcVecDir: String,
      files: Set[String], centsDf: DataFrame, destVecDir: String): Unit =
    if (files.nonEmpty)
      assignCells(readVectorFiles(s, srcVecDir, files), centsDf)
        .write.mode("append").partitionBy("cell").parquet(destVecDir)

  /** `_SOURCE` manifest inside a rebuilt generation: which source
    * vectors dir it was trained from and exactly which of its files
    * were incorporated — the next rebuild diffs the source's CURRENT
    * listing against this to fold in stragglers that appended to the
    * grace generation after the cutover. */
  private def writeSource(fs: org.apache.hadoop.fs.FileSystem,
      genDir: org.apache.hadoop.fs.Path, srcVecDir: String,
      files: Set[String]): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(genDir, "_SOURCE"), true)
    try out.write(
      (s"src $srcVecDir" +: files.toSeq.sorted.map("f " + _))
        .mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readSource(fs: org.apache.hadoop.fs.FileSystem,
      genDir: org.apache.hadoop.fs.Path): Option[(String, Set[String])] = {
    val p = new org.apache.hadoop.fs.Path(genDir, "_SOURCE")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val lines = text.linesIterator.toSeq
      lines.collectFirst { case l if l.startsWith("src ") => l.drop(4) }
        .map(_ -> lines.collect { case l if l.startsWith("f ") => l.drop(2) }
          .toSet)
    }
  }

  /** Fold into the LIVE generation any files appended to its SOURCE
    * (grace) generation after the previous rebuild's final sweep —
    * the backstop that runs at the start of every rebuild, BEFORE the
    * grace generation can be reclaimed by this rebuild's publish.
    * Assignment uses the live generation's own frozen centroids
    * (exactly an [[append]] of those vectors), so it is safe on a
    * committed generation. */
  private def sweepSourceStragglers(s: SparkSession,
      indexPath: String): Unit = {
    val fs = fsOf(s, indexPath)
    val live = layoutRoot(s, indexPath)
    readSource(fs, hp(live)).foreach { case (srcVecDir, incorporated) =>
      if (srcVecDir != s"$live/vectors" && fs.exists(hp(srcVecDir))) {
        val extras = listVectorFiles(fs, srcVecDir) -- incorporated
        if (extras.nonEmpty) {
          foldIn(s, srcVecDir, extras,
            s.read.parquet(s"$live/centroids"), s"$live/vectors")
          writeSource(fs, hp(live), srcVecDir, incorporated ++ extras)
        }
      }
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

  private def newStage(indexPath: String, gen: Long) =
    hp(s"$indexPath/.g$gen-stage-" +
      java.util.UUID.randomUUID().toString.take(8))

  /** Train centroids from the CORPUS TABLE and write the
    * cell-partitioned index as a fresh committed generation (staged +
    * atomic publish — see the object doc). Build re-derives from the
    * corpus, so waves [[append]]ed to a previous generation are
    * intentionally not carried — [[rebuild]] is the wave-preserving
    * retrain. */
  def build(s: SparkSession, dir: String, indexPath: String,
      cells: Int = Similarity.IvfCells,
      iters: Int = Similarity.IvfIters): Unit = {
    VectorFunctions.register(s)
    import s.implicits._
    val cents = Similarity.ivfCentroids(s, dir, cells, iters)
    val centsDf = cents.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq
      .toDF("cell", "centroid")
    val fs = fsOf(s, indexPath)
    val gen = nextGen(fs, indexPath)
    val stage = newStage(indexPath, gen)
    assignCells(Tables.load(s, dir, "embeddings"), centsDf)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$stage/vectors")
    centsDf
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/centroids")
    publishGen(s, indexPath, gen, stage)
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
    * neighbours outside nprobe cells — until a periodic [[rebuild]]
    * re-trains, the IVF analogue of compaction. Appends may run beside
    * a scheduled rebuild: the rebuild's snapshot-diff fold-in (see the
    * object doc) carries a concurrently-appended wave into the new
    * generation, so a completed append is never lost to the cutover.
    * `vectors` must carry the corpus schema (vec_id, label,
    * embedding). */
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
    * consistent (vectors, centroids) pair; a racing [[append]] is
    * carried by the snapshot-diff fold-in (object doc). A crash before
    * the publish leaves the live generation untouched and an invisible
    * writer-tagged staging dir a later publish sweeps. Rebuild stays
    * single-writer by contract — a lost publish race discards only the
    * loser's own staging and fails loudly. */
  def rebuild(s: SparkSession, indexPath: String,
      cells: Int = Similarity.IvfCells,
      iters: Int = Similarity.IvfIters): Unit =
    rebuildImpl(s, indexPath, cells, iters, () => ())

  /** [[rebuild]] with a test seam (`afterStage` fires after the new
    * generation is staged but before the fold-in diff — the widest
    * point of the append/rebuild race window). */
  private[graft] def rebuildImpl(s: SparkSession, indexPath: String,
      cells: Int, iters: Int, afterStage: () => Unit): Unit = {
    VectorFunctions.register(s)
    import s.implicits._
    val fs = fsOf(s, indexPath)
    // backstop first: fold grace-generation stragglers into the live
    // generation BEFORE this rebuild snapshots it (and before this
    // rebuild's publish reclaims the grace dir they live in)
    sweepSourceStragglers(s, indexPath)
    // resolve the source generation ONCE and pin the publish to it:
    // an overlapping rebuild that commits first moves the live gen,
    // and our publish must then fail loudly instead of shadowing it
    val srcGen = committedGen(s, indexPath)
    val live = srcGen.fold(indexPath)(g => s"$indexPath/g$g")
    val liveVecDir = s"$live/vectors"
    val gen = nextGen(fs, indexPath)
    val stage = newStage(indexPath, gen)
    // pin training to an explicit file snapshot: everything in `snap`
    // is incorporated by the train+assign read below; everything a
    // concurrent append lands after it shows up as a listing diff and
    // is folded in exactly once
    var snap = listVectorFiles(fs, liveVecDir)
    require(snap.nonEmpty,
      s"rebuild: $indexPath has no vectors to retrain on")
    val vecs = readVectorFiles(s, liveVecDir, snap)
    val cents = Similarity.trainIvfCentroidsFrom(s,
      vecs.select($"vec_id", $"embedding"), cells, iters)
    val centsDf = cents.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq
      .toDF("cell", "centroid")
    assignCells(vecs, centsDf)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$stage/vectors")
    centsDf.coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/centroids")
    afterStage()
    // fold in waves an overlapping append landed since the snapshot —
    // re-diff until quiet so a publish never drops a completed append
    var attempts = 0
    var fresh = listVectorFiles(fs, liveVecDir) -- snap
    while (fresh.nonEmpty && attempts < 5) {
      foldIn(s, liveVecDir, fresh, centsDf, s"$stage/vectors")
      snap ++= fresh
      attempts += 1
      fresh = listVectorFiles(fs, liveVecDir) -- snap
    }
    if (fresh.nonEmpty) {
      fs.delete(stage, true)
      throw new IllegalStateException(
        s"rebuild of $indexPath: appends are landing faster than " +
          s"fold-in can absorb them ($attempts rounds) — quiesce the " +
          "append path during rebuild; staging discarded, live index " +
          "untouched")
    }
    writeSource(fs, stage, liveVecDir, snap)
    publishGen(s, indexPath, gen, stage, expectLive = Some(srcGen))
    // post-publish sweep: an append that resolved the OLD generation
    // just before the marker landed may have written after the final
    // pre-publish diff; appending to the now-committed generation
    // under its frozen centroids is safe, so fold those in too (the
    // next rebuild's start-of-run sweep is the backstop for anything
    // still in flight)
    val late = listVectorFiles(fs, liveVecDir) -- snap
    if (late.nonEmpty) {
      foldIn(s, liveVecDir, late, centsDf, s"$indexPath/g$gen/vectors")
      writeSource(fs, hp(s"$indexPath/g$gen"), liveVecDir, snap ++ late)
    }
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
    // fold grace-generation stragglers in FIRST (one listing + a diff
    // when quiet) so the health reading — and any triggered retrain —
    // sees every wave, including one stranded by a cutover race
    sweepSourceStragglers(s, indexPath)
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

  /** BATCH serving from the persisted index — one distributed pass for
    * a whole frame of probes (the offline-inference shape: score a
    * query table against the corpus, not one vector at a time from the
    * driver). `probes` must carry (probe_id: long, embedding); returns
    * (probe_id, vec_id, label, sim, rank) with `rank` 1..k per probe.
    *
    * The plan keeps both IVF economies at batch scale:
    *  - cell RANKING rides the packed 1-row broadcast model (plan size
    *    independent of K, same argmax shape as [[assignCells]]), and
    *    per-probe tie-breaks match [[probeTopK]] exactly (max sim,
    *    then min cell — the struct sort is position-independent);
    *  - the vectors SCAN reads only the UNION of probed cells — the
    *    probed-cell set (≤ K values, collected like every other
    *    bounded model state) lands as a partition filter, so the scan
    *    cost is ~|cells probed|/K of the corpus, not the corpus;
    *  - the probe side (|probes| × nprobe rows) BROADCASTS onto the
    *    pruned scan — no shuffle of corpus vectors; the only shuffle
    *    is the per-probe top-k window over candidate hits. For probe
    *    batches too big to broadcast, shard the probe frame and union
    *    — each shard keeps this plan.
    * `excludeSelf` drops vec_id == probe_id hits (corpus-vs-itself
    * queries, parity with [[probeTopK]]'s excludeId). */
  def probeTopKBatch(s: SparkSession, indexPath: String, probes: DataFrame,
      k: Int = 10, nprobe: Int = Similarity.IvfProbes,
      excludeSelf: Boolean = false): DataFrame = {
    VectorFunctions.register(s)
    import s.implicits._
    // one resolution pins the generation for model, pruning, and scan
    val root = layoutRoot(s, indexPath)
    val packed = broadcast(s.read.parquet(s"$root/centroids").agg(
      collect_list(struct(col("cell"), col("centroid"))).as("cents")))
    // rank cells per probe: sort ascending on (-dot, cell) ≡ probeTopK's
    // (max sim, min cell); scaling by the probe's norm cannot change a
    // per-probe ordering, so the raw dot ranks identically to cosine
    val ranked = probes
      .select($"probe_id", $"embedding".as("probe_emb"))
      .crossJoin(packed)
      .withColumn("pcell",
        explode(transform(
          slice(array_sort(transform($"cents", c =>
            struct(
              (-VectorFunctions.dot($"probe_emb", c.getField("centroid")))
                .as("negsim"),
              c.getField("cell").as("cell")))), 1, nprobe),
          s => s.getField("cell"))))
      .drop("cents")
    // the probed-cell union is bounded by K — collect it so the scan
    // carries a LITERAL partition filter (file pruning at the index)
    val cellsNeeded = ranked.select($"pcell").distinct()
      .collect().map(_.getInt(0)).sorted
    val cand = s.read.parquet(s"$root/vectors")
      .filter($"cell".isin(cellsNeeded.map(Int.box).toSeq: _*))
    val hits = cand
      .join(broadcast(ranked), $"cell" === $"pcell")
      .withColumn("sim",
        round(VectorFunctions.cosine($"embedding", $"probe_emb"), 3))
      .filter(!isnan($"sim") && $"sim".isNotNull)
    val kept = if (excludeSelf) hits.filter($"vec_id" =!= $"probe_id")
      else hits
    import org.apache.spark.sql.expressions.Window
    kept
      .withColumn("rank", row_number().over(
        Window.partitionBy($"probe_id").orderBy($"sim".desc, $"vec_id")))
      .filter($"rank" <= k)
      .select($"probe_id", $"vec_id", $"label", $"sim", $"rank")
  }

  // ------------------------------------------------- registry drive
  // ------------------------------------------------- PQ codes sidecar
  /** PQ CODES SIDECAR — generation-pinned compression for serving
    * ([[ProductQuant]]'s codes, persisted next to the vectors they
    * encode):
    *
    *   <root>/pqcodes/cell=<c>/...parquet   (vec_id, codes) per cell
    *   <root>/pqbooks/...parquet            (sub, code, cvec)
    *   <root>/_PQSNAPSHOT                   (encoded-file manifest, LAST)
    *
    * Trains codebooks on the INDEX's own vectors (a pinned file
    * snapshot of the live generation — same posture as [[rebuild]]'s
    * training input) and encodes that snapshot cell-partitioned.
    * Vectors [[append]]ed AFTER the sidecar are served as a raw
    * UNCOMPACTED TAIL by [[probeTopKAdc]] (the snapshot diff is exact
    * by file identity — a vector is either coded or in the tail,
    * never both, never neither); re-running buildPqSidecar absorbs
    * the tail, the same compaction cadence as [[rebuild]]. The
    * `_PQSNAPSHOT` marker is written LAST, so a crash mid-build
    * leaves no readable sidecar (probes keep raw-scanning); a rebuild
    * publishes a NEW generation with no sidecar, so a stale sidecar
    * can never pair with centroids that didn't assign it.
    * Maintenance posture: single sidecar maintainer per index, like
    * [[rebuild]]'s contract. */
  def buildPqSidecar(s: SparkSession, indexPath: String,
      m: Int = ProductQuant.Subspaces,
      ks: Int = ProductQuant.CodebookSize,
      iters: Int = ProductQuant.TrainIters): Unit = {
    VectorFunctions.register(s)
    import s.implicits._
    val root = layoutRoot(s, indexPath)
    val fs = fsOf(s, root)
    val files = listVectorFiles(fs, s"$root/vectors")
    require(files.nonEmpty, s"buildPqSidecar: no vectors under $root")
    val marker = hp(s"$root/_PQSNAPSHOT")
    if (fs.exists(marker)) fs.delete(marker, false) // invalidate first
    val snap = s.read.option("basePath", s"$root/vectors")
      .parquet(files.toSeq.sorted: _*)
      .select($"vec_id", $"embedding", $"cell")
    val uv = ProductQuant.withUnit(snap)
    val cb = ProductQuant.trainCodebooksFrom(s,
      uv.select($"vec_id", $"u"), m, ks, iters)
    val d = cb(0)(0).length
    uv.crossJoin(broadcast(ProductQuant.packedBooks(s, cb)))
      .withColumn("codes", ProductQuant.codesCol(m, d))
      .select($"vec_id", $"cell", $"codes")
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$root/pqcodes")
    cb.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (c, i) => (j, i, c) }
    }.toSeq.toDF("sub", "code", "cvec")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$root/pqbooks")
    val out = fs.create(marker, true)
    try out.write(files.toSeq.sorted.map("f " + _)
      .mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readPqSnapshot(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Option[Set[String]] = {
    val p = hp(s"$root/_PQSNAPSHOT")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Some(text.linesIterator.collect {
        case l if l.startsWith("f ") => l.drop(2)
      }.toSet)
    }
  }

  /** Serving from the COMPRESSED index: the ADC stage scans only
    * (vec_id, codes) of the probed cells — at [[ProductQuant]]'s 10
    * bytes/vector that read is ~25× smaller than the float scan
    * [[probeTopK]] pays, on top of the same nprobe/cells partition
    * pruning (spec asserts the executed plan's pqcodes scan reads no
    * embedding column). Exact cosine then re-ranks ONLY the ADC
    * shortlist plus the uncompacted tail (files appended after the
    * sidecar snapshot — read raw, always candidates), so the result
    * matches [[probeTopK]] whenever the true top-k survives the
    * shortlist cut (the same spec-gated margin contract as
    * [[ProductQuant.sPqRerank]]). Fails loudly if no committed
    * sidecar exists. */
  def probeTopKAdc(s: SparkSession, indexPath: String,
      probe: Array[Double], k: Int = 10,
      nprobe: Int = Similarity.IvfProbes,
      shortlist: Int = ProductQuant.RerankShortlist,
      excludeId: Option[Long] = None): DataFrame = {
    VectorFunctions.register(s)
    import s.implicits._
    // one resolution pins generation + sidecar + tail diff together
    val root = layoutRoot(s, indexPath)
    val fs = fsOf(s, root)
    val snapshot = readPqSnapshot(fs, root).getOrElse(
      throw new IllegalStateException(
        s"probeTopKAdc: no committed PQ sidecar under $root — run " +
          "buildPqSidecar first"))
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
    val books = s.read.parquet(s"$root/pqbooks").collect()
    val m = books.map(_.getAs[Int]("sub")).max + 1
    val ks = books.map(_.getAs[Int]("code")).max + 1
    val cb = Array.ofDim[Array[Double]](m, ks)
    books.foreach { r =>
      cb(r.getAs[Int]("sub"))(r.getAs[Int]("code")) =
        r.getAs[scala.collection.Seq[Double]]("cvec").toArray
    }
    val lut = ProductQuant.lutFor(cb.map(_.toArray), probeU)
    val adcBase = s.read.parquet(s"$root/pqcodes")
      .filter($"cell".isin(probeCells: _*))
    val adcCand = excludeId.fold(adcBase)(id => adcBase.filter($"vec_id" =!= id))
      .withColumn("adc", ProductQuant.adcScore(lut, m, ks))
      .orderBy($"adc".desc, $"vec_id").limit(shortlist)
      .select($"vec_id")
    // uncompacted tail: appended after the sidecar — always candidates
    val tail = listVectorFiles(fs, s"$root/vectors") -- snapshot
    val cand =
      if (tail.isEmpty) adcCand
      else adcCand.union(
        s.read.option("basePath", s"$root/vectors")
          .parquet(tail.toSeq.sorted: _*)
          .filter($"cell".isin(probeCells: _*))
          .select($"vec_id"))
    val pc = array(probe.map(lit): _*)
    val scanned = s.read.parquet(s"$root/vectors")
      .filter($"cell".isin(probeCells: _*))
      .join(broadcast(cand.distinct()), Seq("vec_id"), "left_semi")
    excludeId.fold(scanned)(id => scanned.filter($"vec_id" =!= id))
      .withColumn("sim", round(VectorFunctions.cosine($"embedding", pc), 3))
      .filter(!isnan($"sim") && $"sim".isNotNull)
      .select($"vec_id", $"label", $"sim")
      .orderBy($"sim".desc, $"vec_id")
      .limit(k)
  }

  /** Process-lifetime staged PERSISTED index per (sfDir, corpus
    * fingerprint) — the same staging pattern as the lake registry
    * drives (LakeLayout.stagedBase): the timed registry span measures
    * SERVING from an existing index, not the one-time build it serves
    * from (warmup/fill runs absorb staging). Fingerprint-keyed so a
    * re-generated sfDir re-stages automatically. */
  private val stageCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), String]()

  private def stagedIndex(s: SparkSession, dir: String): String =
    stageCache.computeIfAbsent(
      (dir, Similarity.corpusFingerprint(s, dir)), { _ =>
        // driver-local temp staging is a LOCAL-master-only drive
        // convenience (same posture as the lake registry staging):
        // executors on a real cluster can't see the driver's disk
        require(s.sparkContext.master.startsWith("local"),
          "staged registry IVF index uses driver-local temp storage — " +
            "point build() at shared storage (HDFS/S3) on a non-local " +
            "master")
        val root = java.nio.file.Files
          .createTempDirectory("graft-ivf-reg").toString
        build(s, dir, root)
        root
      })

  /** Registry drive: BATCH ANN serving from the persisted index — a
    * 25-probe frame against the staged corpus index at the production
    * probe width. Rows-only by design: the centroids are engine-local
    * model state (no DuckDB twin ranks the same cells); correctness is
    * pinned by the batch-vs-per-probe parity spec (IvfBatchProbeSpec)
    * and the serving path's recall spec. */
  def sIvfBatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val probes = Tables.load(s, dir, "embeddings")
      .filter($"vec_id" < 25)
      .select($"vec_id".as("probe_id"), $"embedding")
    probeTopKBatch(s, stagedIndex(s, dir), probes,
      k = 5, nprobe = Similarity.IvfProbes, excludeSelf = true)
      .orderBy($"probe_id", $"rank")
  }

  // sidecar staged at most once per staged index root
  private val pqStaged =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private def stagedPqIndex(s: SparkSession, dir: String): String = {
    val root = stagedIndex(s, dir)
    pqStaged.computeIfAbsent(root, { _ => buildPqSidecar(s, root); true })
    root
  }

  /** Registry drive: serving from the COMPRESSED persisted index —
    * [[probeTopKAdc]] against the staged corpus index with its PQ
    * sidecar. Rows-only by design (engine-local centroids and
    * codebooks); correctness is pinned by IvfPqSidecarSpec's exact
    * parity with raw serving plus the no-floats plan assertion. */
  def sIvfPqServe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val probe = Tables.load(s, dir, "embeddings")
      .filter($"vec_id" === Similarity.ProbeId)
      .select($"embedding").head()
      .getAs[scala.collection.Seq[Float]]("embedding")
      .map(_.toDouble).toArray
    probeTopKAdc(s, stagedPqIndex(s, dir), probe,
      excludeId = Some(Similarity.ProbeId))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("s_ivf_batch" -> (sIvfBatch _),
      "s_ivfpq_serve" -> (sIvfPqServe _))
  val oracle: Map[String, String] = Map.empty
}
