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
  *   <indexPath>/g<N>-<tag>/vectors/cell=<c>/...parquet  (cell-partitioned)
  *   <indexPath>/g<N>-<tag>/centroids/...parquet   (K rows of model state)
  *   <indexPath>/_gen/<N>                          (atomic commit claim)
  *
  * Each generation may additionally carry versioned SIDECARS, all on
  * the same marker-publish recipe (dirs named inside an
  * exclusive-created marker, one grace version, lost race = loud):
  * PQ codes+books (`_pq`), SQ8 codes (`_sq8`), and TOMBSTONES
  * (`_tomb` — versioned (vec_id, tomb_v) delete/update events every
  * serving path anti-joins at its exact re-rank against each row's
  * ingest version `wave_v`; a rebuild compacts the hidden rows
  * physically and publishes bare).
  * Lake ingest marks (`_lakesync`) live at the INDEX root so they
  * survive cutovers.
  *
  * and every probe reads ONLY its `nprobe` nearest cells — partition
  * pruning at the FileIndex, so a probe's scan cost is
  * ~nprobe/cells of the corpus regardless of corpus size, with zero
  * training work on the query path. Centroids are deterministic
  * ([[Similarity.ivfCentroids]]'s fixed-point means), so rebuilding the
  * index on the same corpus yields byte-identical assignments.
  *
  * GENERATIONS are what make [[rebuild]] atomic — the SAME
  * exclusive-create commit point as [[graft.sources.LakeLayout]]'s
  * manifest claim, so two overlapping maintainers are mutually
  * excluded BY CONSTRUCTION, not by detection. A generation is staged
  * into a writer-tagged hidden dir (`.g<N>-stage-<tag>`), renamed
  * whole into the equally writer-tagged `g<N>-<tag>` (tag-unique —
  * renames can never contend), and committed by ONE atomic
  * exclusive CREATE of the claim file `_gen/<N>` whose content names
  * the winning dir. Generation numbers are strictly sequential
  * (`N = live + 1`, derived from the claim log, never from dirs), so
  * that single create is simultaneously the mutual-exclusion point
  * (two maintainers that derived from the same live generation race
  * for the same claim name — exactly one can ever win) and the
  * staleness pin (a maintainer whose source generation moved finds
  * its claim already taken and aborts loudly, its own dir discarded,
  * the live index untouched). Readers resolve the max claim ONCE and
  * read both dirs from the dir it names, so a probe racing a rebuild
  * always pairs vectors with the centroids that assigned them. Each
  * publish keeps the previously-committed generation as read grace
  * (a probe that resolved just before the swap still completes) and
  * reclaims older ones; a crash before the claim leaves an orphan
  * dir that readers never see (no claim names it), consumes NO
  * generation number, and a later publish sweeps it. Legacy layouts —
  * `g<N>/_COMMITTED` marker dirs and pre-generational flat
  * `<indexPath>/vectors` — still resolve when no claim exists.
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
  private val TaggedGenName = "g(\\d+)-[0-9a-f]+".r
  private val StageName = "\\.g(\\d+)-stage-.*".r

  private def claimsDir(indexPath: String) = hp(s"$indexPath/_gen")

  /** Parse a claim file name to its generation number. */
  private def claimGen(name: String): Option[Long] =
    if (name.forall(_.isDigit) && name.nonEmpty) Some(name.toLong) else None

  /** List the claim log: (gen → claimed dir name). A claim is created
    * AFTER its dir's rename completes, so every listed claim names a
    * complete generation dir (reclamation deletes a claim BEFORE its
    * dir, preserving the invariant from the other side). Two transient
    * states a concurrent maintainer can expose are tolerated, not
    * errors: a claim CREATED but not yet written reads as empty
    * content (not-yet-committed — skip it; the writer's close makes it
    * visible atomically enough for the next listing), and a claim
    * reclaimed between listStatus and open raises FileNotFound (the
    * generation is gone — skip it). Resolving either as a live claim
    * would point a reader at `$indexPath/` itself or at a deleted
    * dir. */
  private def listClaims(fs: org.apache.hadoop.fs.FileSystem,
      indexPath: String): Map[Long, String] = {
    val d = claimsDir(indexPath)
    if (!fs.exists(d)) Map.empty
    else fs.listStatus(d).iterator
      .filter(_.isFile)
      .flatMap(st => claimGen(st.getPath.getName).flatMap { g =>
        try {
          val in = fs.open(st.getPath)
          val dir =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
            finally in.close()
          if (dir.isEmpty) None else Some(g -> dir)
        } catch {
          case _: java.io.FileNotFoundException => None
        }
      })
      .toMap
  }

  /** Resolve the live generation ONCE: (gen, root dir). Claim-log
    * layouts win; legacy `g<N>/_COMMITTED` marker dirs (pre-claim
    * indexes) resolve when no claim exists. None = flat/empty layout. */
  private def resolveLive(s: SparkSession,
      indexPath: String): Option[(Long, String)] = {
    val fs = fsOf(s, indexPath)
    if (!fs.exists(hp(indexPath))) return None
    val claims = listClaims(fs, indexPath)
    if (claims.nonEmpty) {
      val g = claims.keys.max
      Some(g -> s"$indexPath/${claims(g)}")
    } else fs.listStatus(hp(indexPath)).iterator
      .filter(_.isDirectory)
      .flatMap(st => st.getPath.getName match {
        case GenName(n)
          if fs.exists(new org.apache.hadoop.fs.Path(
            st.getPath, "_COMMITTED")) => Some(n.toLong)
        case _ => None
      })
      .foldLeft(Option.empty[Long])((acc, g) =>
        Some(acc.fold(g)(math.max(_, g))))
      .map(g => g -> s"$indexPath/g$g")
  }

  /** Max committed generation, or None for empty/legacy-flat layouts. */
  private[graft] def committedGen(s: SparkSession,
      indexPath: String): Option[Long] =
    resolveLive(s, indexPath).map(_._1)

  /** The dir holding the CURRENT consistent (vectors, centroids) pair:
    * the max committed generation, or the legacy flat root when none
    * exists. Resolve once per operation — both reads must come from the
    * same resolution or a racing rebuild can mix generations. */
  private[graft] def layoutRoot(s: SparkSession, indexPath: String): String =
    resolveLive(s, indexPath).fold(indexPath)(_._2)

  /** Commit a fully-staged generation `gen` BY CONSTRUCTION: rename
    * the writer-tagged staging into the equally writer-tagged final
    * dir (tag-unique — never contended), then atomically
    * exclusive-create the claim file `_gen/<gen>` naming it. The
    * claim is the single commit point: of two maintainers that both
    * derived from generation `gen − 1`, exactly one create can
    * succeed — mutual exclusion AND staleness detection in one atomic
    * op (a maintainer whose source moved targets an already-claimed
    * number). The loser deletes its own dir and fails loudly; the
    * winner's files are never touched. A crash between rename and
    * claim leaves an orphan dir no reader resolves and consumes no
    * generation number. After the claim: reclaim generations older
    * than the grace (previous live) generation, stale stagings BELOW
    * `gen`, and legacy flat dirs. */
  private def publishGen(s: SparkSession, indexPath: String, gen: Long,
      stage: org.apache.hadoop.fs.Path): Unit = {
    val fs = fsOf(s, indexPath)
    // `.g<gen>-stage-<tag>` → `g<gen>-<tag>`
    val tag = stage.getName.substring(stage.getName.lastIndexOf('-') + 1)
    val destName = s"g$gen-$tag"
    val dest = hp(s"$indexPath/$destName")
    if (!fs.rename(stage, dest))
      throw new IllegalStateException(
        s"ivf publish: rename of ${stage.getName} to $destName failed " +
          s"under $indexPath — staging left in place for inspection")
    fs.mkdirs(claimsDir(indexPath))
    val claim = new org.apache.hadoop.fs.Path(claimsDir(indexPath),
      gen.toString)
    val claimed =
      try {
        val out = fs.create(claim, false) // exclusive — the commit point
        try out.write(destName.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch {
        case _: java.io.IOException | _: org.apache.hadoop.fs
          .FileAlreadyExistsException => false
      }
    if (!claimed) {
      fs.delete(dest, true)
      throw new IllegalStateException(
        s"ivf publish lost the race for generation $gen of $indexPath " +
          "— another maintainer committed this generation first (or " +
          "the source generation moved since this rebuild snapshotted " +
          "it); this writer's staging was discarded and the live index " +
          "is untouched")
    }
    // staleness backstop: a rebuild stale by 2+ generations can find
    // its target claim number already RECLAIMED (publishGen deletes
    // claims < gen − 1) and win the exclusive create for a long-dead
    // number — resolveLive (max claim) would never serve it, a
    // silently lost rebuild. The claim create is still the atomic
    // point; this check only turns that silent loss into the loud
    // abort the commit-by-construction contract promises.
    val maxClaim = listClaims(fs, indexPath).keys.foldLeft(gen)(math.max)
    if (maxClaim > gen) {
      fs.delete(claim, false)
      fs.delete(dest, true)
      throw new IllegalStateException(
        s"ivf publish: generation $gen of $indexPath is stale — " +
          s"generation $maxClaim is already committed (this rebuild's " +
          "source moved two or more generations since it snapshotted); " +
          "its claim and staging were discarded and the live index is " +
          "untouched")
    }
    // reclamation: keep `gen` and the previous generation (read grace
    // for in-flight probes); claims are deleted BEFORE their dirs so
    // no claim ever names a missing dir. Only generations strictly
    // BELOW `gen` are touched — dirs at or above it may belong to a
    // live maintainer racing for the next claim (its own claim
    // attempt decides its fate; reclamation must never).
    val grace = gen - 1
    val claims = listClaims(fs, indexPath)
    // RESCUE before reclaim: a MARKED sync wave in a dying generation
    // that no successor ever incorporated would be silently lost with
    // the dir — breaking the `_lakesync` mark's exactly-once promise
    // (the mark survives, so the version is never re-synced). The
    // shape is a wave whose mark landed AFTER the successor's last
    // straggler sweep listed the dir (the double-cutover race the
    // single-maintainer contract used to paper over). Every fold
    // records what it incorporated in the successor's `_SOURCE`, so
    // "was it carried" is decidable here: fold forward (into the
    // generation this publish just claimed, under its frozen
    // centroids — an [[append]], safe on a committed dir) every
    // lsync-tagged file that is listed, not incorporated, and MARKED.
    // Unmarked waves stay owned by the sync protocol (its recovery
    // redoes them from the lake — deleting them here is correct), and
    // untagged files are never rescued: a plain [[build]] writes no
    // `_SOURCE` by design (it re-derives from the corpus), so rescuing
    // untagged vectors past one would duplicate the whole corpus.
    // Steady state cost: zero — dirs die only when `_SOURCE` already
    // accounts for their waves, so the rescue set is empty.
    val newRootDir = s"$indexPath/${claims(gen)}"
    claims.toSeq.sortBy(_._1).foreach { case (g, dirName) =>
      if (g < grace) {
        val dyingVecDir = s"$indexPath/$dirName/vectors"
        if (fs.exists(hp(dyingVecDir))) {
          val incorporated = claims.get(g + 1)
            .flatMap(d => readSource(fs, hp(s"$indexPath/$d")))
            .filter(_._1 == dyingVecDir).map(_._2)
            .getOrElse(Set.empty[String])
          val listed = listVectorFiles(fs, dyingVecDir) -- incorporated
          val tagged = listed.filter(f =>
            LsyncFileName.pattern.matcher(
              f.substring(f.lastIndexOf('/') + 1)).matches())
          val rescue = tagged -- unmarkedLsyncFiles(fs, indexPath, tagged)
          if (rescue.nonEmpty) {
            foldIn(s, dyingVecDir, rescue,
              s.read.parquet(s"$newRootDir/centroids"),
              s"$newRootDir/vectors")
            // carry the dying root's LAKE-VERSIONED tombstone events
            // with the wave — idempotent under the versioned
            // semantics (an event for an already-compacted row hides
            // nothing; post-images keep wave_v ≥ tomb_v). MaxValue
            // direct-takedown events stay behind: their rows were
            // compacted by the successor rebuild, and re-publishing
            // them would re-block lawful future re-inserts.
            readTombstoneDir(fs, s"$indexPath/$dirName").foreach { d =>
              val versioned = readTombstones(s, d)
                .filter(col("tomb_v") =!= Long.MaxValue)
              if (!versioned.isEmpty)
                unionPublishTombstones(s, newRootDir, versioned)
            }
          }
        }
        fs.delete(new org.apache.hadoop.fs.Path(claimsDir(indexPath),
          g.toString), false)
        fs.delete(hp(s"$indexPath/$dirName"), true)
      }
    }
    fs.listStatus(hp(indexPath)).foreach { st =>
      val drop = st.getPath.getName match {
        // legacy committed / orphan untagged generation dirs below
        // the grace (pre-claim layouts keep their newest as grace
        // until the claim log carries one)
        case GenName(n) => n.toLong < grace
        // orphan TAGGED dirs (a claim loser's leavings, a crash
        // between rename and claim) strictly below this generation;
        // the claimed dirs of `gen` and `grace` are kept by number
        case TaggedGenName(n) => n.toLong < grace
        // stale stagings below `gen` are crash leftovers; stagings
        // at or above it may belong to a live maintainer whose own
        // claim attempt will decide its fate
        case StageName(n) => n.toLong < gen
        // legacy flat dirs are the pre-generational "generation":
        // grace them until a successor generation exists
        case "vectors" | "centroids" => gen > 0
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
      files: Iterable[String]): DataFrame = {
    val df = s.read
      .option("basePath", vecDir)
      .parquet(files.toSeq.sorted: _*)
    // carry the ingest-version column through folds and rebuilds (its
    // absence — a pre-versioning file or index — reads as a base row,
    // −1, predating every lake version); rewriting it keeps the
    // layout's wave_v uniform across generations
    val wv =
      if (df.columns.contains("wave_v")) coalesce(col("wave_v"), lit(-1L))
      else lit(-1L)
    df.select(col("vec_id"), col("label"), col("embedding"),
      wv.as("wave_v"))
  }

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

  private val LsyncFileName = "lsync-([0-9a-f]+)-v(\\d+)-.*".r

  /** Files belonging to an IN-FLIGHT or CRASHED sync wave: lsync-tagged
    * data files whose `_lakesync/<srcTag>-<v>` mark is absent at the
    * index root. The sync protocol OWNS these — its recovery sweeps and
    * redoes the wave — so every fold that carries vectors between
    * generations (rebuild's snapshot and diff rounds, the straggler
    * sweep) must SKIP them: folding a partial wave would duplicate it
    * against the redo, and folding a complete-but-unmarked wave races
    * the mark. Marked waves fold like any other vectors. This is the
    * sync/rebuild arbitration BY CONSTRUCTION: the mark file is the
    * commit point on both sides. */
  private def unmarkedLsyncFiles(fs: org.apache.hadoop.fs.FileSystem,
      indexPath: String, files: Set[String]): Set[String] = {
    val tagged = files.filter(f =>
      LsyncFileName.pattern.matcher(
        f.substring(f.lastIndexOf('/') + 1)).matches())
    if (tagged.isEmpty) Set.empty
    else {
      val markDir = hp(s"$indexPath/_lakesync")
      val marks: Set[String] =
        if (!fs.exists(markDir)) Set.empty
        else fs.listStatus(markDir).iterator
          .filter(_.isFile).map(_.getPath.getName).toSet
      tagged.filter { f =>
        f.substring(f.lastIndexOf('/') + 1) match {
          case LsyncFileName(tag, v) => !marks.contains(s"$tag-$v")
          case _ => false
        }
      }
    }
  }

  /** Fold into the LIVE generation any files appended to its SOURCE
    * (grace) generation after the previous rebuild's final sweep —
    * the backstop that runs at the start of every rebuild AND every
    * sync pass, BEFORE the grace generation can be reclaimed by a
    * publish. This is also how a sync wave that completed just after a
    * rebuild's cutover reaches the new generation (its files landed in
    * what is now the grace dir). Assignment uses the live generation's
    * own frozen centroids (exactly an [[append]] of those vectors), so
    * it is safe on a committed generation. Unmarked sync-wave files
    * are skipped, NOT incorporated — their own sync's recovery or a
    * later marked state decides their fate
    * ([[unmarkedLsyncFiles]]). */
  private def sweepSourceStragglers(s: SparkSession,
      indexPath: String): Unit = {
    val fs = fsOf(s, indexPath)
    val live = layoutRoot(s, indexPath)
    readSource(fs, hp(live)).foreach { case (srcVecDir, incorporated) =>
      if (srcVecDir != s"$live/vectors" && fs.exists(hp(srcVecDir))) {
        val listed = listVectorFiles(fs, srcVecDir) -- incorporated
        val extras = listed -- unmarkedLsyncFiles(fs, indexPath, listed)
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
    // strictly sequential: one past the LIVE generation (claims are
    // the only number authority — orphan dirs consume nothing)
    val gen = resolveLive(s, indexPath).fold(0L)(_._1 + 1L)
    val stage = newStage(indexPath, gen)
    assignCells(Tables.load(s, dir, "embeddings")
        .withColumn("wave_v", lit(-1L)), centsDf)
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
    val wv =
      if (vectors.columns.contains("wave_v")) vectors
      else vectors.withColumn("wave_v", lit(-1L))
    assignCells(wv, s.read.parquet(s"$root/centroids"))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$root/vectors")
  }

  /** REPLAY-SAFE ingest from a LAKE table — the production composition
    * (stream → lake with manifest provenance → the index pulls),
    * closing the one hazard direct [[append]] carries: a crashed and
    * replayed streaming wave re-delivered to `append` would duplicate
    * vectors, but a replayed wave never creates a second LAKE version
    * (the lake's (checkpoint, batchId) provenance skips it —
    * [[graft.sources.LakeLayout.lakeHasCommit]]), and this sync
    * ingests each lake version EXACTLY ONCE, measured at the serving
    * surface. Per unsynced version, the change feed's insert rows are
    * assigned under the live generation's frozen centroids, staged,
    * MOVED file-by-file into the cell dirs under version-tagged names
    * (`lsync-<srcTag>-v<N>-…`), and only then marked synced (a file
    * `_lakesync/<srcTag>-<N>` at the INDEX ROOT, so marks survive
    * generation cutovers). Crash recovery is idempotent: a version
    * with no mark first sweeps its tagged files, then redoes the whole
    * wave — a crash between move and mark can never double-serve.
    * DELETE and UPDATE change rows fold into the tombstone sidecar as
    * versioned events (full-set publish, idempotent under redo) — the
    * lake's takedown OR correction reaches every serving path on the
    * next probe (an update's post-image rides the same version's wave
    * and serves in place of the hidden pre-image; a re-insert after a
    * delete serves from its own later version), and the next
    * [[rebuild]] compacts the hidden rows physically. Only ids taken
    * down directly via [[tombstoneIds]] reject re-insertion until a
    * rebuild. Contract mirrors [[rebuild]]:
    * single sync maintainer per (lake, index) pair, and a crashed
    * sync's recovery must run before the next rebuild cutover.
    * Returns the number of lake versions ingested this pass. */
  def syncFromLake(s: SparkSession, lakePath: String,
      indexPath: String): Long =
    syncFromLakeImpl(s, lakePath, indexPath, _ => ())

  /** [[syncFromLake]] with a test seam: `afterMark` fires after each
    * version's mark write, before the post-mark cutover verification —
    * the widest point of the sync/rebuild reclamation race. */
  private[graft] def syncFromLakeImpl(s: SparkSession, lakePath: String,
      indexPath: String, afterMark: Long => Unit): Long = {
    VectorFunctions.register(s)
    // fold any MARKED wave a previous pass left stranded in the grace
    // generation (a rebuild cutover landed between that wave's moves
    // and now) — one listing + a diff when quiet, the same backstop
    // rebuild and maintainIvf run first
    sweepSourceStragglers(s, indexPath)
    val startGen = committedGen(s, indexPath)
    val root = layoutRoot(s, indexPath)
    val fs = fsOf(s, indexPath)
    val markDir = hp(s"$indexPath/_lakesync")
    val srcTag = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(lakePath).toLong
        & 0xffffffffL)
    // the mark NAME keys on a 32-bit path hash; the BODY carries the
    // full source path — verify it, so two lakes whose hashes collide
    // fail loudly instead of silently counting each other's versions
    // as synced (data never served)
    val synced: Set[Long] =
      if (!fs.exists(markDir)) Set.empty
      else fs.listStatus(markDir).iterator
        .filter(st => st.isFile &&
          st.getPath.getName.startsWith(s"$srcTag-"))
        .flatMap { st =>
          val v = st.getPath.getName.drop(srcTag.length + 1)
          if (v.isEmpty || !v.forall(_.isDigit)) None
          else {
            val in = fs.open(st.getPath)
            val body =
              try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
            body.linesIterator
              .collectFirst { case l if l.startsWith("src ") => l.drop(4) }
              .foreach(src => require(src == lakePath,
                s"syncFromLake: mark ${st.getPath.getName} under " +
                  s"$indexPath records source '$src', not '$lakePath' — " +
                  s"two lake paths collide on tag $srcTag; give this " +
                  "index a dedicated path per source lake"))
            Some(v.toLong)
          }
        }
        .toSet
    val versions = graft.sources.LakeLayout.lakeVersions(s, lakePath)
      .filterNot(synced).sorted
    if (versions.isEmpty) return 0L
    versions.foreach { v =>
      val prefix = s"lsync-$srcTag-v$v-"
      var attempts = 0
      var committed = false
      while (!committed) {
      attempts += 1
      require(attempts <= 5,
        s"syncFromLake: version $v of $lakePath kept losing its " +
          "generation to concurrent rebuild cutovers (5 attempts) — " +
          "quiesce rebuilds during sync or slow their cadence")
      // re-resolve the LIVE generation PER VERSION (and per redo): a
      // cutover during an earlier version must not leave later waves
      // writing into a dead — or mkdirs-resurrected ghost — root
      val genAtStart = committedGen(s, indexPath)
      val root = layoutRoot(s, indexPath)
      val centsDf = s.read.parquet(s"$root/centroids")
      val vecsDir = hp(s"$root/vectors")
      // crash recovery: an UNMARKED partial wave is swept before redo
      if (fs.exists(vecsDir)) {
        val it = fs.listFiles(vecsDir, true)
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile && st.getPath.getName.startsWith(prefix))
            fs.delete(st.getPath, false)
        }
      }
      val ch = graft.streaming.CdfStream
        .changesForVersion(s, lakePath, v, "vec_id")
      // DELETE and UPDATE changes fold into the tombstone sidecar as
      // VERSIONED events (vec_id, tomb_v = v) — full-set publish,
      // idempotent under crash-redo, so it can precede the mark like
      // the file moves do. An update's post-image rides this same
      // version's wave with wave_v = v, so the event hides exactly the
      // OLDER rows of the id (wave_v < v) and the correction serves on
      // the next probe; a delete has no post-image, and a later lake
      // re-insert lands at a later version — above the event — and
      // serves immediately. Publishing the events BEFORE the wave
      // moves means a probe mid-sync sees the delete-half applied
      // first (the id briefly absent), never two rows of one id. Only
      // an id taken down DIRECTLY ([[tombstoneIds]], tomb_v =
      // MaxValue) rejects re-insertion: no lake version rises above
      // MaxValue, so admitting the row would store data that never
      // serves.
      val tombs = ch.filter(col("_change").isin("delete", "update"))
        .select(col("vec_id"), lit(v).as("tomb_v"))
      val wave = ch.filter(col("_change").isin("insert", "update"))
        .select(col("vec_id"), col("label"), col("embedding"))
        .withColumn("wave_v", lit(v))
      readTombstoneDir(fs, root).foreach { dir =>
        val perma = readTombstones(s, dir)
          .filter(col("tomb_v") === Long.MaxValue)
          .select(col("vec_id"))
        require(wave.join(broadcast(perma), Seq("vec_id"), "left_semi")
            .isEmpty,
          s"syncFromLake: version $v of $lakePath re-inserts vec_ids " +
            "taken down directly (tombstoneIds) — rebuild the index " +
            "to compact its tombstones before re-inserting them")
      }
      if (!tombs.isEmpty)
        unionPublishTombstones(s, root, tombs)
      val stage = hp(s"$indexPath/.lsync-stage-$srcTag-v$v")
      fs.delete(stage, true)
      assignCells(wave, centsDf)
        .write.mode("overwrite").partitionBy("cell")
        .parquet(stage.toString)
      // move wave files into the live cell dirs under tagged names —
      // deterministic per (source, version), so recovery can target
      // exactly this wave's files
      fs.listStatus(stage)
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith("cell="))
        .foreach { cd =>
          val destDir = new org.apache.hadoop.fs.Path(vecsDir,
            cd.getPath.getName)
          fs.mkdirs(destDir)
          fs.listStatus(cd.getPath)
            .filter(f => f.isFile &&
              !f.getPath.getName.startsWith("_") &&
              !f.getPath.getName.startsWith("."))
            .foreach { f =>
              val dest = new org.apache.hadoop.fs.Path(destDir,
                prefix + f.getPath.getName)
              if (!fs.rename(f.getPath, dest))
                throw new IllegalStateException(
                  s"syncFromLake: move of ${f.getPath} to $dest failed")
            }
        }
      fs.delete(stage, true)
      // the mark is the commit point — written only after every file
      // of the wave is in place
      fs.mkdirs(markDir)
      val out = fs.create(
        new org.apache.hadoop.fs.Path(markDir, s"$srcTag-$v"), true)
      try out.write(s"src $lakePath\nv $v\n".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      afterMark(v)
      // post-mark arbitration: a cutover DURING this version can have
      // reclaimed the generation the wave landed in before any sweep
      // saw the mark — and a written mark means nothing would ever
      // redo it. Filenames die at folds but `wave_v` rides the data,
      // so verify by CONTENT: fold marked stragglers forward, carry
      // tombstones, then count this wave's rows under the CURRENT
      // live root; a short count = the wave died with its dir —
      // unmark and redo against the new generation.
      if (committedGen(s, indexPath) == genAtStart) committed = true
      else {
        sweepSourceStragglers(s, indexPath)
        val newRoot = layoutRoot(s, indexPath)
        if (newRoot != root)
          readTombstoneDir(fs, root).foreach { d =>
            if (fs.exists(hp(d)))
              unionPublishTombstones(s, newRoot, readTombstones(s, d))
          }
        val expected = wave.count()
        val landedDf = s.read.option("mergeSchema", "true")
          .parquet(s"$newRoot/vectors")
        val landed =
          if (!landedDf.columns.contains("wave_v")) 0L
          else landedDf.filter(col("wave_v") === v)
            .join(broadcast(wave.select(col("vec_id"))), Seq("vec_id"),
              "left_semi")
            .count()
        if (landed == expected) committed = true
        else fs.delete(
          new org.apache.hadoop.fs.Path(markDir, s"$srcTag-$v"), false)
      }
      }
    }
    // a rebuild cutover DURING this pass leaves this pass's work in
    // the now-grace generation (the cutover's own fold rounds carry
    // only waves marked before they listed — unmarked ones are
    // deliberately skipped, [[unmarkedLsyncFiles]]): fold the marked
    // waves forward immediately instead of waiting for the next
    // maintenance pass, and re-publish the grace tombstone set onto
    // the new live root — idempotent, since a tombstone for a row the
    // rebuild already compacted away is a no-op at serving.
    if (committedGen(s, indexPath) != startGen) {
      sweepSourceStragglers(s, indexPath)
      val newRoot = layoutRoot(s, indexPath)
      if (newRoot != root)
        readTombstoneDir(fs, root).foreach { d =>
          if (fs.exists(hp(d)))
            unionPublishTombstones(s, newRoot, readTombstones(s, d))
        }
    }
    versions.size.toLong
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
    *  - `pq_fit` / `pq_tail_frac` — QUANTIZATION health when a PQ
    *    sidecar is committed (0 otherwise): mean cosine between each
    *    CODED vector's unit form and its codebook reconstruction (the
    *    measurable that degrades when append waves drift away from
    *    the frozen, corpus-global codebooks — ADC ranking quality
    *    tracks it), and the fraction of vectors serving from the raw
    *    uncompacted tail (each tail row pays float-scan cost on every
    *    ADC probe). Both feed [[maintainIvf]]'s measured sidecar
    *    refresh, the same policy template as the centroid retrain.
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
    // quantization health: codebook fit over a DETERMINISTIC HASH
    // SAMPLE of the current corpus (`xxhash64(vec_id) % mod = 0`; full
    // scan below PqFitFullScanFloor rows so tiny corpora keep full
    // signal) — each sampled vector is encoded ON
    // THE FLY under the committed codebooks (same deterministic
    // assignment that produced the stored codes, so coded rows score
    // identically) and compared to its reconstruction; tail vectors
    // the sidecar never saw are exactly the rows that drag the average
    // down when an append wave drifts away from the frozen codebooks.
    // A maintenance TICK must not scan the corpus at 100 TB — the
    // sample keeps the pass O(corpus/mod), stays deterministic across
    // ticks (hash, not RNG), and `pq_fit_sample` pins the row count so
    // drift in the metric is attributable. Tail drift is visible at
    // any mod: the hash is uniform over vec_ids, so a drifted wave
    // lands in the sample at its corpus-wide rate.
    val fs = fsOf(s, root)
    val (pqFit, pqTail, pqFitSample) = readPqSidecar(fs, root) match {
      case None => (0.0, 0.0, 0L)
      case Some((_, booksDir, snapFiles)) =>
        val (fit, sampled) = vecsOpt match {
          case Some(vecs) if nVec > 0 =>
            val books = s.read.parquet(booksDir).collect()
            val m = books.map(_.getAs[Int]("sub")).max + 1
            val ks = books.map(_.getAs[Int]("code")).max + 1
            val cb = Array.ofDim[Array[Double]](m, ks)
            books.foreach { r =>
              cb(r.getAs[Int]("sub"))(r.getAs[Int]("code")) =
                r.getAs[scala.collection.Seq[Double]]("cvec").toArray
            }
            val d = cb(0)(0).length
            val recon = flatten(transform(
              ProductQuant.codesCol(m, d), (c, j) =>
                element_at(element_at(col("books"), j + lit(1)),
                  c + lit(1)).getField("cvec")))
            val mod = if (nVec < PqFitFullScanFloor) 1L else PqFitSampleMod
            val row = ProductQuant.withUnit(
                vecs.select(col("vec_id"), col("embedding"))
                  .filter(pmod(xxhash64(col("vec_id")), lit(mod)) === 0))
              .crossJoin(broadcast(ProductQuant.packedBooks(s, cb)))
              .agg(avg(VectorFunctions.cosine(col("u"), recon)),
                count(lit(1)))
              .head()
            (Option(row.get(0)).fold(0.0)(_.asInstanceOf[Double]),
              row.getLong(1))
          case _ => (0.0, 0L)
        }
        val tailFiles = listVectorFiles(fs, s"$root/vectors") -- snapFiles
        val tailRows =
          if (tailFiles.isEmpty) 0L
          else s.read.option("basePath", s"$root/vectors")
            .parquet(tailFiles.toSeq.sorted: _*).count()
        (fit, if (nVec > 0) tailRows.toDouble / nVec else 0.0, sampled)
    }
    // SQ8 tail: rows appended after the int8 sidecar's snapshot
    // (parquet footer counts — no data pages open). No fit metric
    // exists by construction — with no codebook there is nothing to
    // drift — so the tail fraction is the tier's whole health story,
    // and a fleet dashboard reading only this row sees it.
    val sq8Tail = readSq8Sidecar(fs, root) match {
      case None => 0.0
      case Some((_, snapFiles)) =>
        val tailFiles = listVectorFiles(fs, s"$root/vectors") -- snapFiles
        if (tailFiles.isEmpty || nVec == 0L) 0.0
        else s.read.option("basePath", s"$root/vectors")
          .parquet(tailFiles.toSeq.sorted: _*).count().toDouble / nVec
    }
    // tombstone fraction: committed deletes still physically resident
    // (served-around by the anti-join) as a share of the corpus — the
    // measured trigger for a compacting retrain, next to the tails
    val tombFrac = readTombstoneDir(fs, root) match {
      case None => 0.0
      case Some(dir) =>
        if (nVec == 0L) 0.0
        else tryRead(dir).fold(0.0)(_.count().toDouble / nVec)
    }
    Seq((k.toLong, nVec, counts.count(_ == 0L).toLong,
      counts.head, counts.last, meanOcc, pct(0.5), pct(0.9),
      if (meanOcc > 0) counts.last / meanOcc else 0.0, meanSim,
      pqFit, pqTail, pqFitSample, sq8Tail, tombFrac))
      .toDF("n_cells", "n_vectors", "empty_cells", "min_occupancy",
        "max_occupancy", "mean_occupancy", "p50_occupancy",
        "p90_occupancy", "occupancy_skew", "mean_centroid_sim",
        "pq_fit", "pq_tail_frac", "pq_fit_sample", "sq8_tail_frac",
        "tomb_frac")
  }

  /** Hash-sample modulus for the `pq_fit` maintenance metric: 1-in-8
    * of the corpus per tick (deterministic — the same vectors every
    * tick, so the metric moves only when the data does). Below
    * [[PqFitFullScanFloor]] vectors the pass stays a full scan: a
    * sample of a tiny corpus is noisier than it is cheap. */
  val PqFitSampleMod = 8L
  val PqFitFullScanFloor = 1024L

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
    // the target number is source + 1, so an overlapping rebuild that
    // commits first takes the claim and OUR publish fails loudly at
    // its one atomic create instead of shadowing the newer generation
    val liveRes = resolveLive(s, indexPath)
    val srcGen = liveRes.map(_._1)
    val live = liveRes.fold(indexPath)(_._2)
    val liveVecDir = s"$live/vectors"
    val gen = srcGen.fold(0L)(_ + 1L)
    val stage = newStage(indexPath, gen)
    // pin training to an explicit file snapshot: everything in `snap`
    // is incorporated by the train+assign read below; everything a
    // concurrent append lands after it shows up as a listing diff and
    // is folded in exactly once
    // every listing this rebuild folds from skips IN-FLIGHT sync waves
    // (lsync-tagged files with no mark): their own sync's recovery owns
    // them — folding a partial wave here would duplicate it against
    // the redo ([[unmarkedLsyncFiles]])
    def listFoldable(): Set[String] = {
      val l = listVectorFiles(fs, liveVecDir)
      l -- unmarkedLsyncFiles(fs, indexPath, l)
    }
    var snap = listFoldable()
    require(snap.nonEmpty,
      s"rebuild: $indexPath has no vectors to retrain on")
    // COMPACTION of deletes and superseded pre-images: the retrain
    // neither trains on nor carries a HIDDEN vector — drop rows whose
    // id has a tombstone event postdating their wave (the serving
    // predicate, broadcast; bounded by events-between-retrains) from
    // the training snapshot AND every fold-in wave. Current rows —
    // update post-images, re-inserts after a delete — carry over. The
    // new generation is published with NO tombstone sidecar: the
    // hidden rows become physical absences at the cutover.
    val tombDirAtStart = readTombstoneDir(fs, live)
    val liveTombs = tombDirAtStart
      .map(d => broadcast(readTombstones(s, d)
        .select($"vec_id".as("__t_id"), $"tomb_v".as("__t_v"))))
    def dropTombs(df: DataFrame): DataFrame =
      liveTombs.fold(df)(t => df.join(t,
        df("vec_id") === col("__t_id") &&
          coalesce(df("wave_v"), lit(-1L)) < col("__t_v"),
        "left_anti"))
    val vecs = dropTombs(readVectorFiles(s, liveVecDir, snap))
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
    var fresh = listFoldable() -- snap
    while (fresh.nonEmpty && attempts < 5) {
      assignCells(dropTombs(readVectorFiles(s, liveVecDir, fresh)), centsDf)
        .write.mode("append").partitionBy("cell")
        .parquet(s"$stage/vectors")
      snap ++= fresh
      attempts += 1
      fresh = listFoldable() -- snap
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
    stageTombstoneDelta(s, live, stage, tombDirAtStart)
    publishGen(s, indexPath, gen, stage)
    // post-publish sweep: an append that resolved the OLD generation
    // just before the claim landed may have written after the final
    // pre-publish diff; appending to the now-committed generation
    // under its frozen centroids is safe, so fold those in too (the
    // next rebuild's start-of-run sweep is the backstop for anything
    // still in flight). Resolve the just-claimed dir from the log.
    val newRoot = s"$indexPath/${listClaims(fs, indexPath)(gen)}"
    val late = listFoldable() -- snap
    if (late.nonEmpty) {
      assignCells(dropTombs(readVectorFiles(s, liveVecDir, late)), centsDf)
        .write.mode("append").partitionBy("cell")
        .parquet(s"$newRoot/vectors")
      writeSource(fs, hp(newRoot), liveVecDir, snap ++ late)
    }
    carryTombstoneDelta(s, live, newRoot, tombDirAtStart)
  }

  /** Close the in-staging sync window: a sync that ran ENTIRELY inside
    * a rebuild/compaction's staging window published its tombstone
    * events to the OLD root AFTER the maintainer read them — the
    * cutover would discard those events while the sync's mark prevents
    * any re-sync, silently resurrecting the deleted rows at the
    * serving surface (the maintainer folded the wave's rows but never
    * saw its events, and the sync observed no cutover, so its own
    * re-publish never fires). After the publish, re-read the old
    * root's committed events and carry the DELTA — events beyond the
    * set the maintainer compacted against — onto the new generation's
    * sidecar. Versioned events are idempotent (a carried event for a
    * row the maintainer already dropped hides nothing), and a MaxValue
    * direct takedown that landed mid-staging still has its rows
    * resident in the new generation, so carrying it hides them exactly
    * as intended. Each tombstone publish creates a NEW versioned dir,
    * so "same dir" = nothing new — the common case costs one marker
    * read. If the start dir was itself reclaimed mid-staging (two+
    * tombstone publishes inside one staging window), the whole current
    * set carries — over-carrying is safe: superfluous versioned events
    * are serving no-ops, and a re-carried MaxValue event at worst
    * rejects a re-insert loudly until the next compaction. Syncs still
    * in flight ACROSS the publish are covered from their own side (the
    * post-mark and end-of-pass cutover checks re-publish onto the new
    * root); this delta covers the ones that COMPLETED before it. */
  private def carryTombstoneDelta(s: SparkSession, oldRoot: String,
      newRoot: String, dirAtStart: Option[String]): Unit = {
    val fs = fsOf(s, oldRoot)
    readTombstoneDir(fs, oldRoot).foreach { nowDir =>
      if (!dirAtStart.contains(nowDir)) {
        val now = readTombstones(s, nowDir)
        val delta = dirAtStart
          .filter(d => fs.exists(hp(d)))
          .map(d => now.except(readTombstones(s, d)))
          .getOrElse(now)
        val cur = readTombstoneDir(fs, newRoot)
          .map(nd => readTombstones(s, nd))
        // events the staged pre-publish carry already moved (or a
        // cutover-aware sync already re-published) are not pending
        val pending = cur.map(c => delta.except(c)).getOrElse(delta)
        if (!pending.isEmpty)
          unionPublishTombstones(s, newRoot, delta)
      }
    }
  }

  /** The crash-safe HALF of the mid-staging carry: just before the
    * claim create, re-read the old root's events and write any delta
    * (vs the set the maintainer compacted against) INTO THE STAGING
    * DIR — the atomic rename+claim then publishes vectors and carried
    * events together, so a maintainer crash right after the claim
    * cannot strand the events in the dying grace root. The remaining
    * exposure is an event landing between THIS read and the claim
    * create (microseconds, vs the whole staging window) — covered by
    * [[carryTombstoneDelta]] post-publish when the maintainer
    * survives, and by the sync's own post-mark cutover check when the
    * cutover precedes its mark; losing an event outright needs the
    * event in that gap AND a maintainer crash before the post-publish
    * carry AND the sync's mark written before the claim — the same
    * three-independent-failures class as the reclamation sliver
    * (SCALE.md round-20 residual #2). */
  private def stageTombstoneDelta(s: SparkSession, oldRoot: String,
      stage: org.apache.hadoop.fs.Path,
      dirAtStart: Option[String]): Unit = {
    val fs = fsOf(s, oldRoot)
    readTombstoneDir(fs, oldRoot).foreach { nowDir =>
      if (!dirAtStart.contains(nowDir)) {
        val now = readTombstones(s, nowDir)
        val delta = dirAtStart
          .filter(d => fs.exists(hp(d)))
          .map(d => now.except(readTombstones(s, d)))
          .getOrElse(now)
        if (!delta.isEmpty)
          unionPublishTombstones(s, stage.toString, delta)
      }
    }
  }

  /** Distributed raw byte copy of (src, dst) file pairs — the
    * untouched-file fast path of [[compactTombstones]]: no parquet
    * decode/encode, one stream per file, parallelized over the
    * executors. Hadoop's Configuration is not Serializable, so the
    * resolved entries ship as a plain map and each partition rebuilds
    * one Configuration from them. */
  private def copyFilesDistributed(s: SparkSession,
      pairs: Seq[(String, String)]): Unit = {
    if (pairs.isEmpty) return
    val confMap: Map[String, String] = {
      val c = s.sessionState.newHadoopConf()
      val b = Map.newBuilder[String, String]
      val it = c.iterator()
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    s.sparkContext
      .parallelize(pairs, math.max(1,
        math.min(pairs.size, s.sparkContext.defaultParallelism)))
      .foreachPartition { it: Iterator[(String, String)] =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confMap.foreach { case (k, v) => conf.set(k, v) }
        it.foreach { case (src, dst) =>
          val sp = new org.apache.hadoop.fs.Path(src)
          val dp = new org.apache.hadoop.fs.Path(dst)
          val sfs = sp.getFileSystem(conf)
          val dfs = dp.getFileSystem(conf)
          dfs.mkdirs(dp.getParent)
          org.apache.hadoop.fs.FileUtil.copy(sfs, sp, dfs, dp,
            false, true, conf)
        }
      }
  }

  /** Scheme-independent path form, for comparing a listing's qualified
    * paths against `input_file_name()`'s (file:/a vs file:///a). */
  private def pathKey(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** COMPACT tombstoned rows physically WITHOUT a retrain — the cheap
    * middle ground between serving-with-anti-join and a full
    * [[rebuild]]. A tombstoned index pays an anti-join broadcast plus
    * (on compressed tiers) [[tombstoneSlack]] shortlist slots on EVERY
    * probe until something makes the hidden rows physical; rebuild does
    * that but at the price of k-means retraining (iters × corpus
    * passes) and a full re-encode of every sidecar. Compaction keeps
    * the FROZEN centroids — rows keep their cells, so there is no
    * assignment and no shuffle anywhere:
    *
    *  - ONE column-pruned pass over (vec_id, wave_v) finds the files
    *    that actually hold a hidden row (`wave_v < tomb_v` for some
    *    event — the serving predicate);
    *  - only THOSE files decode, drop their hidden rows, and rewrite
    *    (a map-only columnar write under the carried `cell` column);
    *  - every untouched file BYTE-COPIES into the new generation under
    *    its existing name — no decode, no encode, raw stream speed
    *    (for a clustered takedown, almost the whole corpus takes this
    *    path; lsync-tagged names survive the copy, and their marks
    *    live at the index root, so the sync protocol's bookkeeping is
    *    untouched);
    *  - committed PQ/SQ8 sidecars CARRY instead of retraining:
    *    codebooks did not move, so codes of undisturbed ids are kept
    *    as-is and only event-touched ids plus rows the old sidecar
    *    never encoded (its raw tail, this compaction's fold-ins)
    *    re-encode — O(events + tail) encode work, never O(corpus);
    *  - the cutover is the SAME staged-dir + exclusive claim publish
    *    as rebuild (fold-in diff rounds for racing appends, `_SOURCE`
    *    manifest, grace generation, loud lost-race), and the new
    *    generation publishes with NO tombstone sidecar — including
    *    direct MaxValue takedowns, whose ids become re-insertable
    *    again exactly as after a rebuild.
    *
    * Returns false (and leaves the index untouched) when the live
    * generation carries no tombstones. [[maintainIvf]] prefers this
    * over rebuild when ONLY `tomb_frac` crossed its threshold (skew
    * and fit healthy — the model is fine, the rows are just dead). */
  def compactTombstones(s: SparkSession, indexPath: String): Boolean =
    compactTombstonesImpl(s, indexPath, () => ())

  /** [[compactTombstones]] with a test seam (`afterStage` fires after
    * the compacted generation is staged but before the fold-in diff —
    * the widest point of the append/compaction race window). */
  private[graft] def compactTombstonesImpl(s: SparkSession,
      indexPath: String, afterStage: () => Unit): Boolean = {
    VectorFunctions.register(s)
    import s.implicits._
    val fs = fsOf(s, indexPath)
    sweepSourceStragglers(s, indexPath)
    val liveRes = resolveLive(s, indexPath)
    val srcGen = liveRes.map(_._1)
    val live = liveRes.fold(indexPath)(_._2)
    val liveVecDir = s"$live/vectors"
    val tombDir = readTombstoneDir(fs, live)
    if (tombDir.isEmpty) return false
    val events = broadcast(readTombstones(s, tombDir.get)
      .select($"vec_id".as("__t_id"), $"tomb_v".as("__t_v")))
    def dropTombs(df: DataFrame): DataFrame =
      df.join(events, df("vec_id") === col("__t_id") &&
        coalesce(df("wave_v"), lit(-1L)) < col("__t_v"), "left_anti")
    // read a pinned file set keeping the partition-derived `cell`
    // column (cells stay valid — the centroids are frozen)
    def readWithCell(files: Iterable[String]): DataFrame = {
      val df = s.read.option("basePath", liveVecDir)
        .parquet(files.toSeq.sorted: _*)
      val wv =
        if (df.columns.contains("wave_v")) coalesce(col("wave_v"), lit(-1L))
        else lit(-1L)
      df.select(col("vec_id"), col("label"), col("embedding"),
        wv.as("wave_v"), col("cell"))
    }
    def listFoldable(): Set[String] = {
      val l = listVectorFiles(fs, liveVecDir)
      l -- unmarkedLsyncFiles(fs, indexPath, l)
    }
    var snap = listFoldable()
    if (snap.isEmpty) return false
    val gen = srcGen.fold(0L)(_ + 1L)
    val stage = newStage(indexPath, gen)
    // ONE column-pruned pass finds the files holding a hidden row
    val touchedKeys = readWithCell(snap)
      .select($"vec_id", $"wave_v", input_file_name().as("__f"))
      .join(events,
        $"vec_id" === col("__t_id") && $"wave_v" < col("__t_v"),
        "left_semi")
      .select($"__f").distinct()
      .collect().map(r => pathKey(r.getString(0))).toSet
    val (touched, untouched) =
      snap.partition(f => touchedKeys.contains(pathKey(f)))
    if (touched.nonEmpty)
      dropTombs(readWithCell(touched))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$stage/vectors")
    else fs.mkdirs(hp(s"$stage/vectors"))
    val liveKey = pathKey(liveVecDir)
    copyFilesDistributed(s, untouched.toSeq.sorted.map { f =>
      val rel = pathKey(f).stripPrefix(liveKey).stripPrefix("/")
      (f, s"$stage/vectors/$rel")
    })
    // the frozen model carries over value-identical — no retrain
    s.read.parquet(s"$live/centroids").coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/centroids")
    afterStage()
    // fold in waves a racing append landed since the snapshot: their
    // cells were assigned under the SAME frozen centroids, so the fold
    // keeps them as-is (no reassignment), dropping hidden rows like
    // rebuild does
    def foldCompacted(files: Set[String], destVecDir: String): Unit =
      if (files.nonEmpty)
        dropTombs(readWithCell(files))
          .write.mode("append").partitionBy("cell").parquet(destVecDir)
    var attempts = 0
    var fresh = listFoldable() -- snap
    while (fresh.nonEmpty && attempts < 5) {
      foldCompacted(fresh, s"$stage/vectors")
      snap ++= fresh
      attempts += 1
      fresh = listFoldable() -- snap
    }
    if (fresh.nonEmpty) {
      fs.delete(stage, true)
      throw new IllegalStateException(
        s"compactTombstones of $indexPath: appends are landing faster " +
          s"than fold-in can absorb them ($attempts rounds) — quiesce " +
          "the append path during compaction; staging discarded, live " +
          "index untouched")
    }
    writeSource(fs, stage, liveVecDir, snap)
    stageTombstoneDelta(s, live, stage, tombDir)
    // resolve the old generation's sidecars BEFORE the cutover — they
    // carry across it (the old dir stays on disk as read grace)
    val oldPq = readPqSidecar(fs, live)
    val oldSq8 = readSq8Sidecar(fs, live)
    publishGen(s, indexPath, gen, stage)
    val newRoot = s"$indexPath/${listClaims(fs, indexPath)(gen)}"
    val late = listFoldable() -- snap
    if (late.nonEmpty) {
      foldCompacted(late, s"$newRoot/vectors")
      writeSource(fs, hp(newRoot), liveVecDir, snap ++ late)
    }
    // events a sync published to the OLD root while this compaction
    // was staging carry onto the new generation — see the doc on
    // [[carryTombstoneDelta]]
    carryTombstoneDelta(s, live, newRoot, tombDir)
    // the start-of-compaction dir can be RECLAIMED inside the staging
    // window (publishTombstones keeps only versions n and n−1) — the
    // same hazard stageTombstoneDelta/carryTombstoneDelta guard with
    // fs.exists. Fall back to the old root's CURRENT committed set: a
    // superset of the start events, and over-dropping codes only causes
    // extra re-encode under the frozen books — safe (r21, advisor
    // item: the unguarded read threw after the generation had already
    // published, shipping it without its PQ/SQ8 sidecar).
    val eventDir = tombDir.filter(d => fs.exists(hp(d)))
      .orElse(readTombstoneDir(fs, live))
    val eventIds = eventDir
      .map(d => readTombstones(s, d).select($"vec_id").distinct())
      .getOrElse(s.range(0).select($"id".as("vec_id")))
    if (listVectorFiles(fs, s"$newRoot/vectors").nonEmpty) {
      oldPq.foreach { case (codesDir, booksDir, snapFiles) =>
        carryPqSidecar(s, newRoot, codesDir, booksDir, snapFiles, eventIds)
      }
      oldSq8.foreach { case (codesDir, snapFiles) =>
        carrySq8Sidecar(s, newRoot, codesDir, snapFiles, eventIds)
      }
    }
    true
  }

  /** Split a compacted generation's rows into (carry, re-encode) for a
    * sidecar carry: rows of files whose RELATIVE name survived the
    * byte-copy were encoded by the old sidecar iff the old snapshot
    * listed them. Re-encode work is O(events + never-encoded tail) —
    * NOT O(rows of touched files): a surviving row of a REWRITTEN file
    * whose id is undisturbed already holds a valid code under the
    * frozen books, so it CARRIES; only (a) every surviving row of an
    * event-touched id (its old codes are dropped wholesale: with no
    * wave_v on a code row, an id's pre- and post-image codes are
    * indistinguishable) and (b) rows the old sidecar never encoded
    * (its raw tail, this compaction's fold-ins) re-encode. (r21,
    * advisor item: the pre-r21 split put every id of every unmatched
    * file into dropIds and re-encoded all their rows, so a scattered
    * takedown with one hidden row per file re-encoded essentially the
    * whole corpus.) The price is one narrow anti-join of the unmatched
    * rows against the old codes' id column — id longs, never
    * embeddings — which at 100 TB is a narrow-column shuffle vs an
    * m·ks·d-flop re-encode per touched row. Returns (ids whose old
    * codes must be DROPPED, rows to re-encode, the new generation's
    * encoded-file snapshot for the fresh marker). */
  private def splitSidecarCarry(s: SparkSession, newRoot: String,
      oldSnapshot: Set[String], eventIds: DataFrame, oldCodesDir: String)
      : (DataFrame, DataFrame, Set[String]) = {
    import s.implicits._
    val fs = fsOf(s, newRoot)
    val newVecDir = s"$newRoot/vectors"
    val newFiles = listVectorFiles(fs, newVecDir)
    val oldRels = oldSnapshot.map(f =>
      pathKey(f).substring(pathKey(f).lastIndexOf("/vectors/") + 9))
    val (matched, unmatched) = newFiles.partition { f =>
      val k = pathKey(f)
      oldRels.contains(k.substring(k.lastIndexOf("/vectors/") + 9))
    }
    def readFiles(files: Set[String]): DataFrame =
      if (files.isEmpty)
        s.read.option("basePath", newVecDir).parquet(newVecDir)
          .select(col("vec_id"), col("embedding"), col("cell"))
          .limit(0)
      else s.read.option("basePath", newVecDir)
        .parquet(files.toSeq.sorted: _*)
        .select(col("vec_id"), col("embedding"), col("cell"))
    val evb = broadcast(eventIds)
    val oldIds = s.read.parquet(oldCodesDir).select(col("vec_id"))
    val unmatchedRows = readFiles(unmatched)
    val reencode = readFiles(matched)
      .join(evb, Seq("vec_id"), "left_semi")
      .union(unmatchedRows.join(evb, Seq("vec_id"), "left_semi"))
      .union(unmatchedRows.join(evb, Seq("vec_id"), "left_anti")
        .join(oldIds, Seq("vec_id"), "left_anti"))
    (eventIds, reencode, newFiles)
  }

  /** Carry a committed PQ sidecar across a [[compactTombstones]]
    * cutover: the codebooks did not move, so codes of undisturbed ids
    * are kept byte-as-is and only the [[splitSidecarCarry]] targets
    * re-encode under the SAME books — O(events + tail) encode work. A
    * fresh version-0 marker under the new root pins the carried tier
    * to the new generation's file snapshot. */
  private def carryPqSidecar(s: SparkSession, newRoot: String,
      oldCodesDir: String, oldBooksDir: String,
      oldSnapshot: Set[String], eventIds: DataFrame): Unit = {
    import s.implicits._
    val fs = fsOf(s, newRoot)
    val (dropIds, reencode, newFiles) =
      splitSidecarCarry(s, newRoot, oldSnapshot, eventIds, oldCodesDir)
    val books = s.read.parquet(oldBooksDir)
    val rows = books.collect()
    val m = rows.map(_.getAs[Int]("sub")).max + 1
    val cb = Array.ofDim[Array[Double]](m,
      rows.map(_.getAs[Int]("code")).max + 1)
    rows.foreach { r =>
      cb(r.getAs[Int]("sub"))(r.getAs[Int]("code")) =
        r.getAs[scala.collection.Seq[Double]]("cvec").toArray
    }
    val d = cb(0)(0).length
    val carried = s.read.parquet(oldCodesDir)
      .join(dropIds, Seq("vec_id"), "left_anti")
      .select($"vec_id", $"cell", $"codes")
    val fresh = ProductQuant.withUnit(reencode)
      .crossJoin(broadcast(ProductQuant.packedBooks(s, cb)))
      .withColumn("codes", ProductQuant.codesCol(m, d))
      .select($"vec_id", $"cell", $"codes")
    // carry-vs-encode accounting rides the write as observed metrics
    // (zero extra jobs) — the O(events + tail) encode-work contract is
    // spec-checked against this, not trusted from the docstring
    val obs = org.apache.spark.sql.Observation(
      s"graft-pq-carry-${java.util.UUID.randomUUID().toString.take(8)}")
    carried.withColumn("__fresh", lit(0L))
      .union(fresh.withColumn("__fresh", lit(1L)))
      .observe(obs, sum($"__fresh").as("fresh"),
        count(lit(1)).as("total"))
      .drop("__fresh")
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$newRoot/pqcodes-0")
    val freshN = Option(obs.get("fresh")).fold(0L)(_.asInstanceOf[Long])
    val totalN = Option(obs.get("total")).fold(0L)(_.asInstanceOf[Long])
    lastPqCarry.set((totalN - freshN, freshN))
    books.coalesce(1).write.mode("overwrite")
      .parquet(s"$newRoot/pqbooks-0")
    writeSidecarMarker(fs, s"$newRoot/_pq", 0L,
      "d pqcodes-0 pqbooks-0", newFiles)
  }

  /** Carry a committed SQ8 sidecar across a [[compactTombstones]]
    * cutover — [[carryPqSidecar]]'s recipe with no books at all (the
    * encoding is `round(127·u_i)`, nothing can drift). */
  private def carrySq8Sidecar(s: SparkSession, newRoot: String,
      oldCodesDir: String, oldSnapshot: Set[String],
      eventIds: DataFrame): Unit = {
    import s.implicits._
    val fs = fsOf(s, newRoot)
    val (dropIds, reencode, newFiles) =
      splitSidecarCarry(s, newRoot, oldSnapshot, eventIds, oldCodesDir)
    val carried = s.read.parquet(oldCodesDir)
      .join(dropIds, Seq("vec_id"), "left_anti")
      .select($"vec_id", $"cell", $"q")
    val fresh = ProductQuant.withUnit(reencode)
      .withColumn("q",
        transform($"u", x => round(x * 127).cast("tinyint")))
      .select($"vec_id", $"cell", $"q")
    carried.union(fresh)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$newRoot/sq8codes-0")
    writeSidecarMarker(fs, s"$newRoot/_sq8", 0L, "d sq8codes-0", newFiles)
  }

  /** Exclusive-create a sidecar marker (the PQ/SQ8 commit point) with
    * the given dir line and encoded-file snapshot. */
  private def writeSidecarMarker(fs: org.apache.hadoop.fs.FileSystem,
      markerDir: String, n: Long, dirLine: String,
      files: Set[String]): Unit = {
    fs.mkdirs(hp(markerDir))
    val marker = new org.apache.hadoop.fs.Path(hp(markerDir), n.toString)
    val body = (dirLine +: files.toSeq.sorted.map("f " + _))
      .mkString("", "\n", "\n")
    val out = fs.create(marker, false) // exclusive — the commit point
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** What one [[maintainIvf]] pass saw and did. */
  final case class IvfMaintenanceReport(skew: Double, fit: Double,
      rebuilt: Boolean, pqFit: Double = 0.0, pqTail: Double = 0.0,
      sidecarRebuilt: Boolean = false, sq8Tail: Double = 0.0,
      sq8Rebuilt: Boolean = false, tombFrac: Double = 0.0,
      compacted: Boolean = false)

  /** ONE-CALL measured maintenance — the policy layer over
    * [[describeIvf]] + [[rebuild]] + [[compactTombstones]] +
    * [[buildPqSidecar]], mirroring the lake's `maintainLake`: retrain
    * exactly when the measured drift says so (`occupancy_skew` above
    * `maxSkew` — hot cells make probe costs lopsided — or
    * `mean_centroid_sim` below `minFit` — the frozen model no longer
    * represents the corpus and recall erodes), never on cadence; a
    * tombstone fraction above `maxTombFrac` with HEALTHY skew/fit
    * compacts instead (frozen centroids, carried sidecars — the rows
    * are dead, the model is not). The PQ sidecar follows the SAME
    * measured template: it refreshes when quantization fit (`pq_fit`,
    * reconstruction cosine) drops below `minPqFit` — append waves
    * from a new distribution degrade ADC ranking against the frozen
    * corpus-global codebooks — or when the raw uncompacted tail
    * exceeds `maxPqTail` of the corpus (each tail row pays float-scan
    * cost per probe); and a centroid retrain ALWAYS re-derives the
    * sidecar when the previous generation carried one (a new
    * generation starts bare — serving would silently fall back to
    * raw scans forever otherwise). An idle pass costs one K-row
    * aggregate and two corpus-pass averages; thresholds sit loose by
    * default so only genuine drift triggers the O(corpus) work. */
  def maintainIvf(s: SparkSession, indexPath: String,
      maxSkew: Double = 4.0, minFit: Double = 0.15,
      cells: Int = Similarity.IvfCells,
      iters: Int = Similarity.IvfIters,
      minPqFit: Double = 0.85, maxPqTail: Double = 0.25,
      maxTombFrac: Double = 0.25): IvfMaintenanceReport = {
    // fold grace-generation stragglers in FIRST (one listing + a diff
    // when quiet) so the health reading — and any triggered retrain —
    // sees every wave, including one stranded by a cutover race
    sweepSourceStragglers(s, indexPath)
    val root0 = layoutRoot(s, indexPath)
    val fs0 = fsOf(s, root0)
    val hadSidecar = readPqSidecar(fs0, root0).isDefined
    val hadSq8 = readSq8Sidecar(fs0, root0).isDefined
    val d = describeIvf(s, indexPath).collect()(0)
    val skew = d.getAs[Double]("occupancy_skew")
    val fit = d.getAs[Double]("mean_centroid_sim")
    val pqFit = d.getAs[Double]("pq_fit")
    val pqTail = d.getAs[Double]("pq_tail_frac")
    val nVec = d.getAs[Long]("n_vectors")
    val any = nVec > 0
    // SQ8 tail comes from the health row (describeIvf measures it from
    // footer counts). No fit metric exists by construction: with no
    // codebook there is nothing to drift, so the tail fraction is the
    // ONLY refresh trigger besides a retrain
    val sq8Tail = d.getAs[Double]("sq8_tail_frac")
    // tombstones accumulate until something makes them physical: each
    // resident hidden row pays anti-join + (on compressed tiers) a
    // wasted shortlist slot per probe. When ONLY the tombstone
    // fraction crossed its threshold (skew and fit healthy — the
    // model is fine, the rows are just dead), [[compactTombstones]]
    // is the right tool: frozen centroids, untouched files byte-copy,
    // sidecars carry — no k-means passes, no sidecar re-encode. A
    // skew/fit trigger still retrains (which also compacts).
    val tombFrac = d.getAs[Double]("tomb_frac")
    val trigger = any && (skew > maxSkew || fit < minFit)
    val compactOnly = any && !trigger && tombFrac > maxTombFrac
    if (trigger) rebuild(s, indexPath, cells, iters)
    else if (compactOnly) compactTombstones(s, indexPath)
    // compaction CARRIED the sidecars (absorbing their raw tails into
    // the fresh encoded snapshot), so only a retrain — whose new
    // generation starts bare — or genuine codebook drift re-derives
    val refresh = hadSidecar && any &&
      (trigger || pqFit < minPqFit || (!compactOnly && pqTail > maxPqTail))
    if (refresh) buildPqSidecar(s, indexPath)
    // a retrain ALWAYS re-derives a carried SQ8 tier (the new
    // generation starts bare); otherwise append-encode when the raw
    // tail is paying float-scan cost on too many probes
    val sq8Refresh = hadSq8 && any &&
      (trigger || (!compactOnly && sq8Tail > maxPqTail))
    if (sq8Refresh) buildSq8Sidecar(s, indexPath)
    IvfMaintenanceReport(skew, fit, trigger, pqFit, pqTail, refresh,
      sq8Tail, sq8Refresh, tombFrac, compactOnly)
  }

  /** Serve a top-k query from the persisted index: rank cells against
    * the probe on the driver (K rows of model state), then scan ONLY the
    * nprobe nearest cell partitions with exact cosine. `excludeId` drops
    * a known self-match (parity with [[Similarity.sIvfTopk]]).
    *
    * `where` is the FILTERED-ANN form ("nearest WHERE label = X" — the
    * metadata-predicate search every serving stack treats as
    * first-class): the predicate applies INSIDE the probed cells, so
    * the scan stays nprobe/cells of the corpus and the filter + pruned
    * projection reach the parquet reader together. Contract: recall is
    * relative to the probed cells — a selective filter thins survivors
    * per cell, so callers WIDEN nprobe as selectivity rises (the
    * standard filtered-ANN lever; the spec pins exact parity with the
    * brute-force filtered scan at a widened nprobe). */
  def probeTopK(s: SparkSession, indexPath: String, probe: Array[Double],
      k: Int = 10, nprobe: Int = Similarity.IvfProbes,
      excludeId: Option[Long] = None,
      where: Option[org.apache.spark.sql.Column] = None): DataFrame = {
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
    val kept0 = excludeId.fold(scanned)(id => scanned.filter($"vec_id" =!= id))
    antiTombstones(s, root, where.fold(kept0)(kept0.filter))
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
  /** Per-probe cell ranking over the packed 1-row broadcast model —
    * the shared front stage of both batch serving paths. Returns one
    * row per (probe, probed cell): (probe_id, probe_emb, pcell), with
    * [[probeTopK]]'s exact tie-break (max sim, then min cell — the
    * struct sort on (-dot, cell) is position-independent; scaling by
    * the probe's norm cannot change a per-probe ordering, so the raw
    * dot ranks identically to cosine). */
  private def rankProbeCells(s: SparkSession, root: String,
      probes: DataFrame, nprobe: Int): DataFrame = {
    import s.implicits._
    val packed = broadcast(s.read.parquet(s"$root/centroids").agg(
      collect_list(struct(col("cell"), col("centroid"))).as("cents")))
    probes
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
  }

  /** `where` is the FILTERED batch form: the predicate applies inside
    * the probed cells, reaching the pruned scan together with the
    * partition filter — recall contract identical to [[probeTopK]]'s
    * filtered form (widen nprobe as selectivity rises). */
  def probeTopKBatch(s: SparkSession, indexPath: String, probes: DataFrame,
      k: Int = 10, nprobe: Int = Similarity.IvfProbes,
      excludeSelf: Boolean = false,
      where: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    VectorFunctions.register(s)
    import s.implicits._
    // one resolution pins the generation for model, pruning, and scan
    val root = layoutRoot(s, indexPath)
    val ranked = rankProbeCells(s, root, probes, nprobe)
    // the probed-cell union is bounded by K — collect it so the scan
    // carries a LITERAL partition filter (file pruning at the index)
    val cellsNeeded = ranked.select($"pcell").distinct()
      .collect().map(_.getInt(0)).sorted
    val cand0 = s.read.parquet(s"$root/vectors")
      .filter($"cell".isin(cellsNeeded.map(Int.box).toSeq: _*))
    val cand = antiTombstones(s, root, where.fold(cand0)(cand0.filter))
    val hits = cand
      .join(broadcast(ranked), $"cell" === $"pcell")
      .withColumn("sim",
        round(VectorFunctions.cosine($"embedding", $"probe_emb"), 3))
      .filter(!isnan($"sim") && $"sim".isNotNull)
    val kept = if (excludeSelf) hits.filter($"vec_id" =!= $"probe_id")
      else hits
    import org.apache.spark.sql.expressions.Window
    // shed both vectors before the per-probe ranking shuffle — the
    // window needs four narrow columns, not the embeddings that
    // produced `sim`
    kept
      .select($"probe_id", $"vec_id", $"label", $"sim")
      .withColumn("rank", row_number().over(
        Window.partitionBy($"probe_id").orderBy($"sim".desc, $"vec_id")))
      .filter($"rank" <= k)
      .select($"probe_id", $"vec_id", $"label", $"sim", $"rank")
  }

  /** BATCH serving from the COMPRESSED index — [[probeTopKBatch]]
    * composed with the PQ sidecar, the serving-fleet shape at 100 TB:
    * N probes in ONE job whose wide scan reads (vec_id, codes) only —
    * ~25× smaller than the float scan the raw batch path pays, on top
    * of the same probed-cell-union partition pruning. Stages:
    *  - cell ranking per probe over the packed 1-row broadcast model
    *    (shared with [[probeTopKBatch]] — exact [[probeTopK]]
    *    tie-breaks);
    *  - each probe computes its OWN ADC lookup table IN the plan
    *    ([[ProductQuant.lutCol]] over the one-row broadcast codebook —
    *    m·ks doubles per probe ride the broadcast probe side, plan
    *    size independent of m·ks);
    *  - ADC shortlist per probe over the pruned CODES scan (window
    *    top-`shortlist` with [[probeTopKAdc]]'s exact ordering), plus
    *    the raw uncompacted tail (files appended after the sidecar
    *    snapshot — always candidates, exact by file identity);
    *  - exact cosine re-ranks only shortlist ∪ tail per probe.
    * Exact per-probe parity with [[probeTopKAdc]] is spec-pinned
    * (IvfBatchProbeSpec's recipe); the codes scan's no-floats plan
    * assertion lives in IvfPqSidecarSpec's recipe. */
  /** `where` is the FILTERED batch-compressed form — the serving-fleet
    * query (the reference's own KB search is a source-filtered
    * match_count search, `reference/archon-workflow.md:38-57`). Codes
    * carry no metadata, so the predicate applies at the EXACT re-rank,
    * whose float scan holds the metadata columns; the ADC shortlist is
    * computed over unfiltered codes and WIDENS ITSELF by the measured
    * survivor rate ([[widenedShortlist]] — one narrow scan of the
    * probed-cell union, shared across the batch), capped at
    * exhaustive. `shortlist` names the post-filter width the caller
    * wants, selectivity-independent. */
  def probeTopKBatchAdc(s: SparkSession, indexPath: String,
      probes: DataFrame, k: Int = 10,
      nprobe: Int = Similarity.IvfProbes,
      shortlist: Int = ProductQuant.RerankShortlist,
      excludeSelf: Boolean = false,
      where: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    VectorFunctions.register(s)
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // one resolution pins generation + sidecar + tail diff together
    val root = layoutRoot(s, indexPath)
    val fs = fsOf(s, root)
    val (codesDir, booksDir, snapshot) = readPqSidecar(fs, root).getOrElse(
      throw new IllegalStateException(
        s"probeTopKBatchAdc: no committed PQ sidecar under $root — run " +
          "buildPqSidecar first"))
    // codebook shape (m, ks, d) from the books' own rows — bounded
    // model state, same read the single-probe ADC path pays
    val booksDf = s.read.parquet(booksDir)
    val shape = booksDf.agg(
      (max($"sub") + 1).cast("int"), (max($"code") + 1).cast("int"),
      max(size($"cvec")).cast("int")).head()
    val (m, ks, d) = (shape.getInt(0), shape.getInt(1), shape.getInt(2))
    val packedBooks = broadcast(booksDf
      .withColumn("half", lit(0.0)) // unused by the LUT; keeps the
      // packed shape shared with the encoder
      .groupBy($"sub")
      .agg(array_sort(collect_list(struct($"code", $"cvec", $"half")))
        .as("entries"))
      .agg(transform(array_sort(collect_list(struct($"sub", $"entries"))),
        x => x.getField("entries")).as("books")))
    // per-probe LUT as data: raw-probe dots against the broadcast
    // books folded into a flat m·ks column (unnormalized BY DESIGN —
    // see ProductQuant.lutCol: scaling by the probe's norm cannot
    // change a per-probe ordering, and the unit division inside the
    // per-entry lambda was the measured interpreted-HOF hot spot);
    // probes then broadcast WITH their LUTs
    val ranked = rankProbeCells(s, root, probes, nprobe)
      .crossJoin(packedBooks)
      .withColumn("lut", ProductQuant.lutCol(
        transform($"probe_emb", x => x.cast("double")), d))
      .drop("books")
    val cellsNeeded = ranked.select($"pcell").distinct()
      .collect().map(_.getInt(0)).sorted
    // measured widening over the probed-cell UNION (shared across the
    // batch — one narrow scan, not one per probe)
    val effShortlist = where.fold(shortlist)(p =>
      widenedShortlist(s, root, cellsNeeded.toSeq, shortlist, p)) +
      tombstoneSlack(s, root)
    // ADC stage: codes-only scan of the probed-cell union, each hit
    // scored against its probe's LUT — per-probe top-`shortlist` with
    // the single-probe path's exact ordering (adc desc, vec_id)
    val codes = s.read.parquet(codesDir)
      .filter($"cell".isin(cellsNeeded.map(Int.box).toSeq: _*))
    val adcHits = codes
      .join(broadcast(ranked), $"cell" === $"pcell")
      .withColumn("adc", ProductQuant.adcScoreWith($"lut", m, ks))
    val adcKept = if (excludeSelf) adcHits.filter($"vec_id" =!= $"probe_id")
      else adcHits
    // SHED the model columns before the per-probe window: the ranking
    // shuffle must carry three narrow columns per candidate, never the
    // m·ks-double LUT or the probe vector that scored it (leaving them
    // attached made the exchange ~500× wider than the data it ranks —
    // the plan-width discipline every other serving path keeps)
    val shortlisted = adcKept
      .select($"probe_id", $"vec_id", $"adc")
      .withColumn("arank", row_number().over(
        Window.partitionBy($"probe_id").orderBy($"adc".desc, $"vec_id")))
      .filter($"arank" <= effShortlist)
      .select($"probe_id", $"vec_id")
    // uncompacted tail: appended after the sidecar — always candidates
    // for every probe whose probed cells they landed in
    val tailFiles = listVectorFiles(fs, s"$root/vectors") -- snapshot
    val cand =
      if (tailFiles.isEmpty) shortlisted
      else shortlisted.union(
        s.read.option("basePath", s"$root/vectors")
          .parquet(tailFiles.toSeq.sorted: _*)
          .filter($"cell".isin(cellsNeeded.map(Int.box).toSeq: _*))
          .select($"cell", $"vec_id")
          .join(broadcast(ranked.select($"probe_id", $"pcell")),
            $"cell" === $"pcell")
          .select($"probe_id", $"vec_id"))
    // exact re-rank of shortlist ∪ tail only: the float read is
    // O(probes × shortlist), never the corpus. The metadata predicate
    // applies HERE — the one stage whose scan carries those columns
    val rerankBase = s.read.parquet(s"$root/vectors")
      .filter($"cell".isin(cellsNeeded.map(Int.box).toSeq: _*))
    val hits = antiTombstones(s, root,
        where.fold(rerankBase)(rerankBase.filter))
      .select($"vec_id", $"label", $"embedding")
      .join(broadcast(cand.distinct()), Seq("vec_id"))
      .join(broadcast(probes.select($"probe_id", $"embedding"
        .as("probe_emb"))), Seq("probe_id"))
      .withColumn("sim",
        round(VectorFunctions.cosine($"embedding", $"probe_emb"), 3))
      .filter(!isnan($"sim") && $"sim".isNotNull)
    val kept = if (excludeSelf) hits.filter($"vec_id" =!= $"probe_id")
      else hits
    kept
      .select($"probe_id", $"vec_id", $"label", $"sim")
      .withColumn("rank", row_number().over(
        Window.partitionBy($"probe_id").orderBy($"sim".desc, $"vec_id")))
      .filter($"rank" <= k)
      .select($"probe_id", $"vec_id", $"label", $"sim", $"rank")
  }

  // ------------------------------------------------- registry drive
  // ------------------------------------------------- PQ codes sidecar
  /** PQ CODES SIDECAR — generation-pinned compression for serving
    * ([[ProductQuant]]'s codes, persisted next to the vectors they
    * encode), itself VERSIONED so a refresh is atomic:
    *
    *   <root>/pqcodes-<n>/cell=<c>/...parquet  (vec_id, codes) per cell
    *   <root>/pqbooks-<n>/...parquet           (sub, code, cvec)
    *   <root>/_pq/<n>                          (marker: dirs + file
    *                                            manifest, written LAST)
    *
    * Trains codebooks on the INDEX's own vectors (a pinned file
    * snapshot of the live generation — same posture as [[rebuild]]'s
    * training input) and encodes that snapshot cell-partitioned.
    * Vectors [[append]]ed AFTER the sidecar are served as a raw
    * UNCOMPACTED TAIL by [[probeTopKAdc]] (the snapshot diff is exact
    * by file identity — a vector is either coded or in the tail,
    * never both, never neither); re-running buildPqSidecar absorbs
    * the tail, the same compaction cadence as [[rebuild]]. Each
    * sidecar version's codes and books live in THEIR OWN dirs named
    * inside its marker, and the marker is exclusive-created LAST —
    * so one marker resolution pins a consistent codes+books pair even
    * while a refresh overlaps reads (the r17 in-place overwrite could
    * serve new codes against old codebooks mid-refresh); the previous
    * version is kept as read grace and older ones reclaimed. A crash
    * mid-build leaves unreferenced dirs no probe resolves; a rebuild
    * publishes a NEW generation with no sidecar, so a stale sidecar
    * can never pair with centroids that didn't assign it.
    * Maintenance posture: single sidecar maintainer per index, like
    * [[rebuild]]'s contract — a lost marker race fails loudly. */
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
    val pqDir = hp(s"$root/_pq")
    val prior =
      if (!fs.exists(pqDir)) Set.empty[Long]
      else fs.listStatus(pqDir).iterator
        .flatMap(st => claimGen(st.getPath.getName)).toSet
    val n = prior.foldLeft(-1L)(math.max) + 1L
    val codesRel = s"pqcodes-$n"
    val booksRel = s"pqbooks-$n"
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
      .parquet(s"$root/$codesRel")
    cb.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (c, i) => (j, i, c) }
    }.toSeq.toDF("sub", "code", "cvec")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$root/$booksRel")
    fs.mkdirs(pqDir)
    val marker = new org.apache.hadoop.fs.Path(pqDir, n.toString)
    val body = (s"d $codesRel $booksRel" +:
      files.toSeq.sorted.map("f " + _)).mkString("", "\n", "\n")
    try {
      val out = fs.create(marker, false) // exclusive — the commit point
      try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    } catch {
      case e @ (_: java.io.IOException |
                _: org.apache.hadoop.fs.FileAlreadyExistsException) =>
        fs.delete(hp(s"$root/$codesRel"), true)
        fs.delete(hp(s"$root/$booksRel"), true)
        throw new IllegalStateException(
          s"buildPqSidecar lost the marker race for version $n under " +
            s"$root — the sidecar is single-maintainer by contract; " +
            "this build's dirs were discarded", e)
    }
    // reclaim everything older than the grace version (n − 1): delete
    // markers BEFORE their dirs so no marker ever names missing dirs
    prior.filter(_ < n - 1).foreach { v =>
      readPqMarker(fs, root, v).foreach { case (c, b, _) =>
        fs.delete(new org.apache.hadoop.fs.Path(pqDir, v.toString), false)
        fs.delete(hp(c), true)
        fs.delete(hp(b), true)
      }
    }
    // legacy unversioned sidecar (pre-r18): superseded by any
    // versioned marker — reclaim it the first time one lands
    if (fs.exists(hp(s"$root/_PQSNAPSHOT"))) {
      fs.delete(hp(s"$root/_PQSNAPSHOT"), false)
      fs.delete(hp(s"$root/pqcodes"), true)
      fs.delete(hp(s"$root/pqbooks"), true)
    }
  }

  private def readPqMarker(fs: org.apache.hadoop.fs.FileSystem,
      root: String, n: Long): Option[(String, String, Set[String])] = {
    val p = new org.apache.hadoop.fs.Path(hp(s"$root/_pq"), n.toString)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val lines = text.linesIterator.toSeq
      lines.collectFirst { case l if l.startsWith("d ") =>
        val parts = l.drop(2).split(" ")
        (s"$root/${parts(0)}", s"$root/${parts(1)}",
          lines.collect { case f if f.startsWith("f ") => f.drop(2) }.toSet)
      }
    }
  }

  /** Resolve the committed sidecar ONCE: (codes dir, books dir,
    * encoded-file snapshot). Max versioned marker wins; the legacy
    * unversioned layout resolves when no versioned marker exists. */
  private def readPqSidecar(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Option[(String, String, Set[String])] = {
    val pqDir = hp(s"$root/_pq")
    val versions =
      if (!fs.exists(pqDir)) Set.empty[Long]
      else fs.listStatus(pqDir).iterator
        .flatMap(st => claimGen(st.getPath.getName)).toSet
    if (versions.nonEmpty)
      readPqMarker(fs, root, versions.max)
    else {
      val p = hp(s"$root/_PQSNAPSHOT")
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val text =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        Some((s"$root/pqcodes", s"$root/pqbooks",
          text.linesIterator.collect {
            case l if l.startsWith("f ") => l.drop(2)
          }.toSet))
      }
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
  /** `where` is the FILTERED compressed form: codes carry no metadata,
    * so the predicate applies at the exact re-rank (whose float scan
    * holds the metadata columns) and the ADC shortlist WIDENS ITSELF
    * by the measured survivor rate ([[widenedShortlist]]), capped at
    * exhaustive — `shortlist` names the post-filter width the caller
    * wants, selectivity-independent; spec-pinned equal to the
    * brute-force filtered scan at DEFAULT widths. */
  def probeTopKAdc(s: SparkSession, indexPath: String,
      probe: Array[Double], k: Int = 10,
      nprobe: Int = Similarity.IvfProbes,
      shortlist: Int = ProductQuant.RerankShortlist,
      excludeId: Option[Long] = None,
      where: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    VectorFunctions.register(s)
    import s.implicits._
    // one resolution pins generation + sidecar + tail diff together
    val root = layoutRoot(s, indexPath)
    val fs = fsOf(s, root)
    val (codesDir, booksDir, snapshot) = readPqSidecar(fs, root).getOrElse(
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
    val books = s.read.parquet(booksDir).collect()
    val m = books.map(_.getAs[Int]("sub")).max + 1
    val ks = books.map(_.getAs[Int]("code")).max + 1
    val cb = Array.ofDim[Array[Double]](m, ks)
    books.foreach { r =>
      cb(r.getAs[Int]("sub"))(r.getAs[Int]("code")) =
        r.getAs[scala.collection.Seq[Double]]("cvec").toArray
    }
    val lut = ProductQuant.lutFor(cb.map(_.toArray), probeU)
    // measured widening: a predicate thins the exact re-rank's input,
    // so the unfiltered ADC cut is widened by the measured survivor
    // rate (capped at exhaustive) — recall no longer rides a
    // caller-managed width
    val effShortlist = where.fold(shortlist)(p =>
      widenedShortlist(s, root, probeCells, shortlist, p)) +
      tombstoneSlack(s, root)
    val adcBase = s.read.parquet(codesDir)
      .filter($"cell".isin(probeCells: _*))
    val adcCand = excludeId.fold(adcBase)(id => adcBase.filter($"vec_id" =!= id))
      .withColumn("adc", ProductQuant.adcScore(lut, m, ks))
      .orderBy($"adc".desc, $"vec_id").limit(effShortlist)
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
    val scanned0 = s.read.parquet(s"$root/vectors")
      .filter($"cell".isin(probeCells: _*))
      .join(broadcast(cand.distinct()), Seq("vec_id"), "left_semi")
    // metadata predicate + tombstone anti-join at the exact re-rank —
    // the one stage whose scan carries the metadata columns (codes
    // don't)
    val scanned = antiTombstones(s, root,
      where.fold(scanned0)(scanned0.filter))
    excludeId.fold(scanned)(id => scanned.filter($"vec_id" =!= id))
      .withColumn("sim", round(VectorFunctions.cosine($"embedding", pc), 3))
      .filter(!isnan($"sim") && $"sim".isNotNull)
      .select($"vec_id", $"label", $"sim")
      .orderBy($"sim".desc, $"vec_id")
      .limit(k)
  }

  // ------------------------------------------------ SQ8 codes sidecar
  /** SQ8 CODES SIDECAR — the MIDDLE compression tier, persisted and
    * generation-pinned like the PQ sidecar but with NO model to train:
    *
    *   <root>/sq8codes-<n>/cell=<c>/...parquet  (vec_id, q) per cell
    *   <root>/_sq8/<n>                          (marker: dir + file
    *                                             manifest, written LAST)
    *
    * One signed byte per dimension (`q_i = round(127·u_i)` over the
    * unit vector — [[ScalarQuant]]'s exact encoding, so the corpus
    * drive and the persisted tier score identically): 4× smaller scans
    * than floats where PQ's 25× is too lossy, and because there is no
    * codebook the sidecar can never drift — maintenance is
    * append-encode only (re-run absorbs the raw tail, nothing
    * retrains). Same atomicity story as the PQ sidecar: each version's
    * codes live in their own dir named inside an exclusive-created
    * marker; the previous version is read grace; a rebuild publishes a
    * new generation bare. Single sidecar maintainer per index — a lost
    * marker race fails loudly. */
  def buildSq8Sidecar(s: SparkSession, indexPath: String): Unit = {
    VectorFunctions.register(s)
    import s.implicits._
    val root = layoutRoot(s, indexPath)
    val fs = fsOf(s, root)
    val files = listVectorFiles(fs, s"$root/vectors")
    require(files.nonEmpty, s"buildSq8Sidecar: no vectors under $root")
    val sq8Dir = hp(s"$root/_sq8")
    val prior =
      if (!fs.exists(sq8Dir)) Set.empty[Long]
      else fs.listStatus(sq8Dir).iterator
        .flatMap(st => claimGen(st.getPath.getName)).toSet
    val n = prior.foldLeft(-1L)(math.max) + 1L
    val codesRel = s"sq8codes-$n"
    val snap = s.read.option("basePath", s"$root/vectors")
      .parquet(files.toSeq.sorted: _*)
      .select($"vec_id", $"embedding", $"cell")
    ProductQuant.withUnit(snap)
      .withColumn("q",
        transform($"u", x => round(x * 127).cast("tinyint")))
      .select($"vec_id", $"cell", $"q")
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$root/$codesRel")
    fs.mkdirs(sq8Dir)
    val marker = new org.apache.hadoop.fs.Path(sq8Dir, n.toString)
    val body = (s"d $codesRel" +:
      files.toSeq.sorted.map("f " + _)).mkString("", "\n", "\n")
    try {
      val out = fs.create(marker, false) // exclusive — the commit point
      try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    } catch {
      case e @ (_: java.io.IOException |
                _: org.apache.hadoop.fs.FileAlreadyExistsException) =>
        fs.delete(hp(s"$root/$codesRel"), true)
        throw new IllegalStateException(
          s"buildSq8Sidecar lost the marker race for version $n under " +
            s"$root — the sidecar is single-maintainer by contract; " +
            "this build's dir was discarded", e)
    }
    // reclaim below the grace version; markers before dirs, as always
    prior.filter(_ < n - 1).foreach { v =>
      readSq8Marker(fs, root, v).foreach { case (c, _) =>
        fs.delete(new org.apache.hadoop.fs.Path(sq8Dir, v.toString), false)
        fs.delete(hp(c), true)
      }
    }
  }

  private def readSq8Marker(fs: org.apache.hadoop.fs.FileSystem,
      root: String, n: Long): Option[(String, Set[String])] = {
    val p = new org.apache.hadoop.fs.Path(hp(s"$root/_sq8"), n.toString)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val lines = text.linesIterator.toSeq
      lines.collectFirst { case l if l.startsWith("d ") =>
        (s"$root/${l.drop(2).trim}",
          lines.collect { case f if f.startsWith("f ") => f.drop(2) }.toSet)
      }
    }
  }

  /** Resolve the committed SQ8 sidecar ONCE: (codes dir, encoded-file
    * snapshot). Max versioned marker wins. */
  private def readSq8Sidecar(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Option[(String, Set[String])] = {
    val sq8Dir = hp(s"$root/_sq8")
    val versions =
      if (!fs.exists(sq8Dir)) Set.empty[Long]
      else fs.listStatus(sq8Dir).iterator
        .flatMap(st => claimGen(st.getPath.getName)).toSet
    if (versions.isEmpty) None else readSq8Marker(fs, root, versions.max)
  }

  // ------------------------------------------------ tombstone sidecar
  /** TOMBSTONE SIDECAR — the DELETE and UPDATE path to the serving
    * surface. The lake deletes and updates in O(touched keys)
    * (`deleteFromLake`, DV deletes, SQL DELETE/UPDATE/MERGE — the
    * takedown/GDPR and correction shapes), but an IVF layout cannot
    * cheaply remove a row from a cell-partitioned parquet dir; before
    * this tier a deleted vector kept SERVING until the next full
    * retrain and an updated one could not reach the index at all. The
    * sidecar is the PQ/SQ8 marker-publish recipe with no model at all —
    * one versioned set of tombstone EVENTS:
    *
    *   <root>/tombs-<n>/...parquet   ((vec_id, tomb_v) — the FULL
    *                                  current event set, one row per
    *                                  delete/update event)
    *   <root>/_tomb/<n>              (marker naming the dir, written
    *                                  LAST via exclusive create)
    *
    * Events are VERSIONED: `tomb_v` is the lake version of the
    * delete/update (Long.MaxValue for a direct [[tombstoneIds]]
    * takedown), and every resident vector carries the `wave_v` it
    * arrived under (−1 for build/append/rebuild base rows, the lake
    * version for synced waves — a DATA column, so it survives fold
    * rewrites between generations). A row is hidden iff SOME event for
    * its id has `tomb_v > wave_v` — which is exactly "superseded by a
    * later delete or update": an UPDATE at version v tombstones the
    * pre-image (every older row of the id) while its post-image, synced
    * in the same version's wave with `wave_v = v`, keeps serving; a
    * RE-INSERT after a delete lands at a later version and serves
    * immediately. One row per event also makes [[tombstoneSlack]]
    * exact: the lake's key uniqueness means each event hides exactly
    * one previously-served row, so the event count IS the
    * hidden-resident row count.
    *
    * Every serving path anti-joins the resolved set at its EXACT
    * re-rank stage — the same stage the `where` predicate rides — so a
    * tombstoned row never leaves any tier (raw/ADC/SQ8 × single/batch ×
    * plain/filtered). On compressed tiers hidden rows still occupy
    * ADC/SQ8 shortlist slots until a rebuild compacts them (they carry
    * no metadata at the codes scan); the fraction is bounded by
    * [[maintainIvf]]'s `maxTombFrac` retrain trigger, and the paths
    * widen `shortlist` by the event count ([[tombstoneSlack]]).
    * Publishing FULL sets (not deltas) keeps replay idempotent — a
    * re-published union is byte-equivalent — and keeps resolution one
    * marker read; the set is small by policy (events between retrains),
    * so a single coalesced file suffices. Two paths make the hidden
    * rows physical: [[compactTombstones]] (the CHEAP one — frozen
    * centroids, byte-copied untouched files, carried sidecars;
    * [[maintainIvf]] prefers it when only `tomb_frac` fired) and
    * [[rebuild]] (the retrain drops hidden rows — same versioned
    * predicate — from its training snapshot and every fold-in wave).
    * Either way the new generation starts with NO sidecar — the
    * deletes and superseded pre-images become physical at the cutover
    * while current post-images carry over.
    * Pre-`tomb_v` sidecars read as `tomb_v = Long.MaxValue`
    * (hide every resident row of the id — the old id-only semantics);
    * pre-`wave_v` vectors read as base rows. */
  /** What the last [[carryPqSidecar]] did — (codes carried byte-as-is,
    * rows freshly encoded). Observability for the O(events + tail)
    * encode-work contract of [[splitSidecarCarry]]. */
  private[graft] val lastPqCarry =
    new java.util.concurrent.atomic.AtomicReference[(Long, Long)]((0L, 0L))

  /** Thrown when a tombstone publish observes a marker version other
    * than the one its union was computed from — the lost-update signal
    * [[unionPublishTombstones]] retries on (r21, advisor item: the
    * read-union-publish shape used to publish a union built from a
    * stale `cur`, silently dropping a concurrent publisher's events). */
  private final class TombstoneVersionMoved(msg: String,
      cause: Throwable = null) extends IllegalStateException(msg, cause)

  /** Publish a FULL tombstone set as marker version `observed`+1 —
    * compare-and-swap semantics: `observed` is the max marker version
    * the caller's set was computed FROM (None = no marker existed). A
    * cheap pre-check aborts if the listing already moved; the exclusive
    * marker CREATE is the true commit point — two racers targeting the
    * same pinned version resolve to exactly one winner, and the loser
    * throws [[TombstoneVersionMoved]] instead of silently shadowing the
    * winner's events under a higher version (the pre-r21 behavior
    * allocated max+1 at publish time, so a stale union could bury a
    * concurrent publish's events). */
  private def publishTombstones(s: SparkSession, root: String,
      tombs: DataFrame, observed: Option[Long]): Unit = {
    val fs = fsOf(s, root)
    val tombDir = hp(s"$root/_tomb")
    val prior =
      if (!fs.exists(tombDir)) Set.empty[Long]
      else fs.listStatus(tombDir).iterator
        .flatMap(st => claimGen(st.getPath.getName)).toSet
    val curMax = if (prior.isEmpty) None else Some(prior.max)
    if (curMax != observed)
      throw new TombstoneVersionMoved(
        s"publishTombstones under $root: marker listing moved from " +
          s"$observed to $curMax since the union was computed — " +
          "re-read and retry")
    val n = observed.fold(0L)(_ + 1L)
    val rel = s"tombs-$n"
    normalizeTombs(tombs).distinct()
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$root/$rel")
    fs.mkdirs(tombDir)
    val marker = new org.apache.hadoop.fs.Path(tombDir, n.toString)
    try {
      val out = fs.create(marker, false) // exclusive — the commit point
      try out.write(s"d $rel\n".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    } catch {
      case e @ (_: java.io.IOException |
                _: org.apache.hadoop.fs.FileAlreadyExistsException) =>
        fs.delete(hp(s"$root/$rel"), true)
        throw new TombstoneVersionMoved(
          s"publishTombstones lost the marker race for version $n under " +
            s"$root — a concurrent publisher won; this build's dir was " +
            "discarded", e)
    }
    // reclaim below the grace version; markers before dirs, as always
    prior.filter(_ < n - 1).foreach { v =>
      readTombMarker(fs, root, v).foreach { d =>
        fs.delete(new org.apache.hadoop.fs.Path(tombDir, v.toString), false)
        fs.delete(hp(d), true)
      }
    }
  }

  /** The read-union-publish shape every carry/sync site needs, with
    * lost-update protection: read the current committed set, union the
    * caller's events in, publish pinned to the observed version; if a
    * concurrent publisher moved the marker between the read and the
    * publish ([[TombstoneVersionMoved]]), re-read and retry — the loud
    * retry the rest of the protocol promises, instead of the silent
    * stale-union overwrite. Bounded attempts: a site that keeps losing
    * is contending with a runaway publisher and should fail loudly. */
  private def unionPublishTombstones(s: SparkSession, root: String,
      extra: DataFrame, maxAttempts: Int = 5): Unit = {
    val fs = fsOf(s, root)
    var attempts = 0
    var done = false
    while (!done) {
      val obs = readTombstoneState(fs, root)
      val cur = obs.map { case (_, d) => readTombstones(s, d) }
      try {
        publishTombstones(s, root, cur.fold(extra)(_.union(extra)),
          obs.map(_._1))
        done = true
      } catch {
        case e: TombstoneVersionMoved =>
          attempts += 1
          if (attempts >= maxAttempts)
            throw new IllegalStateException(
              s"unionPublishTombstones under $root: lost the publish " +
                s"race $attempts times — a concurrent publisher is " +
                "runaway; giving up loudly", e)
      }
    }
  }

  private def readTombMarker(fs: org.apache.hadoop.fs.FileSystem,
      root: String, n: Long): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(hp(s"$root/_tomb"), n.toString)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      text.linesIterator.collectFirst { case l if l.startsWith("d ") =>
        s"$root/${l.drop(2).trim}"
      }
    }
  }

  /** Resolve the committed tombstone set ONCE: the dir of the max
    * versioned marker, or None when the generation carries no deletes. */
  private def readTombstoneDir(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Option[String] =
    readTombstoneState(fs, root).map(_._2)

  /** As [[readTombstoneDir]], also returning the marker VERSION the dir
    * was resolved from — the observed version a CAS publish pins to. */
  private def readTombstoneState(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Option[(Long, String)] = {
    val tombDir = hp(s"$root/_tomb")
    val versions =
      if (!fs.exists(tombDir)) Set.empty[Long]
      else fs.listStatus(tombDir).iterator
        .flatMap(st => claimGen(st.getPath.getName)).toSet
    if (versions.isEmpty) None
    else readTombMarker(fs, root, versions.max).map(versions.max -> _)
  }

  /** What the last filtered-compressed probe MEASURED and CHOSE —
    * (survivor rate over the probed cells, effective shortlist) — the
    * observability hook for the auto-widening below (the spec reads
    * it; a fleet would export it). */
  private[graft] val lastFilterWidening =
    new java.util.concurrent.atomic.AtomicReference[(Double, Int)]((1.0, 0))

  /** MEASURED shortlist widening for the filtered compressed tiers.
    * Codes carry no metadata, so a `where` predicate can only apply at
    * the exact re-rank — of an UNFILTERED shortlist, only ~rate·|list|
    * rows survive, so a selective predicate at a fixed width silently
    * degrades recall. Instead of a caller-managed contract, MEASURE
    * the survivor rate — one narrow scan of the predicate's columns
    * over the probed cells (column-pruned at the parquet reader;
    * O(probed rows), never the corpus) — and widen the shortlist to
    * 2·⌈asked/rate⌉ (EXPECTED survivors ≈ 2× what the caller asked
    * for — the margin absorbs survivor clustering low in the
    * approximate order), capped at the probed row count (exhaustive =
    * exact, the natural ceiling; a selective predicate at production
    * widths usually lands here). Zero survivors means the filtered
    * result is empty at any width — the original shortlist is kept
    * and the probe returns empty honestly. The measured (rate, width)
    * pair lands in [[lastFilterWidening]]. */
  private def widenedShortlist(s: SparkSession, root: String,
      cells: Seq[Int], shortlist: Int,
      pred: org.apache.spark.sql.Column): Int = {
    import s.implicits._
    val row = s.read.parquet(s"$root/vectors")
      .filter($"cell".isin(cells.map(Int.box): _*))
      .agg(count(lit(1)).as("total"),
        count(when(pred, 1)).as("kept")).head()
    val (total, kept) = (row.getLong(0), row.getLong(1))
    val eff =
      if (kept <= 0L || total <= 0L) shortlist
      else {
        val rate = kept.toDouble / total
        math.max(shortlist,
          math.min(2.0 * math.ceil(shortlist / rate),
            total.toDouble).toInt)
      }
    lastFilterWidening.set(
      (if (total > 0) kept.toDouble / total else 1.0, eff))
    eff
  }

  /** Normalize a tombstone frame to the (vec_id, tomb_v) event schema:
    * id-only frames (pre-versioning sidecars, and direct-takedown
    * inputs) read as `tomb_v = Long.MaxValue` — hide every resident
    * row of the id, the original semantics. */
  private def normalizeTombs(df: DataFrame): DataFrame =
    if (df.columns.contains("tomb_v"))
      df.select(col("vec_id"),
        coalesce(col("tomb_v"), lit(Long.MaxValue)).as("tomb_v"))
    else df.select(col("vec_id"), lit(Long.MaxValue).as("tomb_v"))

  /** The committed tombstone EVENTS of `dir`, normalized. */
  private def readTombstones(s: SparkSession, dir: String): DataFrame =
    normalizeTombs(s.read.parquet(dir))

  /** Anti-join the resolved tombstone events out of a candidate frame —
    * the one stage every serving path shares. A candidate is dropped
    * iff some event for its id postdates the wave it arrived under
    * (`wave_v < tomb_v`; frames or files without `wave_v` read as base
    * rows, −1 — predating every lake version). The event set rides a
    * broadcast (bounded by events-between-retrains, the [[maintainIvf]]
    * `maxTombFrac` policy); no tombstones = no join. */
  private def antiTombstones(s: SparkSession, root: String,
      df: DataFrame): DataFrame =
    readTombstoneDir(fsOf(s, root), root).fold(df) { dir =>
      val t = broadcast(readTombstones(s, dir)
        .select(col("vec_id").as("__t_id"), col("tomb_v").as("__t_v")))
      val wv =
        if (df.columns.contains("wave_v"))
          coalesce(df("wave_v"), lit(-1L))
        else lit(-1L)
      df.join(t, df("vec_id") === col("__t_id") && wv < col("__t_v"),
        "left_anti")
    }

  /** EXACT shortlist compensation for resident tombstones on the
    * compressed tiers: a hidden row still holds codes, so it can
    * occupy an ADC/SQ8 shortlist slot only to be anti-joined away at
    * the exact re-rank — up to |events| asked-for slots vanish (each
    * event hides exactly one previously-served row — lake key
    * uniqueness). Widening by the event COUNT (one footer-sized count
    * of the tiny tombstone file; zero cost when no sidecar exists —
    * the common case) restores the caller's width as a GUARANTEE, not
    * an expectation: at most that many slots can be lost. */
  private def tombstoneSlack(s: SparkSession, root: String): Int =
    readTombstoneDir(fsOf(s, root), root).fold(0)(dir =>
      s.read.parquet(dir).count().toInt)

  /** Direct takedown: fold `ids` (a frame carrying `vec_id`) into the
    * live generation's tombstone set — the serving-surface twin of
    * [[graft.sources.LakeLayout.deleteFromLake]] for callers not
    * routing deletes through a lake. Takes effect on the NEXT probe
    * (every serving path anti-joins the committed set); the next
    * [[compactTombstones]] or [[rebuild]] makes it physical. Single
    * maintainer per index, like every sidecar — a lost marker race
    * fails loudly. */
  def tombstoneIds(s: SparkSession, indexPath: String,
      ids: DataFrame): Unit = {
    val root = layoutRoot(s, indexPath)
    // a direct takedown is permanent until the compacting rebuild:
    // tomb_v = MaxValue hides every resident AND future row of the id
    // (a later lake re-insert of a directly-taken-down id is rejected
    // by [[syncFromLake]] rather than silently never served)
    val incoming = normalizeTombs(ids.select(col("vec_id")))
    unionPublishTombstones(s, root, incoming)
  }

  /** Serving from the SQ8 tier: the shortlist stage scans only
    * (vec_id, q) of the probed cells — 4× smaller than the float scan,
    * on the same nprobe/cells partition pruning (spec asserts the
    * sq8codes scan reads no embedding column) — then exact cosine
    * re-ranks ONLY the shortlist plus the raw uncompacted tail (files
    * appended after the sidecar). Scoring is asymmetric: the exact
    * unit probe against the byte codes, one codegen'd dot per row.
    * `where` follows the compressed-tier filtered contract: the
    * predicate applies at the exact re-rank and the shortlist widens
    * itself by the measured survivor rate ([[widenedShortlist]]).
    * Fails loudly if no committed sidecar exists. */
  def probeTopKSq8(s: SparkSession, indexPath: String,
      probe: Array[Double], k: Int = 10,
      nprobe: Int = Similarity.IvfProbes,
      shortlist: Int = ScalarQuant.Shortlist,
      excludeId: Option[Long] = None,
      where: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    VectorFunctions.register(s)
    import s.implicits._
    // one resolution pins generation + sidecar + tail diff together
    val root = layoutRoot(s, indexPath)
    val fs = fsOf(s, root)
    val (codesDir, snapshot) = readSq8Sidecar(fs, root).getOrElse(
      throw new IllegalStateException(
        s"probeTopKSq8: no committed SQ8 sidecar under $root — run " +
          "buildSq8Sidecar first"))
    val cents = s.read.parquet(s"$root/centroids")
      .collect()
      .map(r => r.getAs[Int]("cell") ->
        r.getAs[scala.collection.Seq[Double]]("centroid").toArray)
      .toMap
    val nrm = math.sqrt(probe.map(x => x * x).sum)
    val probeU = if (nrm > 0) probe.map(_ / nrm) else probe
    val probeCells = cents.toSeq
      .map { case (i, c) => (c.zip(probeU).map { case (a, b) => a * b }.sum, i) }
      .sortBy { case (sim, i) => (-sim, i) }.take(nprobe).map(_._2)
    val pu = array(probeU.map(lit): _*)
    // measured widening — same survivor-rate lever as the ADC tier
    val effShortlist = where.fold(shortlist)(p =>
      widenedShortlist(s, root, probeCells, shortlist, p)) +
      tombstoneSlack(s, root)
    val codeBase = s.read.parquet(codesDir)
      .filter($"cell".isin(probeCells: _*))
    val sqCand = excludeId.fold(codeBase)(id =>
        codeBase.filter($"vec_id" =!= id))
      .withColumn("approx",
        VectorFunctions.dot(transform($"q", c => c.cast("double")), pu)
          / 127.0)
      .orderBy($"approx".desc, $"vec_id").limit(effShortlist)
      .select($"vec_id")
    // uncompacted tail: appended after the sidecar — always candidates
    val tail = listVectorFiles(fs, s"$root/vectors") -- snapshot
    val cand =
      if (tail.isEmpty) sqCand
      else sqCand.union(
        s.read.option("basePath", s"$root/vectors")
          .parquet(tail.toSeq.sorted: _*)
          .filter($"cell".isin(probeCells: _*))
          .select($"vec_id"))
    val pc = array(probe.map(lit): _*)
    val scanned0 = s.read.parquet(s"$root/vectors")
      .filter($"cell".isin(probeCells: _*))
      .join(broadcast(cand.distinct()), Seq("vec_id"), "left_semi")
    val scanned = antiTombstones(s, root,
      where.fold(scanned0)(scanned0.filter))
    excludeId.fold(scanned)(id => scanned.filter($"vec_id" =!= id))
      .withColumn("sim", round(VectorFunctions.cosine($"embedding", pc), 3))
      .filter(!isnan($"sim") && $"sim".isNotNull)
      .select($"vec_id", $"label", $"sim")
      .orderBy($"sim".desc, $"vec_id")
      .limit(k)
  }

  /** BATCH serving from the SQ8 tier — [[probeTopKBatchAdc]]'s shape
    * minus the LUT machinery (asymmetric int8 scoring needs no
    * codebook: each candidate costs ONE codegen'd dot of its byte
    * codes against the broadcast probe): cell ranking per probe over
    * the packed 1-row model, 4×-compressed codes-only scan of the
    * probed-cell union, per-probe shortlist window (model columns shed
    * before the exchange), raw tail unioned, exact cosine re-rank of
    * shortlist ∪ tail. `where` follows the compressed-tier filtered
    * contract (predicate at the exact re-rank; the shortlist widens
    * itself by the measured survivor rate, [[widenedShortlist]]).
    * Exact per-probe parity with [[probeTopKSq8]] is spec-pinned. */
  def probeTopKSq8Batch(s: SparkSession, indexPath: String,
      probes: DataFrame, k: Int = 10,
      nprobe: Int = Similarity.IvfProbes,
      shortlist: Int = ScalarQuant.Shortlist,
      excludeSelf: Boolean = false,
      where: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    VectorFunctions.register(s)
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // one resolution pins generation + sidecar + tail diff together
    val root = layoutRoot(s, indexPath)
    val fs = fsOf(s, root)
    val (codesDir, snapshot) = readSq8Sidecar(fs, root).getOrElse(
      throw new IllegalStateException(
        s"probeTopKSq8Batch: no committed SQ8 sidecar under $root — " +
          "run buildSq8Sidecar first"))
    val ranked = rankProbeCells(s, root, probes, nprobe)
    val cellsNeeded = ranked.select($"pcell").distinct()
      .collect().map(_.getInt(0)).sorted
    // measured widening over the probed-cell union, shared by the batch
    val effShortlist = where.fold(shortlist)(p =>
      widenedShortlist(s, root, cellsNeeded.toSeq, shortlist, p)) +
      tombstoneSlack(s, root)
    // int8 stage: codes-only scan of the probed-cell union, each hit
    // scored by one dot against its broadcast probe (scaling by 127 or
    // the probe's norm cannot change a per-probe ordering — skipped)
    val codes = s.read.parquet(codesDir)
      .filter($"cell".isin(cellsNeeded.map(Int.box).toSeq: _*))
    val sqHits = codes
      .join(broadcast(ranked), $"cell" === $"pcell")
      .withColumn("approx", VectorFunctions.dot(
        transform($"q", c => c.cast("double")),
        transform($"probe_emb", x => x.cast("double"))))
    val sqKept = if (excludeSelf) sqHits.filter($"vec_id" =!= $"probe_id")
      else sqHits
    // shed the probe vector before the per-probe window — the ranking
    // exchange carries three narrow columns, never the embeddings
    val shortlisted = sqKept
      .select($"probe_id", $"vec_id", $"approx")
      .withColumn("arank", row_number().over(
        Window.partitionBy($"probe_id").orderBy($"approx".desc, $"vec_id")))
      .filter($"arank" <= effShortlist)
      .select($"probe_id", $"vec_id")
    // uncompacted tail: appended after the sidecar — always candidates
    val tailFiles = listVectorFiles(fs, s"$root/vectors") -- snapshot
    val cand =
      if (tailFiles.isEmpty) shortlisted
      else shortlisted.union(
        s.read.option("basePath", s"$root/vectors")
          .parquet(tailFiles.toSeq.sorted: _*)
          .filter($"cell".isin(cellsNeeded.map(Int.box).toSeq: _*))
          .select($"cell", $"vec_id")
          .join(broadcast(ranked.select($"probe_id", $"pcell")),
            $"cell" === $"pcell")
          .select($"probe_id", $"vec_id"))
    // exact re-rank of shortlist ∪ tail only; the metadata predicate
    // applies HERE — the one stage whose scan carries those columns
    val rerankBase = s.read.parquet(s"$root/vectors")
      .filter($"cell".isin(cellsNeeded.map(Int.box).toSeq: _*))
    val hits = antiTombstones(s, root,
        where.fold(rerankBase)(rerankBase.filter))
      .select($"vec_id", $"label", $"embedding")
      .join(broadcast(cand.distinct()), Seq("vec_id"))
      .join(broadcast(probes.select($"probe_id", $"embedding"
        .as("probe_emb"))), Seq("probe_id"))
      .withColumn("sim",
        round(VectorFunctions.cosine($"embedding", $"probe_emb"), 3))
      .filter(!isnan($"sim") && $"sim".isNotNull)
    val kept = if (excludeSelf) hits.filter($"vec_id" =!= $"probe_id")
      else hits
    kept
      .select($"probe_id", $"vec_id", $"label", $"sim")
      .withColumn("rank", row_number().over(
        Window.partitionBy($"probe_id").orderBy($"sim".desc, $"vec_id")))
      .filter($"rank" <= k)
      .select($"probe_id", $"vec_id", $"label", $"sim", $"rank")
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

  /** Registry drive: BATCH serving from the COMPRESSED persisted
    * index — [[probeTopKBatchAdc]] over the same 25-probe frame as
    * `s_ivf_batch`, against the staged index with its PQ sidecar.
    * Rows-only by design (engine-local centroids and codebooks);
    * correctness is pinned by the batch-ADC-vs-per-probe-ADC parity
    * spec plus the codes scan's no-floats plan assertion
    * (IvfPqSidecarSpec). */
  def sIvfPqBatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val probes = Tables.load(s, dir, "embeddings")
      .filter($"vec_id" < 25)
      .select($"vec_id".as("probe_id"), $"embedding")
    probeTopKBatchAdc(s, stagedPqIndex(s, dir), probes,
      k = 5, nprobe = Similarity.IvfProbes, excludeSelf = true)
      .orderBy($"probe_id", $"rank")
  }

  // SQ8 sidecar staged at most once per staged index root
  private val sq8Staged =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private def stagedSq8Index(s: SparkSession, dir: String): String = {
    val root = stagedIndex(s, dir)
    sq8Staged.computeIfAbsent(root, { _ => buildSq8Sidecar(s, root); true })
    root
  }

  /** Registry drive: serving from the SQ8 tier of the persisted index
    * — [[probeTopKSq8]] against the staged corpus index with its int8
    * sidecar, the middle rung of the raw ↔ SQ8 (4×) ↔ PQ (25×)
    * serving ladder now persisted end-to-end. Rows-only by design
    * (engine-local centroids); correctness is pinned by the
    * sq8-vs-raw parity spec plus the codes scan's no-floats plan
    * assertion (IvfSq8SidecarSpec recipe). */
  def sIvfSq8Serve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val probe = Tables.load(s, dir, "embeddings")
      .filter($"vec_id" === Similarity.ProbeId)
      .select($"embedding").head()
      .getAs[scala.collection.Seq[Float]]("embedding")
      .map(_.toDouble).toArray
    probeTopKSq8(s, stagedSq8Index(s, dir), probe,
      excludeId = Some(Similarity.ProbeId))
  }

  /** Registry drive: FILTERED serving from the COMPRESSED persisted
    * index — [[probeTopKAdc]] with the standard metadata predicate
    * (`label = FilterLabel`, ~10 % of the corpus) at DEFAULT widths:
    * the shortlist widens itself by the MEASURED survivor rate
    * ([[widenedShortlist]]), so filtered + compressed — the query a
    * serving fleet actually runs (the reference's KB search is a
    * source-filtered match_count search) — carries no caller-managed
    * recall contract. Rows-only by design (engine-local centroids and
    * codebooks); correctness is pinned by the filtered-parity spec —
    * exact equality with the oracle-checked brute-force filtered scan
    * — plus the codes scan's no-floats plan assertion. */
  def sIvfPqFiltered(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val probe = Tables.load(s, dir, "embeddings")
      .filter($"vec_id" === Similarity.ProbeId)
      .select($"embedding").head()
      .getAs[scala.collection.Seq[Float]]("embedding")
      .map(_.toDouble).toArray
    probeTopKAdc(s, stagedPqIndex(s, dir), probe,
      excludeId = Some(Similarity.ProbeId),
      where = Some($"label" === Similarity.FilterLabel))
  }

  /** Registry drive: BATCH serving from the SQ8 tier — the same
    * 25-probe frame as the other batch drives through
    * [[probeTopKSq8Batch]]. Rows-only by design (engine-local
    * centroids); correctness is pinned by the batch-vs-per-probe SQ8
    * parity spec plus the codes scan's no-floats plan assertion. */
  def sIvfSq8Batch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val probes = Tables.load(s, dir, "embeddings")
      .filter($"vec_id" < 25)
      .select($"vec_id".as("probe_id"), $"embedding")
    probeTopKSq8Batch(s, stagedSq8Index(s, dir), probes,
      k = 5, nprobe = Similarity.IvfProbes, excludeSelf = true)
      .orderBy($"probe_id", $"rank")
  }

  /** Process-lifetime staged index + lake for the DML-serving drive:
    * a corpus index joined by a lake of 100 shifted twins
    * (vec_id + 1e6) that is then CORRECTED and TAKEN DOWN through lake
    * DML — labels of the first 10 twins updated to 777, the next 10
    * twins deleted — and synced. The drive below serves from the
    * result; staging runs once per (sfDir, corpus fingerprint). */
  private val updateStageCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), String]()

  private def stagedUpdateIndex(s: SparkSession, dir: String): String =
    updateStageCache.computeIfAbsent(
      (dir, Similarity.corpusFingerprint(s, dir)), { _ =>
        require(s.sparkContext.master.startsWith("local"),
          "staged registry IVF index uses driver-local temp storage — " +
            "point build() at shared storage (HDFS/S3) on a non-local " +
            "master")
        val base = java.nio.file.Files
          .createTempDirectory("graft-ivf-upd").toString
        val idx = s"$base/index"
        val lake = s"$base/lake"
        build(s, dir, idx)
        val twins = Tables.load(s, dir, "embeddings")
          .filter(col("vec_id") < 100L)
          .select((col("vec_id") + 1000000L).as("vec_id"), col("label"),
            col("embedding"))
        graft.sources.LakeLayout.appendToLake(s, lake, twins, "seed", 1L,
          statsKey = Some("vec_id"))
        graft.sources.LakeLayout.upsertIntoLake(s, lake,
          twins.filter(col("vec_id") < 1000010L)
            .withColumn("label", lit(777)),
          "vec_id", "fix", 2L)
        graft.sources.LakeLayout.deleteFromLake(s, lake,
          s.range(1000010L, 1000020L).select(col("id").as("vec_id")),
          "vec_id", "takedown", 3L)
        syncFromLake(s, lake, idx)
        idx
      })

  /** Registry drive: the lake-DML → sync → serve composition with an
    * EXACT oracle — the one ANN drive a SQL engine can hash-match,
    * because full nprobe (= every cell) makes IVF serving brute-force
    * exact while still riding the whole production path: versioned
    * tombstone events hide the 10 deleted twins and the 10 superseded
    * pre-images, the update post-images serve under their wave_v, and
    * the DuckDB twin computes top-k over the equivalent post-DML
    * state in pure SQL. */
  def sIvfUpdateServe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val idx = stagedUpdateIndex(s, dir)
    val pemb = Tables.load(s, dir, "embeddings")
      .filter($"vec_id" === Similarity.ProbeId)
      .select($"embedding").collect().head
      .getAs[scala.collection.Seq[Float]](0).map(_.toDouble).toArray
    probeTopK(s, idx, pemb, k = 20, nprobe = Similarity.IvfCells,
      excludeId = Some(Similarity.ProbeId))
  }

  /** DuckDB twin of [[sIvfUpdateServe]]: the post-DML corpus is the
    * base table plus the surviving twins (first 10 relabeled 777, ids
    * 10..19 absent), brute-force cosine top-20 with the Spark side's
    * exact NaN/zero-norm guard and tie-break. */
  val sIvfUpdateServeSql: String =
    s"""WITH aug AS (
         SELECT vec_id, label, embedding FROM embeddings
         UNION ALL
         SELECT vec_id + 1000000,
           CASE WHEN vec_id < 10 THEN 777 ELSE label END AS label,
           embedding
         FROM embeddings
         WHERE vec_id < 100 AND NOT (vec_id >= 10 AND vec_id < 20)),
       p AS (SELECT embedding::DOUBLE[] AS p FROM embeddings
             WHERE vec_id = ${Similarity.ProbeId}),
       scored AS (
         SELECT vec_id, label,
           round(list_cosine_similarity(embedding::DOUBLE[], p.p), 3) AS sim
         FROM aug, p
         WHERE vec_id <> ${Similarity.ProbeId}
           AND list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0)
       SELECT vec_id, label, sim FROM scored
       WHERE sim IS NOT NULL AND NOT isnan(sim)
       ORDER BY sim DESC, vec_id LIMIT 20"""

  /** Process-lifetime staged index for the COMPACTION drive: the same
    * lake-DML history as [[stagedUpdateIndex]] (twins appended, 10
    * relabeled 777, 10 deleted) synced in, then
    * [[compactTombstones]] makes the hidden rows physical under the
    * frozen centroids — with both compressed sidecars committed
    * BEFORE the compaction so the drive exercises the sidecar carry,
    * not just the vector rewrite. */
  private val compactStageCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), String]()

  private def stagedCompactIndex(s: SparkSession, dir: String): String =
    compactStageCache.computeIfAbsent(
      (dir, Similarity.corpusFingerprint(s, dir)), { _ =>
        require(s.sparkContext.master.startsWith("local"),
          "staged registry IVF index uses driver-local temp storage — " +
            "point build() at shared storage (HDFS/S3) on a non-local " +
            "master")
        val base = java.nio.file.Files
          .createTempDirectory("graft-ivf-cmp").toString
        val idx = s"$base/index"
        val lake = s"$base/lake"
        build(s, dir, idx)
        val twins = Tables.load(s, dir, "embeddings")
          .filter(col("vec_id") < 100L)
          .select((col("vec_id") + 1000000L).as("vec_id"), col("label"),
            col("embedding"))
        graft.sources.LakeLayout.appendToLake(s, lake, twins, "seed", 1L,
          statsKey = Some("vec_id"))
        graft.sources.LakeLayout.upsertIntoLake(s, lake,
          twins.filter(col("vec_id") < 1000010L)
            .withColumn("label", lit(777)),
          "vec_id", "fix", 2L)
        graft.sources.LakeLayout.deleteFromLake(s, lake,
          s.range(1000010L, 1000020L).select(col("id").as("vec_id")),
          "vec_id", "takedown", 3L)
        syncFromLake(s, lake, idx)
        buildPqSidecar(s, idx)
        buildSq8Sidecar(s, idx)
        require(compactTombstones(s, idx),
          "staged compaction drive: the synced DML must leave tombstones")
        idx
      })

  /** Registry drive: the lake-DML → sync → COMPACT → serve composition
    * with an EXACT oracle — [[compactTombstones]] makes the takedowns
    * and superseded pre-images physical (frozen centroids, byte-copied
    * untouched files, carried sidecars), and full-nprobe serving over
    * the compacted index must hash-match the same pure-SQL post-DML
    * truth as [[sIvfUpdateServe]]: compaction is serving-invariant by
    * construction, and this drive pins that against DuckDB. */
  def sIvfCompactServe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val idx = stagedCompactIndex(s, dir)
    val pemb = Tables.load(s, dir, "embeddings")
      .filter($"vec_id" === Similarity.ProbeId)
      .select($"embedding").collect().head
      .getAs[scala.collection.Seq[Float]](0).map(_.toDouble).toArray
    probeTopK(s, idx, pemb, k = 20, nprobe = Similarity.IvfCells,
      excludeId = Some(Similarity.ProbeId))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("s_ivf_batch" -> (sIvfBatch _),
      "s_ivfpq_serve" -> (sIvfPqServe _),
      "s_ivfpq_batch" -> (sIvfPqBatch _),
      "s_ivfpq_filtered" -> (sIvfPqFiltered _),
      "s_ivfsq8_serve" -> (sIvfSq8Serve _),
      "s_ivfsq8_batch" -> (sIvfSq8Batch _),
      "s_ivf_update_serve" -> (sIvfUpdateServe _),
      "s_ivf_compact_serve" -> (sIvfCompactServe _))
  val oracle: Map[String, String] =
    Map("s_ivf_update_serve" -> sIvfUpdateServeSql,
      // compaction is serving-invariant: the post-DML truth is the
      // same as the update drive's
      "s_ivf_compact_serve" -> sIvfUpdateServeSql)
}
