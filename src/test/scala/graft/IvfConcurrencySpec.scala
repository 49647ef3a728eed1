package graft

import graft.operators.IvfIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The append/rebuild concurrency contract of the generational IVF
  * layout: [[IvfIndex.append]] is the normal ingestion path and may
  * overlap a scheduled [[IvfIndex.rebuild]] without losing a completed
  * wave. Three windows are pinned:
  *  (a) a wave appended AFTER rebuild's training snapshot but before
  *      its publish is detected by the pre-publish listing diff and
  *      folded into the new generation under the NEW centroids;
  *  (b) a wave that landed in the GRACE generation after the cutover
  *      (a stale append that resolved the old generation) is folded in
  *      by the next rebuild's start-of-run straggler sweep — before
  *      the grace dir it lives in can be reclaimed;
  *  (c) a lost publish race discards only the loser's writer-tagged
  *      staging and fails loudly — the live index is untouched and a
  *      retry succeeds (no shared staging dir to clobber). */
class IvfConcurrencySpec extends SparkSuite {
  import spark.implicits._

  private def wave(from: Long, n: Int): DataFrame =
    spark.range(n).select(
      ($"id" + from).as("vec_id"),
      transform(sequence(lit(0), lit(63)), j =>
        (when(pmod(j, lit(2)) === 0, lit(0.125)).otherwise(lit(-0.125)) +
          (pmod(($"id" + from) * 131 + j.cast("long") * 17, lit(11)) - 5)
            .cast("double") * 0.002).cast("float")).as("embedding"),
      lit(9).as("label"))

  private def nVectors(idx: String): Long =
    IvfIndex.describeIvf(spark, idx).collect()(0).getAs[Long]("n_vectors")

  test("a wave appended during rebuild is folded into the published generation") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-race")
      .toString
    IvfIndex.build(spark, sfDir, idx)
    val n0 = nVectors(idx)

    // the race, deterministically: the append fires after the new
    // generation is fully staged (the widest window — training never
    // saw these vectors), resolving the OLD generation because no new
    // marker exists yet
    IvfIndex.rebuildImpl(spark, idx, 16, 4,
      () => IvfIndex.append(spark, idx, wave(900000L, 120)))

    assert(nVectors(idx) == n0 + 120,
      s"the concurrently-appended wave must survive the cutover: " +
        s"$n0 + 120 != ${nVectors(idx)}")
    // and it must be SERVABLE — assigned under the published model,
    // not just present on disk
    val probe = wave(900000L, 1).select($"embedding").head()
      .getAs[scala.collection.Seq[Float]]("embedding")
      .map(_.toDouble).toArray
    val top = IvfIndex.probeTopK(spark, idx, probe, k = 3)
      .collect().map(_.getLong(0))
    assert(top.nonEmpty && top.head >= 900000L,
      s"the folded wave must serve through cell pruning: ${top.toSeq}")
  }

  test("a stale append into the grace generation is swept in by the next rebuild") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-late")
      .toString
    IvfIndex.build(spark, sfDir, idx)
    val graceRoot = IvfIndex.layoutRoot(spark, idx)
    IvfIndex.rebuild(spark, idx)
    val n1 = nVectors(idx)

    // simulate an append whose writer resolved g0 BEFORE g1's claim
    // landed and completed after the post-publish sweep: write the
    // wave straight into the grace generation under ITS centroids
    // (exactly what that stale append would have done)
    IvfIndex.assignCells(wave(950000L, 80),
        spark.read.parquet(s"$graceRoot/centroids"))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$graceRoot/vectors")
    assert(nVectors(idx) == n1,
      "a stale wave in the grace generation is not yet visible")

    // the next rebuild's start-of-run sweep folds it into the live
    // generation before anything else — so the retrain sees it and
    // the published generation carries it
    IvfIndex.rebuild(spark, idx)
    assert(nVectors(idx) == n1 + 80,
      s"the straggler sweep must carry the stale wave: " +
        s"$n1 + 80 != ${nVectors(idx)}")
  }

  test("a lost publish race discards only the loser's dir, fails loudly, and a retry succeeds") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-lost")
      .toString
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    IvfIndex.build(spark, sfDir, idx)
    val n0 = nVectors(idx)
    val g0Dir = IvfIndex.layoutRoot(spark, idx)
      .substring(idx.length + 1)

    // the "winner": a competing maintainer claims generation 1 while
    // this writer is staged (for the test the claim points at the g0
    // dir — a self-consistent pair; only the claim's EXISTENCE
    // matters to the exclusion)
    val err = intercept[IllegalStateException] {
      IvfIndex.rebuildImpl(spark, idx, 16, 4, () => {
        fs.mkdirs(new org.apache.hadoop.fs.Path(s"$idx/_gen"))
        val out = fs.create(
          new org.apache.hadoop.fs.Path(s"$idx/_gen/1"), false)
        out.write(g0Dir.getBytes("UTF-8")); out.close()
      })
    }
    assert(err.getMessage.contains("lost the race"), err.getMessage)
    // live index untouched (the fake winner's claim resolves to the
    // same consistent pair), loser's dir and staging cleaned up
    assert(IvfIndex.committedGen(spark, idx).contains(1L) &&
      nVectors(idx) == n0, "the live generation must be untouched")
    val stray = fs.listStatus(new org.apache.hadoop.fs.Path(idx))
      .map(_.getPath.getName)
      .filter(n => n.contains("-stage-") || n.startsWith("g1-")).toSeq
    assert(stray.isEmpty, s"the loser must remove its dir/staging: $stray")

    // a retry rebuilds from the winner's generation and publishes 2
    IvfIndex.rebuild(spark, idx)
    assert(IvfIndex.committedGen(spark, idx).contains(2L) &&
      nVectors(idx) == n0,
      s"retry must publish a fresh generation: ${IvfIndex.committedGen(spark, idx)}")
  }

  test("two concurrent rebuilds from the same source: exactly one can ever commit, by construction") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-excl")
      .toString
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    IvfIndex.build(spark, sfDir, idx)
    val n0 = nVectors(idx)

    // forced interleaving: BOTH maintainers fully stage their new
    // generation before EITHER attempts the commit — the widest
    // possible overlap. The claim file `_gen/1` is one atomic
    // exclusive create, so exactly one of the two publishes can ever
    // succeed, no matter how the threads schedule: mutual exclusion
    // holds by construction, not by a detect-then-abort window.
    val staged = new java.util.concurrent.CountDownLatch(2)
    def run(): Either[Throwable, Unit] =
      try {
        IvfIndex.rebuildImpl(spark, idx, 16, 4, () => {
          staged.countDown()
          assert(staged.await(120, java.util.concurrent.TimeUnit.SECONDS),
            "both rebuilds must reach the staged point")
        })
        Right(())
      } catch { case e: Throwable => Left(e) }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val results =
      try {
        val futures = Seq(
          pool.submit(new java.util.concurrent.Callable[
            Either[Throwable, Unit]] { def call() = run() }),
          pool.submit(new java.util.concurrent.Callable[
            Either[Throwable, Unit]] { def call() = run() }))
        futures.map(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
      } finally pool.shutdown()
    assert(results.count(_.isRight) == 1,
      s"exactly one of two concurrent rebuilds may commit: $results")
    val loser = results.collectFirst { case Left(e) => e }.get
    assert(loser.isInstanceOf[IllegalStateException] &&
      loser.getMessage.contains("lost the race"), loser.toString)

    // one winner: generation 1 live, the corpus intact and servable,
    // no second-generation dir and no staging left behind
    assert(IvfIndex.committedGen(spark, idx).contains(1L) &&
      nVectors(idx) == n0,
      "the winner's generation must be live and complete")
    val g1Dirs = fs.listStatus(new org.apache.hadoop.fs.Path(idx))
      .map(_.getPath.getName).filter(_.startsWith("g1-")).toSeq
    assert(g1Dirs.size == 1,
      s"only the winner's generation dir may survive: $g1Dirs")
    val stray = fs.listStatus(new org.apache.hadoop.fs.Path(idx))
      .map(_.getPath.getName).filter(_.contains("-stage-")).toSeq
    assert(stray.isEmpty, s"no staging may survive the race: $stray")
  }

  test("an in-flight sync racing a rebuild cutover: zero duplicates, zero lost waves, whichever wins") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-syncrace")
      .toString
    val lake = java.nio.file.Files
      .createTempDirectory("graft-ivf-syncrace-lake").toString
    IvfIndex.build(spark, sfDir, idx)
    def dupCount(): Long = {
      val root = IvfIndex.layoutRoot(spark, idx)
      spark.read.parquet(s"$root/vectors")
        .groupBy($"vec_id").agg(count(lit(1)).as("n"))
        .filter($"n" > 1).count()
    }
    graft.sources.LakeLayout.appendToLake(spark, lake, wave(800000L, 40),
      "s", 1L, statsKey = Some("vec_id"))
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 1L)
    val n0 = nVectors(idx)

    // the widest interleaving: the sync's whole wave (moves + mark)
    // lands while the rebuild is fully staged — its fold rounds must
    // carry the MARKED wave into the published generation exactly once
    graft.sources.LakeLayout.appendToLake(spark, lake, wave(840000L, 40),
      "s", 2L, statsKey = Some("vec_id"))
    IvfIndex.rebuildImpl(spark, idx, 16, 4, () =>
      assert(IvfIndex.syncFromLake(spark, lake, idx) == 1L))
    assert(nVectors(idx) == n0 + 40,
      s"the mid-rebuild sync wave must survive the cutover: " +
        s"$n0 + 40 != ${nVectors(idx)}")
    assert(dupCount() == 0L, "the folded wave must not duplicate")
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 0L,
      "the wave is marked — a re-sync is a no-op")
    assert(nVectors(idx) == n0 + 40 && dupCount() == 0L)

    // CRASHED sync: a wave whose mark was lost (crash between moves
    // and mark) is an UNMARKED partial — the next rebuild must skip
    // it (the sync protocol owns it), and the sync's own recovery
    // then redoes it into the new generation, exactly once
    graft.sources.LakeLayout.appendToLake(spark, lake, wave(880000L, 40),
      "s", 3L, statsKey = Some("vec_id"))
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 1L)
    val markDir = new org.apache.hadoop.fs.Path(s"$idx/_lakesync")
    val fs = markDir.getFileSystem(spark.sessionState.newHadoopConf())
    val marks = fs.listStatus(markDir).map(_.getPath).sortBy(_.getName)
    fs.delete(marks.last, false)
    IvfIndex.rebuild(spark, idx)
    assert(nVectors(idx) == n0 + 40,
      "a rebuild must not fold an unmarked sync wave: " +
        s"${nVectors(idx)} != $n0 + 40")
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 1L,
      "recovery redoes the unmarked wave into the new generation")
    assert(nVectors(idx) == n0 + 80 && dupCount() == 0L,
      s"the redone wave must serve exactly once: ${nVectors(idx)}")
  }

  test("a marked sync wave in a dying generation is rescued at reclamation — tombstone events carried with it") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-rescue")
      .toString
    IvfIndex.build(spark, sfDir, idx)                    // gen0
    IvfIndex.rebuild(spark, idx, cells = 16, iters = 2)  // gen1; gen0 = grace
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def dirOfGen(g: Long): String = {
      val in = fs.open(new org.apache.hadoop.fs.Path(s"$idx/_gen/$g"))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val gen0Dir = s"$idx/${dirOfGen(0L)}"

    // during the NEXT rebuild — after its start-of-run straggler sweep
    // and staging — a MARKED wave (plus a versioned tombstone set)
    // lands in the grace dir gen0: the double-cutover shape. The
    // publish that claims gen2 reclaims gen0; without the rescue both
    // would be silently lost (the mark survives, so the lake would
    // never re-sync the wave).
    IvfIndex.rebuildImpl(spark, idx, 16, 2, () => {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-rescue-wave").toString
      wave(900000L, 10).withColumn("wave_v", lit(7L))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val cellDir = new org.apache.hadoop.fs.Path(s"$gen0Dir/vectors/cell=0")
      fs.mkdirs(cellDir)
      fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
        .foreach { f =>
          assert(fs.rename(f.getPath, new org.apache.hadoop.fs.Path(
            cellDir, s"lsync-cafe-v7-${f.getPath.getName}")))
        }
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$idx/_lakesync"))
      val mark = fs.create(
        new org.apache.hadoop.fs.Path(s"$idx/_lakesync/cafe-7"), true)
      try mark.write("src /fake/lake\nv 7\n".getBytes("UTF-8"))
      finally mark.close()
      // a versioned event in the dying root hides the wave's first id
      // (wave_v 7 < tomb_v 8); the rescue must carry it
      Seq((900000L, 8L)).toDF("vec_id", "tomb_v")
        .coalesce(1).write.mode("overwrite").parquet(s"$gen0Dir/tombs-0")
      val tm = fs.create(
        new org.apache.hadoop.fs.Path(s"$gen0Dir/_tomb/0"), true)
      try tm.write("d tombs-0\n".getBytes("UTF-8")) finally tm.close()
    })

    assert(!fs.exists(new org.apache.hadoop.fs.Path(gen0Dir)),
      "gen0 must be reclaimed by the gen2 publish")
    assert(IvfIndex.committedGen(spark, idx).contains(2L))
    val root = IvfIndex.layoutRoot(spark, idx)
    val rescued = spark.read.parquet(s"$root/vectors")
      .filter($"vec_id" >= 900000L && $"vec_id" < 900010L)
    assert(rescued.count() == 10L,
      "the marked wave must be rescued into the new generation")
    assert(rescued.groupBy($"vec_id").agg(count(lit(1)).as("n"))
      .filter($"n" > 1).isEmpty, "the rescue must not duplicate")
    def emb(id: Long): Array[Double] = rescued
      .filter($"vec_id" === id).select($"embedding").collect().head
      .getAs[scala.collection.Seq[Float]](0).map(_.toDouble).toArray
    val top1 = IvfIndex.probeTopK(spark, idx, emb(900001L), k = 1,
      nprobe = 16).collect().head
    assert(top1.getAs[Long]("vec_id") == 900001L &&
      top1.getAs[Double]("sim") == 1.0,
      s"a rescued vector must serve from the new generation: $top1")
    val served0 = IvfIndex.probeTopK(spark, idx, emb(900000L), k = 50,
      nprobe = 16).collect().map(_.getAs[Long]("vec_id"))
    assert(!served0.contains(900000L),
      "the carried tombstone event must keep hiding the superseded row")
  }

  test("a cutover between a sync's mark and its verification: content-verified, committed once, zero duplicates") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft-ivf-postmark").toString
    val lake = java.nio.file.Files
      .createTempDirectory("graft-ivf-postmark-lake").toString
    IvfIndex.build(spark, sfDir, idx)
    graft.sources.LakeLayout.appendToLake(spark, lake, wave(950000L, 30),
      "s", 1L, statsKey = Some("vec_id"))
    // the seam fires after the wave's mark lands — a full rebuild
    // cutover there moves the wave's generation to grace before the
    // sync's own verification runs; the verification must find the
    // wave (folded forward by the rebuild or the straggler sweep) by
    // its wave_v CONTENT and commit without a redo
    assert(IvfIndex.syncFromLakeImpl(spark, lake, idx,
      _ => IvfIndex.rebuild(spark, idx, cells = 16, iters = 2)) == 1L)
    val root = IvfIndex.layoutRoot(spark, idx)
    val rows = spark.read.parquet(s"$root/vectors")
      .filter($"vec_id" >= 950000L && $"vec_id" < 950030L)
    assert(rows.count() == 30L,
      "the wave must land in the post-cutover generation exactly once")
    assert(rows.groupBy($"vec_id").agg(count(lit(1)).as("n"))
      .filter($"n" > 1).isEmpty,
      "post-mark verification must not re-ingest a surviving wave")
    assert(IvfIndex.syncFromLake(spark, lake, idx) == 0L,
      "the version stays marked — a re-sync is a no-op")
  }

  test("the claim log stays bounded: 10 straight rebuilds keep at most 2 claims and 2 generation dirs") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-claims")
      .toString
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    IvfIndex.build(spark, sfDir, idx)
    for (_ <- 1 to 10) {
      IvfIndex.rebuild(spark, idx, cells = 16, iters = 2)
      val claims = fs
        .listStatus(new org.apache.hadoop.fs.Path(s"$idx/_gen"))
        .map(_.getPath.getName).toSeq
      assert(claims.size <= 2,
        s"reclamation must keep the claim log at live+grace: $claims")
      val gens = fs.listStatus(new org.apache.hadoop.fs.Path(idx))
        .map(_.getPath.getName).filter(_.startsWith("g")).toSeq
      assert(gens.size <= 2,
        s"reclamation must keep at most live+grace dirs: $gens")
    }
    assert(IvfIndex.committedGen(spark, idx).contains(10L))
  }

  test("a mid-create (empty) claim is not-yet-committed: readers skip it instead of resolving to a broken root") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-eclaim")
      .toString
    IvfIndex.build(spark, sfDir, idx)
    val before = IvfIndex.committedGen(spark, idx)
    val pemb = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .orderBy(org.apache.spark.sql.functions.col("vec_id")).limit(1)
      .collect().head
      .getAs[scala.collection.Seq[Float]]("embedding")
      .map(_.toDouble).toArray
    val served = IvfIndex.probeTopK(spark, idx, pemb, k = 5)
      .collect().toSeq
    // simulate a concurrent publisher between its exclusive create and
    // its content write: an EMPTY claim file for a higher generation
    val claims = new org.apache.hadoop.fs.Path(s"$idx/_gen")
    val fs = claims.getFileSystem(spark.sessionState.newHadoopConf())
    fs.create(new org.apache.hadoop.fs.Path(claims, "7"), false).close()
    // readers must still resolve and serve the real generation — an
    // empty claim resolved as live would point them at "$idx/" itself
    assert(IvfIndex.committedGen(spark, idx) == before,
      "an empty claim must read as not-yet-committed")
    assert(IvfIndex.probeTopK(spark, idx, pemb, k = 5)
      .collect().toSeq == served,
      "serving must be unaffected by a mid-create claim")
    fs.delete(new org.apache.hadoop.fs.Path(claims, "7"), false)
  }
}
