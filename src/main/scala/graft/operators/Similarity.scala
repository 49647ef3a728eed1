package graft.operators

import graft.functions.VectorFunctions
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY §2.C P1 /
  * §2.D): brute-force cosine top-k as the exact baseline, all-pairs
  * near-dup ranking, and an LSH-bucketed approximate variant as the
  * scale path.
  *
  * Determinism: similarities are computed in double with a fixed fold
  * order, ROUNDED to 3 decimals, and every ranking orders by
  * (rounded score, id) — so the cross-engine compare never depends on
  * sub-ulp float agreement.
  *
  * Scale notes: brute-force top-k against one probe is a single scan +
  * TakeOrderedAndProject (linear, no shuffle of vectors); it is the
  * correct recall=1.0 baseline at any size. The quadratic all-pairs
  * form is for corpus diagnostics at sample scale; the production
  * near-dup path is [[Similarity.sAnnLshBuckets]]-style bucketing
  * (random hyperplane signatures → candidates only within a bucket). */
object Similarity {

  private def e(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  val ProbeId = 0L

  // ---------------------------------------------------- brute-force topk
  /** Exact cosine top-10 neighbors of vec_id=0. The probe row is
    * broadcast; the corpus is scanned once. */
  def sCosineTopk(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    import s.implicits._
    val probe = e(s, dir).filter($"vec_id" === ProbeId)
      .select($"embedding".as("p"))
    e(s, dir).filter($"vec_id" =!= ProbeId)
      .crossJoin(broadcast(probe))
      .withColumn("sim",
        round(VectorFunctions.cosine($"embedding", $"p"), 3))
      // zero-norm vectors yield NaN, which Spark sorts ABOVE every real
      // double — drop them before ranking
      .filter(!isnan($"sim") && $"sim".isNotNull)
      .select($"vec_id", $"label", $"sim")
      .orderBy($"sim".desc, $"vec_id")
      .limit(10)
  }

  /** Mirrors the Spark side's NaN/zero-norm guard: rows whose embedding
    * has zero norm (or a NULL-poisoned similarity) are excluded before
    * ranking on BOTH engines, so a degenerate vector in a future corpus
    * can't rank NaN rows at the top of the oracle only. */
  val sCosineTopkSql: String =
    s"""WITH p AS (SELECT embedding::DOUBLE[] AS p FROM embeddings WHERE vec_id = $ProbeId),
       scored AS (
         SELECT vec_id, label,
           round(list_cosine_similarity(embedding::DOUBLE[], p.p), 3) AS sim
         FROM embeddings, p
         WHERE vec_id <> $ProbeId
           AND list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0)
       SELECT vec_id, label, sim FROM scored
       WHERE sim IS NOT NULL AND NOT isnan(sim)
       ORDER BY sim DESC, vec_id LIMIT 10"""

  /** The metadata predicate the filtered-search drive pins (label 7 —
    * ~10 % of the corpus at every SF, selective enough that filtering
    * changes the answer, dense enough that every cell holds matches). */
  val FilterLabel = 7

  /** FILTERED vector search — top-k among rows matching a metadata
    * predicate, the production shape behind "nearest docs WHERE
    * source = X / lang = Y" (every serving stack treats this as
    * first-class; ref's `match_count` + source-filter surface,
    * `backend/src/api/recall.py:33-41`, lifted to the vector tier).
    * This exact form pushes the predicate INTO the corpus scan
    * (filter + projection reach the parquet reader together), scores
    * only survivors, and is oracle-checked; the IVF serving twin is
    * [[IvfIndex.probeTopK]]'s `where` parameter — same predicate
    * applied inside the probed cells, spec-pinned against this exact
    * truth with a widened nprobe (the standard filtered-ANN recall
    * lever: survivors thin out per cell, so probes widen). */
  def sFilteredTopk(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    import s.implicits._
    val probe = e(s, dir).filter($"vec_id" === ProbeId)
      .select($"embedding".as("p"))
    e(s, dir).filter($"vec_id" =!= ProbeId && $"label" === FilterLabel)
      .crossJoin(broadcast(probe))
      .withColumn("sim",
        round(VectorFunctions.cosine($"embedding", $"p"), 3))
      .filter(!isnan($"sim") && $"sim".isNotNull)
      .select($"vec_id", $"label", $"sim")
      .orderBy($"sim".desc, $"vec_id")
      .limit(10)
  }

  val sFilteredTopkSql: String =
    s"""WITH p AS (SELECT embedding::DOUBLE[] AS p FROM embeddings WHERE vec_id = $ProbeId),
       scored AS (
         SELECT vec_id, label,
           round(list_cosine_similarity(embedding::DOUBLE[], p.p), 3) AS sim
         FROM embeddings, p
         WHERE vec_id <> $ProbeId AND label = $FilterLabel
           AND list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0)
       SELECT vec_id, label, sim FROM scored
       WHERE sim IS NOT NULL AND NOT isnan(sim)
       ORDER BY sim DESC, vec_id LIMIT 10"""

  // ------------------------------------------------------- near-dup pairs
  /** Hard ceiling for the quadratic diagnostic: 20k vectors → 2·10⁸
    * candidate pairs, the most a deliberate all-pairs scan should ever
    * chew through. Above it the query fails fast with a pointer to the
    * LSH path instead of silently launching an O(n²) job that would run
    * for days at 100 TB. */
  val NeardupMaxRows = 20000L

  /** Top-20 most-similar embedding pairs (corpus near-dup diagnostic).
    * Quadratic by construction — sample/diagnostic scale only, and
    * GUARDED: refuses corpora above [[NeardupMaxRows]] (one cheap
    * parquet-metadata count) so the cartesian can never run unbounded.
    * The LSH variant below is the production path. */
  def sNeardupPairs(s: SparkSession, dir: String,
                    maxRows: Long = NeardupMaxRows): DataFrame = {
    VectorFunctions.register(s)
    import s.implicits._
    val nVecs = e(s, dir).count()
    require(nVecs <= maxRows,
      s"s_neardup_pairs is an all-pairs diagnostic capped at $maxRows vectors; " +
        s"corpus has $nVecs — use the bucketed sAnnLshBuckets/sAnnTopk path instead")
    // Pre-normalize once per vector (O(n) norms) so each of the O(n²)
    // pairs costs a single dot product instead of dot + two norms —
    // 3× less higher-order-function work in the quadratic stage. The
    // cache boundary stops project-collapse from inlining the norm
    // expression into the per-element division lambda (which would
    // re-evaluate it 64× per row).
    val withNorm = e(s, dir)
      .withColumn("nrm", VectorFunctions.l2Norm($"embedding"))
      // zero-norm vectors would propagate NaN through every pair they
      // touch (and NaN sorts above all real similarities)
      .filter($"nrm" > 0.0)
      .cache()
    val unit = withNorm.select($"vec_id",
      transform($"embedding", x => x.cast("double") / $"nrm").as("u"))
    val a = unit.select($"vec_id".as("i"), $"u".as("ua"))
    val b = unit.select($"vec_id".as("j"), $"u".as("ub"))
    a.join(b, $"i" < $"j")
      .withColumn("sim", round(VectorFunctions.dot($"ua", $"ub"), 3))
      .select($"i", $"j", $"sim")
      .orderBy($"sim".desc, $"i", $"j")
      .limit(20)
  }

  /** Zero-norm guard on both sides, mirroring the Spark `nrm > 0`
    * pre-filter (see [[sCosineTopkSql]]). */
  val sNeardupPairsSql: String =
    """WITH nz AS (
         SELECT vec_id, embedding FROM embeddings
         WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
       scored AS (
         SELECT a.vec_id AS i, b.vec_id AS j,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 3) AS sim
         FROM nz a JOIN nz b ON a.vec_id < b.vec_id)
       SELECT i, j, sim FROM scored
       WHERE sim IS NOT NULL AND NOT isnan(sim)
       ORDER BY sim DESC, i, j LIMIT 20"""

  // ----------------------------------------------------------- LSH path
  /** Deterministic pseudo-random hyperplanes (seeded LCG, no RNG calls)
    * for sign-LSH signatures. */
  private[operators] def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    var state = seed
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    Seq.fill(nPlanes)(Seq.fill(dim)(next()))
  }

  /** Sign-LSH bucketing: 8 hyperplanes → 8-bit bucket signature; emits
    * bucket histogram (bucket, n_vectors). Candidate generation for ANN
    * joins happens within equal buckets only — at 100 TB this is the
    * shuffle-key that replaces the quadratic pair join. Rows-only
    * correctness check (hyperplane constants are engine-local). */
  /** Embedding dimensionality read from the data (one tiny job) — a
    * hardcoded dim would silently degenerate every signature to one
    * bucket on a different corpus (VecDot returns NULL on length
    * mismatch). */
  private def embeddingDim(s: SparkSession, dir: String): Int = {
    import s.implicits._
    e(s, dir).select(size($"embedding")).head().getInt(0)
  }

  def sAnnLshBuckets(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    import s.implicits._
    val planes = hyperplanes(nPlanes = 8, dim = embeddingDim(s, dir))
    val sig = planes.zipWithIndex.map { case (p, idx) =>
      val pc = array(p.map(lit): _*)
      when(VectorFunctions.dot($"embedding", pc) >= 0, lit("1")).otherwise(lit("0"))
        .as(s"b$idx")
    }
    e(s, dir)
      .select(($"vec_id" +: sig): _*)
      .withColumn("bucket", concat((0 until 8).map(i => col(s"b$i")): _*))
      .groupBy($"bucket").agg(count(lit(1)).as("n_vectors"))
      .orderBy($"bucket")
  }

  /** Band-OR table count / hyperplane bits per table for the ANN path.
    * A single b-bit signature misses a true neighbor with probability
    * 1-(1-θ/π)^b, compounding silently; OR-ing T independent tables
    * drives the miss rate to (1-(1-θ/π)^b)^T. 6 tables × 6 bits gives
    * measured recall@10 ≥ 0.9 against the exact scan (PipelineOperatorsSpec)
    * while each probe still scans only ~T/2^b of the corpus. */
  val AnnTables = 6
  val AnnBitsPerTable = 6

  /** ANN top-k via multi-table sign-LSH: each vector lands in one bucket
    * per table (bucket key prefixed with the table index so tables never
    * cross-match); the candidate set is the OR over tables of the
    * probe's buckets, deduped, then scored with exact cosine. The
    * distinct and the scoring touch only candidates — the corpus never
    * shuffles, so the plan shape is the same at 100 TB with bucket
    * occupancy scaled by 2^bits.
    *
    * `probeFlips = 1` enables MULTI-PROBE (Lv et al. 2007): the probe
    * also queries every bucket at Hamming distance 1 in each table —
    * T×(bits+1) bucket keys instead of T, the cheap recall lever when a
    * corpus sits between the near-dup regime (plain band-OR suffices)
    * and the wide-angle regime (use IVF). The probe's own bucket keys
    * are BOUNDED model state (T rows), collected and expanded on the
    * driver. */
  def sAnnTopk(s: SparkSession, dir: String, k: Int = 10,
               tables: Int = AnnTables, bits: Int = AnnBitsPerTable,
               probeFlips: Int = 0): DataFrame = {
    VectorFunctions.register(s)
    import s.implicits._
    val dim = embeddingDim(s, dir)
    def bucketArr(v: org.apache.spark.sql.Column) =
      array((0 until tables).map { t =>
        val planes = hyperplanes(nPlanes = bits, dim = dim, seed = 42L + t)
        concat((lit(s"$t:") +: planes.map { p =>
          val pc = array(p.map(lit): _*)
          when(VectorFunctions.dot(v, pc) >= 0, lit("1")).otherwise(lit("0"))
        }): _*)
      }: _*)
    val ex = e(s, dir).select($"vec_id", explode(bucketArr($"embedding")).as("bkt"))
    val probeBkts = ex.filter($"vec_id" === ProbeId)
      .select($"bkt").collect().map(_.getString(0)).toSeq
    val expanded =
      if (probeFlips == 0) probeBkts
      else probeBkts.flatMap { b =>
        val (pre, rest) = b.splitAt(b.indexOf(':') + 1)
        b +: rest.indices.map(i =>
          pre + rest.updated(i, if (rest(i) == '1') '0' else '1'))
      }
    val candIds = ex.filter($"bkt".isin(expanded: _*))
      .filter($"vec_id" =!= ProbeId)
      .select($"vec_id").distinct()
    val probeVec = e(s, dir).filter($"vec_id" === ProbeId)
      .select($"embedding".as("p"))
    e(s, dir).join(candIds, Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(probeVec))
      .withColumn("sim", round(VectorFunctions.cosine($"embedding", $"p"), 3))
      .filter(!isnan($"sim") && $"sim".isNotNull)
      .select($"vec_id", $"label", $"sim")
      .orderBy($"sim".desc, $"vec_id")
      .limit(k)
  }

  // ----------------------------------------------------------- IVF path
  /** IVF index geometry: 16 spherical-k-means cells, probe the 6 nearest.
    * Chosen against THIS corpus's similarity profile: the exact top-10
    * neighbors sit at cosine 0.27-0.37 (θ ≈ 70°), where sign-LSH is
    * information-theoretically useless — per-bit collision ≈ 0.6 means
    * any (bits, tables) config reaching 0.9 recall scans ≥ the full
    * corpus. IVF still wins on such data because centroid proximity
    * correlates with neighbor proximity even at wide angles: measured
    * recall@10 = 1.0 scanning ~40% (K=16, nprobe=6), 0.9 at ~20%
    * (K=32, nprobe=6). For genuinely near-dup corpora (sim ≥ 0.9) the
    * band-OR sign-LSH above is cheaper — 6 tables × 6 bits scans ~9%
    * with recall ≥ 0.999. */
  val IvfCells = 16
  val IvfProbes = 6
  // 3 Lloyd iterations: measured recall@10 is already 1.0 at K=16/
  // nprobe=6 (the assignment argmax dominates training cost and each
  // iteration is a full corpus pass)
  val IvfIters = 3

  /** Deterministic spherical k-means centroids: seeded from the `cells`
    * lowest-vec_id unit vectors, then Lloyd iterations — assignment is a
    * map-side argmax against broadcast centroid literals; the mean
    * recompute collects K×dim per-dimension averages (bounded MODEL
    * state, ~1k doubles — not data). `trainModulo` > 1 trains on a
    * deterministic 1/modulo id-slice — the standard IVF recipe at scale,
    * where centroids need a representative sample, not every vector
    * (measured here: at ≥ ~100 training vectors per cell sampling is
    * free; below that recall degrades, so the 500-vector test corpus
    * trains on everything). The SERVING plan always assigns the full
    * corpus. */
  // In-session model cache: IVF centroids are an INDEX — trained once per
  // (corpus, geometry), then served by every probe, exactly like the
  // persisted IvfIndex layout. Without it each query re-pays 3 full
  // Lloyd passes per lookup. Safe to memoize: training is deterministic
  // by construction (fixed-point order-independent means), so a cached
  // model is bit-identical to a retrained one.
  //
  // The key includes a CORPUS FINGERPRINT, not just the directory path:
  // a path-keyed model cache would silently serve stale centroids after
  // an in-place rewrite. The fingerprint hashes the embeddings table's
  // file listing — (path, length, modification time) per file — one
  // filesystem metadata call, zero data read, so it stays cheap at any
  // corpus size. Rewrites change mtimes/lengths and appends add files;
  // both retrain automatically. (mtime granularity is the filesystem's;
  // a byte-identical same-length rewrite landing in the same timestamp
  // tick is the one theoretical miss, and it serves an identical model.)
  private val centroidCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Int, Int, Int), Array[Array[Double]]]()

  /** Cheap corpus-version fingerprint for the embeddings table under
    * `dir`: order-independent hash of every file's (name, length,
    * mtime). Metadata-only — no data is scanned. */
  private[graft] def corpusFingerprint(s: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(path)
    val files = if (st.isDirectory) fs.listStatus(path) else Array(st)
    files.foldLeft(17L) { (acc, f) =>
      // XOR-fold per-file hashes so listing order can't matter
      acc ^ (f.getPath.getName.hashCode.toLong * 31L +
        f.getLen * 1000003L + f.getModificationTime)
    }
  }

  /** Drop all memoized centroid models. With fingerprint-keyed entries
    * this is only needed to release memory, not for correctness. */
  def clearCentroidCache(): Unit = centroidCache.clear()

  private[graft] def ivfCentroids(s: SparkSession, dir: String,
      cells: Int, iters: Int, trainModulo: Int = 1): Array[Array[Double]] =
    centroidCache.computeIfAbsent(
      (dir, corpusFingerprint(s, dir), cells, iters, trainModulo),
      _ => trainIvfCentroids(s, dir, cells, iters, trainModulo))

  private def trainIvfCentroids(s: SparkSession, dir: String,
      cells: Int, iters: Int, trainModulo: Int): Array[Array[Double]] = {
    import s.implicits._
    trainIvfCentroidsFrom(s,
      e(s, dir).filter(pmod($"vec_id", lit(trainModulo)) === 0),
      cells, iters)
  }

  /** Lloyd training over an arbitrary (vec_id, embedding) frame — the
    * corpus-table path above and [[IvfIndex.rebuild]] (which retrains
    * on the INDEX's own vectors, appended waves included) share it. */
  private[graft] def trainIvfCentroidsFrom(s: SparkSession,
      vecs: org.apache.spark.sql.DataFrame,
      cells: Int, iters: Int): Array[Array[Double]] = {
    VectorFunctions.register(s)
    import s.implicits._
    // cache the UNIT vectors themselves: every Lloyd iteration (and the
    // seed collect) reads them, and the cache boundary also stops
    // project-collapse from inlining the norm into the per-element
    // division lambda
    val unitVecs = vecs
      .withColumn("nrm", VectorFunctions.l2Norm($"embedding"))
      .filter($"nrm" > 0.0)
      .select($"vec_id",
        transform($"embedding", x => x.cast("double") / $"nrm").as("u"))
      .cache()
    var cents: Array[Array[Double]] = unitVecs.orderBy($"vec_id").limit(cells)
      .collect().map(_.getAs[scala.collection.Seq[Double]]("u").toArray)
    for (_ <- 0 until iters) {
      // no rounding needed in the argmax: VecDot folds the array in
      // index order, so with DETERMINISTIC centroid literals (see the
      // fixed-point mean below) each row's 16 sims are bit-identical
      // every run; struct compare tie-breaks equal sims by cell index
      val best = array_max(array(cents.zipWithIndex.map { case (c, i) =>
        struct(VectorFunctions.dot($"u", array(c.map(lit): _*)).as("sim"),
          lit(i).as("cell"))
      }: _*))
      // order-independent mean via exact scaled-integer sums — a raw
      // double avg() merges partials in shuffle-arrival order and would
      // bake nondeterministic centroids into the plan. Unit components
      // are in [-1,1], so a 1e7 fixed-point long is exact under addition
      // up to ~9·10¹¹ training rows per cell and costs one primitive
      // sum (DECIMAL sums measured ~2× the whole query's time)
      val sums = unitVecs.select(best.getField("cell").as("cell"), posexplode($"u"))
        .groupBy($"cell", $"pos")
        .agg(sum(round($"col" * 1e7).cast("long")).as("fx"),
          count(lit(1)).as("cnt"))
        .collect()
      val byCell = sums.groupBy(_.getAs[Int]("cell"))
      cents = cents.zipWithIndex.map { case (old, i) =>
        byCell.get(i).fold(old) { rows =>
          val v = new Array[Double](old.length)
          rows.foreach(r => v(r.getAs[Int]("pos")) =
            r.getAs[Long]("fx").toDouble / (1e7 * r.getAs[Long]("cnt")))
          val n = math.sqrt(v.map(x => x * x).sum)
          if (n > 0) v.map(_ / n) else old
        }
      }
    }
    unitVecs.unpersist()
    cents
  }

  /** ANN top-k via IVF: assign every vector to its nearest centroid
    * (map-side argmax over broadcast literals — no shuffle), scan only
    * the probe's `nprobe` nearest cells with exact cosine. Candidate
    * fraction ≈ nprobe/cells regardless of corpus size, so the plan is
    * the 100 TB shape: a pruned scan + TakeOrderedAndProject. */
  def sIvfTopk(s: SparkSession, dir: String, k: Int = 10,
               cells: Int = IvfCells, nprobe: Int = IvfProbes): DataFrame = {
    VectorFunctions.register(s)
    import s.implicits._
    val cents = ivfCentroids(s, dir, cells, IvfIters)
    val probeU = { // one bounded row: the probe vector
      val r = e(s, dir).filter($"vec_id" === ProbeId).select($"embedding").head()
      val v = r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val probeCells = cents.zipWithIndex
      .map { case (c, i) => (c.zip(probeU).map { case (a, b) => a * b }.sum, i) }
      .sortBy { case (sim, i) => (-sim, i) }.take(nprobe).map(_._2)
    val best = array_max(array(cents.zipWithIndex.map { case (c, i) =>
      struct(VectorFunctions.dot($"embedding", array(c.map(lit): _*)).as("sim"),
        lit(i).as("cell"))
    }: _*))
    val probeVec = e(s, dir).filter($"vec_id" === ProbeId)
      .select($"embedding".as("p"))
    e(s, dir)
      .withColumn("cell", best.getField("cell"))
      .filter($"cell".isin(probeCells: _*) && $"vec_id" =!= ProbeId)
      .crossJoin(broadcast(probeVec))
      .withColumn("sim", round(VectorFunctions.cosine($"embedding", $"p"), 3))
      .filter(!isnan($"sim") && $"sim".isNotNull)
      .select($"vec_id", $"label", $"sim")
      .orderBy($"sim".desc, $"vec_id")
      .limit(k)
  }

  // ------------------------------------------------- semantic dedup
  /** Within-cluster similarity threshold for semantic dedup. This
    * corpus has no planted embedding near-dups (max pairwise cosine
    * 0.513 at sf0.01, θ ≈ 70° typical) — 0.45 sits at the top of the
    * real distribution so the operator exercises both outcomes, the
    * same percentile-style tuning the SemDeDup recipe prescribes. */
  val SemDedupThreshold = 0.45

  /** The dropped-vector set of [[sSemanticDedup]]: vectors that have a
    * LOWER-id neighbor at cosine ≥ threshold within their own cell
    * (greedy keep-lowest-id, the standard SemDeDup reduction). Exposed
    * for the cross-check spec, which compares it against the exact
    * quadratic ground truth. */
  /** Clusters each vector joins under for semantic dedup: the top-N
    * nearest cells, not just the argmax. At the wide angles this corpus
    * lives at (true dups ≈ 0.45 cosine), a pair's endpoints frequently
    * straddle a cell boundary — single-assignment measured recall 0.43;
    * top-2 assignment roughly doubles candidate volume (still ∝ Σcellᵢ²,
    * never n²) and lifts recall to every pair whose top-2 cell sets
    * intersect. Same idea as the ANN path's multi-probe. */
  val SemDedupAssign = 2

  /** Per-task pair budget for the within-cell join: a cell whose
    * exploded membership exceeds this splits into `ceil(m / target)`
    * hash blocks, bounding any one join task at ~target² comparisons
    * no matter how runaway the cell (the skew case the IVF shape can't
    * prevent — a dense corpus region lands everything in one cell). */
  val HotCellTarget = 2048

  private[graft] def semanticDropSet(s: SparkSession, dir: String,
      cells: Int, threshold: Double,
      hotCellTarget: Int = HotCellTarget): (DataFrame, DataFrame) = {
    VectorFunctions.register(s)
    import s.implicits._
    val cents = ivfCentroids(s, dir, cells, IvfIters)
    // (sim, cell) structs sorted desc → top-N cell ids per vector;
    // deterministic: fixed fold order in VecDot, struct compare
    // tie-breaks equal sims by cell id
    val simStructs = array(cents.zipWithIndex.map { case (c, i) =>
      struct(VectorFunctions.dot($"u", array(c.map(lit): _*)).as("sim"),
        lit(i).as("cell"))
    }: _*)
    val topCells = transform(
      slice(reverse(sort_array(simStructs)), 1, SemDedupAssign),
      x => x.getField("cell"))
    val assigned = e(s, dir)
      .withColumn("nrm", VectorFunctions.l2Norm($"embedding"))
      .filter($"nrm" > 0.0)
      .select($"vec_id",
        transform($"embedding", x => x.cast("double") / $"nrm").as("u"))
      .withColumn("cells", topCells)
      // primary cell owns the vector for per-cell accounting
      .withColumn("cell", element_at($"cells", 1))
      // read by both sides of the pair join AND the size aggregate; the
      // boundary also keeps the centroid ranking from re-running per use
      .cache()
    // Hot-cell mitigation (the runaway-cell skew case): triangular
    // block decomposition of each cell's all-pairs. Members hash into
    // nb = ceil(m/target) blocks; the a-side serves block-pair tasks
    // (blk, q ≥ blk), the b-side tasks (p ≤ blk, blk), so an unordered
    // cross-block pair meets at exactly ONE (c, p, q) key and a
    // same-block pair at (c, x, x) twice (once per orientation — the
    // i<j filter keeps one). Join-task work is bounded at (m/nb)² ≈
    // target² however large the cell; total candidate volume is
    // UNCHANGED (this fixes the straggler/OOM, not the pair count, and
    // therefore provably preserves the drop set — see the equivalence
    // spec). Normal cells get nb = 1 and degenerate to the plain
    // cell equi-join. Same playbook as [[SkewJoin]], specialized to a
    // self-join's triangle.
    val exploded = assigned.select(explode($"cells").as("c"), $"vec_id", $"u")
    val cellBlocks = exploded.groupBy($"c")
      .agg(count(lit(1)).as("m"))
      .select($"c", greatest(lit(1),
        ceil($"m" / lit(hotCellTarget.toDouble))).cast("int").as("nb"))
    val aSide = exploded.join(broadcast(cellBlocks), Seq("c"))
      .withColumn("blk", pmod(xxhash64($"vec_id"), $"nb").cast("int"))
      .select($"c", $"blk".as("p"),
        explode(sequence($"blk", $"nb" - 1)).as("q"),
        $"vec_id".as("i"), $"u".as("ua"))
    val bSide = exploded.join(broadcast(cellBlocks), Seq("c"))
      .withColumn("blk", pmod(xxhash64($"vec_id"), $"nb").cast("int"))
      .select($"c", explode(sequence(lit(0), $"blk")).as("p"),
        $"blk".as("q"), $"vec_id".as("j"), $"u".as("ub"))
    val dropped = aSide.join(bSide, Seq("c", "p", "q"))
      .filter($"p" =!= $"q" || $"i" < $"j")
      .withColumn("sim", round(VectorFunctions.dot($"ua", $"ub"), 3))
      .filter($"sim" >= threshold)
      // greedy keep-lowest-id: the higher id of each qualifying pair
      // drops. A pair can meet under both shared cells — account the
      // DROP to the dropped vector's own primary cell, once.
      .select(greatest($"i", $"j").as("vec_id"))
      .distinct()
      .join(assigned.select($"vec_id", $"cell"), Seq("vec_id"))
      .select($"cell", $"vec_id")
    (assigned, dropped)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster embeddings (reusing the IVF centroid
    * model), then search for near-duplicates ONLY within a cluster and
    * greedily keep the lowest-id member of each duplicate pair. The
    * cell equi-join is the bucketed not-all-pairs shape: candidate
    * volume is Σ cellᵢ² instead of n² — with K scaled so cells hold
    * ~corpus/K vectors, this is the form that runs at 100 TB. The
    * runaway-cell skew case is handled: cells past [[HotCellTarget]]
    * split into triangular hash-block tasks that bound per-task work
    * while provably preserving the pair set (see [[semanticDropSet]]).
    * Emits per-cell accounting
    * (n_vecs, n_dropped, n_kept). Rows-only driver check — centroids
    * are engine-local; the spec cross-checks the dropped set against
    * the exact quadratic ground truth instead. */
  def sSemanticDedup(s: SparkSession, dir: String,
      cells: Int = IvfCells,
      threshold: Double = SemDedupThreshold): DataFrame = {
    import s.implicits._
    val (assigned, dropped) = semanticDropSet(s, dir, cells, threshold)
    val sizes = assigned.groupBy($"cell").agg(count(lit(1)).as("n_vecs"))
    val drops = dropped.groupBy($"cell").agg(count(lit(1)).as("n_dropped"))
    sizes.join(drops, Seq("cell"), "left")
      .withColumn("n_dropped", coalesce($"n_dropped", lit(0L)))
      .withColumn("n_kept", $"n_vecs" - $"n_dropped")
      .orderBy($"cell")
  }

  // ----------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_semantic_dedup" -> ((s: SparkSession, dir: String) => sSemanticDedup(s, dir)),
    "s_cosine_topk" -> (sCosineTopk _),
    "s_filtered_topk" -> (sFilteredTopk _),
    "s_ann_lsh_buckets" -> (sAnnLshBuckets _),
    "s_ann_topk" -> ((s: SparkSession, dir: String) => sAnnTopk(s, dir)),
    "s_ivf_topk" -> ((s: SparkSession, dir: String) => sIvfTopk(s, dir)))

  /** Deliberately NOT in the production registry: the all-pairs scan
    * is fail-fast guarded but still O(n²) by construction — a corpus
    * forensics tool, not a query a user should find next to the scale
    * paths. Exposed here for specs and ad-hoc use; its DuckDB twin
    * ([[sNeardupPairsSql]]) remains for manual cross-checks. */
  val diagnostics: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_neardup_pairs" -> ((s: SparkSession, dir: String) => sNeardupPairs(s, dir)))

  /** s_ann_* and s_semantic_dedup have no oracle (engine-local
    * hyperplane/centroid constants) → driver records the weaker
    * rows-only check. */
  val oracle: Map[String, String] = Map(
    "s_cosine_topk" -> sCosineTopkSql,
    "s_filtered_topk" -> sFilteredTopkSql)
}
