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

  // ------------------------------------------------------- near-dup pairs
  /** Top-20 most-similar embedding pairs (corpus near-dup diagnostic).
    * Quadratic by construction — sample/diagnostic scale only; the LSH
    * variant below is the production path. */
  def sNeardupPairs(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    import s.implicits._
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

  /** ANN top-k via LSH buckets: probe joins only its own bucket, then
    * exact cosine within the bucket. Approximate (recall < 1) but the
    * scan is 1/2^bits of the corpus in expectation. */
  def sAnnTopk(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    VectorFunctions.register(s)
    import s.implicits._
    val planes = hyperplanes(nPlanes = 8, dim = embeddingDim(s, dir))
    def bucketCol(v: org.apache.spark.sql.Column) =
      concat(planes.map { p =>
        val pc = array(p.map(lit): _*)
        when(VectorFunctions.dot(v, pc) >= 0, lit("1")).otherwise(lit("0"))
      }: _*)
    val withBucket = e(s, dir).withColumn("bucket", bucketCol($"embedding"))
    val probe = withBucket.filter($"vec_id" === ProbeId)
      .select($"bucket", $"embedding".as("p"))
    withBucket.join(broadcast(probe), "bucket")
      .filter($"vec_id" =!= ProbeId)
      .withColumn("sim", round(VectorFunctions.cosine($"embedding", $"p"), 3))
      .filter(!isnan($"sim") && $"sim".isNotNull)
      .select($"vec_id", $"label", $"sim")
      .orderBy($"sim".desc, $"vec_id")
      .limit(k)
  }

  // ----------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_cosine_topk" -> (sCosineTopk _),
    "s_neardup_pairs" -> (sNeardupPairs _),
    "s_ann_lsh_buckets" -> (sAnnLshBuckets _),
    "s_ann_topk" -> ((s: SparkSession, dir: String) => sAnnTopk(s, dir)))

  /** s_ann_* have no oracle (engine-local hyperplane constants) →
    * driver records the weaker rows-only check. */
  val oracle: Map[String, String] = Map(
    "s_cosine_topk" -> sCosineTopkSql,
    "s_neardup_pairs" -> sNeardupPairsSql)
}
