package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns as pure
  * Column expressions (SURVEY §2.C P1).
  *
  * Built from Spark's higher-order functions (`zip_with` / `aggregate`),
  * which stay inside whole-stage codegen — no UDF/serialization cost in
  * the hot path. Math is done in double after an exact float→double
  * widening, with a strict sequential left-fold accumulation order, so
  * results are bit-deterministic regardless of partitioning.
  */
object VectorFunctions {

  /** Elementwise-product sum (dot product) in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity = dot / (|a|·|b|). NaN on zero vectors (caller
    * filters if the corpus can contain them). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Euclidean (L2) distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0), (acc, v) => acc + v))
}
