package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-query helpers that MUST stay in lockstep between the Spark and
  * oracle forms (single source of truth; previously duplicated per
  * file). */
object Shared {

  /** Exact, order-independent sum of a double column: cast each value to
    * DECIMAL, sum exactly, emit double. Deterministic at any
    * parallelism. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Synthetic deterministic confidence for documents-as-memory-store
    * queries: (doc_id·37 mod 100)/100 covers both sides of the 0.6
    * threshold with exact integer math on both engines. */
  def syntheticConfidence(docId: Column): Column =
    ((docId * 37) % 100).cast("double") / 100.0

  /** The oracle-SQL twin of [[syntheticConfidence]]. */
  val syntheticConfidenceSql: String =
    "CAST((doc_id * 37) % 100 AS DOUBLE) / 100.0"
}
