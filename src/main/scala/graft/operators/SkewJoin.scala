package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §7.4 risk 6 / 100 TB
  * posture). AQE's skew-join handles most cases at runtime; explicit
  * salting is for the pathological hot key that still overwhelms one
  * task — e.g. the null-ish "unknown user" owning 10% of a 100 TB fact
  * table.
  *
  * Mechanics: the skewed (large) side gets a random-ish salt in
  * [0, factor); the small side is replicated `factor`× with every salt
  * value; the join key becomes (key, salt), splitting each hot key's
  * rows across `factor` tasks. Row multiplicity is preserved exactly
  * (each large-side row matches exactly one replica).
  *
  * The salt mixes row content (xxhash64) with a per-row monotonic id so
  * even byte-identical duplicate rows of the hot key spread across
  * tasks (a content-only hash would send identical rows to one task —
  * the exact case salting targets). Join RESULTS are deterministic
  * regardless of salt values — salting only relocates rows, the output
  * multiset is unchanged.
  */
object SkewJoin {

  /** Join `large` ⋈ `small` on `key`, salting `large` into `factor`
    * sub-keys. Inner join only (outer variants need null-side care). */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      factor: Int = 8): DataFrame = {
    require(factor >= 1)
    require(!large.columns.contains("__salt") && !small.columns.contains("__salt"),
      "__salt column name is reserved by saltedJoin")
    val salted = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col): _*))
        + monotonically_increasing_id(), lit(factor)))
    val salts = (0 until factor).map(i => lit(i))
    val replicated = small.withColumn("__salt",
      explode(array(salts: _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Diagnostic: per-key row counts on the top-N heaviest keys — what
    * you run BEFORE deciding to salt. */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 10): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("rows"))
      .orderBy(col("rows").desc, col(key))
      .limit(topN)

  /** A hot-key filter Column for hybrid strategies: broadcast-join the
    * hot keys, shuffle-join the long tail. */
  def hotKeys(df: DataFrame, key: String, threshold: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("rows"))
      .filter(col("rows") > threshold)
      .select(col(key))
}
