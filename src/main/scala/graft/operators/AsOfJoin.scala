package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join — for each left row, the latest right row at-or-before its
  * timestamp within the same key (the canonical feature-join of a
  * training-data pipeline: "state of X when Y happened").
  *
  * Spark lacks a native as-of join; the scalable composition is the
  * union-marker pattern: tag both sides, union, sort per key by (time,
  * side-priority), and carry the last right-side value forward with a
  * `last(ignoreNulls)` running window. One shuffle on the key — no range
  * join, no per-row subquery. (A custom SparkStrategy — SURVEY §7.4 —
  * would only be warranted if the window form ever bottlenecked; it
  * shares a single sort with any downstream per-key work.)
  *
  * The oracle is DuckDB's native ASOF JOIN, which makes this operator a
  * semantics cross-check of two completely different implementations.
  */
object AsOfJoin {

  /** Generic form: left(keyCol, timeCol, ...) asof-joined against
    * right(keyCol, timeCol, valueCols...). Right columns arrive
    * null-filled when no right row precedes the left row. */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.forall(!left.columns.contains(_)),
      "right value columns must not collide with left columns")
    val l = left.withColumn("__side", lit(1))
    val r = right.select(
      (Seq(col(keyCol), col(timeCol)) ++ valueCols.map(col)): _*)
      .withColumn("__side", lit(0))
    val lCols = left.columns
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at the same timestamp (__side 0<1)
    // => "at-or-before" semantics
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { (acc, c) =>
      acc.withColumn(s"__asof_$c", last(col(c), ignoreNulls = true).over(w))
    }
    val out = carried.filter(col("__side") === 1)
    valueCols.foldLeft(out) { (acc, c) =>
      acc.withColumn(c, col(s"__asof_$c")).drop(s"__asof_$c")
    }.drop("__side").select((lCols ++ valueCols).map(col): _*)
  }

  /** Oracle-checked instance: for each purchase event, the same user's
    * latest click at-or-before it ("what did they click before buying").
    * The right side is deduped to one row per (uid, t) — max event_id —
    * so tie handling is deterministic on both engines. Times are the raw
    * integral nanoseconds. */
  def qAsofPurchaseClick(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("uid"),
        $"ts".as("t"))
    val clickW = Window.partitionBy($"uid", $"t").orderBy($"click_id".desc)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("uid"), $"ts".as("t"),
        $"event_id".as("click_id"), $"value".as("click_value"))
      .withColumn("rn", row_number().over(clickW))
      .filter($"rn" === 1).drop("rn")
    asOf(purchases, clicks, "uid", "t", Seq("click_id", "click_value"))
      .select($"purchase_id", $"uid", $"click_id", $"click_value")
      .orderBy($"purchase_id")
  }

  val qAsofSql: String =
    """WITH p AS (
         SELECT event_id AS purchase_id, user_id AS uid, epoch_ns(ts) AS t
         FROM events WHERE event_type = 'purchase'),
       c0 AS (
         SELECT user_id AS uid, epoch_ns(ts) AS t, event_id AS click_id,
                value AS click_value,
                row_number() OVER (PARTITION BY user_id, epoch_ns(ts)
                                   ORDER BY event_id DESC) AS rn
         FROM events WHERE event_type = 'click'),
       c AS (SELECT uid, t, click_id, click_value FROM c0 WHERE rn = 1)
       SELECT p.purchase_id, p.uid, c.click_id, c.click_value
       FROM p ASOF LEFT JOIN c ON p.uid = c.uid AND p.t >= c.t
       ORDER BY p.purchase_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_purchase_click" -> (qAsofPurchaseClick _))

  val oracle: Map[String, String] = Map(
    "q_asof_purchase_click" -> qAsofSql)
}
