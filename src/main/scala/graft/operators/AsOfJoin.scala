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
    * null-filled when no right row precedes the left row.
    *
    * The matched right row is carried as ONE struct, so a null in one
    * value column of the matched row stays null (no per-column backfill
    * from older rows — row atomicity matches a true as-of join). Ties
    * among right rows at the same (key, time) are resolved
    * deterministically by struct comparison (last = field-wise max);
    * for full control dedup the right side first (as
    * [[qAsofPurchaseClick]] does). */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCols: Seq[String]): DataFrame = {
    val reserved = Seq("__side", "__rv", "__asof")
    require(valueCols.forall(!left.columns.contains(_)),
      "right value columns must not collide with left columns")
    require(reserved.forall(c =>
      !left.columns.contains(c) && !right.columns.contains(c)),
      s"column names ${reserved.mkString("/")} are reserved by asOf")
    require(right.columns.contains(keyCol) && right.columns.contains(timeCol),
      s"right side must carry $keyCol and $timeCol")
    val l = left.withColumn("__side", lit(1))
    val r = right.select(
        (Seq(col(keyCol), col(timeCol)) ++ valueCols.map(col)): _*)
      .withColumn("__side", lit(0))
      // the whole right row as one value — atomic carry
      .withColumn("__rv", struct(valueCols.map(col): _*))
      .drop(valueCols: _*)
    val lCols = left.columns
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at the same timestamp (__side 0<1)
    // => "at-or-before"; __rv as final key makes right-side ties
    // deterministic regardless of partition-internal order
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("__side"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__asof",
      last(col("__rv"), ignoreNulls = true).over(w))
    val out = carried.filter(col("__side") === 1)
    valueCols.foldLeft(out) { (acc, c) =>
      acc.withColumn(c, col("__asof").getField(c))
    }.select((lCols ++ valueCols).map(col): _*)
  }

  /** Oracle-checked instance: for each purchase event, the same user's
    * latest click at-or-before it ("what did they click before buying").
    * The right side is deduped to one row per (uid, t) — max event_id —
    * so tie handling is deterministic on both engines.
    *
    * Times are compared in MICROSECONDS on both engines: DuckDB
    * truncates TIMESTAMP(NANOS) to µs internally (verified — epoch_ns
    * returns µs-zero-padded values), so the Spark side must truncate
    * too or same-µs boundary events would tie differently per engine. */
  def qAsofPurchaseClick(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
      .withColumn("t", expr("ts div 1000")) // µs, matching the oracle
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("uid"), $"t")
    val clickW = Window.partitionBy($"uid", $"t").orderBy($"click_id".desc)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("uid"), $"t",
        $"event_id".as("click_id"), $"value".as("click_value"))
      .withColumn("rn", row_number().over(clickW))
      .filter($"rn" === 1).drop("rn")
    asOf(purchases, clicks, "uid", "t", Seq("click_id", "click_value"))
      .select($"purchase_id", $"uid", $"click_id", $"click_value")
      .orderBy($"purchase_id")
  }

  val qAsofSql: String =
    """WITH p AS (
         SELECT event_id AS purchase_id, user_id AS uid,
                epoch_ns(ts) // 1000 AS t
         FROM events WHERE event_type = 'purchase'),
       c0 AS (
         SELECT user_id AS uid, epoch_ns(ts) // 1000 AS t,
                event_id AS click_id, value AS click_value,
                row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000
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
