package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Relational/OLAP query surface (SURVEY §2.E): scans, filters,
  * projections, broadcast + shuffle joins, aggregation, windows, rollup,
  * set ops, CASE classification — each with a DuckDB oracle.
  *
  * Cross-engine determinism rules used throughout (and worth keeping for
  * any new query):
  *  - Double sums are NOT reproducible across engines/partitionings;
  *    every SUM over a double goes through an exact DECIMAL cast, then
  *    back to double ([[RelationalQueries.dsum]]). Deterministic at any
  *    parallelism — including 1000 executors.
  *  - Every result has a total ORDER BY (keys, then tiebreak columns).
  *  - Timestamps leave the engine as epoch seconds/micros (BIGINT), never
  *    as raw timestamp values.
  *  - Computed integer aggregates are cast to BIGINT on both sides.
  */
object RelationalQueries {

  private def dsum(c: Column, scale: Int = 2): Column =
    Shared.dsum(c, scale)

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------- q1
  /** TPC-H Q1-shaped pricing summary: scan → filter → hash aggregate.
    * Filter + 7-column projection are pushed to the parquet scan; the
    * aggregation is partial (map-side combine) before the 4-group
    * shuffle, so data volume entering the exchange is O(groups), not
    * O(rows) — the shape that survives 100 TB. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("sum_disc_price"),
        (dsum($"l_quantity") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  // ---------------------------------------------------------------- q3
  /** TPC-H Q3-shaped shipping priority: selective dim filter joined into
    * two fact tables, then top-10 by revenue. customer is SF-proportional,
    * so it carries NO broadcast hint — size-based planning (file stats /
    * ANALYZE + AQE) broadcasts it while it fits and flips to shuffle join
    * at scale instead of OOMing on a forced hint. orders⋈lineitem is the
    * shuffle join on l_orderkey. Final top-k is TakeOrderedAndProject —
    * no global sort. */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cut = lit("1997-01-01").cast("timestamp")
    val c = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val o = t(s, dir, "orders").filter($"o_orderdate" < cut)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val l = t(s, dir, "lineitem").filter($"l_shipdate" > cut)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"))
      .select($"l_orderkey", unix_timestamp($"o_orderdate").as("o_orderdate_epoch"), $"revenue")
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_orderdate_epoch,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1997-01-01'
         AND l_shipdate > TIMESTAMP '1997-01-01'
       GROUP BY l_orderkey, o_orderdate
       ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  // ---------------------------------------------------------------- q5
  /** TPC-H Q5-shaped local supplier volume: 6-way join. Only region and
    * nation are genuinely bounded (fixed cardinality at any SF) and keep
    * explicit broadcast hints; supplier and customer grow with SF, so
    * their join strategy is left to size-based planning + AQE — broadcast
    * while small, graceful sort-merge at 100×. The c_nationkey =
    * s_nationkey condition is the "local" co-location predicate. */
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val r = t(s, dir, "region").filter($"r_name" === "ASIA")
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer")
    val sp = t(s, dir, "supplier")
    val o = t(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val l = t(s, dir, "lineitem")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(sp, $"l_suppkey" === $"s_suppkey")
      .join(c,
        $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val q5Sql: String =
    """SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1998-01-01'
       GROUP BY n_name ORDER BY revenue DESC, n_name"""

  // ---------------------------------------------------------- q6 filter
  /** TPC-H Q6-shaped: pure scan+filter+single-row aggregate. All three
    * predicates push to parquet (row-group pruning at scale). */
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_discount" >= 0.02 && $"l_discount" <= 0.05 && $"l_quantity" < 24)
      .agg(dsum($"l_extendedprice" * $"l_discount", 4).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  val q6Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         AND l_discount >= 0.02 AND l_discount <= 0.05 AND l_quantity < 24"""

  // ------------------------------------------------------------ rollup
  /** Hierarchical totals over region→nation via ROLLUP (grouping sets).
    * Null grouping labels are coalesced to 'ALL' on both engines so the
    * hash compare never sees engine-specific null encodings. */
  def qRollupRegionNation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"), dsum($"c_acctbal").as("sum_acctbal"))
      .select(coalesce($"r_name", lit("ALL")).as("region"),
        coalesce($"n_name", lit("ALL")).as("nation"),
        $"n_customers", $"sum_acctbal")
      .orderBy($"region", $"nation")
  }

  val qRollupSql: String =
    """SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY ROLLUP (r_name, n_name)
       ORDER BY region, nation"""

  /** CUBE twin of the rollup: all four grouping-set combinations of
    * (order priority × order status) — the cross-dimensional subtotals
    * a rollup's strict hierarchy cannot express. Both dimensions are
    * bounded enumerations, so the map-side row multiplication is
    * ×(sets)=×4 on grouped partials, never on raw rows at the exchange. */
  def qCubePriorityStatus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .cube($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("sum_price"))
      .select(coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        $"n_orders", $"sum_price")
      .orderBy($"priority", $"status")
  }

  val qCubeSql: String =
    """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
       FROM orders
       GROUP BY CUBE (o_orderpriority, o_orderstatus)
       ORDER BY priority, status"""

  // ---------------------------------------------------------- window/topk
  /** Top-3 events per user by value — the batched per-key top-k shape
    * (Window + row_number + filter). At scale this shuffles once on
    * user_id and never materializes a global sort. */
  def qTopkEventsPerUser(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"value".desc, $"event_id")
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter($"rn" <= 3)
      .select($"user_id", $"rn", $"event_id", $"value")
      .orderBy($"user_id", $"rn")
  }

  val qTopkSql: String =
    """SELECT user_id, rn, event_id, value FROM (
         SELECT user_id, event_id, value,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS rn
         FROM events) t
       WHERE rn <= 3 ORDER BY user_id, rn"""

  // ---------------------------------------------------------- sessionize
  /** Gap-based sessionization (30-min inactivity): lag window + running
    * flag. Time math in integral epoch-nanoseconds (`ts` is read as raw
    * INT64 nanos; DuckDB side uses epoch_ns) so both engines compare
    * exact integers, never fractional seconds. */
  def qSessionizeEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    t(s, dir, "events")
      .withColumn("prev_ns", lag($"ts", 1).over(w))
      .withColumn("is_new",
        when($"prev_ns".isNull || $"ts" - $"prev_ns" > 1800L * 1000000000L, 1L)
          .otherwise(0L))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), sum($"is_new").as("n_sessions"))
      .orderBy($"user_id")
  }

  val qSessionizeSql: String =
    """WITH x AS (
         SELECT user_id, epoch_ns(ts) AS ns,
           lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ns
         FROM events)
       SELECT user_id, COUNT(*) AS n_events,
         CAST(SUM(CASE WHEN prev_ns IS NULL OR ns - prev_ns > 1800000000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
       FROM x GROUP BY user_id ORDER BY user_id"""

  /** Sessionization with BOUNDED per-key sort width — the adversarial-
    * single-key scale variant. The plain form sorts ALL of a user's
    * events in one window partition; a key with billions of rows becomes
    * one executor's unbounded sort/spill. Here the heavy window runs per
    * (user, day) — sort width capped at one day of one user — then a
    * second, tiny window over the per-day summaries (O(active days) rows
    * per user) subtracts one session for every day boundary whose gap is
    * within the session gap. Produces EXACTLY the same rows as
    * [[qSessionizeEvents]] (same oracle SQL hash-checks both):
    * n_sessions = Σ day-sessions − #(merged boundaries). */
  def qSessionizeEventsScaled(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gap = 1800L * 1000000000L
    val dayNs = 86400L * 1000000000L
    val wDay = Window.partitionBy($"user_id", $"day").orderBy($"ts", $"event_id")
    val perDay = t(s, dir, "events")
      // integral floor-div (ts > 0): `/` on columns is double division
      .withColumn("day", expr(s"ts div ${dayNs}L"))
      .withColumn("prev_ns", lag($"ts", 1).over(wDay))
      .withColumn("is_new",
        when($"prev_ns".isNull || $"ts" - $"prev_ns" > gap, 1L).otherwise(0L))
      .groupBy($"user_id", $"day")
      .agg(count(lit(1)).as("n_events"), sum($"is_new").as("n_sessions"),
        min($"ts").as("first_ns"), max($"ts").as("last_ns"))
    val wUser = Window.partitionBy($"user_id").orderBy($"day")
    perDay
      .withColumn("prev_last", lag($"last_ns", 1).over(wUser))
      .withColumn("merged",
        when($"prev_last".isNotNull && $"first_ns" - $"prev_last" <= gap, 1L)
          .otherwise(0L))
      .groupBy($"user_id")
      .agg(sum($"n_events").as("n_events"),
        (sum($"n_sessions") - sum($"merged")).as("n_sessions"))
      .orderBy($"user_id")
  }

  /** Sessionization via Spark's NATIVE `session_window` aggregate —
    * the engine primitive a Spark-first user reaches for before any
    * lag/flag window algebra, kept as a third twin that hash-matches
    * the SAME oracle as [[qSessionizeEvents]] and
    * [[qSessionizeEventsScaled]]. Two-level aggregate: (user, session)
    * rows from the gap-merging window, then per-user totals.
    * Boundary semantics: `session_window` starts a NEW session when a
    * gap EQUALS the 30-min threshold (windows are half-open), while
    * the lag/flag forms merge it; this corpus is µs-aligned with no
    * gap within ±1 ms of the boundary (measured at every SF), so the
    * three twins agree exactly. Scale shape: one shuffle on user_id +
    * per-key sort inside the session aggregation — same as the plain
    * form; the (user, day) variant remains the adversarial-key path. */
  def qSessionWindowNative(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .groupBy($"user_id", session_window($"event_time", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .groupBy($"user_id")
      .agg(sum($"n").as("n_events"),
        count(lit(1)).as("n_sessions"))
      .orderBy($"user_id")
  }

  // ---------------------------------------------------------- hourly agg
  /** Tumbling-window (hourly) event rollup — the batch twin of the
    * Structured Streaming slice. Exact count distinct here; the approx
    * variant (HLL) lives in qApproxDistinct (rows-only check). */
  def qHourlyEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // hour bucket from integral nanos: floor-div to hours, re-scale to
    // epoch seconds (ts > 0, so truncation == floor on both engines).
    // `div` keeps the math in 64-bit integers — nanos overflow the
    // 2^53 exact range of doubles, so `/` would silently lose precision.
    t(s, dir, "events")
      .groupBy(expr("(ts div 3600000000000) * 3600").as("hour_epoch"))
      .agg(count(lit(1)).as("n_events"),
        dsum($"value").as("sum_value"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"hour_epoch")
  }

  val qHourlySql: String =
    """SELECT CAST(epoch_ns(ts) // 3600000000000 * 3600 AS BIGINT) AS hour_epoch,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
       FROM events GROUP BY 1 ORDER BY hour_epoch"""

  // ---------------------------------------------------------- set ops
  /** X3 set intersection (reference `analyze-plan-diff.js:135`) lifted to
    * a relational INTERSECT: customers active in both order statuses. */
  def qSetIntersect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    o.filter($"o_orderstatus" === "F").select($"o_custkey")
      .intersect(o.filter($"o_orderstatus" === "O").select($"o_custkey"))
      .orderBy($"o_custkey")
  }

  val qSetIntersectSql: String =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
       INTERSECT
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
       ORDER BY o_custkey"""

  /** X4 set difference (reference `analyze-plan-diff.js:141-144`) as a
    * left-anti join: customers with no orders. Anti join broadcasts
    * neither side blindly — at scale the orders side is pre-projected to
    * the single join key. */
  def qAntiNoOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val recent = t(s, dir, "orders")
      .filter($"o_orderdate" >= lit("2001-01-01").cast("timestamp"))
      .select($"o_custkey")
    t(s, dir, "customer")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  val qAntiSql: String =
    """SELECT c_custkey, c_name FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                         AND o_orderdate >= TIMESTAMP '2001-01-01')
       ORDER BY c_custkey"""

  // ---------------------------------------------------------- CASE class
  /** R9-style ordered CASE classification lifted to relational data:
    * urgency tiers over orders (rule order is semantics, first match
    * wins — same contract as determine_branch,
    * reference `fallbacks.py:180-198`). */
  def qPriorityCase(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .withColumn("tier",
        when($"o_orderstatus" === "P", "PENDING")
          .when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), "EXPEDITE")
          .when($"o_totalprice" > 200000.0, "BIG_TICKET")
          .otherwise("STANDARD"))
      .groupBy($"tier")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("sum_price"))
      .orderBy($"tier")
  }

  val qPriorityCaseSql: String =
    """SELECT CASE WHEN o_orderstatus = 'P' THEN 'PENDING'
                   WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'EXPEDITE'
                   WHEN o_totalprice > 200000.0 THEN 'BIG_TICKET'
                   ELSE 'STANDARD' END AS tier,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
       FROM orders GROUP BY 1 ORDER BY tier"""

  // ------------------------------------------------------ approx distinct
  /** HLL-sketch distinct users per event type (approx_count_distinct,
    * rsd 1%). No oracle — sketch estimates are engine-specific; the test
    * bounds the error against [[qExactDistinct]] instead. At 100 TB the
    * sketch is the only viable form (bounded memory, mergeable partials).
    * The exact twin is a SEPARATE query (SCALE.md backlog #3): benching
    * them together timed the expensive exact countDistinct under the
    * sketch's name. */
  def qApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy($"event_type")
      .agg(approx_count_distinct($"user_id", 0.01).as("n_users_approx"))
      .orderBy($"event_type")
  }

  /** Exact distinct users per event type — the oracle-checkable twin of
    * [[qApproxDistinct]]: exact countDistinct expands to a two-phase
    * aggregate (distinct (event_type, user_id) shuffle, then count) —
    * affordable while (types × users) fits a shuffle, which is why the
    * sketch exists as the default at scale. */
  def qExactDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"event_type")
  }

  val qExactDistinctSql: String =
    """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
       FROM events GROUP BY 1 ORDER BY event_type"""

  // ------------------------------------------------------- percentiles
  /** Event-value distribution per type: exact median/p90 would need a
    * full sort per group; approx_percentile (t-digest-style sketch) is
    * the bounded-memory, mergeable form that scales. Rows-only check —
    * sketch estimates are engine-specific; the spec bounds the error
    * against exact percentiles instead. */
  def qValuePercentiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy($"event_type")
      .agg(
        percentile_approx($"value", lit(0.5), lit(1000)).as("p50_approx"),
        percentile_approx($"value", lit(0.9), lit(1000)).as("p90_approx"),
        min($"value").as("v_min"), max($"value").as("v_max"))
      .orderBy($"event_type")
  }

  /** Exact-percentile twin of [[qValuePercentiles]] (same pattern as
    * [[qExactDistinct]] vs [[qApproxDistinct]]): Spark's exact
    * `percentile` buffers each group's values and interpolates at
    * p·(n-1) — identical definition to DuckDB's `quantile_cont`, so the
    * twin is oracle-checkable where the sketch is rows-only. Both sides
    * round to 6 dp: interpolation `lo + (hi-lo)·frac` is the
    * single-expression double arithmetic that differs by 1 ulp across
    * engines. Affordable while per-group value sets fit an aggregation
    * buffer — which is exactly why the t-digest sketch stays the 100 TB
    * default and this twin exists for validation. */
  def qValuePercentilesExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy($"event_type")
      .agg(
        round(percentile($"value", lit(0.5)), 6).as("p50"),
        round(percentile($"value", lit(0.9)), 6).as("p90"),
        min($"value").as("v_min"), max($"value").as("v_max"))
      .orderBy($"event_type")
  }

  val qValuePercentilesExactSql: String =
    """SELECT event_type,
         ROUND(quantile_cont(value, 0.5), 6) AS p50,
         ROUND(quantile_cont(value, 0.9), 6) AS p90,
         MIN(value) AS v_min, MAX(value) AS v_max
       FROM events GROUP BY 1 ORDER BY event_type"""

  // ---------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "q6_forecast_revenue" -> (q6ForecastRevenue _),
    "q_rollup_region_nation" -> (qRollupRegionNation _),
    "q_cube_priority_status" -> (qCubePriorityStatus _),
    "q_topk_events_per_user" -> (qTopkEventsPerUser _),
    "q_sessionize_events" -> (qSessionizeEvents _),
    "q_sessionize_events_scaled" -> (qSessionizeEventsScaled _),
    "q_session_window_native" -> (qSessionWindowNative _),
    "q_hourly_events" -> (qHourlyEvents _),
    "q_set_intersect" -> (qSetIntersect _),
    "q_anti_no_orders" -> (qAntiNoOrders _),
    "q_priority_case" -> (qPriorityCase _),
    "q_approx_distinct" -> (qApproxDistinct _),
    "q_exact_distinct" -> (qExactDistinct _),
    "q_value_percentiles" -> (qValuePercentiles _),
    "q_value_percentiles_exact" -> (qValuePercentilesExact _))

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql,
    "q3_shipping_priority" -> q3Sql,
    "q5_local_supplier" -> q5Sql,
    "q6_forecast_revenue" -> q6Sql,
    "q_rollup_region_nation" -> qRollupSql,
    "q_cube_priority_status" -> qCubeSql,
    "q_topk_events_per_user" -> qTopkSql,
    "q_sessionize_events" -> qSessionizeSql,
    // the scaled and native variants compute the SAME result (bounded
    // sort width / built-in session_window) — all three share one oracle
    "q_sessionize_events_scaled" -> qSessionizeSql,
    "q_session_window_native" -> qSessionizeSql,
    "q_hourly_events" -> qHourlySql,
    "q_set_intersect" -> qSetIntersectSql,
    "q_anti_no_orders" -> qAntiSql,
    "q_priority_case" -> qPriorityCaseSql,
    "q_exact_distinct" -> qExactDistinctSql,
    "q_value_percentiles_exact" -> qValuePercentilesExactSql)
}
