package graft

import graft.operators.RelationalQueries

/** Smoke + invariant tests for the relational surface on sf0.001. The
  * authoritative correctness gate is the DuckDB oracle compare
  * (`scripts/check_oracle.py` at sf0.01); these tests catch regressions
  * inside `sbt test`. */
class RelationalQueriesSpec extends SparkSuite {

  test("every relational query has an oracle and runs on sf0.001") {
    // sketch queries are deliberately oracle-free (engine-specific HLL /
    // percentile sketches)
    val oracleFree = Set("q_approx_distinct", "q_value_percentiles")
    assert(RelationalQueries.queries.keySet -- oracleFree ==
      RelationalQueries.oracle.keySet)
    for ((name, fn) <- RelationalQueries.queries) {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty, name)
      assert(df.count() >= 0, name)
    }
  }

  test("q1 groups by returnflag/linestatus with positive sums") {
    val rows = RelationalQueries.q1PricingSummary(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
    }
  }

  test("q3 returns at most 10 rows ordered by revenue desc") {
    val rows = RelationalQueries.q3ShippingPriority(spark, sfDir).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sorted.reverse))
  }

  test("topk window emits at most 3 rows per user, ranked") {
    val rows = RelationalQueries.qTopkEventsPerUser(spark, sfDir).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.values.foreach { rs =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Long]("rn")).sorted.sameElements(1L to rs.length))
    }
  }

  test("sessionize: session count never exceeds event count") {
    val rows = RelationalQueries.qSessionizeEvents(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (e, ses) = (r.getAs[Long]("n_events"), r.getAs[Long]("n_sessions"))
      assert(ses >= 1 && ses <= e)
    }
  }

  test("approx percentiles bracket the true distribution per event type") {
    import org.apache.spark.sql.functions._
    val approx = RelationalQueries.qValuePercentiles(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("p50_approx"), r.getAs[Double]("p90_approx"),
          r.getAs[Double]("v_min"), r.getAs[Double]("v_max"))).toMap
    val exact = graft.sources.Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"))
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p90"))).toMap
    for ((t, (a50, a90, lo, hi)) <- approx) {
      val (e50, e90) = exact(t)
      assert(a50 >= lo && a50 <= hi && a90 >= lo && a90 <= hi)
      assert(math.abs(a50 - e50) <= 0.05 * (hi - lo) + 1e-9, s"$t p50")
      assert(math.abs(a90 - e90) <= 0.05 * (hi - lo) + 1e-9, s"$t p90")
      assert(a90 >= a50)
    }
  }

  test("scd2 history: one open version per key, contiguous, no same-state neighbors") {
    val rows = graft.operators.AdvancedQueries.qScd2History(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("cust_key"), r.getAs[Long]("version"),
        r.getAs[String]("state"), r.getAs[java.sql.Timestamp]("valid_from"),
        r.getAs[java.sql.Timestamp]("valid_to"), r.getAs[Boolean]("is_current")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cust, vs) =>
      val byVersion = vs.sortBy(_._2)
      // versions are 1..n dense
      assert(byVersion.map(_._2).toSeq == (1L to vs.length).toSeq, s"cust $cust")
      // exactly one open (current) version, and it is the last
      assert(vs.count(_._6) == 1, s"cust $cust must have ONE current version")
      assert(byVersion.last._6 && byVersion.last._5 == null)
      // closed intervals chain: valid_to(v) == valid_from(v+1); state changes
      byVersion.iterator.sliding(2).withPartial(false).foreach { pair =>
        val (a, b) = (pair.head, pair.last)
        assert(a._5 == b._4, s"cust $cust v${a._2}: intervals must chain")
        assert(a._3 != b._3, s"cust $cust v${a._2}: same-state neighbors must collapse")
      }
    }
  }

  test("rollup contains per-nation rows, per-region subtotals and a grand total") {
    val rows = RelationalQueries.qRollupRegionNation(spark, sfDir).collect()
    assert(rows.count(r => r.getString(0) == "ALL" && r.getString(1) == "ALL") == 1)
    assert(rows.exists(r => r.getString(0) != "ALL" && r.getString(1) == "ALL"))
    assert(rows.exists(r => r.getString(0) != "ALL" && r.getString(1) != "ALL"))
    val grand = rows.find(r => r.getString(0) == "ALL").get.getAs[Long]("n_customers")
    val perNation = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) != "ALL")
      .map(_.getAs[Long]("n_customers")).sum
    assert(grand == perNation)
  }
}
