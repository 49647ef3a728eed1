package graft

import graft.operators.RelationalQueries

/** Smoke + invariant tests for the relational surface on sf0.001. The
  * authoritative correctness gate is the DuckDB oracle compare
  * (`scripts/check_oracle.py` at sf0.01); these tests catch regressions
  * inside `sbt test`. */
class RelationalQueriesSpec extends SparkSuite {

  test("every relational query has an oracle and runs on sf0.001") {
    // sketch queries are deliberately oracle-free (engine-specific HLL)
    val oracleFree = Set("q_approx_distinct")
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
