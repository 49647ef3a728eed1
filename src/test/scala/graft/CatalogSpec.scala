package graft

import graft.sources.Catalog
import org.apache.spark.sql.functions.{col, count, lit}

/** SQL surface over registered views (the Hive-metastore external-table
  * path is driven end-to-end by `graft.SqlCli` — embedded Derby can't
  * coexist with the shared non-Hive test session). */
class CatalogSpec extends SparkSuite {

  test("registered views expose the whole surface to spark.sql") {
    Catalog.registerViews(spark, sfDir)
    val n = spark.sql("SELECT count(*) AS n FROM lineitem").collect().head.getLong(0)
    assert(n == 6000)
    val joined = spark.sql(
      """SELECT r_name, count(*) AS n FROM nation
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""").collect()
    assert(joined.length == 5 && joined.forall(_.getLong(1) == 5))
  }

  test("events view reads nanosecond timestamps as raw int64") {
    Catalog.registerViews(spark, sfDir)
    val row = spark.sql(
      "SELECT min(ts) AS lo, max(ts) AS hi FROM events").collect().head
    // Jan 2024 epoch-nanos are ~1.70e18
    assert(row.getAs[Long]("lo") > 1700000000L * 1000000000L)
    assert(row.getAs[Long]("hi") < 1710000000L * 1000000000L)
  }

  test("column statistics feed the CBO: exact row counts + stats-driven broadcast") {
    // ANALYZE ... FOR ALL COLUMNS is what makes cost-based join
    // reordering possible at 100 TB (join fan-in ordered by real NDV/
    // row counts, not declaration order). In-memory catalog supports
    // external parquet tables + ANALYZE the same way the Hive
    // metastore does, so the mechanism is pinned here without Derby.
    import graft.sources.Tables
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_cbo")
    for (t <- Seq("nation", "customer", "orders")) {
      spark.sql(s"DROP TABLE IF EXISTS graft_cbo.$t")
      spark.sql(
        s"""CREATE EXTERNAL TABLE graft_cbo.$t (${Tables.schemaOf(t).toDDL})
            USING parquet LOCATION '$sfDir/$t.parquet'""")
      spark.sql(s"ANALYZE TABLE graft_cbo.$t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    val saved = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
      .map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      // exact row counts must reach the optimizer from the catalog
      val cust = spark.table("graft_cbo.customer")
      val rc = cust.queryExecution.optimizedPlan.stats.rowCount
      assert(rc.contains(BigInt(cust.count())),
        s"ANALYZE row count must be exact and visible to the CBO, got $rc")
      // and a stats-small dim must broadcast without any hint
      val joined = spark.table("graft_cbo.orders")
        .join(spark.table("graft_cbo.customer"),
          col("o_custkey") === col("c_custkey"))
        .join(spark.table("graft_cbo.nation"),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        "stats-visible small dims must broadcast with zero hints")
      assert(joined.collect().map(_.getLong(1)).sum ==
        spark.table("graft_cbo.orders").count(),
        "every order lands in exactly one nation bucket")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("SQL and DataFrame forms of q1 agree") {
    Catalog.registerViews(spark, sfDir)
    // q1's oracle SQL is ANSI enough to run unchanged on Spark SQL too
    val sql = spark.sql(graft.operators.RelationalQueries.q1Sql)
    val df = graft.operators.RelationalQueries.q1PricingSummary(spark, sfDir)
    assert(sql.collect().map(_.toSeq).toSeq == df.collect().map(_.toSeq).toSeq)
  }
}
