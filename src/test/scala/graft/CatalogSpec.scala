package graft

import graft.sources.Catalog

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

  test("SQL and DataFrame forms of q1 agree") {
    Catalog.registerViews(spark, sfDir)
    // q1's oracle SQL is ANSI enough to run unchanged on Spark SQL too
    val sql = spark.sql(graft.operators.RelationalQueries.q1Sql)
    val df = graft.operators.RelationalQueries.q1PricingSummary(spark, sfDir)
    assert(sql.collect().map(_.toSeq).toSeq == df.collect().map(_.toSeq).toSeq)
  }
}
