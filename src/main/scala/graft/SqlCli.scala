package graft

import graft.sources.Catalog

/** SQL entry over the Hive-metastore catalog: registers the testdata as
  * external tables in an embedded-Derby metastore and runs an arbitrary
  * SQL statement — the "Spark SQL with Hive metastore" face of the
  * engine. Usage:
  *   runMain graft.SqlCli "<sql>" [sfDir] [warehouseDir]
  *   runMain graft.SqlCli dpp [sfDir]    — dynamic-partition-pruning
  *     demo ON THE HIVE METASTORE: stages the day-partitioned events
  *     fact + day dim, registers the fact as a partitioned external
  *     Hive table (MSCK recovery), runs the dim-filtered join, and
  *     prints whether `dynamicpruning` reached the fact scan's
  *     PartitionFilters (exit 1 if not — this is a check, not a demo
  *     that can silently rot).
  */
object SqlCli {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("dpp")) { dppDemo(args); return }
    val sql = if (args.nonEmpty) args(0)
      else "SELECT count(*) AS n_lineitem FROM graft.lineitem"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val wh = if (args.length > 2) args(2)
      else java.nio.file.Files.createTempDirectory("graft-wh").toString

    val spark = Catalog.hiveSession("graft-sql", wh)
    spark.sparkContext.setLogLevel("ERROR")
    Catalog.registerExternal(spark, sfDir)
    Catalog.analyzeAll(spark)
    println(s"catalog=${spark.conf.get("spark.sql.catalogImplementation")}")
    spark.sql("SHOW TABLES IN graft").show(20, truncate = false)
    spark.sql(sql).show(50, truncate = false)
    spark.stop()
  }

  private def dppDemo(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val spark = Catalog.hiveSession("graft-sql-dpp", wh)
    spark.sparkContext.setLogLevel("ERROR")
    val df = Catalog.qDppEvents(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val pruned = plan.contains("dynamicpruning")
    println(s"catalog=${spark.conf.get("spark.sql.catalogImplementation")}")
    println(s"dpp_in_plan=$pruned")
    df.show(20, truncate = false)
    spark.stop()
    if (!pruned) {
      System.err.println("dynamic partition pruning did NOT reach the " +
        "fact scan on the Hive metastore surface")
      sys.exit(1)
    }
  }
}
