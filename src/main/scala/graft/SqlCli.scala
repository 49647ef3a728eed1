package graft

import graft.sources.Catalog

/** SQL entry over the Hive-metastore catalog: registers the testdata as
  * external tables in an embedded-Derby metastore and runs an arbitrary
  * SQL statement — the "Spark SQL with Hive metastore" face of the
  * engine. Usage:
  *   runMain graft.SqlCli "<sql>" [sfDir] [warehouseDir]
  */
object SqlCli {
  def main(args: Array[String]): Unit = {
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
}
