package graft.sources

import org.apache.spark.sql.SparkSession

/** Hive-metastore catalog surface (the declared spark_approach:
  * "Spark SQL with Hive metastore" — storage stays external parquet,
  * the metastore owns schemas/locations/statistics).
  *
  * [[registerExternal]] declares each testdata table as an EXTERNAL
  * parquet table in the current catalog (works against the embedded
  * Derby metastore locally and any shared HMS on a cluster), so the
  * whole engine surface is reachable from plain `spark.sql`.
  * [[registerViews]] is the lighter temp-view variant for sessions
  * without Hive support.
  *
  * Scale notes: external tables + `ANALYZE TABLE ... COMPUTE STATISTICS`
  * give Catalyst row counts for join reordering; partitioned layouts
  * (e.g. events by day) would be declared here with `PARTITIONED BY` so
  * partition pruning kicks in at the metastore level.
  */
object Catalog {

  val tableNames: Seq[String] = Tables.names

  /** Builder for a Hive-enabled local session (embedded Derby metastore
    * under warehouseDir). */
  def hiveSession(appName: String, warehouseDir: String, cpus: Int = 4): SparkSession = {
    // catalogImplementation is a static conf: getOrCreate on an existing
    // session would silently drop Hive support — fail fast instead.
    require(SparkSession.getActiveSession.isEmpty &&
      SparkSession.getDefaultSession.isEmpty,
      "hiveSession must be created before any other SparkSession in this JVM")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", s"$warehouseDir/warehouse")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$warehouseDir/metastore_db;create=true")
      .enableHiveSupport()
      .getOrCreate()
  }

  /** Declare every testdata table as an external parquet table in
    * `dbName`, with the DECLARED schema (not footer inference — which
    * would choke on events' TIMESTAMP(NANOS), see [[Tables.events]]).
    * Idempotent. */
  def registerExternal(spark: SparkSession, sfDir: String,
      dbName: String = "graft"): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $dbName")
    for (t <- tableNames) {
      spark.sql(s"DROP TABLE IF EXISTS $dbName.$t")
      spark.sql(
        s"""CREATE EXTERNAL TABLE $dbName.$t (${Tables.schemaOf(t).toDDL})
            USING parquet
            LOCATION '$sfDir/$t.parquet'""")
    }
  }

  /** Compute table-level statistics so the cost-based optimizer can
    * reorder joins / pick broadcast sides from real row counts. */
  def analyzeAll(spark: SparkSession, dbName: String = "graft"): Unit =
    for (t <- tableNames)
      spark.sql(s"ANALYZE TABLE $dbName.$t COMPUTE STATISTICS")

  /** Temp-view registration for non-Hive sessions (same SQL surface,
    * session-scoped). */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    for (t <- tableNames)
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)

  /** Expose a manifest-committed LAKE table to plain `spark.sql`: the
    * view pins the exact file list of the latest manifest at
    * registration time (a consistent snapshot — concurrent commits
    * never tear a running query); re-register to advance to a newer
    * version. This is the SQL face of [[LakeLayout.readLake]] — the
    * committed schema applies (format:3 null-fill included), so SQL
    * and DataFrame readers see byte-identical tables. */
  def registerLakeView(spark: SparkSession, tablePath: String,
      viewName: String): Unit =
    LakeLayout.readLake(spark, tablePath)
      .getOrElse(throw new IllegalArgumentException(
        s"registerLakeView: $tablePath has no committed version"))
      .createOrReplaceTempView(viewName)

  /** Time travel from SQL: pin a specific committed lake VERSION as a
    * view (must not have been vacuumed). */
  def registerLakeVersionView(spark: SparkSession, tablePath: String,
      version: Long, viewName: String): Unit =
    LakeLayout.readLakeVersion(spark, tablePath, version)
      .createOrReplaceTempView(viewName)
}
