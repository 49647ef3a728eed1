package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL face of the lake layer — the thin statement surface that makes
  * time travel, history, and detail reachable from "Spark SQL with a
  * catalog" instead of API calls only (Delta's SQL surface, re-derived
  * over the manifest protocol):
  *
  *   LakeSql.register(spark, "orders_lake", "/path/to/table")
  *   LakeSql.sql(spark, "SELECT ... FROM orders_lake")
  *   LakeSql.sql(spark, "SELECT ... FROM orders_lake VERSION AS OF 3")
  *   LakeSql.sql(spark, "SELECT ... FROM orders_lake TIMESTAMP AS OF 1755...")
  *   LakeSql.sql(spark, "DESCRIBE HISTORY orders_lake")
  *   LakeSql.sql(spark, "DESCRIBE DETAIL orders_lake")
  *
  * Mechanics: `register` binds a logical name to a table path and
  * publishes the CURRENT snapshot as a session view (works on a plain
  * session and on the Hive-metastore session alike — views resolve
  * through whichever catalog the session runs). `sql` first answers the
  * two DESCRIBE commands directly ([[LakeLayout.lakeHistory]] /
  * [[LakeLayout.describeLake]]), then rewrites every
  * `<name> VERSION AS OF <v>` / `<name> TIMESTAMP AS OF <millis>`
  * table reference to a pinned snapshot view
  * ([[LakeLayout.readLakeVersion]] — the exact file list of that
  * commit, so a pinned reference can never tear under concurrent
  * writers), refreshes the plain current-snapshot views of every
  * registered name the statement mentions, and hands the rewritten
  * text to `spark.sql`. Results are therefore BY CONSTRUCTION equal to
  * the API surface — the parity spec pins it.
  *
  * TIMESTAMP AS OF takes epoch-millis on the store clock — the same
  * instants [[LakeLayout.lakeCommitInstants]] publishes (persisted in
  * manifests, monotonized), so a pipeline can record an instant at
  * write time and replay it verbatim in SQL. */
object LakeSql {

  private val registered =
    new scala.collection.concurrent.TrieMap[String, String]()

  private val ident = "[A-Za-z_][A-Za-z0-9_]*"

  /** Bind `name` to a lake table and publish its current snapshot as a
    * session view. Re-register (or just call [[sql]] again) to advance
    * the plain view to a newer commit. */
  def register(spark: SparkSession, name: String, tablePath: String): Unit = {
    require(name.matches(ident),
      s"lake table name must be a plain SQL identifier, got '$name'")
    // SQL identifiers are case-insensitive — so is this registry
    registered(name.toLowerCase) = tablePath
    Catalog.registerLakeView(spark, tablePath, name)
  }

  private def isRegistered(name: String): Boolean =
    registered.contains(name.toLowerCase)

  private def pathOf(name: String): String =
    registered.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(
        s"'$name' is not a registered lake table " +
          s"(registered: ${registered.keys.toSeq.sorted.mkString(", ")})"))

  private val historyRe =
    s"(?is)^\\s*DESCRIBE\\s+HISTORY\\s+($ident)\\s*;?\\s*$$".r
  private val detailRe =
    s"(?is)^\\s*DESCRIBE\\s+DETAIL\\s+($ident)\\s*;?\\s*$$".r
  private val versionAsOfRe =
    s"(?is)\\b($ident)\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)".r
  private val timestampAsOfRe =
    s"(?is)\\b($ident)\\s+TIMESTAMP\\s+AS\\s+OF\\s+(\\d+)".r

  /** Run one statement with the lake extensions resolved. */
  def sql(spark: SparkSession, statement: String): DataFrame =
    statement match {
      case historyRe(name) =>
        LakeLayout.lakeHistory(spark, pathOf(name))
      case detailRe(name) =>
        LakeLayout.describeLake(spark, pathOf(name))
      case _ =>
        // pin VERSION AS OF references as snapshot views; a match
        // whose identifier is NOT a registered lake table passes
        // through untouched — this keeps string literals that happen
        // to contain the phrase intact and leaves genuinely-misspelled
        // table references to Spark's own analysis error
        def quoted(m: scala.util.matching.Regex.Match): String =
          scala.util.matching.Regex.quoteReplacement(m.matched)
        val afterVersion = versionAsOfRe.replaceAllIn(statement, m => {
          val (name, v) = (m.group(1), m.group(2).toLong)
          if (isRegistered(name)) pinnedView(spark, name, v) else quoted(m)
        })
        // resolve TIMESTAMP AS OF to a version on the instants surface
        val rewritten = timestampAsOfRe.replaceAllIn(afterVersion, m => {
          val (name, ts) = (m.group(1), m.group(2).toLong)
          if (!isRegistered(name)) quoted(m)
          else {
            val v = LakeLayout.lakeVersionAsOf(spark, pathOf(name), ts)
              .getOrElse(throw new IllegalArgumentException(
                s"$name has no version committed at or before instant " +
                  s"$ts (the table did not exist yet)"))
            pinnedView(spark, name, v)
          }
        })
        // advance the plain current-snapshot views the statement uses
        registered.foreach { case (name, path) =>
          if (s"(?i)\\b$name\\b".r.findFirstIn(rewritten).isDefined)
            Catalog.registerLakeView(spark, path, name)
        }
        spark.sql(rewritten)
    }

  /** A view pinned to one committed version — its name encodes the
    * version, so repeated statements reuse the registration and two
    * pins of different versions never collide. */
  private def pinnedView(spark: SparkSession, name: String,
      version: Long): String = {
    val viewName = s"${name}__asof_v$version"
    Catalog.registerLakeVersionView(spark, pathOf(name), version, viewName)
    viewName
  }
}
