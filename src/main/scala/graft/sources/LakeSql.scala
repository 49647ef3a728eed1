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
  *   LakeSql.sql(spark, "RESTORE orders_lake TO VERSION AS OF 2")
  *   LakeSql.sql(spark, "RESTORE orders_lake TO TIMESTAMP AS OF 1755...")
  *   LakeSql.sql(spark, "OPTIMIZE orders_lake BY o_orderkey")
  *   LakeSql.sql(spark, "OPTIMIZE orders_lake ZORDER BY (user_id, ts)")
  *   LakeSql.sql(spark, "VACUUM orders_lake RETAIN 3 VERSIONS")
  *   LakeSql.sql(spark, "ALTER TABLE orders_lake ADD CONSTRAINT c CHECK (o_totalprice > 0)")
  *   LakeSql.sql(spark, "ALTER TABLE orders_lake DROP CONSTRAINT c")
  *   LakeSql.sql(spark, "SHOW CONSTRAINTS orders_lake")
  *
  * Mechanics: `register` binds a logical name to a table path and
  * publishes the CURRENT snapshot as a session view (works on a plain
  * session and on the Hive-metastore session alike — views resolve
  * through whichever catalog the session runs). `sql` first answers
  * the COMMAND forms directly — DESCRIBE HISTORY/DETAIL
  * ([[LakeLayout.lakeHistory]] / [[LakeLayout.describeLake]]), RESTORE
  * ([[LakeLayout.restoreLake]] — rollback as a new metadata-only
  * commit), OPTIMIZE ([[LakeLayout.compactLakeOcc]] /
  * [[LakeLayout.optimizeLakeZOrderOcc]]), and VACUUM
  * ([[LakeLayout.vacuumLake]]) — then rewrites every
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

  // PER-SESSION registries: the views `register` manages are session
  // temp views, so the name→path bindings must share their scope — a
  // JVM-global map would let two sessions (parallel tests, two
  // notebook users on one driver) registering the same name silently
  // redirect each other's AS-OF resolution and view refreshes. Weak
  // keying ties each registry's lifetime to its session's, exactly
  // like the temp views themselves. Within one registry: lowercased
  // name -> (name as registered, table path) — lookups are
  // case-insensitive like any SQL identifier, but views are always
  // (re-)registered under the ORIGINAL casing so case-sensitive
  // sessions (spark.sql.caseSensitive=true) resolve the same view the
  // registration created.
  private val bySession = new java.util.WeakHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[String, (String, String)]]()

  private def registryOf(spark: SparkSession)
      : scala.collection.concurrent.TrieMap[String, (String, String)] =
    bySession.synchronized {
      bySession.computeIfAbsent(spark,
        _ => new scala.collection.concurrent.TrieMap[String, (String, String)]())
    }

  private val ident = "[A-Za-z_][A-Za-z0-9_]*"

  /** Bind `name` to a lake table and publish its current snapshot as a
    * session view. Re-register (or just call [[sql]] again) to advance
    * the plain view to a newer commit. The binding is scoped to
    * `spark` — sibling sessions (`spark.newSession()`) neither see it
    * nor can overwrite it. */
  def register(spark: SparkSession, name: String, tablePath: String): Unit = {
    require(name.matches(ident),
      s"lake table name must be a plain SQL identifier, got '$name'")
    registryOf(spark)(name.toLowerCase) = (name, tablePath)
    Catalog.registerLakeView(spark, tablePath, name)
  }

  private def isRegistered(spark: SparkSession, name: String): Boolean =
    registryOf(spark).contains(name.toLowerCase)

  private def pathOf(spark: SparkSession, name: String): String = {
    val registered = registryOf(spark)
    registered.get(name.toLowerCase).map(_._2)
      .getOrElse(throw new IllegalArgumentException(
        s"'$name' is not a registered lake table in this session " +
          s"(registered: ${registered.values.map(_._1).toSeq.sorted.mkString(", ")})"))
  }

  private val historyRe =
    s"(?is)^\\s*DESCRIBE\\s+HISTORY\\s+($ident)\\s*;?\\s*$$".r
  private val detailRe =
    s"(?is)^\\s*DESCRIBE\\s+DETAIL\\s+($ident)\\s*;?\\s*$$".r
  private val restoreVersionRe =
    s"(?is)^\\s*RESTORE\\s+($ident)\\s+(?:TO\\s+)?VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*$$".r
  private val restoreTimestampRe =
    s"(?is)^\\s*RESTORE\\s+($ident)\\s+(?:TO\\s+)?TIMESTAMP\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*$$".r
  private val optimizeRe =
    s"(?is)^\\s*OPTIMIZE\\s+($ident)\\s+BY\\s+($ident)\\s*;?\\s*$$".r
  private val optimizeZorderRe =
    s"(?is)^\\s*OPTIMIZE\\s+($ident)\\s+ZORDER\\s+BY\\s*\\(\\s*($ident)\\s*,\\s*($ident)\\s*\\)\\s*;?\\s*$$".r
  private val vacuumRe =
    s"(?is)^\\s*VACUUM\\s+($ident)(?:\\s+RETAIN\\s+(\\d+)\\s+VERSIONS)?\\s*;?\\s*$$".r
  private val addConstraintRe =
    s"(?is)^\\s*ALTER\\s+TABLE\\s+($ident)\\s+ADD\\s+CONSTRAINT\\s+($ident)\\s+CHECK\\s*\\((.+)\\)\\s*;?\\s*$$".r
  private val dropConstraintRe =
    s"(?is)^\\s*ALTER\\s+TABLE\\s+($ident)\\s+DROP\\s+CONSTRAINT\\s+($ident)\\s*;?\\s*$$".r
  private val showConstraintsRe =
    s"(?is)^\\s*SHOW\\s+CONSTRAINTS\\s+($ident)\\s*;?\\s*$$".r
  private val versionAsOfRe =
    s"(?is)\\b($ident)\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)".r
  private val timestampAsOfRe =
    s"(?is)\\b($ident)\\s+TIMESTAMP\\s+AS\\s+OF\\s+(\\d+)".r

  /** Run one statement with the lake extensions resolved. */
  def sql(spark: SparkSession, statement: String): DataFrame =
    statement match {
      case historyRe(name) =>
        LakeLayout.lakeHistory(spark, pathOf(spark, name))
      case detailRe(name) =>
        LakeLayout.describeLake(spark, pathOf(spark, name))
      case restoreVersionRe(name, v) =>
        restoreResult(spark, name, v.toLong)
      case restoreTimestampRe(name, ts) =>
        val path = pathOf(spark, name)
        val v = LakeLayout.lakeVersionAsOf(spark, path, ts.toLong)
          .getOrElse(throw new IllegalArgumentException(
            s"$name has no version committed at or before instant $ts " +
              "(the table did not exist yet)"))
        restoreResult(spark, name, v)
      case optimizeRe(name, key) =>
        import spark.implicits._
        val v = LakeLayout.compactLakeOcc(spark, pathOf(spark, name),
          key, writerId = "sql")
        Seq((name, v)).toDF("table_name", "version")
      case optimizeZorderRe(name, key, tsKey) =>
        import spark.implicits._
        val v = LakeLayout.optimizeLakeZOrderOcc(spark,
          pathOf(spark, name), key, tsKey, writerId = "sql")
        Seq((name, v)).toDF("table_name", "version")
      case addConstraintRe(name, cname, check) =>
        import spark.implicits._
        val path = pathOf(spark, name)
        LakeLayout.setLakeConstraints(spark, path,
          LakeLayout.lakeConstraints(spark, path) + (cname -> check.trim))
        Seq((name, cname, check.trim))
          .toDF("table_name", "constraint_name", "check_expr")
      case dropConstraintRe(name, cname) =>
        import spark.implicits._
        LakeLayout.dropLakeConstraint(spark, pathOf(spark, name), cname)
        Seq((name, cname)).toDF("table_name", "constraint_name")
      case showConstraintsRe(name) =>
        import spark.implicits._
        LakeLayout.lakeConstraints(spark, pathOf(spark, name))
          .toSeq.sortBy(_._1).toDF("constraint_name", "check_expr")
      case vacuumRe(name, retain) =>
        import spark.implicits._
        val path = pathOf(spark, name)
        LakeLayout.vacuumLake(spark, path,
          keep = Option(retain).map(_.toInt).getOrElse(2))
        Seq((name, LakeLayout.lakeVersions(spark, path).size.toLong))
          .toDF("table_name", "versions_retained")
      case _ =>
        // pin AS-OF references as snapshot views. Two guards keep the
        // rewrite from touching text that is not a table reference:
        // STRING LITERALS and backquoted identifiers are masked out
        // entirely, and a match whose identifier is not a registered
        // lake table passes through untouched (genuinely-misspelled
        // references get Spark's own analysis error)
        def quoted(m: scala.util.matching.Regex.Match): String =
          scala.util.matching.Regex.quoteReplacement(m.matched)
        val rewritten = rewriteOutsideLiterals(statement) { seg =>
          val afterVersion = versionAsOfRe.replaceAllIn(seg, m =>
            if (isRegistered(spark, m.group(1)))
              pinnedView(spark, m.group(1), m.group(2).toLong)
            else quoted(m))
          timestampAsOfRe.replaceAllIn(afterVersion, m =>
            if (!isRegistered(spark, m.group(1))) quoted(m)
            else {
              val (name, ts) = (m.group(1), m.group(2).toLong)
              val v = LakeLayout.lakeVersionAsOf(spark, pathOf(spark, name), ts)
                .getOrElse(throw new IllegalArgumentException(
                  s"$name has no version committed at or before instant " +
                    s"$ts (the table did not exist yet)"))
              pinnedView(spark, name, v)
            })
        }
        // advance the plain current-snapshot views the statement uses,
        // always under the ORIGINAL registered casing
        registryOf(spark).values.foreach { case (orig, path) =>
          if (s"(?i)\\b$orig\\b".r.findFirstIn(rewritten).isDefined)
            Catalog.registerLakeView(spark, path, orig)
        }
        spark.sql(rewritten)
    }

  /** Apply `f` to every segment of `stmt` OUTSIDE quoted regions,
    * re-assembling the quoted text verbatim — the rewrite can then
    * never corrupt data values or identifiers that merely mention a
    * table name or an AS-OF phrase. Three quote forms, matching
    * Spark's default (non-ANSI) lexer: single- AND double-quoted
    * string literals (doubled-quote '' / "" escapes and backslash
    * escapes included — the default parser processes \' and \" inside
    * both), and backquoted identifiers (doubled `` escape). */
  private val literalRe =
    ("'(?:\\\\.|''|[^'\\\\])*'" +      // '...'  with \x and '' escapes
      "|\"(?:\\\\.|\"\"|[^\"\\\\])*\"" + // "..."  with \x and "" escapes
      "|`(?:``|[^`])*`").r             // `...`  with `` escape
  private def rewriteOutsideLiterals(stmt: String)(
      f: String => String): String = {
    val sb = new StringBuilder
    var last = 0
    literalRe.findAllMatchIn(stmt).foreach { m =>
      sb.append(f(stmt.substring(last, m.start))).append(m.matched)
      last = m.end
    }
    sb.append(f(stmt.substring(last)))
    sb.toString
  }

  private def restoreResult(spark: SparkSession, name: String,
      version: Long): DataFrame = {
    import spark.implicits._
    val path = pathOf(spark, name)
    val v = LakeLayout.restoreLake(spark, path, version)
    // advance the plain view (under the ORIGINAL registered casing) so
    // the next SELECT sees the rolled-back state
    val orig = registryOf(spark)(name.toLowerCase)._1
    Catalog.registerLakeView(spark, path, orig)
    Seq((orig, version, v))
      .toDF("table_name", "restored_version", "version")
  }

  /** A view pinned to one committed version — its name encodes the
    * version, so repeated statements reuse the registration and two
    * pins of different versions never collide. */
  private def pinnedView(spark: SparkSession, name: String,
      version: Long): String = {
    val viewName = s"${name}__asof_v$version"
    Catalog.registerLakeVersionView(spark, pathOf(spark, name), version,
      viewName)
    viewName
  }
}
