package graft

import graft.sources.{LakeLayout, LakeSql}
import org.apache.spark.sql.functions._

/** Parity of the lake's SQL face ([[LakeSql]]) with the API surface:
  * every statement form must return exactly what the corresponding
  * API call returns — the SQL layer is a resolver, never a second
  * implementation. */
class LakeSqlSpec extends SparkSuite {
  import spark.implicits._

  private def stageTable(): String = {
    val t = java.nio.file.Files.createTempDirectory("graft-lakesql").toString
    LakeLayout.commitLakeVersion(
      (0L until 3000L).map(k => (k, k % 5, s"p$k")).toDF("id", "grp", "pay")
        .repartitionByRange(4, $"id").sortWithinPartitions($"id"),
      t, "ck", 0L, statsKey = Some("id"))
    LakeLayout.upsertIntoLake(spark, t,
      (0L until 3000L by 3).map(k => (k, -1L, "upd")).toDF("id", "grp", "pay"),
      "id", "ck", 1L)
    t
  }

  test("SELECT over a registered lake table equals the API snapshot, and advances with new commits") {
    val t = stageTable()
    LakeSql.register(spark, "sqlspec_t", t)
    def viaSql = LakeSql.sql(spark,
      "SELECT grp, count(*) AS n FROM sqlspec_t GROUP BY grp ORDER BY grp")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    def viaApi = LakeLayout.readLake(spark, t).get
      .groupBy($"grp").agg(count(lit(1)).as("n")).orderBy($"grp")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaSql == viaApi)
    // a new commit must be visible on the NEXT statement without
    // re-registering (the view advances per statement)
    LakeLayout.deleteFromLake(spark, t,
      (0L until 3000L by 2).toDF("id"), "id", "ck", 2L)
    assert(viaSql == viaApi,
      "the SQL view must advance to the latest commit per statement")
  }

  test("VERSION AS OF and TIMESTAMP AS OF pin exactly what the API time travel reads") {
    val t = stageTable()
    LakeSql.register(spark, "sqlspec_tt", t)
    val pin = LakeLayout.lakeCommitInstants(spark, t)(0L)
    // v0 predates the update wave: no grp = -1 rows
    val v0 = LakeSql.sql(spark,
      "SELECT count(*) AS n FROM sqlspec_tt VERSION AS OF 0 " +
        "WHERE grp = -1").collect()(0).getLong(0)
    assert(v0 == 0L)
    val v0All = LakeSql.sql(spark,
      "SELECT count(*) AS n FROM sqlspec_tt VERSION AS OF 0")
      .collect()(0).getLong(0)
    assert(v0All == LakeLayout.readLakeVersion(spark, t, 0L).count())
    val tsAll = LakeSql.sql(spark,
      s"SELECT count(*) AS n FROM sqlspec_tt TIMESTAMP AS OF $pin")
      .collect()(0).getLong(0)
    assert(tsAll == LakeLayout.readLakeAsOf(spark, t, pin).get.count())
    // both references in ONE statement: current vs pinned join
    val changed = LakeSql.sql(spark,
      "SELECT count(*) AS n FROM sqlspec_tt cur " +
        "JOIN sqlspec_tt VERSION AS OF 0 old ON cur.id = old.id " +
        "WHERE cur.grp <> old.grp").collect()(0).getLong(0)
    assert(changed == 1000L,
      s"the update wave re-grouped every 3rd of 3000 keys: $changed")
    // an instant before the table existed fails loudly
    val e = intercept[IllegalArgumentException](LakeSql.sql(spark,
      s"SELECT * FROM sqlspec_tt TIMESTAMP AS OF ${pin - 1000000L}"))
    assert(e.getMessage.contains("did not exist"))
  }

  test("DESCRIBE HISTORY / DESCRIBE DETAIL return the API frames verbatim") {
    val t = stageTable()
    LakeSql.register(spark, "sqlspec_h", t)
    val histSql = LakeSql.sql(spark, "DESCRIBE HISTORY sqlspec_h")
      .collect().map(_.toSeq).toSeq
    val histApi = LakeLayout.lakeHistory(spark, t)
      .collect().map(_.toSeq).toSeq
    assert(histSql == histApi)
    val detSql = LakeSql.sql(spark, "describe detail sqlspec_h")
      .collect().map(_.toSeq).toSeq
    val detApi = LakeLayout.describeLake(spark, t)
      .collect().map(_.toSeq).toSeq
    assert(detSql == detApi)
  }

  test("unregistered names and malformed identifiers fail loudly") {
    assert(intercept[IllegalArgumentException](
      LakeSql.sql(spark, "DESCRIBE HISTORY nosuch_lake_table"))
      .getMessage.contains("not a registered lake table"))
    assert(intercept[IllegalArgumentException](
      LakeSql.register(spark, "bad name!", "/tmp/x"))
      .getMessage.contains("identifier"))
  }

  test("names resolve case-insensitively, like every other SQL identifier") {
    val t = stageTable()
    LakeSql.register(spark, "SqlSpec_Case", t)
    assert(LakeSql.sql(spark,
      "SELECT count(*) AS n FROM sqlspec_case VERSION AS OF 0")
      .collect()(0).getLong(0) == 3000L)
    assert(LakeSql.sql(spark, "DESCRIBE HISTORY SQLSPEC_CASE")
      .count() == 2L)
  }

  test("an AS-OF phrase inside a string literal passes through untouched") {
    val t = stageTable()
    LakeSql.register(spark, "sqlspec_lit", t)
    // 'see VERSION AS OF 3' must not be treated as a table reference —
    // the unregistered identifier 'see' leaves the literal intact
    val n = LakeSql.sql(spark,
      "SELECT count(*) AS n FROM sqlspec_lit " +
        "WHERE 'see VERSION AS OF 3' = 'see VERSION AS OF 3'")
      .collect()(0).getLong(0)
    assert(n == 3000L)
    // even a REGISTERED name inside a literal stays data, not a ref
    val s = LakeSql.sql(spark,
      "SELECT 'sqlspec_lit VERSION AS OF 0' AS s FROM sqlspec_lit " +
        "LIMIT 1").collect()(0).getString(0)
    assert(s == "sqlspec_lit VERSION AS OF 0",
      s"a literal mentioning a registered table must not be rewritten: $s")
    // Spark's default lexer also accepts DOUBLE-QUOTED string
    // literals and backslash escapes — both masked the same way
    val d = LakeSql.sql(spark,
      "SELECT \"sqlspec_lit VERSION AS OF 0\" AS s FROM sqlspec_lit " +
        "LIMIT 1").collect()(0).getString(0)
    assert(d == "sqlspec_lit VERSION AS OF 0",
      s"a double-quoted literal must not be rewritten: $d")
    val e = LakeSql.sql(spark,
      "SELECT 'it\\'s sqlspec_lit VERSION AS OF 0' AS s " +
        "FROM sqlspec_lit LIMIT 1").collect()(0).getString(0)
    assert(e == "it's sqlspec_lit VERSION AS OF 0",
      s"backslash escapes must not terminate the mask early: $e")
    // a backquoted IDENTIFIER mentioning the phrase is never data to
    // rewrite either — alias text comes back verbatim
    val b = LakeSql.sql(spark,
      "SELECT count(*) AS `sqlspec_lit VERSION AS OF 0` " +
        "FROM sqlspec_lit").columns.head
    assert(b == "sqlspec_lit VERSION AS OF 0",
      s"a backquoted identifier must not be rewritten: $b")
  }

  test("RESTORE / OPTIMIZE / VACUUM commands drive the API maintenance surface") {
    val t = stageTable()
    LakeSql.register(spark, "sqlspec_cmd", t)
    // RESTORE TO VERSION AS OF: rollback of the v1 update wave; the
    // plain view advances to the rolled-back state in-statement
    val r = LakeSql.sql(spark,
      "RESTORE sqlspec_cmd TO VERSION AS OF 0").collect()(0)
    assert(r.getAs[Long]("restored_version") == 0L &&
      r.getAs[Long]("version") == 2L, s"unexpected restore row: $r")
    assert(LakeSql.sql(spark,
      "SELECT count(*) AS n FROM sqlspec_cmd WHERE pay = 'upd'")
      .collect()(0).getLong(0) == 0L,
      "the view must serve the rolled-back state after RESTORE")
    assert(LakeSql.sql(spark, "DESCRIBE HISTORY sqlspec_cmd")
      .collect()(0).getAs[String]("op") == "restore")
    // RESTORE TO TIMESTAMP AS OF resolves through the same instants
    // as the API and re-publishes the pinned version
    val pin = LakeLayout.lakeCommitInstants(spark, t)(1L)
    val rt = LakeSql.sql(spark,
      s"RESTORE sqlspec_cmd TO TIMESTAMP AS OF $pin").collect()(0)
    assert(rt.getAs[Long]("restored_version") == 1L &&
      rt.getAs[Long]("version") == 3L, s"unexpected restore row: $rt")
    assert(LakeSql.sql(spark,
      "SELECT count(*) AS n FROM sqlspec_cmd WHERE pay = 'upd'")
      .collect()(0).getLong(0) == 1000L)
    // OPTIMIZE compacts small files under OCC; the row count is
    // untouched and the result row reports the committed version
    val o = LakeSql.sql(spark, "OPTIMIZE sqlspec_cmd BY id").collect()(0)
    assert(o.getAs[Long]("version") >= 3L, s"unexpected optimize row: $o")
    assert(LakeSql.sql(spark,
      "SELECT count(*) AS n FROM sqlspec_cmd").collect()(0).getLong(0)
      == 3000L)
    // VACUUM RETAIN n VERSIONS trims history through the same API path
    val k = LakeSql.sql(spark, "VACUUM sqlspec_cmd RETAIN 2 VERSIONS")
      .collect()(0)
    assert(k.getAs[Long]("versions_retained") == 2L &&
      LakeLayout.lakeVersions(spark, t).size == 2, s"vacuum row: $k")
    assert(LakeSql.sql(spark,
      "SELECT count(*) AS n FROM sqlspec_cmd").collect()(0).getLong(0)
      == 3000L, "the current snapshot must survive the SQL vacuum")
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT and SHOW CONSTRAINTS drive the API constraint surface") {
    val t = stageTable()
    LakeSql.register(spark, "sqlspec_cons", t)
    val a = LakeSql.sql(spark,
      "ALTER TABLE sqlspec_cons ADD CONSTRAINT id_set CHECK (id IS NOT NULL)")
      .collect()(0)
    assert(a.getString(1) == "id_set" && a.getString(2) == "id IS NOT NULL")
    assert(LakeLayout.lakeConstraints(spark, t) ==
      Map("id_set" -> "id IS NOT NULL"),
      "the SQL form must land in the same store the API reads")
    // nested parens survive the CHECK capture
    LakeSql.sql(spark,
      "ALTER TABLE sqlspec_cons ADD CONSTRAINT grp_ok " +
        "CHECK ((grp >= -1 AND grp < 5) OR grp IS NULL)")
    val shown = LakeSql.sql(spark, "SHOW CONSTRAINTS sqlspec_cons")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(shown == Seq(
      ("grp_ok", "(grp >= -1 AND grp < 5) OR grp IS NULL"),
      ("id_set", "id IS NOT NULL")), s"unexpected SHOW result: $shown")
    // the gate is live: a violating write through the API is rejected
    intercept[IllegalArgumentException] {
      LakeLayout.upsertIntoLake(spark, t,
        Seq((java.lang.Long.valueOf(5000L), java.lang.Long.valueOf(9L),
          "bad")).toDF("id", "grp", "pay"),
        "id", "ck", 90L)
    }
    // adding a constraint the RESIDENT rows violate fails the ALTER
    intercept[IllegalArgumentException] {
      LakeSql.sql(spark,
        "ALTER TABLE sqlspec_cons ADD CONSTRAINT no_upd CHECK (pay <> 'upd')")
    }
    LakeSql.sql(spark, "ALTER TABLE sqlspec_cons DROP CONSTRAINT grp_ok")
    assert(LakeLayout.lakeConstraints(spark, t).keySet == Set("id_set"))
  }

  test("INSERT / DELETE / MERGE lower to the typed lake operations — SQL result equals API result") {
    // two identical tables: one mutated through SQL, one through the
    // typed API — every DML statement must land the same snapshot
    val sqlT = stageTable()
    val apiT = stageTable()
    LakeSql.register(spark, "dml_t", sqlT, key = Some("id"))
    def snap(t: String): Set[Seq[Any]] =
      LakeLayout.readLake(spark, t).get.collect().map(_.toSeq).toSet

    // INSERT ... VALUES (positional, cast to the table's types)
    LakeSql.sql(spark,
      "INSERT INTO dml_t VALUES (90001, 7, 'ins1'), (90002, 7, 'ins2')")
    LakeLayout.appendToLake(spark, apiT,
      Seq((90001L, 7L, "ins1"), (90002L, 7L, "ins2"))
        .toDF("id", "grp", "pay"),
      "api", 10L, statsKey = Some("id"))
    assert(snap(sqlT) == snap(apiT), "INSERT VALUES parity")

    // INSERT ... SELECT (reads the table's own snapshot)
    LakeSql.sql(spark,
      "INSERT INTO dml_t SELECT id + 100000, grp, 'copy' FROM dml_t " +
        "WHERE id % 500 = 1")
    LakeLayout.appendToLake(spark, apiT,
      LakeLayout.readLake(spark, apiT).get.filter($"id" % 500 === 1)
        .select(($"id" + 100000L).as("id"), $"grp", lit("copy").as("pay")),
      "api", 11L, statsKey = Some("id"))
    assert(snap(sqlT) == snap(apiT), "INSERT SELECT parity")

    // DELETE FROM ... WHERE (merge-on-read DV delete under OCC)
    LakeSql.sql(spark, "DELETE FROM dml_t WHERE grp = 7")
    LakeLayout.deleteFromLakeDvOcc(spark, apiT,
      LakeLayout.readLake(spark, apiT).get.filter($"grp" === 7)
        .select($"id"),
      "id", "api", 12L)
    assert(snap(sqlT) == snap(apiT), "DELETE parity")

    // MERGE (upsert form), source = a temp view
    Seq((1L, 99L, "merged"), (777777L, 99L, "mergednew"))
      .toDF("id", "grp", "pay").createOrReplaceTempView("dml_src")
    LakeSql.sql(spark,
      """MERGE INTO dml_t USING dml_src ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    LakeLayout.upsertIntoLakeOcc(spark, apiT,
      spark.table("dml_src"), "id", "api", 13L)
    assert(snap(sqlT) == snap(apiT), "MERGE upsert parity")

    // MERGE with a delete clause (three-clause merge; the condition
    // references a SOURCE-ONLY marker column the table never stores).
    // The statement is ONE atomic commit — updates, inserts, and
    // removals land in a single version, so a reader can never observe
    // the kept-half-applied state two commits would expose.
    Seq((2L, 0L, "x", true), (888888L, 98L, "kept", false))
      .toDF("id", "grp", "pay", "doomed")
      .createOrReplaceTempView("dml_src2")
    val vBeforeMerge = LakeLayout.lakeVersions(spark, sqlT).max
    LakeSql.sql(spark,
      """MERGE INTO dml_t USING dml_src2 ON t.id = s.id
         WHEN MATCHED AND doomed THEN DELETE
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    assert(LakeLayout.lakeVersions(spark, sqlT).max == vBeforeMerge + 1,
      "the three-clause MERGE must be ONE atomic commit")
    LakeLayout.upsertIntoLakeOcc(spark, apiT,
      spark.table("dml_src2").filter(!$"doomed")
        .select($"id", $"grp", $"pay"),
      "id", "api", 14L)
    LakeLayout.deleteFromLakeDvOcc(spark, apiT,
      spark.table("dml_src2").filter($"doomed").select($"id"),
      "id", "api", 15L)
    assert(snap(sqlT) == snap(apiT), "MERGE delete-clause parity")
    assert(!snap(sqlT).exists(_.head == 2L), "doomed key deleted via SQL")
    assert(snap(sqlT).exists(_.head == 888888L),
      "not-matched source row inserted via SQL MERGE")

    // the plain view advanced with every mutation
    val viaSql = LakeSql.sql(spark,
      "SELECT count(*) FROM dml_t").collect().head.getLong(0)
    assert(viaSql == LakeLayout.readLake(spark, sqlT).get.count(),
      "the registered view must track DML mutations")
  }

  test("conditional MERGE with column assignments lowers to ONE OCC upsert — parity with the hand-lowered typed equivalent") {
    val sqlT = stageTable()
    val apiT = stageTable()
    LakeSql.register(spark, "cmrg_t", sqlT, key = Some("id"))
    def snap(t: String): Set[Seq[Any]] =
      LakeLayout.readLake(spark, t).get.collect().map(_.toSeq).toSet
    // matched rows 0 and 6 pass the condition, matched row 3 FAILS it
    // (must stay byte-untouched), 999999 is unmatched (explicit-column
    // insert with expressions; unnamed columns null-fill — none here)
    Seq((0L, 60L, "s0"), (3L, 49L, "s3"), (6L, 52L, "s6"),
      (999999L, 53L, "snew"))
      .toDF("id", "grp", "pay").createOrReplaceTempView("cmrg_src")
    val before3 = snap(sqlT).find(_.head == 3L).get
    val vBefore = LakeLayout.lakeVersions(spark, sqlT).max
    LakeSql.sql(spark,
      """MERGE INTO cmrg_t a USING cmrg_src b ON a.id = b.id
         WHEN MATCHED AND b.grp > 50 THEN
           UPDATE SET pay = concat(a.pay, '+', b.pay), grp = b.grp
         WHEN NOT MATCHED THEN
           INSERT (id, grp, pay) VALUES (b.id, b.grp + 1, upper(b.pay))""")
    assert(LakeLayout.lakeVersions(spark, sqlT).max == vBefore + 1,
      "the conditional MERGE must be ONE commit")
    // the hand-lowered typed equivalent
    val src = spark.table("cmrg_src")
    val base = LakeLayout.readLake(spark, apiT).get
    val updated = base.as("a")
      .join(src.as("b"), col("a.id") === col("b.id"))
      .filter(col("b.grp") > 50)
      .select(col("a.id").as("id"), col("b.grp").as("grp"),
        concat(col("a.pay"), lit("+"), col("b.pay")).as("pay"))
    val inserts = src.as("b")
      .join(base.as("a"), col("b.id") === col("a.id"), "left_anti")
      .select(col("b.id").as("id"), (col("b.grp") + 1L).as("grp"),
        upper(col("b.pay")).as("pay"))
    LakeLayout.upsertIntoLakeOcc(spark, apiT,
      updated.unionByName(inserts), "id", "api", 20L)
    assert(snap(sqlT) == snap(apiT), "conditional MERGE parity")
    assert(snap(sqlT).find(_.head == 3L).get == before3,
      "a matched row failing the condition must stay untouched")
    assert(snap(sqlT).exists(r => r.head == 999999L && r(1) == 54L &&
      r(2) == "SNEW"), "explicit-column INSERT applies its expressions")
    // MERGE keyed on anything but the registered merge key fails loudly
    val err = intercept[IllegalArgumentException](LakeSql.sql(spark,
      """MERGE INTO cmrg_t USING cmrg_src ON t.grp = s.grp
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *"""))
    assert(err.getMessage.contains("registered merge key"))
  }

  test("readLakeMatching (the conditional MERGE's target read) opens only the files whose key range intersects the key frame") {
    // four range-disjoint files (no follow-up upsert — that tiny
    // rewrite would collapse the table to one file and leave nothing
    // to prune)
    val t = java.nio.file.Files.createTempDirectory("graft-lakesql-m")
      .toString
    LakeLayout.commitLakeVersion(
      (0L until 3000L).map(k => (k, k % 5, s"p$k")).toDF("id", "grp", "pay")
        .repartitionByRange(4, $"id").sortWithinPartitions($"id"),
      t, "ck", 0L, statsKey = Some("id"))
    // key-local frame: ids 0..9 live in one range-partitioned file
    val keys = (0L until 10L).toDF("id")
    val m = LakeLayout.readLakeMatching(spark, t, keys, "id")
    val filesRead = m.select(input_file_name()).distinct().count()
    val allFiles = LakeLayout.readLake(spark, t).get
      .select(input_file_name()).distinct().count()
    assert(filesRead >= 1 && filesRead < allFiles,
      s"a key-local frame must prune: read $filesRead of $allFiles files")
    // superset contract: joining back gives exactly the true matches
    val matched = m.join(keys, Seq("id"), "left_semi")
      .select($"id").collect().map(_.getLong(0)).toSet
    val truth = LakeLayout.readLake(spark, t).get
      .filter($"id" < 10).select($"id").collect().map(_.getLong(0)).toSet
    assert(matched == truth, s"pruned read must lose no match: " +
      s"${truth -- matched} missing")
  }

  test("UPDATE lowers to the OCC upsert of exactly the touched rows — SQL result equals API result") {
    val sqlT = stageTable()
    val apiT = stageTable()
    LakeSql.register(spark, "upd_t", sqlT, key = Some("id"))
    def snap(t: String): Set[Seq[Any]] =
      LakeLayout.readLake(spark, t).get.collect().map(_.toSeq).toSet

    // multi-assignment with a function call (top-level comma split
    // must not break inside the parens) and a predicate
    LakeSql.sql(spark,
      "UPDATE upd_t SET grp = greatest(grp, 2), pay = 'touched' " +
        "WHERE id % 100 = 0")
    LakeLayout.upsertIntoLakeOcc(spark, apiT,
      LakeLayout.readLake(spark, apiT).get.filter($"id" % 100 === 0)
        .select($"id", greatest($"grp", lit(2L)).as("grp"),
          lit("touched").as("pay")),
      "id", "api", 20L)
    assert(snap(sqlT) == snap(apiT), "UPDATE parity")
    assert(LakeLayout.readLake(spark, sqlT).get
      .filter($"pay" === "touched").count() == 30L,
      "exactly the predicate's rows are touched")

    // guard rails: unknown column and key rewrites fail loudly
    val e1 = intercept[IllegalArgumentException] {
      LakeSql.sql(spark, "UPDATE upd_t SET nope = 1 WHERE id = 1")
    }
    assert(e1.getMessage.contains("no such column"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      LakeSql.sql(spark, "UPDATE upd_t SET id = id + 1 WHERE id = 1")
    }
    assert(e2.getMessage.contains("merge key"), e2.getMessage)
  }

  test("SQL DML enforces constraints and key registration like the typed paths") {
    val t = stageTable()
    LakeSql.register(spark, "dml_guard", t) // no key
    // DELETE needs the registered key to lower file-granularly
    val e1 = intercept[IllegalArgumentException] {
      LakeSql.sql(spark, "DELETE FROM dml_guard WHERE id = 1")
    }
    assert(e1.getMessage.contains("registered without a key"),
      e1.getMessage)

    // constraints gate the SQL INSERT exactly like the typed append
    LakeSql.register(spark, "dml_guard", t, key = Some("id"))
    LakeSql.sql(spark,
      "ALTER TABLE dml_guard ADD CONSTRAINT pos CHECK (id >= 0)")
    val before = LakeLayout.lakeVersions(spark, t).size
    val e2 = intercept[IllegalArgumentException] {
      LakeSql.sql(spark, "INSERT INTO dml_guard VALUES (-5, 1, 'bad')")
    }
    assert(e2.getMessage.contains("constraint violation"), e2.getMessage)
    assert(LakeLayout.lakeVersions(spark, t).size == before,
      "a rejected SQL INSERT must publish nothing")
    // a clean insert passes the same gate
    LakeSql.sql(spark, "INSERT INTO dml_guard VALUES (95001, 1, 'ok')")
    assert(LakeLayout.readLake(spark, t).get
      .filter($"id" === 95001L).count() == 1)

    // column-count mismatch fails loudly before anything writes
    val e3 = intercept[IllegalArgumentException] {
      LakeSql.sql(spark, "INSERT INTO dml_guard VALUES (1, 2)")
    }
    assert(e3.getMessage.contains("columns provided"), e3.getMessage)
  }

  test("DML on an unregistered name falls through to spark.sql — never hijacked by the lake layer") {
    // Spark's own resolution error (TABLE_OR_VIEW_NOT_FOUND), not the
    // registry's "not a registered lake table" — proof the statement
    // reached spark.sql untouched
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      LakeSql.sql(spark, "INSERT INTO totally_missing_tbl VALUES (1)")
    }
    assert(!e.getMessage.contains("registered lake table"), e.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      LakeSql.sql(spark, "UPDATE totally_missing_tbl SET x = 1 WHERE x = 2")
    }
    assert(!e2.getMessage.contains("registered lake table"), e2.getMessage)
  }

  test("registrations are session-scoped: sibling sessions neither see nor overwrite each other's names") {
    val tA = stageTable()
    val tB = stageTable()
    // make B's table distinguishable: one extra delete commit
    LakeLayout.deleteFromLake(spark, tB,
      (0L until 3000L by 2).toDF("id"), "id", "ck", 2L)
    val sessionB = spark.newSession()
    LakeSql.register(spark, "sqlspec_scope", tA)
    // B registering the SAME name must not redirect A's resolution
    LakeSql.register(sessionB, "sqlspec_scope", tB)
    val nA = LakeSql.sql(spark,
      "SELECT count(*) AS n FROM sqlspec_scope").collect()(0).getLong(0)
    val nB = LakeSql.sql(sessionB,
      "SELECT count(*) AS n FROM sqlspec_scope").collect()(0).getLong(0)
    assert(nA == LakeLayout.readLake(spark, tA).get.count() &&
      nB == LakeLayout.readLake(sessionB, tB).get.count() && nA != nB,
      s"each session must resolve its own binding: A=$nA B=$nB")
    // AS-OF pins route through the session's own path too
    assert(LakeSql.sql(sessionB,
      "SELECT count(*) AS n FROM sqlspec_scope VERSION AS OF 2")
      .collect()(0).getLong(0) ==
      LakeLayout.readLakeVersion(sessionB, tB, 2L).count())
    // a name registered ONLY in B resolves in A through the shared
    // METASTORE record (the durable name authority) — but A's own
    // session binding, when present, always wins (asserted above:
    // A kept tA even after B persisted tB under the same name)
    LakeSql.register(sessionB, "sqlspec_b_only", tB)
    assert(LakeSql.sql(spark,
      "SELECT count(*) AS n FROM sqlspec_b_only").collect()(0).getLong(0)
      == LakeLayout.readLake(spark, tB).get.count(),
      "a fresh session must resolve a lake name from the metastore record")
  }

  test("a FRESH session resolves lake names from the metastore: SELECT, VERSION AS OF, and DML by bare name") {
    val t = stageTable()
    LakeSql.register(spark, "hms_reg_t", t, key = Some("id"))
    // a brand-new logical session: NO temp views, NO session registry —
    // only the shared catalog (same contract as a second driver on one
    // Hive metastore)
    val fresh = spark.newSession()
    val n = LakeSql.sql(fresh,
      "SELECT count(*) AS n FROM hms_reg_t").collect()(0).getLong(0)
    assert(n == LakeLayout.readLake(fresh, t).get.count(),
      "SELECT by bare name in a fresh session")
    val v0 = LakeSql.sql(fresh,
      "SELECT count(*) AS n FROM hms_reg_t VERSION AS OF 0")
      .collect()(0).getLong(0)
    assert(v0 == LakeLayout.readLakeVersion(fresh, t, 0L).count(),
      "VERSION AS OF by bare name in a fresh session")
    // DML: the persisted record carries the merge key, so a keyed
    // operation lowers without re-registering
    LakeSql.sql(fresh, "DELETE FROM hms_reg_t WHERE grp = -1")
    assert(LakeLayout.readLake(fresh, t).get
      .filter(col("grp") === -1L).count() == 0L,
      "DELETE by bare name in a fresh session")
    // the originating session sees the fresh session's commit on its
    // next statement (views advance per statement)
    assert(LakeSql.sql(spark,
      "SELECT count(*) AS n FROM hms_reg_t WHERE grp = -1")
      .collect()(0).getLong(0) == 0L)
  }

  test("a session's OWN temp view is never clobbered by metastore hydration; explicit register is the opt-in") {
    val t = stageTable()
    LakeSql.register(spark, "hms_shadow_t", t, key = Some("id"))
    val fresh = spark.newSession()
    // the fresh session creates ITS OWN temp view under the lake's
    // metastore-registered name BEFORE ever mentioning the lake
    fresh.range(3).toDF("id").createOrReplaceTempView("hms_shadow_t")
    assert(LakeSql.sql(fresh,
      "SELECT count(*) AS n FROM hms_shadow_t").collect()(0).getLong(0)
      == 3L,
      "the session's own temp view must win over metastore hydration")
    // DML on the bare name must NOT silently mutate the lake the
    // session never registered: whatever surfaces (a loud pass-through
    // failure), the lake's version history is untouched
    val vBefore = LakeLayout.lakeVersions(spark, t).max
    intercept[Exception] {
      LakeSql.sql(fresh, "DELETE FROM hms_shadow_t WHERE id = 1")
    }
    assert(LakeLayout.lakeVersions(spark, t).max == vBefore,
      "a shadowed name's DML must never reach the lake")
    // explicit register() takes the name over — the documented opt-in
    LakeSql.register(fresh, "hms_shadow_t", t, key = Some("id"))
    assert(LakeSql.sql(fresh,
      "SELECT count(*) AS n FROM hms_shadow_t").collect()(0).getLong(0)
      == LakeLayout.readLake(fresh, t).get.count())
  }

  test("MERGE rejects a source carrying duplicate merge keys — the standard multiple-matches error, before any commit") {
    val t = stageTable()
    LakeSql.register(spark, "dupmerge_t", t, key = Some("id"))
    Seq((5L, 1L, "a"), (5L, 2L, "b"), (9999999L, 3L, "c"))
      .toDF("id", "grp", "pay").createOrReplaceTempView("dupmerge_src")
    val vBefore = LakeLayout.lakeVersions(spark, t).max
    val e = intercept[IllegalArgumentException] {
      LakeSql.sql(spark,
        """MERGE INTO dupmerge_t USING dupmerge_src
           ON dupmerge_t.id = dupmerge_src.id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(e.getMessage.contains("duplicate"), e.getMessage)
    assert(LakeLayout.lakeVersions(spark, t).max == vBefore,
      "a rejected MERGE must not commit")
    // key-unique sources still merge fine through every form
    Seq((5L, 7L, "ok"), (9999999L, 3L, "c"))
      .toDF("id", "grp", "pay").createOrReplaceTempView("dupmerge_ok")
    LakeSql.sql(spark,
      """MERGE INTO dupmerge_t USING dupmerge_ok
         ON dupmerge_t.id = dupmerge_ok.id
         WHEN MATCHED THEN UPDATE SET grp = dupmerge_ok.grp
         WHEN NOT MATCHED THEN INSERT *""")
    val got = LakeLayout.readLake(spark, t).get
      .filter($"id".isin(5L, 9999999L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((5L, 7L), (9999999L, 3L)), s"merge applied: $got")
  }
}
