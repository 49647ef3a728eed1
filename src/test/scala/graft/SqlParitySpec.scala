package graft

import graft.sources.Catalog

/** Three-way equivalence: every oracle SQL string that is ANSI enough to
  * parse on Spark SQL must produce exactly the DataFrame query's result
  * over the same temp views. (DuckDB-specific oracles — list functions,
  * epoch_ns, `//`, ASOF — fail analysis and are skipped; DuckDB itself
  * checks those via scripts/check_oracle.py.) */
class SqlParitySpec extends SparkSuite {

  test("parseable oracle SQL agrees with the DataFrame implementation") {
    Catalog.registerViews(spark, sfDir)
    var parity = 0
    var skipped = 0
    val mismatches = Seq.newBuilder[String]
    for ((name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)) {
      val viaSql =
        try Some(spark.sql(sql).collect().map(_.toSeq).toSeq)
        catch { case _: Throwable => None }
      viaSql match {
        case None => skipped += 1
        case Some(rows) =>
          val viaDf = SparkEntry.queries(name)(spark, sfDir)
            .collect().map(_.toSeq).toSeq
          if (rows.sortBy(_.mkString("|")) == viaDf.sortBy(_.mkString("|"))) parity += 1
          else mismatches += name
      }
    }
    assert(mismatches.result().isEmpty,
      s"SQL/DataFrame mismatch: ${mismatches.result()}")
    // the relational core should all be ANSI-parseable on Spark; 23 as
    // of round 3 — a drop means an oracle SQL regressed into a dialect
    // Spark can't parse (or a query lost its oracle entirely)
    assert(parity >= 23, s"only $parity oracle SQLs ran on Spark SQL ($skipped skipped)")
    info(s"three-way parity: $parity queries, $skipped DuckDB-specific skipped")
  }

  test("lake tables are reachable from plain spark.sql via catalog views") {
    import spark.implicits._
    import graft.sources.LakeLayout
    val table = java.nio.file.Files.createTempDirectory("graft-lakeview").toString
    LakeLayout.commitLakeVersion(
      (0L until 50L).map(k => (k, s"v$k")).toDF("id", "v")
        .repartitionByRange(2, org.apache.spark.sql.functions.col("id")),
      table, "ck", 0L, statsKey = Some("id"))
    LakeLayout.upsertIntoLake(spark, table,
      Seq((7L, "UPD"), (100L, "INS")).toDF("id", "v"), "id", "ck", 1L)
    // latest-version view: SQL sees exactly what readLake sees
    Catalog.registerLakeView(spark, table, "lake_t")
    val viaSql = spark.sql(
      "SELECT COUNT(*) AS n, SUM(id) AS s FROM lake_t").head()
    assert(viaSql.getLong(0) == 51L)
    assert(viaSql.getLong(1) == (0L until 50L).sum + 100L)
    assert(spark.sql("SELECT v FROM lake_t WHERE id = 7").head().getString(0)
      == "UPD")
    // time-travel view pins the pre-upsert state
    Catalog.registerLakeVersionView(spark, table, 0L, "lake_t_v0")
    assert(spark.sql("SELECT COUNT(*) AS n FROM lake_t_v0").head().getLong(0)
      == 50L)
    assert(spark.sql("SELECT v FROM lake_t_v0 WHERE id = 7").head().getString(0)
      == "v7")
    // a view is a pinned snapshot: a commit AFTER registration must not
    // tear or advance it (consistent reads under concurrent writers)
    LakeLayout.deleteFromLake(spark, table,
      Seq(Tuple1(7L)).toDF("id"), "id", "ck", 2L)
    assert(spark.sql("SELECT COUNT(*) AS n FROM lake_t").head().getLong(0)
      == 51L, "registered view must keep its snapshot")
    Catalog.registerLakeView(spark, table, "lake_t")
    assert(spark.sql("SELECT COUNT(*) AS n FROM lake_t").head().getLong(0)
      == 50L, "re-registration advances to the latest version")
  }

  test("every registered query emits only driver-sortable scalar columns") {
    // The driver's harness (rows-only included) loads results into pandas
    // and sorts — array/map/struct cells crash it with numpy `unhashable
    // type` (round-3 CORRECTNESS, r12_envelope_per_source). Nested shapes
    // stay library API; registry entries serialize at the boundary.
    // DECIMAL is banned too: round 20's q_zorder3_key_stats matched the
    // oracle value-for-value yet failed the driver's hash gate, and it
    // was the registry's only DECIMAL column — the driver's hash
    // canonicalization treats DECIMAL differently from exact-value
    // equality, so wide sums must ship as BIGINT-safe pieces instead.
    import org.apache.spark.sql.types.{ArrayType, DecimalType, MapType, StructType}
    val offenders = for {
      (name, q) <- SparkEntry.queries.toSeq.sortBy(_._1)
      f <- q(spark, sfDir).schema.fields
      if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] ||
        f.dataType.isInstanceOf[StructType] ||
        f.dataType.isInstanceOf[DecimalType]
    } yield s"$name.${f.name}: ${f.dataType.simpleString}"
    assert(offenders.isEmpty, s"non-scalar/decimal columns in registry: $offenders")
  }
}
