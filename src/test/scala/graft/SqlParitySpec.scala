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

  test("every registered query emits only driver-sortable scalar columns") {
    // The driver's harness (rows-only included) loads results into pandas
    // and sorts — array/map/struct cells crash it with numpy `unhashable
    // type` (round-3 CORRECTNESS, r12_envelope_per_source). Nested shapes
    // stay library API; registry entries serialize at the boundary.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = for {
      (name, q) <- SparkEntry.queries.toSeq.sortBy(_._1)
      f <- q(spark, sfDir).schema.fields
      if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] ||
        f.dataType.isInstanceOf[StructType]
    } yield s"$name.${f.name}: ${f.dataType.simpleString}"
    assert(offenders.isEmpty, s"non-scalar columns in registry: $offenders")
  }
}
