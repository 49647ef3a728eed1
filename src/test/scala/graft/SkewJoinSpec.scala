package graft

import graft.operators.SkewJoin
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSuite {

  test("salted join returns exactly the same rows as the plain join") {
    val orders = Tables.load(spark, sfDir, "orders")
    val customer = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
    val salted = SkewJoin.saltedJoin(orders, customer, "o_custkey", factor = 8)
    assert(salted.count() == plain.count())
    // full multiset equality via sorted key tuples
    val a = plain.select("o_orderkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val b = salted.select("o_orderkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(a == b)
  }

  test("salting actually spreads a hot key across sub-keys") {
    import spark.implicits._
    // 10k rows all sharing one key — the pathological hot key
    val hot = spark.range(10000).select(lit(42L).as("k"), $"id")
    val dim = Seq((42L, "x")).toDF("k", "v")
    val joined = SkewJoin.saltedJoin(hot, dim, "k", factor = 8)
    assert(joined.count() == 10000)
    // observe the IMPLEMENTATION's salt (shared withSalt step), not a
    // re-derived expression that could silently diverge
    val salts = SkewJoin.withSalt(hot, 8, uniqueCol = None)
      .groupBy("__salt").count().collect()
    assert(salts.length >= 6, s"only ${salts.length} of 8 salts used")
  }

  test("uniqueCol spreads byte-identical duplicate rows; all-columns hash cannot") {
    import spark.implicits._
    // 10k rows of ONE hot key whose content is fully identical except a
    // stable unique id — the adversarial shape for content-hash salting
    val hot = spark.range(10000)
      .select(lit(42L).as("k"), lit("same-payload").as("payload"), $"id".as("uid"))
    // all-columns hash over only (k, payload) — byte-identical rows
    // collapse onto a single sub-key (the documented trade-off)
    val collapsed = SkewJoin.withSalt(hot.drop("uid"), 8, uniqueCol = None)
      .groupBy("__salt").count().collect()
    assert(collapsed.length == 1, "identical rows must share one content-hash salt")
    // uniqueCol derives the salt from the stable unique id → spreads
    val spread = SkewJoin.withSalt(hot, 8, uniqueCol = Some("uid"))
      .groupBy("__salt").count().collect()
    assert(spread.length == 8, s"only ${spread.length} of 8 salts used with uniqueCol")
    // and the join itself stays multiplicity-exact with uniqueCol
    val dim = Seq((42L, "x")).toDF("k", "v")
    val joined = SkewJoin.saltedJoin(hot, dim, "k", factor = 8, uniqueCol = Some("uid"))
    assert(joined.count() == 10000)
    assert(joined.columns.count(_ == "__salt") == 0, "salt column must not leak")
  }

  test("skew profile surfaces the heaviest keys first") {
    val prof = SkewJoin.keySkewProfile(
      Tables.load(spark, sfDir, "lineitem"), "l_suppkey", topN = 5).collect()
    assert(prof.length == 5)
    val counts = prof.map(_.getAs[Long]("rows"))
    assert(counts.sameElements(counts.sorted.reverse))
  }
}
