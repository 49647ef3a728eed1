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
    // the salt distribution should use most of the 8 sub-keys
    val salts = hot.withColumn("__salt",
      pmod(xxhash64(struct(hot.columns.map(col): _*)), lit(8)))
      .groupBy("__salt").count().collect()
    assert(salts.length >= 6, s"only ${salts.length} of 8 salts used")
  }

  test("skew profile surfaces the heaviest keys first") {
    val prof = SkewJoin.keySkewProfile(
      Tables.load(spark, sfDir, "lineitem"), "l_suppkey", topN = 5).collect()
    assert(prof.length == 5)
    val counts = prof.map(_.getAs[Long]("rows"))
    assert(counts.sameElements(counts.sorted.reverse))
  }
}
