package graft

import org.apache.spark.sql.functions._
import graft.core.Joins

class JoinsSpec extends SparkSpec {

  test("bucketed join elides the exchange on both sides") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    Joins.writeBucketed(orders.withColumnRenamed("o_custkey", "custkey"),
      "b_orders", "custkey", 4)
    Joins.writeBucketed(customer.withColumnRenamed("c_custkey", "custkey"),
      "b_customer", "custkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = Joins.bucketedJoin(spark, "b_orders", "b_customer", "custkey")
      val n = joined.count()
      assert(n === orders.count()) // every order has a customer
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")

      // control: the same join on raw parquet DOES shuffle
      val raw = orders.join(customer, col("o_custkey") === col("c_custkey"))
      raw.count()
      assert(raw.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bloom-pruned join equals the plain join; filter reaches below the shuffle") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val urgent = orders.where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("k")).limit(100)
    val big = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "k")
    val plain = big.join(urgent, Seq("k")).count()
    val pruned = graft.core.Joins.bloomPrunedJoin(big, urgent, "k", expectedKeys = 1000)
    assert(pruned.count() === plain)
    // the bloom filter prunes most of the big side before the join
    val bloomKept = pruned.queryExecution.executedPlan.toString
    assert(bloomKept.contains("UDF")) // filter present in the physical plan
  }

  test("bloom-pruned join is lossless on STRING keys (probe matches build representation)") {
    import spark.implicits._
    // string keys whose cast-to-long is null — the old probe silently
    // dropped every such row (false negatives from a false-positive-only
    // structure)
    val big = (1 to 500).map(i => (s"key_$i", i)).toDF("k", "payload")
    val small = Seq("key_7", "key_42", "key_499").toDF("k")
    val plain = big.join(small, Seq("k")).select("k", "payload")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    val pruned = Joins.bloomPrunedJoin(big, small, "k", expectedKeys = 100)
      .select("k", "payload")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(pruned === plain && plain.size === 3)
    // unsupported key types fail fast instead of silently dropping rows
    val doubleKeyed = Seq((1.5, "x")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Joins.bloomPrunedJoin(doubleKeyed, doubleKeyed, "k")
    }
  }

  test("salted join returns exactly the plain-join rows on skewed data") {
    import spark.implicits._
    // 90% of big rows share one hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i % 7 else 0, i)).toDF("k", "payload")
    val small = (0 to 6).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    val salted = Joins.saltedJoin(big, small, "k", salts = 8)
      .select("k", "payload", "name")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    assert(salted === plain && plain.size === 2000)
  }
}
