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

  test("asofJoin: latest at-or-before match per key, tolerance, one shuffle, no BNLJ") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val left = Seq(
      (1L, ts(10), "a"), (1L, ts(20), "b"), (1L, ts(30), "c"),
      (2L, ts(5), "d"), (3L, ts(50), "e"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts(10), 100.0), (1L, ts(25), 250.0),
      (2L, ts(6), 60.0), (4L, ts(1), 10.0))
      .toDF("k", "ts", "v")
      .withColumn("rts", col("ts"))
    val out = Joins.asofJoin(left, right, Seq("k"), "ts", Seq("v", "rts"))
    val byTag = out.collect().map(r => r.getAs[String]("tag") ->
      (Option(r.getAs[java.lang.Double]("v")))).toMap
    assert(byTag("a") === Some(100.0)) // equal ts matches (inclusive)
    assert(byTag("b") === Some(100.0)) // latest at-or-before, not the later 25
    assert(byTag("c") === Some(250.0))
    assert(byTag("d") === None)        // right is strictly later → no match
    assert(byTag("e") === None)        // key absent on right → left outer
    // tolerance: c's match at 25 is 5s old — a 4s tolerance nulls it
    val tol = Joins.asofJoin(left, right, Seq("k"), "ts", Seq("v"), toleranceMs = Some(4000L))
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Double]("v"))).toMap
    assert(tol("a") === Some(100.0) && tol("c") === None)
    // forward: earliest at-or-after; d (ts 5) now matches right k=2 at 6
    val fwd = Joins.asofJoin(left, right, Seq("k"), "ts", Seq("v"), direction = "forward")
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Double]("v"))).toMap
    assert(fwd("a") === Some(100.0)) // equal ts still inclusive
    assert(fwd("b") === Some(250.0)) // next at-or-after 20 is 25
    assert(fwd("c") === None)        // nothing after 30
    assert(fwd("d") === Some(60.0))
    // forward tolerance: b→25 is 5s ahead; 4s tolerance nulls it, d→6 (1s) survives
    val ftol = Joins.asofJoin(left, right, Seq("k"), "ts", Seq("v"),
      toleranceMs = Some(4000L), direction = "forward")
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Double]("v"))).toMap
    assert(ftol("b") === None && ftol("d") === Some(60.0))
    // plan shape: one Exchange (the window shuffle), no nested-loop join;
    // AQE echoes the initial plan below the final one — count only the final
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"asofJoin must not BNLJ:\n$plan")
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
    assert(exchanges <= 1, s"asofJoin should shuffle once, saw $exchanges:\n$finalPlan")
  }

  test("rangeJoinBuckets equals the naive range join; equi join, no BNLJ") {
    import spark.implicits._
    val fact = (0 until 500).map(i => (i.toLong, i * 7.3 % 400)).toDF("id", "x")
    // overlapping bands, incl. one empty and one bucket-edge-aligned
    val bands = Seq((0, 0.0, 50.0), (1, 25.0, 120.0), (2, 100.0, 100.0), (3, 300.0, 400.0))
      .toDF("band_id", "lo", "hi")
    val naive = fact.join(bands, col("x") >= col("lo") && col("x") < col("hi"))
      .select("id", "band_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val bucketed = Joins.rangeJoinBuckets(fact, bands, "x", "lo", "hi", bucketWidth = 30.0)
      .select("id", "band_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(bucketed === naive && naive.nonEmpty)
    val plan = Joins.rangeJoinBuckets(fact, bands, "x", "lo", "hi", 30.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"range join must not BNLJ:\n$plan")
  }

  test("intervalOverlapJoin equals the naive theta join, emits each pair once, no BNLJ") {
    import spark.implicits._
    // intervals spanning multiple buckets, zero-length, bucket-edge-aligned,
    // negative coordinates, and non-overlapping extremes
    val a = Seq((1L, 0.0, 10.0), (2L, 5.0, 5.0), (3L, 25.0, 95.0), (4L, 30.0, 30.0),
      (5L, -20.0, -3.0), (6L, 1000.0, 1010.0)).toDF("aid", "a_lo", "a_hi")
    val b = Seq((10L, 3.0, 7.0), (11L, 0.0, 120.0), (12L, 90.0, 200.0), (13L, -5.0, 2.0),
      (14L, 500.0, 600.0)).toDF("bid", "b_lo", "b_hi")
    val naive = a.join(b, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val bucketed = Joins.intervalOverlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
        bucketWidth = 30.0)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    // seq-level equality (not set): a pair sharing several buckets must be
    // emitted exactly once — duplicates would survive a set comparison
    assert(bucketed.sorted.toSeq === naive.sorted.toSeq && naive.nonEmpty)
    assert(bucketed.distinct.length === bucketed.length)
    val plan = Joins.intervalOverlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 30.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"interval join must not BNLJ:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
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

  test("asofJoinNearest: min |gap| wins, ties backward, tolerance bounds both sides") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val left = Seq(
      (1L, ts(20), "mid"),    // right at 10 (gap 10) and 26 (gap 6) → forward
      (1L, ts(18), "tie"),    // right at 10 (gap 8) and 26 (gap 8) → tie → backward
      (1L, ts(9), "before"),  // only forward candidates (10, 26) → 10
      (2L, ts(100), "far"),   // nearest right (2, 5) is 95s away
      (3L, ts(7), "none"))    // no right key
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts(10), 100.0), (1L, ts(26), 260.0), (2L, ts(5), 50.0))
      .toDF("k", "ts", "v")
    def run(tol: Option[Long]) =
      Joins.asofJoinNearest(left, right, Seq("k"), "ts", Seq("v"), tol)
        .collect().map(r => r.getAs[String]("tag") ->
          ((Option(r.getAs[java.lang.Double]("v")).map(_.toDouble),
            Option(r.getAs[String]("__asof_dir"))))).toMap
    val out = run(None)
    assert(out("mid") === ((Some(260.0), Some("f"))))
    assert(out("tie") === ((Some(100.0), Some("b")))) // tie → backward, pandas parity
    assert(out("before") === ((Some(100.0), Some("f"))))
    assert(out("far") === ((Some(50.0), Some("b"))))
    assert(out("none") === ((None, None)))
    // tolerance 7s: mid's forward gap 6 survives; tie's both gaps (8) null out;
    // far's 95s match nulls
    val tol = run(Some(7000L))
    assert(tol("mid") === ((Some(260.0), Some("f"))))
    assert(tol("tie") === ((None, None)))
    assert(tol("far") === ((None, None)))
    assert(tol("before") === ((Some(100.0), Some("f"))))
  }
}
