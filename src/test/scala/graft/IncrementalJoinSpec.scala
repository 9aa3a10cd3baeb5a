package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** u4's delta-join fold beyond the broadcast-sized-dimension fixture:
  * the fold identity Δ(A⋈B) = ΔA⋈B does not care HOW the join executes,
  * so with the broadcast hint dropped (and the auto-broadcast threshold
  * off, as a too-big dimension would force on a real cluster) the same
  * fold must produce the same maintained result through a sort-merge
  * join. This is the documented non-broadcast path of u4's BROADCAST
  * BOUND note. */
class IncrementalJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def fold(useBroadcast: Boolean): (DataFrame, String) = {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val dim = if (useBroadcast) broadcast(cust) else cust
    def batch(i: Int) = orders.where(pmod(col("o_orderkey"), lit(3)) === i)
    // the fold: each delta batch joins ONLY against the dimension, then
    // appends — materialized eagerly (as u4 materializes via parquet)
    val folded = (0 to 2).map(i =>
        batch(i).join(dim, col("o_custkey") === col("c_custkey")).drop("c_custkey"))
      .reduce(_ unionByName _)
    val joinPlan = batch(0).join(dim, col("o_custkey") === col("c_custkey"))
      .queryExecution.executedPlan.toString
    val agg = folded.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
      .orderBy(col("c_mktsegment"))
    (agg, joinPlan)
  }

  test("delta-join fold is join-strategy-agnostic: sort-merge ≡ broadcast") {
    val (bAgg, bPlan) = fold(useBroadcast = true)
    assert(bPlan.contains("BroadcastHashJoin"), bPlan)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val (sAgg, sPlan) = fold(useBroadcast = false)
      assert(sPlan.contains("SortMergeJoin"), sPlan)
      assert(!sPlan.contains("BroadcastHashJoin"), sPlan)
      assert(sAgg.collect().toSeq === bAgg.collect().toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
