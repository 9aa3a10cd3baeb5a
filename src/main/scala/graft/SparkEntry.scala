package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{AggQueries, LlmQueries, MlQueries, Q, RelationalQueries, StreamQueries, WindowQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def registry: Seq[Q] =
    RelationalQueries.all ++ AggQueries.all ++ LlmQueries.all ++ MlQueries.all ++
      StreamQueries.all ++ WindowQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mirrors the reference's target-prevalence block shape (scan → join →
    * wide agg → derived rate → sort; `public_eda_pipeline.py:87-104`)
    * with a broadcast dimension join and a windowed share. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    orders
      .join(broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"), "inner")
      .groupBy(col("o_orderstatus"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("sum_price"))
      .withColumn("share_in_status",
        col("n_orders") / sum(col("n_orders"))
          .over(org.apache.spark.sql.expressions.Window.partitionBy(col("o_orderstatus"))))
      .orderBy(col("o_orderstatus"), col("n_orders").desc, col("c_mktsegment"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
