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
    * Mirrors the reference's target-prevalence block (scan → wide agg →
    * derived rate → sort; `eda_workspace/public_eda_pipeline.py:87-104`). */
  def entry(spark: SparkSession): DataFrame = {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    orders
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("sum_price"))
      .withColumn("share", col("n_orders") / sum(col("n_orders")).over())
      .orderBy(col("n_orders").desc, col("o_orderstatus"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
