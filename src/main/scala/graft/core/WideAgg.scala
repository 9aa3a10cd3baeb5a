package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Wide (many-column) single-pass aggregation with codegen-safe batching.
  *
  * The reference computes per-column statistics for up to 2241 columns in one
  * streaming pass (null-rate profile, `eda_workspace/public_eda_pipeline
  * .py:235-254`; wide target sums `P:87-92`). In Spark, thousands of
  * aggregates in a single `agg(...)` can blow whole-stage-codegen / Janino
  * constant-pool limits (SURVEY.md A3), so we batch columns into chunks,
  * run one job per chunk, and assemble the (tiny) results on the driver.
  *
  * Scale note: each batch is a full-scan map-side-combined aggregate — no
  * shuffle beyond the single-row partial merge. At 100 TB the cost is
  * (#batches × one scan); with column pruning each batch scans only its own
  * column chunk in parquet, so total bytes read ≈ one full-table scan.
  */
object WideAgg {
  val DefaultBatch = 400

  /** Null-rate per column (reference A3: `is_null().mean()` for 2241 cols).
    * Returns a small DataFrame (column, null_rate) — one row per column. */
  def nullProfile(df: DataFrame, cols: Seq[String], batch: Int = DefaultBatch): DataFrame = {
    val spark = df.sparkSession
    val rates = runBatched(df, cols, c => avg(col(c).isNull.cast(DoubleType)), batch)
    toDf(spark, rates, "column", "null_rate")
  }

  /** Per-column sum (reference A2: 41 target sums in one pass). */
  def sumProfile(df: DataFrame, cols: Seq[String], batch: Int = DefaultBatch): DataFrame = {
    val spark = df.sparkSession
    val sums = runBatched(df, cols, c => sum(col(c).cast(DoubleType)), batch)
    toDf(spark, sums, "column", "sum")
  }

  /** Per-column mean. */
  def meanProfile(df: DataFrame, cols: Seq[String], batch: Int = DefaultBatch): DataFrame = {
    val spark = df.sparkSession
    val m = runBatched(df, cols, c => avg(col(c).cast(DoubleType)), batch)
    toDf(spark, m, "column", "mean")
  }

  /** Generic: one aggregate expression per column, batched, long format. */
  def runBatched(
      df: DataFrame,
      cols: Seq[String],
      exprOf: String => Column,
      batch: Int = DefaultBatch): Seq[(String, Double)] =
    cols.grouped(math.max(1, batch)).toSeq.flatMap { group =>
      val aggs = group.map(c => exprOf(c).cast(DoubleType).as(c))
      val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
      group.zipWithIndex.map { case (c, i) =>
        c -> (if (row.isNullAt(i)) Double.NaN else row.getDouble(i))
      }
    }

  private def toDf(
      spark: SparkSession,
      data: Seq[(String, Double)],
      keyName: String,
      valName: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField(keyName, StringType, nullable = false),
      StructField(valName, DoubleType, nullable = true)))
    val rows = data.map { case (k, v) =>
      Row(k, if (v.isNaN) null else v)
    }
    spark.createDataFrame(rows.asJava, schema)
  }

  /** Horizontal (row-wise) sum over many columns (reference E6:
    * `pl.sum_horizontal` over 41 targets / 2241 null-indicators,
    * `public_eda_pipeline.py:284,289`). Nulls count as 0. */
  def horizontalSum(cols: Seq[String]): Column =
    cols.map(c => coalesce(col(c).cast(LongType), lit(0L))).reduce(_ + _)

  /** Horizontal count of nulls across columns (missingness indicator sum). */
  def horizontalNullCount(cols: Seq[String]): Column =
    cols.map(c => col(c).isNull.cast(LongType)).reduce(_ + _)

  /** Boolean→tinyint flag (reference E7: `(expr > 0).cast(Int8)`). */
  def flag(cond: Column): Column = when(cond, 1).otherwise(0).cast(ByteType)
}
