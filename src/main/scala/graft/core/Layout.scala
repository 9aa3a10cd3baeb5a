package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * Why it matters at 100 TB: parquet min/max footer stats only skip files
  * when the data is clustered on the filtered column. Sorting on one key
  * gives perfect skipping on that key and none on any other; interleaving
  * the bits of two keys (the Morton curve) gives partial-but-real
  * skipping on BOTH — each range-partitioned output file covers a small
  * rectangle of the (x, y) space instead of a full-width stripe. This is
  * the same layout trick Delta/Iceberg expose as `OPTIMIZE ZORDER BY`,
  * built here from stock expressions: the z-value is a fold of
  * shift/mask/or terms (whole-stage codegen keeps it in one span — no
  * UDF), and the clustering itself is `repartitionByRange` + in-partition
  * sort, i.e. one shuffle at write time, zero cost at read time.
  */
object Layout {

  /** Morton z-value of the low `bits` bits of two non-negative integral
    * columns: bit i of `x` lands at position 2i, bit i of `y` at 2i+1.
    * 2·bits ≤ 62 keeps everything in a long. Callers bucket raw values
    * into [0, 2^bits) first (see [[zorderBy]]). */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ bitwiseOR _).cast("long")
  }

  /** The same z-value as portable SQL (the DuckDB oracle twin) — kept
    * next to the Column form so the two can't drift. */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i})", s"((($y >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")

  /** Z-cluster `df` on two integral columns already bucketed to
    * [0, 2^bits): one range shuffle on the z-value, sorted runs inside
    * each partition, helper column dropped. Write the result with any
    * sink and every output file covers a tight (x, y) rectangle. */
  def zorderBy(df: DataFrame, xCol: String, yCol: String, bits: Int,
      numPartitions: Int): DataFrame =
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  /** Per-partition [min,max] of each column — the footer stats a writer
    * would persist; the spec's pruning metric reads them back. */
  def partitionBounds(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    df.withColumn("__pid", spark_partition_id())
      .groupBy(col("__pid")).agg(aggs.head, aggs.tail: _*)
  }
}
