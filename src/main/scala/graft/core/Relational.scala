package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational building blocks from SURVEY.md §2 that are thin, reusable
  * compositions of the DataFrame API (value counts A9, band histograms
  * E12/A8, top-k windows W2/W3/W5, decile bucketing W4, dictionary diff
  * J7/E10/A5, labeled union J6, whale contingency A19).
  *
  * Scale notes are attached per operator; the general stance: group-bys
  * shuffle on their keys (map-side combined), per-group windows shuffle
  * once on the partition key, and the *global*-order operators (decile,
  * whale rank) are exact variants for oracle parity — each has an
  * approximate, fully-parallel twin for the 100 TB path.
  */
object Relational {

  /** A9: value counts — groupBy + count, deterministic order (count desc,
    * key asc). One shuffle on the key, map-side combined. */
  def valueCounts(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))

  /** A9: mode = most frequent value of a column (ties → smallest key). */
  def mode(df: DataFrame, key: String): DataFrame =
    valueCounts(df, key).limit(1)

  /** E12/A8: band histogram — label rows by a when-chain over `bands`
    * (upper-bound exclusive, last band catches the rest), then count per
    * band. `bands` = (label, upperBound) pairs in ascending bound order. */
  def bandLabel(c: Column, bands: Seq[(String, Double)], rest: String): Column =
    bands.foldRight(lit(rest)) { case ((label, ub), elseCol) =>
      when(c < ub, lit(label)).otherwise(elseCol)
    }

  /** W3: top-k rows per group by `order` (add unique tie-break columns in
    * `order` for determinism). One shuffle on the group key. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= k)
  }

  /** W4 (exact): decile bucketing via ntile over a global order. Matches
    * the reference's qcut-ish equal-count split given a unique order key.
    * NOTE: the global window is single-partition — exact/oracle variant
    * only. At scale use [[decileByRange]] (range-partitioned, parallel). */
  def decileExact(df: DataFrame, order: Seq[Column], n: Int = 10): DataFrame =
    df.withColumn("decile", ntile(n).over(Window.orderBy(order: _*)).cast("int"))

  /** W4 (scale path): equal-frequency bucketing by approx-quantile cut
    * points — fully parallel (one pass for the sketch + one map pass).
    * Bucket edges are approximate; bucket populations approach n-tiles as
    * relativeError → 0. */
  def decileByRange(df: DataFrame, valueCol: String, n: Int = 10, relErr: Double = 1e-4): DataFrame = {
    val probs = (1 until n).map(_.toDouble / n).toArray
    val cuts = df.stat.approxQuantile(valueCol, probs, relErr)
    val c = col(valueCol)
    val bucket = cuts.zipWithIndex.foldRight(lit(n)) { case ((cut, i), elseCol) =>
      when(c <= cut, lit(i + 1)).otherwise(elseCol)
    }
    df.withColumn("decile", bucket.cast("int"))
  }

  /** J7/E10/A5: dictionary diff — distinct values of `keyCol` in `left`
    * that never occur in `right`. Broadcast-friendly when dictionaries are
    * small; stays a shuffled anti join otherwise (both scale-safe). */
  def unseenValues(left: DataFrame, right: DataFrame, keyCol: String): DataFrame =
    left.select(col(keyCol)).distinct()
      .join(right.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
      .orderBy(col(keyCol))

  /** J6: vertical concat with a provenance label (reference's train∪test
    * adversarial frame, `public_eda_pipeline.py:431`). */
  def unionLabeled(a: DataFrame, b: DataFrame, labelCol: String): DataFrame =
    a.withColumn(labelCol, lit(0)).unionByName(b.withColumn(labelCol, lit(1)))

  /** Sketch twins of the exact operators (SURVEY §7.6): constant-memory
    * per-column estimates for the 100 TB path, where COUNT(DISTINCT) /
    * exact percentile would shuffle every value. rsd/relErr trade
    * precision for sketch size; accuracy contracts live in CoreSpec. */
  def distinctCountApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame =
    df.agg(
      approx_count_distinct(col(cols.head), rsd).as(cols.head),
      cols.tail.map(c => approx_count_distinct(col(c), rsd).as(c)): _*)

  def quantilesApprox(df: DataFrame, c: String, probs: Seq[Double],
      relErr: Double = 1e-3): Seq[Double] =
    df.stat.approxQuantile(c, probs.toArray, relErr).toSeq

  /** Heavy hitters: values with frequency ≥ `support` per column
    * (count-based FreqItems sketch — one pass, constant memory; may
    * return false positives, never false negatives). */
  def heavyHitters(df: DataFrame, cols: Seq[String], support: Double = 0.01): DataFrame =
    df.stat.freqItems(cols.toArray, support)

  /** A19 (exact): whale contingency — top-`pct`% rows by `order` (strict
    * lexicographic rank; include unique tie-breakers) vs a boolean target:
    * returns (a,b,c,d) with a = whale∧target, b = whale∧¬target,
    * c = ¬whale∧target, d = rest, plus the positive-rate lift of whales.
    * Exact variant ranks on a global window (single partition) — for the
    * 100 TB path cut on `approxQuantile(value, 1-pct/100)` instead and
    * accept boundary fuzz (the reference's own cut is a quantile,
    * `public_eda_pipeline.py:622`). */
  def whaleContingency(df: DataFrame, order: Seq[Column], target: Column, pct: Double = 1.0): DataFrame = {
    val ranked = df.withColumn("__rk", row_number().over(Window.orderBy(order: _*)))
      .withColumn("__t", target.cast("int"))
    val n = floor(max(col("__rk")).over(Window.partitionBy()) * lit(pct) / 100.0)
    ranked
      .withColumn("__whale", (col("__rk") <= n).cast("int"))
      .agg(
        sum(when(col("__whale") === 1 && col("__t") === 1, 1L).otherwise(0L)).as("a"),
        sum(when(col("__whale") === 1 && col("__t") === 0, 1L).otherwise(0L)).as("b"),
        sum(when(col("__whale") === 0 && col("__t") === 1, 1L).otherwise(0L)).as("c"),
        sum(when(col("__whale") === 0 && col("__t") === 0, 1L).otherwise(0L)).as("d"))
      .withColumn(
        "whale_lift",
        round(
          (col("a").cast("double") / (col("a") + col("b"))) /
            ((col("a") + col("c")).cast("double") / (col("a") + col("b") + col("c") + col("d"))),
          6))
  }
}
