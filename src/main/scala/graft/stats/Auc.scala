package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact ROC AUC as a distributed rank statistic (Mann–Whitney U with
  * average-rank tie correction) — SURVEY.md A17.
  *
  * The reference wraps sklearn's `roc_auc_score` with a degenerate-class
  * guard (`eda_workspace/public_eda_pipeline.py:33-39`) and uses it in three
  * blocks (`P:304,353,459`). sklearn computes the trapezoidal ROC integral,
  * which with average ranks is exactly
  *   AUC = (Σ rank⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻).
  * Ties get average ranks (tie correction), which matters for binary scores
  * like missing-indicators (`P:345-355`).
  *
  * Scale design: instead of ranking raw rows with a global single-partition
  * window, we first reduce to one row per DISTINCT score (a shuffled,
  * map-side-combined aggregate), then rank the distinct-score table. For
  * continuous scores at extreme scale the distinct table is still large, but
  * the window degrades gracefully; for the common screening case (integer
  * counts, binary indicators, bucketed scores) it is tiny. The final
  * reduction is a single-row aggregate.
  */
object Auc {

  /** AUC of `score` predicting boolean/0-1 `label`, as a 1-row DataFrame
    * (n_pos, n_neg, auc). Returns NaN auc when a class is absent —
    * the reference's `safe_auc` guard (`public_eda_pipeline.py:34-35`). */
  def aucDf(df: DataFrame, label: Column, score: Column): DataFrame = {
    val perScore = df
      .select(score.cast("double").as("s"), label.cast("int").as("y"))
      .where(col("s").isNotNull && col("y").isNotNull)
      .groupBy(col("s"))
      .agg(
        sum(col("y")).cast("double").as("pos"),
        sum(lit(1) - col("y")).cast("double").as("neg"))

    // Average rank of a tie-group = (rows before group) + (size+1)/2.
    val w = Window.orderBy(col("s"))
    val ranked = perScore
      .withColumn("cum", sum(col("pos") + col("neg")).over(w))
      .withColumn("avg_rank", col("cum") - (col("pos") + col("neg") - 1) / 2.0)

    ranked.agg(
      sum(col("pos")).as("n_pos"),
      sum(col("neg")).as("n_neg"),
      sum(col("avg_rank") * col("pos")).as("rank_sum"))
      .select(
        col("n_pos"),
        col("n_neg"),
        when(col("n_pos") === 0 || col("n_neg") === 0, lit(Double.NaN))
          .otherwise(
            (col("rank_sum") - col("n_pos") * (col("n_pos") + 1) / 2.0) /
              (col("n_pos") * col("n_neg")))
          .as("auc"))
  }

  /** Scalar convenience: collect the 1-row result. */
  def auc(df: DataFrame, label: Column, score: Column): Double = {
    val row = aucDf(df, label, score).head()
    if (row.isNullAt(2)) Double.NaN else row.getDouble(2)
  }

  /** Orientation-free strength `max(auc, 1-auc)` (reference `P:354`). */
  def aucStrength(a: Double): Double =
    if (a.isNaN) Double.NaN else math.max(a, 1.0 - a)
}
