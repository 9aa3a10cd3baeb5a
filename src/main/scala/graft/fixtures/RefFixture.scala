package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded generator for the reference-schema synthetic analog
  * (FIXTURES.md §A): train/test main features (num + cat), sparse extra
  * features, and 41 binary targets named `target_<family>_<idx>` —
  * exercising prefix role-detection, nulls, unseen test categories, and
  * rare targets, without shipping the reference's data.
  *
  * Deterministic by construction: every column is a pure function of
  * `customer_id` via seeded xxhash64 — no RNG state, so any subset /
  * re-partitioning reproduces identically (the same trick the driver's
  * corpus uses, and fully distributed).
  */
object RefFixture {

  /** u ∈ [0,1) derived from (id, tag) — stable pseudo-uniform. */
  private def u(tag: String) =
    (pmod(xxhash64(col("customer_id"), lit(tag)), lit(1000000L)).cast("double") / 1000000.0)

  val NumMain = 12
  val CatMain = 5
  val NumExtra = 30
  val Families = Seq("10", "9", "8", "7")
  /** 41 targets spread over 4 families, family 10 first (the analog of the
    * reference's antagonist `target_10_1`). */
  val TargetNames: Seq[String] =
    (0 until 41).map(i => s"target_${Families(i % Families.size)}_${i / Families.size + 1}")

  private def mains(spark: SparkSession, n: Long, test: Boolean): DataFrame = {
    val base = spark.range(n).withColumnRenamed("id", "customer_id")
    val withNum = (1 to NumMain).foldLeft(base) { (df, k) =>
      // nulls at varying rates (up to ~0.4), gaussian-ish values
      val rate = 0.4 * (k - 1) / NumMain
      df.withColumn(s"num_feature_$k",
        when(u(s"null$k") < rate, lit(null).cast("double"))
          .otherwise(round((u(s"v$k") + u(s"w$k") + u(s"x$k") - 1.5) * 10.0, 4)))
    }
    (1 to CatMain).foldLeft(withNum) { (df, k) =>
      val card = Seq(3, 8, 20, 50, 200)(k - 1)
      // test rows get a slightly wider code range → a few unseen categories
      val width = if (test && k >= 4) card + 2 else card
      df.withColumn(s"cat_feature_$k",
        (pmod(xxhash64(col("customer_id"), lit(s"c$k")), lit(width.toLong))).cast("int"))
    }
  }

  def trainMain(spark: SparkSession, n: Long = 8000): DataFrame = mains(spark, n, test = false)
  def testMain(spark: SparkSession, n: Long = 3000): DataFrame = mains(spark, n, test = true)

  /** Heavily-null extra features: null rates spanning ~0.1 → >0.99 with
    * value correlated to the any-target signal (so screening finds real
    * correlations). `nCols` widens the table to the reference's real
    * `train_extra_features` width (2241 columns incl. the key,
    * `public_eda_pipeline.py:65`, `public_tables/summary.json:6`) for
    * width-stress specs; built as ONE select — a foldLeft of withColumn
    * re-analyzes the plan per column, O(k²) at 2k+ columns. */
  def trainExtra(spark: SparkSession, n: Long = 8000, nCols: Int = NumExtra): DataFrame = {
    val base = spark.range(n).withColumnRenamed("id", "customer_id")
    val sig = u("signal") // latent propensity shared with targets
    val feats = (1 to nCols).map { k =>
      val rate = math.min(0.995, 0.1 + 0.9 * (k - 1) / nCols)
      // missingness itself carries the signal (reference: null structure
      // is a tested signal, filled_extra_count AUC 0.652) — high-signal
      // rows are ~40% more likely to have the cell filled
      val tilted = lit(rate) * (lit(1.25) - sig * 0.5)
      // offset names so extra features never collide with main's columns
      when(u(s"enull$k") < tilted, lit(null).cast("double"))
        .otherwise(round(sig * 5.0 + u(s"ev$k") * 2.0, 4))
        .as(s"num_feature_${100 + k}")
    }
    base.select(col("customer_id") +: feats: _*)
  }

  /** 41 binary targets; prevalence decays per index (rare tail), all
    * driven by the shared latent signal except family-10 targets, which
    * anti-correlate (the antagonist family). */
  def trainTarget(spark: SparkSession, n: Long = 8000): DataFrame = {
    val base = spark.range(n).withColumnRenamed("id", "customer_id")
    val sig = u("signal")
    TargetNames.zipWithIndex.foldLeft(base) { case (df, (t, i)) =>
      val prev = math.max(0.002, 0.3 * math.pow(0.87, i))
      val anti = t.startsWith("target_10_")
      val driver = if (anti) lit(1.0) - sig else sig
      // positive when the per-target uniform falls under prev, tilted by signal
      df.withColumn(t,
        (u(s"t$i") < (driver * 2.0 * prev)).cast("int"))
    }
  }

  /** Write all four tables as parquet under `dir`. `nExtraCols` widens
    * the extra-features table (2240 = the reference's real width). */
  def write(spark: SparkSession, dir: String, nTrain: Long = 8000, nTest: Long = 3000,
      nExtraCols: Int = NumExtra): Unit = {
    trainMain(spark, nTrain).write.mode("overwrite").parquet(s"$dir/train_main_features.parquet")
    testMain(spark, nTest).write.mode("overwrite").parquet(s"$dir/test_main_features.parquet")
    trainExtra(spark, nTrain, nExtraCols).write.mode("overwrite")
      .parquet(s"$dir/train_extra_features.parquet")
    trainTarget(spark, nTrain).write.mode("overwrite").parquet(s"$dir/train_target.parquet")
  }
}
