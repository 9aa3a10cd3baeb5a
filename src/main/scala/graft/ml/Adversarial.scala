package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.classification.GBTClassifier
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler

/** Adversarial-shift detection (reference M1/M2,
  * `eda_workspace/public_eda_pipeline.py:410-459`): label rows by origin
  * (train=0 / test=1), fit a gradient-boosted classifier, and read the
  * AUC — ≈ 0.5 means the two samples are indistinguishable (no shift).
  *
  * The reference uses CatBoost (ordered target statistics for
  * categoricals — no Spark equivalent); the CONTRACT is the adversarial
  * AUC metric, not the model (SURVEY.md §2.7 M2). Spark-first mapping:
  * `unionByName` + `lit` label (J6), per-class `randomSplit` stratified
  * split (M1), `GBTClassifier` (distributed boosting), AUC via the
  * rank-based evaluator.
  *
  * Scale: GBT fit shuffles once per iteration over the assembled
  * features; the sampled adversarial frame (reference: 20% hash sample)
  * keeps iterations bounded. Assembler + model pipeline is all
  * DataFrame-native — no driver-side collect of features.
  */
object Adversarial {

  /** M1: stratified split — per-class randomSplit, unioned back.
    * Statistically equivalent to sklearn's stratified split (exact class
    * ratios differ by sampling noise; seed-deterministic). */
  def stratifiedSplit(
      df: DataFrame, labelCol: String, testFrac: Double, seed: Long): (DataFrame, DataFrame) = {
    val classes = df.select(labelCol).distinct().collect().map(_.get(0))
    val splits = classes.map { c =>
      val Array(tr, te) = df.where(col(labelCol) === c)
        .randomSplit(Array(1.0 - testFrac, testFrac), seed)
      (tr, te)
    }
    (splits.map(_._1).reduce(_ unionByName _), splits.map(_._2).reduce(_ unionByName _))
  }

  /** M2: adversarial AUC between two frames over `featureCols`.
    * Returns (auc, n_a, n_b). Nulls are mean-filled by the assembler's
    * keep + the upstream caller; here we fill -1 like the reference
    * (`fill_null(-1)`, P:412). */
  def adversarialAuc(
      a: DataFrame, b: DataFrame, featureCols: Seq[String],
      maxIter: Int = 40, maxDepth: Int = 5, stepSize: Double = 0.08,
      seed: Long = 42L): (Double, Long, Long) = {
    val labeled = a.select(featureCols.map(col): _*).withColumn("origin", lit(0.0))
      .unionByName(b.select(featureCols.map(col): _*).withColumn("origin", lit(1.0)))
      .na.fill(-1.0, featureCols)
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .setHandleInvalid("keep")
    val assembled = assembler.transform(labeled)
    val (train, valid) = stratifiedSplit(assembled, "origin", 0.25, seed)
    val gbt = new GBTClassifier()
      .setLabelCol("origin").setFeaturesCol("features")
      .setMaxIter(maxIter).setMaxDepth(maxDepth).setStepSize(stepSize)
      .setSeed(seed)
    val model = gbt.fit(train)
    val scored = model.transform(valid)
    val auc = new BinaryClassificationEvaluator()
      .setLabelCol("origin").setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderROC")
      .evaluate(scored)
    (auc, a.count(), b.count())
  }
}
