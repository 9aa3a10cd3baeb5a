package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array

/** Model-based quality filtering for pretraining corpora — the
  * weak-supervision distillation shape (GPT-3/CCNet-style): a cheap
  * deterministic heuristic labels a training slice, a linear classifier
  * over hashed bag-of-token features learns to reproduce it, and the
  * fitted model then scores the FULL corpus map-only. The reference's
  * analytics stop at per-doc heuristic scores
  * (`eda_workspace/public_eda_pipeline.py` quality blocks); the
  * classifier layer is part of the extended LLM-pipeline surface.
  *
  * Why this beats applying the heuristic directly at 100 TB: the
  * heuristic is usually only computable on a curated slice (labels from
  * a trusted subcorpus, human ratings, a reference domain), while the
  * model generalizes its signal to the whole corpus. Here the heuristic
  * IS computable everywhere — deliberately, so the driver's DuckDB
  * oracle can recompute the label counts — and the contract is that the
  * classifier RECOVERS it from text alone (held-out AUC in the
  * 'separable' band).
  *
  * Scale shape:
  *   - Features: `HashingTF` over the portable tokenizer's output —
  *     fixed `dim` (size 2^18+ for web vocabulary; 2^12 suffices for
  *     the fixture's ~35-word vocabulary), no vocabulary dictionary to
  *     build, ship, or skew (the feature hash IS the dictionary).
  *   - Training: `LogisticRegression` (distributed L-BFGS — per-
  *     iteration treeAggregate of gradients, nothing vocabulary-sized
  *     on the driver beyond the dim-width coefficient vector).
  *   - Scoring: map-only transform; the filter decision never shuffles.
  *   - Split: deterministic by `id % testMod` (engine-portable, so the
  *     oracle recomputes the split sizes exactly).
  */
object QualityModel {

  /** Fit on the `id % testMod != 0` slice labeled by `heuristicLabel`,
    * score the held-out slice, return (heldOutAuc, scoredHeldOut).
    * The scored frame carries (id, label, p1) where p1 = P(label=1) —
    * the corpus-filter score a caller would threshold on.
    */
  def distillFilter(
      docs: DataFrame, idCol: String, textCol: String,
      heuristicLabel: Column, dim: Int = 1 << 12, testMod: Int = 4,
      maxIter: Int = 25, regParam: Double = 1e-4): (Double, DataFrame) = {
    require(testMod >= 2, s"testMod must be >= 2, got $testMod")
    val toks = docs.select(
      col(idCol).as("id"),
      heuristicLabel.cast("double").as("label"),
      graft.llm.Retrieval.tokenize(col(textCol)).as("toks"))
    val tf = new HashingTF().setInputCol("toks").setOutputCol("features")
      .setNumFeatures(dim)
    val featured = tf.transform(toks)
    val isEval = pmod(col("id"), lit(testMod)) === 0
    val lr = new LogisticRegression()
      .setLabelCol("label").setFeaturesCol("features")
      .setMaxIter(maxIter).setRegParam(regParam).setStandardization(false)
    val model = lr.fit(featured.where(!isEval))
    val scored = model.transform(featured.where(isEval))
    val auc = new BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderROC")
      .evaluate(scored)
    val p1 = element_at(vector_to_array(col("probability")), 2)
    (auc, scored.select(col("id"), col("label"), p1.as("p1")))
  }

  /** AUC → contract band. The pinned query contract is 'separable'
    * (the planted heuristic is linearly recoverable); thresholds leave
    * room for hash-collision and regularization noise. */
  def aucBand(auc: Double): String =
    if (auc >= 0.85) "separable" else if (auc >= 0.6) "weak" else "none"
}
