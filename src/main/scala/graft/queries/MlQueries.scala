package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ml.{Adversarial, Clustering}
import graft.stats.Correlations

/** ML-layer queries (SURVEY.md §2.7 M1–M5). The models themselves (GBT
  * splits, agglomerative merge order) are not SQL-expressible, so the
  * driver-checked contract is a hybrid: every DATA-DEPENDENT input the
  * oracle can recompute (sample sizes, the correlation mass the
  * clustering consumes) is emitted as a value column, and the model
  * outcome is emitted as a BAND flag whose expected value is pinned in
  * the oracle as a literal. A band mismatch (shift detected on
  * shift-free halves, silhouette outside [-1,1]) therefore fails the
  * driver's hash compare exactly like a wrong number would. Exact
  * model internals are value-checked in MlSpec on fixed fixtures
  * (hand-computed silhouette, planted-block recovery, planted-shift
  * detection); the band is the strongest contract that is also stable
  * across Spark versions (GBT tree splits are not bit-pinned). */
object MlQueries {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    s.read.parquet(s"$dir/$n.parquet")

  /** Numeric lineitem columns clustered by m2 (M3–M5). */
  private val m2Cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_orderkey", "l_partkey", "l_suppkey")

  val all: Seq[Q] = Seq(

    // M1+M2: adversarial shift between two hash-halves of orders (by
    // construction shift-free → AUC ≈ 0.5). n_a/n_b verify the sampling
    // + halving against DuckDB; auc_band='no_shift' is the pinned model
    // contract (window [0.35, 0.65], asserted tighter in MlSpec).
    Q("m1_adversarial",
      (s, d) => {
        // 20% hash sample, mirroring the reference's adversarial block
        // (`public_eda_pipeline.py:418`)
        val orders = graft.core.Sampling.modSample(T(s, d, "orders"), "o_orderkey", 20)
        val a = orders.where(pmod(col("o_orderkey"), lit(2)) === 0)
        val b = orders.where(pmod(col("o_orderkey"), lit(2)) === 1)
        val (auc, na, nb) = Adversarial.adversarialAuc(
          a, b, Seq("o_totalprice", "o_custkey"), maxIter = 10, maxDepth = 3)
        val schema = StructType(Seq(
          StructField("n_a", LongType, nullable = false),
          StructField("n_b", LongType, nullable = false),
          StructField("auc_band", StringType, nullable = false)))
        import scala.jdk.CollectionConverters._
        // band rather than raw AUC: GBT tree splits are not bit-stable
        // across Spark versions; the contract is "no detectable shift".
        val band = if (auc < 0.35) "low" else if (auc <= 0.65) "no_shift" else "shift"
        s.createDataFrame(Seq(Row(na, nb, band)).asJava, schema)
      },
      Some("""SELECT CAST(COUNT(*) FILTER (WHERE o_orderkey % 2 = 0) AS BIGINT) AS n_a,
             |CAST(COUNT(*) FILTER (WHERE o_orderkey % 2 = 1) AS BIGINT) AS n_b,
             |'no_shift' AS auc_band
             |FROM orders WHERE o_orderkey % 100 < 20""".stripMargin)),

    // M3+M4+M5: cluster lineitem numeric columns on 1−|corr| distance
    // (average linkage, k=3) + silhouette + per-cluster summaries.
    // sum_abs_corr is the data-dependent half: the total |Pearson r|
    // mass over all 21 pairs of the SAME matrix the clustering
    // consumes, recomputed independently by DuckDB's CORR — if the
    // one-pass co-moment matrix drifted, this hash breaks. n_clusters /
    // n_cols pin that average linkage returned exactly k non-empty
    // clusters covering every column; dist_band / sil_band pin the
    // metric invariants (1−|r| distances in [0,1]; silhouette in
    // [−1,1]). Per-cluster sizes / dominant groups / exact silhouette
    // are MlSpec's fixtures — no SQL engine can replay the merge order.
    Q("m2_corr_clusters",
      (s, d) => {
        val cols = m2Cols
        val m = Correlations.corrMatrix(T(s, d, "lineitem"), cols)
        val k = cols.length
        val dist = Array.tabulate(k, k)((i, j) => 1.0 - math.abs(m(i, j)))
        val labels = Clustering.averageLinkage(dist, 3)
        val sil = Clustering.silhouette(dist, labels)
        val groups = cols.map(c => c.split("_")(1).take(1)).toArray
        val sums = Clustering.summaries(dist, labels, groups)
        val sumAbsCorr = (for { i <- 0 until k; j <- i + 1 until k }
          yield math.abs(m(i, j))).sum
        val distOk = sums.forall(cs => cs.avgIntraDist >= 0.0 && cs.avgIntraDist <= 1.0)
        val silOk = sil >= -1.0 && sil <= 1.0
        val schema = StructType(Seq(
          StructField("n_clusters", IntegerType, nullable = false),
          StructField("n_cols", IntegerType, nullable = false),
          StructField("sum_abs_corr", DoubleType, nullable = false),
          StructField("dist_band", StringType, nullable = false),
          StructField("sil_band", StringType, nullable = false)))
        import scala.jdk.CollectionConverters._
        // HALF_UP, not rint: DuckDB's ROUND is half-away-from-zero and
        // sum_abs_corr is non-negative, so these agree at the boundary.
        val rows = Seq(Row(
          sums.length, sums.map(_.size).sum,
          BigDecimal(sumAbsCorr).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          if (distOk) "in_range" else "out_of_range",
          if (silOk) "in_range" else "out_of_range"))
        s.createDataFrame(rows.asJava, schema)
      },
      Some {
        val pairSelects = (for { i <- m2Cols.indices; j <- m2Cols.indices if i < j }
          yield s"SELECT CORR(${m2Cols(i)}, ${m2Cols(j)}) AS r FROM lineitem")
          .mkString(" UNION ALL ")
        s"""SELECT 3 AS n_clusters, ${m2Cols.length} AS n_cols,
           |ROUND(SUM(ABS(r)), 6) AS sum_abs_corr,
           |'in_range' AS dist_band, 'in_range' AS sil_band
           |FROM ($pairSelects)""".stripMargin
      }),

    // Model-based quality filter (weak-supervision distillation): a
    // deterministic heuristic gate (token count >= 56, the fixture
    // median) labels the id%4!=0 slice; hashed-unigram logistic
    // regression must RECOVER the gate from text alone on the held-out
    // slice. The gate is deliberately SQL-expressible so DuckDB
    // recomputes the split/label counts exactly; auc_band='separable'
    // is the pinned model contract (the gate is a linear functional of
    // the TF vector — sum of counts — so a linear model can represent
    // it exactly; band floor 0.85 absorbs hash/regularization noise).
    // Exact-AUC behavior on planted fixtures is MlSpec's job.
    Q("m3_quality_classifier",
      (s, d) => {
        val docs = T(s, d, "documents")
        val label = size(graft.llm.Retrieval.tokenize(col("text"))) >= 56
        val (auc, _) = graft.ml.QualityModel.distillFilter(
          docs, "doc_id", "text", label)
        val counts = docs.select(
          count(when(pmod(col("doc_id"), lit(4)) =!= 0, 1)).as("n_train"),
          count(when(pmod(col("doc_id"), lit(4)) === 0, 1)).as("n_eval"),
          count(when(pmod(col("doc_id"), lit(4)) === 0 && label, 1)).as("n_pos_eval"))
        counts.withColumn("auc_band", lit(graft.ml.QualityModel.aucBand(auc)))
      },
      Some("""SELECT
             |  CAST(COUNT(*) FILTER (WHERE doc_id % 4 <> 0) AS BIGINT) AS n_train,
             |  CAST(COUNT(*) FILTER (WHERE doc_id % 4 = 0) AS BIGINT) AS n_eval,
             |  CAST(COUNT(*) FILTER (WHERE doc_id % 4 = 0
             |    AND len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
             |            t -> t <> '')) >= 56) AS BIGINT) AS n_pos_eval,
             |  'separable' AS auc_band
             |FROM documents""".stripMargin))
  )
}
