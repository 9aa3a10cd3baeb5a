package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ml.{Adversarial, Clustering}
import graft.stats.Correlations

/** ML-layer queries (SURVEY.md §2.7 M1–M5). Not SQL-expressible — no
  * DuckDB oracles; all are seed-deterministic, and their semantic
  * contracts live in MlSpec (adversarial AUC ≈ 0.5 on shift-free
  * halves, clustering/silhouette vs hand-computed matrices). */
object MlQueries {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    s.read.parquet(s"$dir/$n.parquet")

  val all: Seq[Q] = Seq(

    // M1+M2: adversarial shift between two hash-halves of orders (by
    // construction shift-free → AUC ≈ 0.5; the driver row-checks, the
    // spec asserts the metric window).
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
      None),

    // M3+M4+M5: cluster lineitem numeric columns on 1−|corr| distance
    // (average linkage, k=3), emit per-cluster summaries + silhouette.
    Q("m2_corr_clusters",
      (s, d) => {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_orderkey", "l_partkey", "l_suppkey")
        val m = Correlations.corrMatrix(T(s, d, "lineitem"), cols)
        val k = cols.length
        val dist = Array.tabulate(k, k)((i, j) => 1.0 - math.abs(m(i, j)))
        val labels = Clustering.averageLinkage(dist, 3)
        val sil = Clustering.silhouette(dist, labels)
        val groups = cols.map(c => c.split("_")(1).take(1)).toArray
        val sums = Clustering.summaries(dist, labels, groups)
        val schema = StructType(Seq(
          StructField("cluster", IntegerType, nullable = false),
          StructField("size", IntegerType, nullable = false),
          StructField("avg_intra_dist", DoubleType, nullable = false),
          StructField("dominant_group", StringType, nullable = false),
          StructField("silhouette", DoubleType, nullable = false)))
        import scala.jdk.CollectionConverters._
        val rows = sums.map(cs =>
          Row(cs.cluster, cs.size, math.rint(cs.avgIntraDist * 1e4) / 1e4,
            cs.dominantGroup, math.rint(sil * 1e4) / 1e4))
        s.createDataFrame(rows.asJava, schema)
      },
      None)
  )
}
