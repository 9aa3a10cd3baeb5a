package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{FeatureCatalog, Relational, Sampling, WideAgg}
import graft.io.Sinks
import graft.ml.{Adversarial, Clustering}
import graft.stats.{Auc, Correlations, StatTests}

/** End-to-end EDA pipeline: the reference's analysis blocks in order
  * (`eda_workspace/public_eda_pipeline.py:73-714`), re-expressed
  * Spark-first over the reference-schema analog (FIXTURES.md §A).
  * Emits the golden-table layout: CSVs + summary.json + report.md.
  *
  * Block → reference line map:
  *   1 counts P:76-85 · 2 target stats P:87-116 · 3 opened dist P:119-135
  *   4 pair lift P:138-173 · 5 corr matrix + antagonist P:140-181
  *   6 clustering P:184-229 · 7 main missingness P:233-247
  *   8 extra bands P:249-280 · 9 filled-count deciles/AUC P:283-318
  *   10 missing-indicator AUC P:321-364 · 11 dictionaries P:369-405
  *   12 adversarial P:410-459 · 13 linear screen P:464-536
  *   14 universality P:539-594 · 15 whales P:599-669 · 16 summary P:674-905
  *
  * Scale: every block that touches full-width input runs as Spark jobs
  * (batched wide aggs, one-pass Gramians, sampled joins with pushed-down
  * hash filters); only post-aggregation artifacts (≤ ~20k rows) cross to
  * the driver for CSV/stats.
  */
object EdaPipeline {

  final case class Result(
      trainRows: Long, testRows: Long,
      nTargets: Int, rareTargets: Int,
      filledCountAuc: Double, filledCountPb: Double,
      adversarialAuc: Double,
      silhouetteK4: Double, largestClusterShare: Double,
      unseenCatFeatures: Int,
      screenedFeatures: Int, screenSampleRows: Long,
      whaleSignificant: Long)

  def run(spark: SparkSession, inputDir: String, outDir: String): Result = {
    def load(n: String) = spark.read.parquet(s"$inputDir/$n.parquet")
    def out(n: String) = s"$outDir/$n"
    // per-block wall clock (the scaling-curve instrument, FIXTURES.md):
    // prints at block END — the delta since the previous tick
    val tBlock = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
    def tick(block: String): Unit = {
      val now = System.nanoTime()
      println(f"[pipeline] block $block%-28s ${(now - tBlock.getAndSet(now)) / 1e9}%6.1f s")
    }

    val trainMain = load("train_main_features")
    val testMain = load("test_main_features")
    val trainExtra = load("train_extra_features")
    val trainTarget = load("train_target")

    val mainCat = FeatureCatalog.fromSchema(trainMain.schema.fieldNames.toSeq)
    val extraCat = FeatureCatalog.fromSchema(trainExtra.schema.fieldNames.toSeq)
    val tgtCat = FeatureCatalog.fromSchema(trainTarget.schema.fieldNames.toSeq)
    val targets = tgtCat.targets

    // ---- 1: dataset sizes --------------------------------------------------
    val trainRows = trainMain.count()
    val testRows = testMain.count()

    tick("1_sizes")
    // ---- 2: target stats (wide sum → rate → family → sort) -----------------
    val sums = WideAgg.runBatched(trainTarget, targets, c => sum(col(c).cast("long"))).toMap
    val targetStats = targets.map { t =>
      val pos = sums(t).map(_.toLong).getOrElse(0L)
      (t, FeatureCatalog.targetFamily(t), pos, pos.toDouble / trainRows)
    }
    import spark.implicits._
    val targetStatsDf = targetStats.toDF("target", "family", "positive_count", "positive_rate")
      .orderBy(col("positive_count").desc, col("target"))
    Sinks.writeCsv(targetStatsDf, out("target_stats.csv"))
    val familyStats = targetStatsDf.groupBy(col("family"))
      .agg(count(lit(1)).as("n_targets"), avg(col("positive_rate")).as("avg_rate"),
        min(col("positive_rate")).as("min_rate"), max(col("positive_rate")).as("max_rate"))
      .orderBy(col("family"))
    Sinks.writeCsv(familyStats, out("target_family_stats.csv"))

    tick("2_target_stats")
    // ---- 3: opened-targets distribution ------------------------------------
    val opened = trainTarget.withColumn("n_opened", WideAgg.horizontalSum(targets))
    Sinks.writeCsv(
      opened.groupBy(col("n_opened")).agg(count(lit(1)).as("n_customers")).orderBy(col("n_opened")),
      out("opened_targets_distribution.csv"))

    tick("3_opened_dist")
    // ---- 4: pair co-occurrence + lift --------------------------------------
    val pairDf = Correlations.pairLift(trainTarget, targets)
    Sinks.writeCsv(pairDf.orderBy(col("col_a"), col("col_b")), out("target_pair_stats.csv"))
    Sinks.writeCsv(
      pairDf.where(col("co_count") >= 10)
        .orderBy(col("pair_lift").desc, col("col_a"), col("col_b")).limit(30),
      out("target_top_pairs.csv"))

    tick("4_pair_lift")
    // ---- 5: 41×41 corr matrix + antagonist slice ---------------------------
    val corrM = Correlations.corrMatrix(trainTarget, targets)
    val corrRows = targets.indices.map { i =>
      org.apache.spark.sql.Row.fromSeq(targets(i) +: targets.indices.map(j => corrM(i, j)))
    }
    val corrSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("target", org.apache.spark.sql.types.StringType) +:
        targets.map(t => org.apache.spark.sql.types.StructField(t,
          org.apache.spark.sql.types.DoubleType)))
    import scala.jdk.CollectionConverters._
    Sinks.writeCsv(spark.createDataFrame(corrRows.asJava, corrSchema), out("target_corr_matrix.csv"))
    // pair tables enriched with the pearson corr of each pair
    // (reference `P:168-173`): top-30 positive / negative / lift slices
    val corrPairs = (for { i <- targets.indices; j <- targets.indices if i < j }
      yield (targets(i), targets(j), corrM(i, j))).toDF("col_a", "col_b", "corr")
    val pairWithCorr = pairDf.join(corrPairs, Seq("col_a", "col_b"), "left")
    Sinks.writeCsv(
      pairWithCorr.orderBy(col("corr").desc, col("col_a"), col("col_b")).limit(30),
      out("top_positive_target_pairs.csv"))
    Sinks.writeCsv(
      pairWithCorr.orderBy(col("corr").asc, col("col_a"), col("col_b")).limit(30),
      out("top_negative_target_pairs.csv"))
    Sinks.writeCsv(
      pairWithCorr.where(col("co_count") >= 10)
        .orderBy(col("pair_lift").desc, col("col_a"), col("col_b")).limit(30),
      out("top_cooccurrence_lift_pairs.csv"))

    val antagonist = targets.head // family-10 analog of target_10_1
    val ai = targets.indexOf(antagonist)
    val antiCorrs = targets.indices.filter(_ != ai).map(j => corrM(ai, j))
    val antagonistNegShare = antiCorrs.count(_ < 0).toDouble / antiCorrs.size
    Sinks.writeCsv(
      targets.indices.filter(_ != ai).map(j => (targets(j), corrM(ai, j)))
        .toDF("target", "corr_with_antagonist").orderBy(col("corr_with_antagonist")),
      out("antagonist_corr_slice.csv"))
    // abs-sorted profile variant (reference's target_10_1_profile, `P:175-181`)
    Sinks.writeCsv(
      targets.indices.filter(_ != ai)
        .map(j => (targets(j), corrM(ai, j), math.abs(corrM(ai, j))))
        .toDF("other_target", "correlation", "abs_correlation")
        .orderBy(col("abs_correlation").desc, col("other_target")),
      out("antagonist_profile.csv"))

    tick("5_corr_matrix")
    // ---- 6: clustering on 1−|corr| (k ∈ {3,4,5}) ---------------------------
    val dist = Array.tabulate(targets.size, targets.size)((i, j) => 1.0 - math.abs(corrM(i, j)))
    val byK = Seq(3, 4, 5).map { k =>
      val labels = Clustering.averageLinkage(dist, k)
      k -> (labels, Clustering.silhouette(dist, labels))
    }.toMap
    val (labels4, sil4) = byK(4)
    // per-k quality table: silhouette + cluster-size value counts
    // (reference's target_cluster_quality, `P:186-205`)
    Sinks.writeCsv(
      Seq(3, 4, 5).map { k =>
        val (labels, sil) = byK(k)
        val sizes = labels.groupBy(identity).values.map(_.size)
        (k, sil, sizes.max.toDouble / targets.size, sizes.min, sizes.max)
      }.toDF("k", "silhouette_precomputed", "largest_cluster_share",
        "min_cluster_size", "max_cluster_size"),
      out("target_cluster_quality.csv"))
    val families = targets.map(FeatureCatalog.targetFamily).toArray
    Sinks.writeCsv(
      targets.indices.map(i => (targets(i), families(i), labels4(i)))
        .toDF("target", "family", "cluster").orderBy(col("cluster"), col("target")),
      out("target_cluster_assignments.csv"))
    Sinks.writeCsv(
      Clustering.summaries(dist, labels4, families)
        .map(s => (s.cluster, s.size, s.avgIntraDist, s.dominantGroup, s.dominantShare))
        .toDF("cluster", "size", "avg_intra_dist", "dominant_family", "dominant_share"),
      out("target_cluster_summary.csv"))
    val largestShare = labels4.groupBy(identity).values.map(_.size).max.toDouble / targets.size

    tick("6_clustering")
    // ---- 7: main-feature missingness ---------------------------------------
    val mainFeats = mainCat.allFeatures
    val mainNulls = WideAgg.nullProfile(trainMain, mainFeats)
      .withColumn("feature_type",
        when(col("col_name").startsWith("num_"), "numeric").otherwise("categorical"))
      .withColumn("source", lit("main"))

    tick("7_main_missing")
    // ---- 8: extra-feature missingness bands --------------------------------
    val extraNulls = WideAgg.nullProfile(trainExtra, extraCat.numFeatures)
    // the combined summary is main ∪ extra (reference `P:249-267`), plus
    // the extra-only slice and its top-10-missing head as separate tables
    val extraNullsLabeled = extraNulls
      .withColumn("feature_type", lit("numeric"))
      .withColumn("source", lit("extra"))
    Sinks.writeCsv(
      mainNulls.unionByName(extraNullsLabeled).orderBy(col("null_rate").desc, col("col_name")),
      out("feature_missingness_summary.csv"))
    Sinks.writeCsv(extraNullsLabeled.orderBy(col("null_rate").desc, col("col_name")),
      out("extra_missingness_summary.csv"))
    Sinks.writeCsv(
      extraNullsLabeled.orderBy(col("null_rate").desc, col("col_name")).limit(10),
      out("top10_missing_features.csv"))
    val banded = extraNulls.withColumn("band", Relational.bandLabel(
      col("null_rate"),
      Seq("a_.. <=0.10" -> 0.10001, "b_.. <=0.50" -> 0.50001, "c_.. <=0.90" -> 0.90001,
        "d_.. <=0.99" -> 0.99001), "e_.. >0.99"))
    Sinks.writeCsv(
      banded.groupBy(col("band")).agg(count(lit(1)).as("n_features")).orderBy(col("band")),
      out("extra_missingness_bands.csv"))

    tick("8_extra_bands")
    // ---- 9: filled-extra-count → deciles, AUC, point-biserial --------------
    val filled = trainExtra.select(
      col("customer_id"),
      WideAgg.horizontalNotNullCount(extraCat.numFeatures).as("filled_extra_count"))
    val anyOpen = trainTarget.select(
      col("customer_id"),
      WideAgg.flag(WideAgg.horizontalSum(targets) > 0).as("any_open"))
    val joined = filled.join(anyOpen, Seq("customer_id"), "inner").cache()
    val deciles = Relational.decileExact(joined, Seq(col("filled_extra_count"), col("customer_id")))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), avg(col("filled_extra_count")).as("avg_filled"),
        avg(col("any_open").cast("double")).as("open_rate"))
      .orderBy(col("decile"))
    Sinks.writeCsv(deciles, out("filled_extra_count_deciles.csv"))
    val aucRow = Auc.aucDf(joined, col("any_open") === 1, col("filled_extra_count")).collect()(0)
    val filledAuc = aucRow.getAs[Double]("auc")
    val pbRow = joined.agg(
      corr(col("any_open").cast("double"), col("filled_extra_count").cast("double")).as("r"),
      count(lit(1)).as("n")).collect()(0)
    val filledPb = pbRow.getAs[Double]("r")
    val filledPbP = StatTests.corrPValue(filledPb, pbRow.getAs[Long]("n"))
    joined.unpersist()

    tick("9_filled_deciles")
    // ---- 10: missing-indicator AUC (30% sample) ----------------------------
    val candidates = extraNulls.collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .filter { case (_, nr) => nr > 0.05 && nr < 0.95 }.map(_._1).take(20).toSeq
    val sampled = Sampling.modSample(trainExtra, "customer_id", 30)
      .select((col("customer_id") +: candidates.map(col)): _*)
      .join(anyOpen, Seq("customer_id"), "inner")
      .select((col("any_open") +: candidates.map(c => col(c).isNotNull.cast("int").as(c))): _*)
    // all indicator AUCs in ONE aggregate pass (binary-score closed form)
    val indAuc = Auc.binaryAucProfile(sampled, col("any_open") === 1, candidates)
    Sinks.writeCsv(
      indAuc.withColumnRenamed("col_name", "feature")
        .orderBy(col("abs_auc").desc, col("feature")),
      out("missing_indicator_auc.csv"))

    tick("10_missing_auc")
    // ---- 11: categorical dictionaries + unseen test categories -------------
    // Melted to ONE (feature, value) pass per side + one anti-join — a
    // handful of jobs total instead of ~4 per feature (the reference loops
    // per column in pandas where data is in memory, `P:369-405`; at
    // cluster scale per-feature jobs are minutes of scheduler latency for
    // seconds of work). Null handling matches the per-feature loop: a null
    // group never equi-matches, so null test values always count as
    // unseen, and cardinalities count the null group (distinct() kept it).
    val catCols = mainCat.catFeatures
    def meltCats(df: DataFrame): DataFrame =
      df.select(expr(
        s"stack(${catCols.length}, " +
          catCols.map(c => s"'$c', CAST(`$c` AS STRING)").mkString(", ") +
          ") AS (feature, value)"))
    val trainGroups = meltCats(trainMain).groupBy("feature", "value")
      .agg(count(lit(1)).as("n_tr")).cache()
    val testGroups = meltCats(testMain).groupBy("feature", "value")
      .agg(count(lit(1)).as("n_te")).cache()
    val unseenAgg = testGroups.join(trainGroups, Seq("feature", "value"), "left_anti")
      .groupBy("feature")
      .agg(count(lit(1)).as("unseen_test_values"), sum("n_te").as("unseen_rows"))
    val catStats = trainGroups.groupBy("feature").agg(count(lit(1)).as("train_cardinality"))
      .join(testGroups.groupBy("feature").agg(count(lit(1)).as("test_cardinality")),
        Seq("feature"))
      .join(unseenAgg, Seq("feature"), "left")
      .select(col("feature"), col("train_cardinality"), col("test_cardinality"),
        coalesce(col("unseen_test_values"), lit(0L)).as("unseen_test_values"),
        (coalesce(col("unseen_rows"), lit(0L)) / testRows.toDouble).as("unseen_row_rate"))
      .orderBy(col("feature"))
      .collect().toSeq
    trainGroups.unpersist(); testGroups.unpersist()
    Sinks.writeCsv(
      catStats.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toDF("feature", "train_cardinality", "test_cardinality",
          "unseen_test_values", "unseen_row_rate"),
      out("categorical_cardinality.csv"))
    // unseen-values slice sorted by test-row impact (reference's
    // categorical_unseen_categories, `P:398-405`)
    Sinks.writeCsv(
      catStats.map(r => (r.getString(0), r.getLong(3), r.getDouble(4)))
        .toDF("feature", "unseen_unique_categories", "unseen_rate_test_rows")
        .orderBy(col("unseen_rate_test_rows").desc, col("feature")),
      out("categorical_unseen_categories.csv"))
    val unseenFeatures = catStats.count(_.getLong(3) > 0)

    tick("11_cat_dicts")
    // ---- 12: adversarial shift (20% samples) -------------------------------
    val advCols = mainCat.numFeatures ++ mainCat.catFeatures
    val (advAuc, _, _) = Adversarial.adversarialAuc(
      Sampling.modSample(trainMain, "customer_id", 20),
      Sampling.modSample(testMain, "customer_id", 20),
      advCols, maxIter = 15, maxDepth = 4)
    Sinks.writeCsv(Seq(("train_vs_test", advAuc)).toDF("experiment", "auc"),
      out("adversarial_auc.csv"))

    tick("12_adversarial")
    // ---- 13: linear screening (12% sample, impute, cross-corr) -------------
    val screenFeats = mainCat.numFeatures ++
      extraNulls.collect().map(r => r.getString(0) -> r.getDouble(1))
        .filter(_._2 < 0.95).map(_._1).toSeq
    val screenSample = Sampling.modSample(trainMain, "customer_id", 12)
      .select((col("customer_id") +: mainCat.numFeatures.map(col)): _*)
      .join(Sampling.modSample(trainExtra, "customer_id", 12)
        .select((col("customer_id") +:
          screenFeats.filterNot(mainCat.numFeatures.contains).map(col)): _*),
        Seq("customer_id"), "inner")
      .join(Sampling.modSample(trainTarget, "customer_id", 12), Seq("customer_id"), "inner")
      .cache()
    val screenRows = screenSample.count()
    val linear = Correlations.crossCorr(screenSample, screenFeats, targets)
    Sinks.writeCsv(linear.orderBy(col("feature"), col("target")),
      out("feature_target_linear_corr.csv"))
    val top10 = Relational.topKPerGroup(
      linear.na.drop(Seq("corr")), Seq("target"), Seq(col("abs_corr").desc, col("feature")), 10)
    Sinks.writeCsv(top10.orderBy(col("target"), col("rk")), out("top10_features_per_target.csv"))

    // feature provenance for the mix/signal tables
    val mainFeatSet = (mainCat.numFeatures ++ mainCat.catFeatures).toSet
    val withMeta = top10
      .withColumn("source",
        when(col("feature").isin(mainFeatSet.toSeq: _*), "main").otherwise("extra"))
      .withColumn("feature_type",
        when(col("feature").startsWith("cat_"), "categorical").otherwise("numeric"))

    // per-target composition of the top-10 list (reference `P:539-551`)
    Sinks.writeCsv(
      withMeta.groupBy(col("target")).agg(
        avg(col("abs_corr")).as("mean_abs_corr_top10"),
        sum(when(col("feature_type") === "categorical", 1).otherwise(0)).as("n_cat_top10"),
        sum(when(col("feature_type") === "numeric", 1).otherwise(0)).as("n_num_top10"),
        sum(when(col("source") === "main", 1).otherwise(0)).as("n_main_top10"),
        sum(when(col("source") === "extra", 1).otherwise(0)).as("n_extra_top10"))
        .orderBy(col("mean_abs_corr_top10").desc, col("target")),
      out("target_top10_feature_mix.csv"))

    // universality via top-10 membership (reference `P:553-563`; the full-
    // screen variant below stays as feature_universality.csv)
    Sinks.writeCsv(
      withMeta.groupBy(col("feature")).agg(
        countDistinct(col("target")).as("n_targets_top10"),
        avg(col("abs_corr")).as("mean_abs_corr_when_top10"),
        max(col("abs_corr")).as("max_abs_corr_when_top10"))
        .orderBy(col("n_targets_top10").desc, col("mean_abs_corr_when_top10").desc,
          col("feature")),
      out("feature_universality_top10.csv"))

    // full-screen signal summary with provenance + null rate (reference
    // `P:565-585`)
    val featNullRates = mainNulls.select(col("col_name").as("feature"), col("null_rate"))
      .unionByName(extraNulls.select(col("col_name").as("feature"), col("null_rate")))
    Sinks.writeCsv(
      linear.na.drop(Seq("corr")).groupBy(col("feature")).agg(
        max(col("abs_corr")).as("max_abs_corr"),
        avg(col("abs_corr")).as("mean_abs_corr"),
        sum(when(col("abs_corr") > 0.05, 1).otherwise(0)).as("n_targets_abs_corr_gt_005"),
        sum(when(col("abs_corr") > 0.10, 1).otherwise(0)).as("n_targets_abs_corr_gt_010"))
        .withColumn("source",
          when(col("feature").isin(mainFeatSet.toSeq: _*), "main").otherwise("extra"))
        .withColumn("feature_type",
          when(col("feature").startsWith("cat_"), "categorical").otherwise("numeric"))
        .join(featNullRates, Seq("feature"), "left")
        .orderBy(col("max_abs_corr").desc, col("mean_abs_corr").desc, col("feature")),
      out("feature_signal_summary.csv"))

    // convenience slice: top-5 linear rows for a fixed target set
    // (reference's golden_linear_top5_selected_targets, `P:587-594`;
    // selection is deterministic — first 4 targets in catalog order)
    val selectedTargets = targets.take(4)
    Sinks.writeCsv(
      Relational.topKPerGroup(
        linear.na.drop(Seq("corr")).where(col("target").isin(selectedTargets: _*)),
        Seq("target"), Seq(col("abs_corr").desc, col("feature")), 5)
        .orderBy(col("target"), col("rk")),
      out("golden_linear_top5_selected_targets.csv"))
    screenSample.unpersist()

    tick("13_screening")
    // ---- 14: feature universality ------------------------------------------
    val universality = linear.na.drop(Seq("corr")).groupBy(col("feature"))
      .agg(
        sum(when(col("abs_corr") > 0.05, 1).otherwise(0)).as("n_targets_gt05"),
        avg(col("abs_corr")).as("mean_abs_corr"),
        max(col("abs_corr")).as("max_abs_corr"),
        median(col("abs_corr")).as("median_abs_corr"))
      .orderBy(col("n_targets_gt05").desc, col("mean_abs_corr").desc, col("feature"))
    Sinks.writeCsv(universality, out("feature_universality.csv"))

    tick("14_universality")
    // ---- 15: whale signals (p99 cut × rare targets, Fisher) ----------------
    val rare = targetStats.filter(_._4 < 0.05).map(_._1).take(8)
    val whaleSample = Sampling.modSample(trainMain, "customer_id", 12)
      .join(trainTarget.select((col("customer_id") +: rare.map(col)): _*),
        Seq("customer_id"), "inner").cache()
    val nW = whaleSample.count()
    val numFeats = mainCat.numFeatures
    val cuts = WideAgg.runBatched(whaleSample, numFeats,
      c => percentile(col(c), lit(0.99))).toMap
    // one pass: per (feature,target) contingency via conditional aggs
    val aggExprs = numFeats.flatMap { f =>
      val whale = col(f).isNotNull && col(f) >= cuts(f).getOrElse(Double.MaxValue)
      Seq(sum(when(whale, 1L).otherwise(0L)).as(s"${f}__n")) ++ rare.map { t =>
        sum(when(whale && col(t) === 1, 1L).otherwise(0L)).as(s"${f}__${t}__a")
      }
    } ++ rare.map(t => sum(col(t).cast("long")).as(s"__tot__$t"))
    val aggRow = whaleSample.agg(aggExprs.head, aggExprs.tail: _*).collect()(0)
    whaleSample.unpersist()
    def gl(n: String): Long = if (aggRow.isNullAt(aggRow.fieldIndex(n))) 0L
      else aggRow.getLong(aggRow.fieldIndex(n))
    val whaleRows = for {
      f <- numFeats
      t <- rare
      nWhale = gl(s"${f}__n") if nWhale > 0
      a = gl(s"${f}__${t}__a")
      tot = gl(s"__tot__$t")
    } yield {
      val b = nWhale - a
      val c = tot - a
      val d = nW - nWhale - c
      val whaleRate = a.toDouble / nWhale
      val baseRate = tot.toDouble / nW
      val lift = if (baseRate > 0) whaleRate / baseRate else Double.NaN
      val p = StatTests.fisherExactGreater(a, b, c, d)
      (f, t, nWhale, a, lift, p)
    }
    val whaleDf = whaleRows
      .toDF("feature", "target", "n_whales", "n_whale_pos", "lift", "p_value")
      .orderBy(col("p_value"), col("feature"), col("target"))
    Sinks.writeCsv(whaleDf, out("whale_signals.csv"))
    // candidate rollup + top-3 per target over the SIGNIFICANT slice
    // (reference `P:652-669`); whaleRows is a driver-side list (≤ features
    // × rare targets), so these are local transforms
    val sigWhales = whaleRows.filter(r => !r._5.isNaN && r._5 >= 2.0 && r._6 < 0.05)
    val whaleCandidates = sigWhales.groupBy(_._1).map { case (f, rs) =>
      val lifts = rs.map(_._5).sorted
      val median =
        if (lifts.size % 2 == 1) lifts(lifts.size / 2)
        else (lifts(lifts.size / 2 - 1) + lifts(lifts.size / 2)) / 2.0
      (f, rs.map(_._2).distinct.size, median, lifts.last, rs.map(_._6).min)
    }.toSeq
    Sinks.writeCsv(
      whaleCandidates
        .toDF("feature", "n_rare_targets", "median_lift", "max_lift", "min_pvalue")
        .orderBy(col("n_rare_targets").desc, col("median_lift").desc, col("feature")),
      out("whale_feature_candidates.csv"))
    Sinks.writeCsv(
      sigWhales.groupBy(_._2).toSeq.flatMap { case (_, rs) =>
        rs.sortBy(r => (-r._5, r._1)).take(3)
      }.toDF("feature", "target", "n_whales", "n_whale_pos", "lift", "p_value")
        .orderBy(col("target"), col("lift").desc, col("feature")),
      out("whale_top3_per_target.csv"))
    val whaleSig = whaleRows.count(r => r._5 >= 2.0 && r._6 < 0.05).toLong

    tick("15_whales")
    // ---- 16: summary.json + report.md --------------------------------------
    val rareCount = targetStats.count(_._4 < 0.01)
    val summary = Seq[(String, Any)](
      "train_rows" -> trainRows, "test_rows" -> testRows,
      "n_targets" -> targets.size,
      "n_main_features" -> mainFeats.size,
      "n_extra_features" -> extraCat.numFeatures.size,
      "targets_below_1pct" -> rareCount,
      "antagonist_target" -> antagonist,
      "antagonist_neg_share" -> antagonistNegShare,
      "filled_extra_count_auc" -> filledAuc,
      "filled_extra_count_pointbiserial" -> filledPb,
      "filled_extra_count_pb_pvalue" -> filledPbP,
      "adversarial_auc" -> advAuc,
      "silhouette_k3" -> byK(3)._2, "silhouette_k4" -> sil4, "silhouette_k5" -> byK(5)._2,
      "largest_cluster_share" -> largestShare,
      "cat_features_with_unseen" -> unseenFeatures,
      "screened_features" -> screenFeats.size,
      "screen_sample_rows" -> screenRows,
      "whale_significant_pairs" -> whaleSig)
    Sinks.writeJson(summary, out("summary.json"))

    val report =
      s"""# EDA report (Spark-native rebuild)
         |
         |Deterministic pipeline over `$inputDir` (seeded hash sampling,
         |reference block order, `public_eda_pipeline.py:73-714` analog).
         |Memory-safe via distributed execution; all heavy blocks run as
         |Spark jobs, only post-aggregation artifacts reach the driver.
         |
         |## 1. Dataset
         |- train rows: $trainRows, test rows: $testRows
         |- targets: ${targets.size} ($rareCount below 1% prevalence)
         |- main features: ${mainFeats.size} (${mainCat.numFeatures.size} numeric / ${mainCat.catFeatures.size} categorical)
         |- extra features: ${extraCat.numFeatures.size} (heavily null)
         |
         |## 2. Target stats (top 10 by positive count)
         |${Sinks.pretty(targetStatsDf, 10)}
         |
         |## 3. Family rollup
         |${Sinks.pretty(familyStats, 10)}
         |
         |## 4. Opened-target distribution
         |${Sinks.pretty(opened.groupBy(col("n_opened")).count().orderBy(col("n_opened")), 10)}
         |
         |## 5. Strongest co-occurring target pairs (co_count ≥ 10, by lift)
         |${Sinks.pretty(pairDf.where(col("co_count") >= 10)
              .orderBy(col("pair_lift").desc, col("col_a"), col("col_b")), 10)}
         |
         |## 6. Antagonist target `$antagonist`
         |- negative-correlation share vs other targets: ${f"$antagonistNegShare%.3f"}
         |
         |## 7. Clustering on 1−|corr| (average linkage)
         |- silhouette: k=3 ${f"${byK(3)._2}%.4f"}, k=4 ${f"$sil4%.4f"}, k=5 ${f"${byK(5)._2}%.4f"}
         |- largest-cluster share at k=4: ${f"$largestShare%.3f"}
         |
         |## 8. Extra-feature missingness bands
         |${Sinks.pretty(banded.groupBy(col("band")).agg(count(lit(1)).as("n_features"))
              .orderBy(col("band")), 10)}
         |
         |## 9. Filled-extra-count signal
         |- AUC vs any-open: ${f"$filledAuc%.4f"}
         |- point-biserial r: ${f"$filledPb%.4f"} (p = ${f"$filledPbP%.3g"})
         |- deciles:
         |${Sinks.pretty(deciles, 10)}
         |
         |## 10. Top missing-indicator AUCs (30% sample)
         |${Sinks.pretty(indAuc.orderBy(col("abs_auc").desc, col("col_name")), 10)}
         |
         |## 11. Categorical dictionaries
         |- features with unseen test categories: $unseenFeatures
         |
         |## 12. Adversarial shift (20% samples)
         |- train-vs-test AUC: ${f"$advAuc%.4f"} (≈0.5 ⇒ no detectable shift)
         |
         |## 13. Linear screen (12% sample, $screenRows rows, ${screenFeats.size} features)
         |top universal features:
         |${Sinks.pretty(universality, 10)}
         |
         |## 14. Whale signals (top 10 by p-value)
         |${Sinks.pretty(whaleDf, 10)}
         |- significant (lift ≥ 2, p < 0.05): $whaleSig
         |""".stripMargin
    Sinks.writeText(report, out("report.md"))

    Result(trainRows, testRows, targets.size, rareCount,
      filledAuc, filledPb, advAuc, sil4, largestShare,
      unseenFeatures, screenFeats.size, screenRows, whaleSig)
  }
}
