package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: LLM-operator scaling curve. Replicates the sf0.1
  * documents table ×1/×10/×100 (ids offset per replica; a per-replica
  * suffix token keeps replicas NEAR-dups rather than exact dups, which
  * is the realistic shape for dedup candidate generation) and times the
  * text/dedup operators that scale with document count. Results go into
  * FIXTURES.md's scaling section. Run: `sbt "runMain graft.DevScale"`. */
object DevScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional section filter: `runMain graft.DevScale skew` runs only
    // the skew section; no args = everything.
    val want: String => Boolean =
      if (args.isEmpty) _ => true else args.toSet.contains
    if (want("llm")) llmSection(spark)
    if (want("ann")) annSection(spark)
    if (want("skew")) skewSection(spark)
    if (want("hh")) hhSection(spark)
    if (want("atrest")) atrestSection(spark)
    if (want("gates")) gatesSection(spark)
    if (want("gates12")) gates12Section(spark)
    if (want("ingest12")) ingest12Section(spark)
    if (want("gates12b")) gates12bSection(spark)
    if (want("gates12c")) gates12cSection(spark)
    if (want("gates12d")) gates12dSection(spark)
    if (want("gates12e")) gates12eSection(spark)
    if (want("gates12f")) gates12fSection(spark)
    if (want("gates12g")) gates12gSection(spark)
    if (want("gates12h")) gates12hSection(spark)
    if (want("gates13a")) gates13aSection(spark)
    if (want("gates13b")) gates13bSection(spark)
    if (want("gates13c")) gates13cSection(spark)
    if (want("gates13d")) gates13dSection(spark)
    if (want("gates13e")) gates13eSection(spark)
    if (want("gates13f")) gates13fSection(spark)
    if (want("gates13g")) gates13gSection(spark)
    if (want("gates13h")) gates13hSection(spark)
    if (want("gates13i")) gates13iSection(spark)
    if (want("gates13j")) gates13jSection(spark)
    if (want("gates13k")) gates13kSection(spark)
    if (want("gates13l")) gates13lSection(spark)
    if (want("gates14a")) gates14aSection(spark)
    if (want("gates14b")) gates14bSection(spark)
    if (want("gates14c")) gates14cSection(spark)
    if (want("gates14d")) gates14dSection(spark)
    if (want("gates14e")) gates14eSection(spark)
    if (want("gates14f")) gates14fSection(spark)
    if (want("gates14g")) gates14gSection(spark)
    if (want("gates15a")) gates15aSection(spark)
    if (want("gates15b")) gates15bSection(spark)
    if (want("gates15c")) gates15cSection(spark)
    if (want("gates15d")) gates15dSection(spark)
    if (want("gates15e")) gates15eSection(spark)
    if (want("gates16a")) gates16aSection(spark)
    if (want("gates16b")) gates16bSection(spark)
    if (want("gates16c")) gates16cSection(spark)
    spark.stop()
  }

  /** Round-16b: new-operator wave at ×1/×10/×100 (g12b dirs — all four
    * inputs replicate: documents for d18, events for t34/a38,
    * embeddings for n27). d18 — one signature aggregation (the
    * token-linear stage) + 4 banded equi self-joins from the SAME
    * signatures + pair-bounded anti-join supersetship checks (d3's
    * cost law, ×4 band layouts); t34 — one daily aggregate (scan-bound)
    * + a per-type SeqFold over day-count rows (days×types ≪ events);
    * a38 — one scan to the 5×24 cell grid + per-row p arithmetic +
    * constant-partition windows over 120 rows (scan-bound, the BH
    * frame is fixed by the test family, not the data); n27 — three
    * seeded PQ builds (10k-capped driver k-means + one encode pass
    * each) + one decode/MSE pass per m (vector-linear ×3); t35 — one
    * scan to the ≤168-cell grid per type, term folds on the cell
    * frame (scan-bound). */
  private def gates16bSection(spark: SparkSession): Unit =
    gateQueries(spark, "g16b", Seq("d18_lsh_band_sweep",
      "t34_holt_winters", "a38_bh_fdr", "n27_pq_distortion_sweep",
      "t35_seasonal_strength"))

  /** Round-16c: second new-operator wave at ×1/×10/×100. a39 — one
    * map-side-combined scan to 5 integers (scan-bound by construction);
    * u13 — three per-batch keyed latest windows + the pairwise
    * latestWins folds (per-key rows = the key's change cadence; the
    * resurrection probe is one key-keyed join on the tombstone set). */
  private def gates16cSection(spark: SparkSession): Unit =
    gateQueries(spark, "g16c", Seq("a39_cochran_armitage",
      "u13_cdc_tombstones", "x55_padding_waste"))

  /** Round-16a: dq20 on a REPLICATED customer axis at ×1/×10/×100 —
    * the g14c row ran it against the shared dir's un-replicated
    * customer copy, so its ×100 row measured nothing (a gate row whose
    * input doesn't grow is not a gate). This dir replicates customer
    * ×mult with per-replica custkey offsets and a per-replica acctbal
    * shift of 501 (one full band + 1), so the quasi-id groups keep the
    * bounded (nation, segment) vocabulary while each group's row count
    * AND its distinct sensitive-band set grow with mult — the honest
    * countDistinct stress (partial-agg dedup cannot collapse replicas
    * to the base vocabulary). */
  private def gates16aSection(spark: SparkSession): Unit = {
    Seq(1, 10, 100).foreach { mult =>
      val dir = s"/tmp/graft_scale_g16a_x$mult"
      if (!new java.io.File(s"$dir/customer.parquet").exists()) {
        val base = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
        (0 until mult).map { i =>
          base.select(
            (col("c_custkey") + lit(i.toLong * 10000000L)).as("c_custkey"),
            col("c_name"), col("c_nationkey"),
            (col("c_acctbal") + lit(i * 501.0)).as("c_acctbal"),
            col("c_mktsegment"))
        }.reduce(_ unionByName _).repartition(32)
          .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      }
      val fn = SparkEntry.queries("dq20_l_diversity")
      Bench.exec(fn(spark, dir)) // warm
      val t0 = System.nanoTime()
      Bench.exec(fn(spark, dir))
      println(f"[g16a] x$mult%-4d dq20_l_diversity           ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
  }

  /** Round-15a: SeqFold + window wave at ×1/×10/×100. t29 rides the
    * secondary-sort fold (one user-keyed exchange, spillable sort, O(1)
    * state — expect sort-linear; users scale with data); t30 is one
    * user-keyed running-max window + aggregate (linear); t31 is the
    * same shuffle with a LAG frame + six decimal sums (linear); a36 is
    * a vocab-bounded contingency grid + margins off one cell aggregate
    * (scan-bound, near-flat beyond it). */
  private def gates15aSection(spark: SparkSession): Unit =
    gateQueries(spark, "g15a", Seq("t29_cusum", "t30_drawdown",
      "t31_autocorr", "a36_cramers_v"))

  /** Round-15b: corpus/audit wave at ×1/×10/×100. x52 is one token
    * explode + token-keyed min agg + one doc-keyed attribution join
    * (token-linear; the source×quarter frame is constant); dq24 is one 10-group map-side-combined aggregate over a
    * scan (scan-bound, near-flat beyond it); n26 runs 1 index build + 4
    * probe passes over the row-bounded embeddings table (gates the
    * sweep plumbing, not corpus growth — the kernels are require-
    * capped). */
  private def gates15bSection(spark: SparkSession): Unit =
    gateQueries(spark, "g15b", Seq("x52_vocab_yield", "dq24_last_digit",
      "n26_ivf_nprobe_sweep"))

  /** Round-15c: wave-2 at ×1/×10/×100. t32 rides SeqFold (t29's curve);
    * x53 is two token-keyed aggregates + two vocab equi joins
    * (token-linear); st23 is replay-volume-bound with state O(users ×
    * touched segments), read fold O(state). */
  private def gates15cSection(spark: SparkSession): Unit =
    gateQueries(spark, "g15c", Seq("t32_kalman", "x53_collocations",
      "st23_stream_drawdown_mv"))

  /** Round-15d: wave-3 at ×1/×10/×100. a37 is one map-side-combined
    * conditional-decimal-moment aggregate over the scan (scan-bound); st24 is
    * replay-volume-bound with state O(users × slices), read = one
    * rank-successor join + one keyed decimal aggregate. */
  private def gates15dSection(spark: SparkSession): Unit =
    gateQueries(spark, "g15d", Seq("a37_trend_break",
      "st24_stream_autocorr_mv"))

  /** Round-15e: t33 at ×1/×10/×100 — one user-keyed aggregate is the
    * row-scale work; the curve math runs on the hour-grid-bounded
    * deaths frame (require-capped driver collect, the S7 class). */
  private def gates15eSection(spark: SparkSession): Unit =
    gateQueries(spark, "g15e", Seq("t33_kaplan_meier"))

  /** Round-14a: stats/window batch at ×1/×10/×100. a32 is one
    * conditional-sum scan (map-side combined — the scan IS the work,
    * expect linear); a33 rides the pooled value HISTOGRAM through
    * withGlobalCumSum (distinct values grow sublinearly vs rows for
    * repeated measures, near-linear here since event values are
    * near-distinct doubles — the honest worst case, a28's curve); w19
    * rides the distinct-price frame through withGlobalCumMax (replica
    * price offsets grow it with mult); w20 is scan + O(days×8) frame
    * work (expect scan-bound). */
  private def gates14aSection(spark: SparkSession): Unit =
    gateQueries(spark, "g14a", Seq("a32_welch_ttest", "a33_mann_whitney",
      "w19_skyline", "w20_lag_xcorr"))

  /** Round-14b: temporal batch at ×1/×10/×100. t24 — two user-keyed
    * window passes + session-grained agg (per-key rows = user cadence;
    * expect linear in events); t26 — one keyed lag window + the
    * histogram-compressed quantile pass (gap vocabulary ≪ rows; a21's
    * curve); j17 — asofJoin's single key-keyed union window shuffle +
    * one aggregate (t2's curve). */
  private def gates14bSection(spark: SparkSession): Unit =
    gateQueries(spark, "g14b", Seq("t24_session_conversion",
      "t26_interarrival", "j17_scd2_point_in_time"))

  /** Round-14c: DQ/incremental batch at ×1/×10/×100. dq20's row here
    * was vacuous (the shared dir's customer copy is un-replicated) and
    * moved to [[gates16aSection]], which replicates the customer axis
    * for real. dq21 rides the distinct (week, domain) frame (vocab ×
    * weeks bounded — expect scan-bound); u10 is three batch scans +
    * keyed 10-row folds (scan-bound; state flat). */
  private def gates14cSection(spark: SparkSession): Unit =
    gateQueries(spark, "g14c", Seq(
      "dq21_valueset_drift", "u10_incremental_psi"))

  /** Round-14d: stats/index/text batch at ×1/×10/×100. a34 — a33's
    * histogram-rank machinery + one value-keyed join (near-linear in
    * distinct values; event values are near-distinct doubles, the
    * honest worst case); u11 — three key scans + ≤1024-row BIT_OR
    * folds + one broadcast probe join (scan-bound, state flat); mm13 —
    * decode+hash is the row-scale work, the class frame is gradient-
    * vocabulary-bounded (≤96 distinct hashes) so the banded join is
    * flat; x51 — one explode + map-side-combined agg (token-linear). */
  private def gates14dSection(spark: SparkSession): Unit =
    gateQueries(spark, "g14d", Seq("a34_kruskal_wallis",
      "u11_incremental_bloom", "mm13_image_neardup_probe",
      "x51_lexical_complexity"))

  /** Round-14e: third wave at ×1/×10/×100. st21 — replay-volume-bound
    * like every st MV (state ≤1024 rows at any scale); dq22 — one
    * global range-rank + a rank-successor equi join (two shuffles of
    * the slim id column, linear); t28 — distinct (user, day) frame +
    * user-keyed window (day-level rows ≪ events); a35 — histogram
    * median pass + one conditional-sum scan (a33's curve + scan). */
  private def gates14eSection(spark: SparkSession): Unit =
    gateQueries(spark, "g14e", Seq("st21_stream_bloom_mv",
      "dq22_id_gap_islands", "t28_active_streaks", "a35_brown_forsythe"))

  /** Round-14f: fourth wave at ×1/×10/×100. t27 — one user-keyed
    * shuffle + per-user sequential fold, t18's curve (users scale with
    * data → linear; per-user array bounded by event cadence); u12 —
    * three batch scans + keyed min/max folds over the O(keys/1000)
    * zone map + one serve aggregate (scan-bound, map flat). */
  private def gates14fSection(spark: SparkSession): Unit =
    gateQueries(spark, "g14f", Seq("t27_holt_linear",
      "u12_incremental_zonemap"))

  /** Round-14g: fifth wave at ×1/×10/×100. n25 — query-bounded brute
    * kernels (require-capped; embeddings replicas row-bounded — gates
    * the pre/post-filter plumbing); dq23 — one user-keyed window over
    * slim (id, tsu); st22 — replay-volume-bound, state O(buckets). */
  private def gates14gSection(spark: SparkSession): Unit =
    gateQueries(spark, "g14g", Seq("n25_filtered_ann",
      "dq23_monotonic_audit", "st22_stream_zonemap_mv"))

  /** Round-13l: sixth operator batch at ×1/×10/×100. t25 chains three
    * decileExact range-rank passes over the USER frame (user count
    * grows with replicas — the honest distributed-NTILE cost); w18
    * rides the weeks×segments frame after one broadcast join (scan-
    * bound); dq19 is one per-feed aggregate + 1-row broadcast (flat). */
  private def gates13lSection(spark: SparkSession): Unit =
    gateQueries(spark, "g13l", Seq(
      "t25_rfm_segments", "w18_top_movers", "dq19_freshness_lag"))

  /** Round-13k: fifth operator batch at ×1/×10/×100. j16 is the
    * fact-chain shape — expect scan/shuffle-linear on lineitem⋈orders
    * with the dim broadcasts flat; u9 is one co-moment pass per batch
    * (a30's curve); n24 rides the embeddings table (row-bounded in the
    * replicas) plus the require-capped brute truth, so it gates the
    * FOLD plumbing, not corpus growth. */
  private def gates13kSection(spark: SparkSession): Unit =
    gateQueries(spark, "g13k", Seq(
      "j16_star_join", "u9_incremental_corr", "n24_incremental_ivf"))

  /** Round-13j: fourth operator batch at ×1/×10/×100. w17 rides the
    * distinct (day, user) pair table (≪ events) through a bounded 7×
    * explode — expect near-flat beyond the scan+distinct; st20's state
    * is the distinct key set (the honest exact-distinct cost — u6's
    * curve); dq18 is two key-keyed aggregates over slim (id, fp)
    * projections; p18 is a write-bound layout job (base sort + delta
    * compaction dominate). */
  private def gates13jSection(spark: SparkSession): Unit =
    gateQueries(spark, "g13j", Seq(
      "w17_sliding_distinct", "st20_stream_distinct_mv",
      "dq18_conflicting_keys", "p18_incremental_compaction"))

  /** Round-13i: third operator batch at ×1/×10/×100. st19's per-trigger
    * state is one sketch row per key (expect replay-volume cost, st17's
    * curve); x50 rides d2's pair cost law (replica suffix tokens keep
    * shingle joins intra-replica, so pair volume scales ~linearly);
    * p17 is a text round-trip + map-only parse (linear in the write+
    * scan); t23's 168-cell profile broadcasts back (scan-linear). */
  private def gates13iSection(spark: SparkSession): Unit =
    gateQueries(spark, "g13i", Seq(
      "t23_seasonal_anomaly", "p17_corrupt_record_audit",
      "x50_threshold_sweep", "st19_stream_kll_mv"))

  /** Round-13h: second operator batch at ×1/×10/×100. t21 is one
    * map-side-combined moment pass (expect a30's scan-linear curve);
    * t22 is one user-keyed window with a 5-row frame (state bounded by
    * the frame, per-key rows by change count); a31/dq17 collapse to
    * day-/pattern-count frames (flat beyond the scan). */
  private def gates13hSection(spark: SparkSession): Unit =
    gateQueries(spark, "g13h", Seq(
      "t21_trend_slope", "t22_rolling_median",
      "a31_durbin_watson", "dq17_null_patterns"))

  /** Round-13g: the session's NEW operators at ×1/×10/×100. t19's
    * boundary table is 2 rows/session (≪ events) and withGlobalCumSum
    * is one range exchange — expect ~scan-bound; t20/dq16 collapse to
    * week-/candidate-count frames (flat beyond the scan); u6's state is
    * the distinct (type, user) set — grows with replica count (user ids
    * are offset per replica) but each fold is batch-distinct + one
    * keyed anti-join; u7/st18 state is k·groups rows at EVERY scale
    * (expect flat beyond scan/replay); a30 is one map-side-combined
    * moment pass; dq15 one user-keyed window whose per-key row count is
    * change-count-bounded. */
  private def gates13gSection(spark: SparkSession): Unit =
    gateQueries(spark, "g13g", Seq(
      "t19_max_concurrency", "t20_period_over_period",
      "u6_incremental_distinct", "u7_incremental_topk",
      "a30_weighted_corr", "dq15_interval_audit",
      "dq16_candidate_keys", "st18_stream_topk_mv"))

  /** Round-13f: st17 streaming CMS maintenance at ×1/×10/×100 — the
    * fold's per-trigger state is 3×1024 counter rows regardless of
    * corpus size, so cost should track replay volume (the scan), like
    * st16. */
  private def gates13fSection(spark: SparkSession): Unit =
    gateQueries(spark, "g13f", Seq("st17_stream_cms_mv"))

  /** Round-13e: the round's NEW operators at ×1/×10/×100. a29 collapses
    * onto domain-bounded contingency cells (expect ~scan cost, flat
    * structure); h9's counters are 3×1024×shards rows (same); n22 PPR
    * has n16's exact per-iteration shape (src-keyed edge join +
    * map-side-combined sum) on the synthetic graphs (the declared query
    * rides the require-capped brute kNN builder, like n16/n20); n23's
    * peel rounds shrink the edge list monotonically — hub graph
    * included because peeling k=3 deletes most of a hub-star in round
    * one (the favorable case) while the bounded graph keeps ~all edges
    * (the worst case: 4 full-size rounds). */
  private def gates13eSection(spark: SparkSession): Unit = {
    import graft.llm.Graph
    gateQueries(spark, "g13e", Seq("a29_kendall", "h9_cms_at_rest"))
    Seq(1, 10, 100).foreach { mult =>
      def time(label: String)(body: => Unit): Unit = {
        body // warm
        val t0 = System.nanoTime()
        body
        println(f"[g13e] x$mult%-4d $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      val bounded = spark.read.parquet(ensureBoundedGraph(spark, mult))
      val hubby = spark.read.parquet(ensureHubGraph(spark, mult))
      val seeds = bounded.select(col("id_a").as("id"))
        .where(pmod(col("id"), lit(17)) === 0).distinct()
      time("ppr_bounded") { Bench.exec(Graph.personalizedPageRank(bounded, seeds, iters = 5)) }
      time("kcore_bounded") { Bench.exec(Graph.kCorePeel(bounded, k = 3, rounds = 4)) }
      time("kcore_hub") { Bench.exec(Graph.kCorePeel(hubby, k = 3, rounds = 4)) }
    }
  }

  /** Bounded-degree synthetic graph (~5 out-edges per node, no hubs —
    * the mutual-kNN contract shape), 100k·mult nodes. Idempotent. */
  private def ensureBoundedGraph(spark: SparkSession, mult: Int): String = {
    val n = 100000L * mult
    val path = s"/tmp/graft_scale_g12h_x$mult/edges.parquet"
    if (!new java.io.File(path).exists()) {
      spark.range(n).toDF("src")
        .select(col("src"), explode(array((1 to 5).map(lit(_)): _*)).as("j"))
        .select(col("src"), pmod(xxhash64(col("src"), col("j")), lit(n)).as("dst"))
        .where(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("id_a"),
          greatest(col("src"), col("dst")).as("id_b"))
        .dropDuplicates("id_a", "id_b")
        .repartition(32)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** Hub-skewed synthetic graph (gates12f's recipe: 100 hubs of degree
    * ~n/100 plus the bounded background), 100k·mult nodes. Idempotent. */
  private def ensureHubGraph(spark: SparkSession, mult: Int): String = {
    val n = 100000L * mult
    val path = s"/tmp/graft_scale_g12f_x$mult/edges.parquet"
    if (!new java.io.File(path).exists()) {
      spark.range(n).toDF("src")
        .select(col("src"), explode(array((1 to 5).map(lit(_)): _*)).as("j"))
        .select(col("src"),
          when(col("j") === 1, pmod(xxhash64(col("src"), lit("hub")), lit(100L)))
            .otherwise(pmod(xxhash64(col("src"), col("j")), lit(n))).as("dst"))
        .where(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("id_a"),
          greatest(col("src"), col("dst")).as("id_b"))
        .dropDuplicates("id_a", "id_b")
        .repartition(32)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** Shared runner: time each declared query against the replicated
    * g12b dir at ×1/×10/×100, one warm pass then one timed pass. */
  private def gateQueries(spark: SparkSession, tag: String,
      names: Seq[String], mults: Seq[Int] = Seq(1, 10, 100)): Unit = {
    mults.foreach { mult =>
      val dir = ensureG12bDir(spark, mult)
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        Bench.exec(fn(spark, dir)) // warm
        val t0 = System.nanoTime()
        Bench.exec(fn(spark, dir))
        println(f"[$tag] x$mult%-4d $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
  }

  /** Round-13a: similarity-graph community/assortativity ops whose
    * ×100 behavior was unproven (VERDICT r12 #3). The declared queries
    * build edges via knnGraphEdges, a require-capped brute kernel (10k
    * vectors — exactly its documented contract), so the scale gate runs
    * the OPERATORS directly on gates12h's synthetic edge lists: the
    * bounded-degree graph (the mutual-kNN contract shape) AND the
    * hub-skewed one (100 hubs of degree ~n/100 — LPA's worst case: the
    * per-round neighbor join fans a hub's label to all its neighbors,
    * but rows stay (id, lbl)-keyed so no single reducer eats a hub).
    * n20 — 4 rounds of neighbor join + mode agg (expect near-linear in
    * edges); n21 — five integer sums over the edge list (linear). */
  private def gates13aSection(spark: SparkSession): Unit = {
    import graft.llm.Graph
    Seq(1, 10, 100).foreach { mult =>
      def time(label: String)(body: => Unit): Unit = {
        body // warm
        val t0 = System.nanoTime()
        body
        println(f"[g13a] x$mult%-4d $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      val bounded = spark.read.parquet(ensureBoundedGraph(spark, mult))
      val hubby = spark.read.parquet(ensureHubGraph(spark, mult))
      time("lpa_bounded") { Bench.exec(Graph.labelPropagation(bounded, iters = 4)) }
      time("lpa_hub") { Bench.exec(Graph.labelPropagation(hubby, iters = 4)) }
      time("assortativity_bounded") { Bench.exec(Graph.assortativity(bounded)) }
      time("assortativity_hub") { Bench.exec(Graph.assortativity(hubby)) }
    }
  }

  /** Round-13b: the percentile-class rewrites (VERDICT r12 #1). All
    * four previously buffered full columns in ≤5 built-in exact
    * percentile/median aggregation buffers — the a21/h7 OOM class,
    * heap-dead at ×100. Now all ride weightedQuantiles' histogram-
    * compressed pass (a26/a7 on value histograms; dq3's MAD medians on
    * near-distinct doubles — the worst case, where compression buys
    * little and the per-group spillable window sort is the load-bearing
    * difference; dq9 on per-key count histograms). Expect: finite,
    * near-linear, no OOM. */
  private def gates13bSection(spark: SparkSession): Unit =
    gateQueries(spark, "g13b", Seq("a7_groupby_median", "a26_trimmed_stats",
      "dq3_outlier_mad", "dq9_skew_profile"))

  /** Round-13c: remaining ungated round-12 batch (VERDICT r12 #3).
    * a28 — two distributed prefix-sum ranks + value-keyed joins (the
    * most expensive ungated entry; expect near-linear, no OOM); t18 —
    * one user-keyed shuffle, per-user sequential fold (users scale with
    * data → linear); x49 — d1's fingerprint groupBy + slim semi-join
    * (linear); dq14 — parquet-footer metadata only (flat). */
  private def gates13cSection(spark: SparkSession): Unit =
    gateQueries(spark, "g13c", Seq("a28_spearman", "t18_ewma",
      "x49_dedup_savings", "dq14_schema_drift"))

  /** Round-13d: incremental/maintenance ops (VERDICT r12 #3 + u5). u4 —
    * per-batch delta⋈broadcast-dim; fact history scales ×100 but each
    * fold touches only its batch (expect linear in TOTAL because the
    * fixture folds thirds of the whole table — the per-batch claim is
    * batch-size-bound, measured by the flat ingest12 tables); u5 — fold
    * is O(batch + touched keys), but the materialized output unions the
    * full closed history (scan-only pass-through, no shuffle) → expect
    * linear scan cost, shuffles batch-sized; st16 — streaming replay,
    * per-trigger state is k category rows (expect cost ~ replay volume);
    * p16 — footer stats over a fixed file manifest (flat-ish). */
  private def gates13dSection(spark: SparkSession): Unit =
    gateQueries(spark, "g13d", Seq("u4_incremental_join", "u5_scd2_incremental",
      "st16_stream_drift_monitor", "p16_rowgroup_pruning"))

  /** Round-12h: this session's new operators at ×1/×10/×100.
    * Link prediction on a bounded-degree graph (the mutual-kNN contract
    * shape: deg ≤ ~10, exact scores — expect near-linear) AND on the
    * gates12f hub-skewed graph with the maxHubDegree=64 guard (expect
    * near-linear BECAUSE the cap prunes hub wedges; uncapped would be
    * quadratic in the ~1k–100k hub degrees). Chi-square drift replays
    * events with user offsets (k-row shuffles — expect flat beyond the
    * scan). VAD runs spark.range-driven synthetic clips (map-only real
    * codec both directions — expect linear). */
  private def gates12hSection(spark: SparkSession): Unit = {
    import graft.llm.{Graph, Multimodal}
    import graft.core.Validation
    Seq(1, 10, 100).foreach { mult =>
      def time(label: String)(body: => Unit): Unit = {
        body // warm
        val t0 = System.nanoTime()
        body
        println(f"[g12h] x$mult%-4d $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      val bounded = spark.read.parquet(ensureBoundedGraph(spark, mult))
      time("linkpred_bounded") { Bench.exec(Graph.linkPredictionPlan(bounded)) }
      val hubby = spark.read.parquet(ensureHubGraph(spark, mult))
      time("linkpred_hub_cap") {
        Bench.exec(Graph.linkPredictionPlan(hubby, maxHubDegree = Some(64L)))
      }
      val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      val evN = Seq.tabulate(mult) { i =>
        ev.withColumn("user_id", col("user_id") + lit(i * 10000000L))
      }.reduce(_ unionAll _)
      time("chi2_drift") {
        Bench.exec(Validation.chiSquareDrift(
          evN.where(pmod(col("user_id"), lit(2)) === 0),
          evN.where(pmod(col("user_id"), lit(2)) === 1), "event_type"))
      }
      val clips = spark.range(20000L * mult).toDF("doc_id")
      time("vad_segments") {
        Bench.exec(Multimodal.vadSegments(Multimodal.fromDocumentsWavVad(clips)))
      }
    }
  }

  /** Round-12g: the new text/event operators at ×1/×10/×100.
    * Documents replicate with id offsets + a per-replica suffix token,
    * KEEPING the source column (sources do NOT multiply with corpus
    * size — the realistic mixture shape: more docs per domain, same
    * domains): d16's per-source shingle sets and x47's per-(source,
    * bigram) count tables grow with content, the S² pair structure
    * stays fixed. Events replicate with user offsets (t15's per-user
    * gap windows and t17's staged joins scale with user population). */
  private def gates12gSection(spark: SparkSession): Unit = {
    val docsBase = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val eventsBase = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    Seq(1, 10, 100).foreach { mult =>
      val dir = s"/tmp/graft_scale_g12g_x$mult"
      if (!new java.io.File(s"$dir/documents.parquet").exists()) {
        (0 until mult).map { i =>
          docsBase.select(
            (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
            concat(col("text"), lit(s" g$i")).as("text"),
            col("lang"), col("source"), col("n_chars"))
        }.reduce(_ unionByName _).repartition(32)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        (0 until mult).map { i =>
          eventsBase.select(
            (col("event_id") + lit(i.toLong * 100000000L)).as("event_id"),
            col("ts"),
            (col("user_id") + lit(i.toLong * 1000000L)).as("user_id"),
            col("event_type"), col("value"), col("props"))
        }.reduce(_ unionByName _).repartition(32)
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
      }
      Seq("d16_source_overlap", "x47_cross_entropy", "t15_burstiness",
          "t17_funnel").foreach { name =>
        val fn = SparkEntry.queries(name)
        Bench.exec(fn(spark, dir)) // warm
        val t0 = System.nanoTime()
        Bench.exec(fn(spark, dir))
        println(f"[g12g] x$mult%-4d $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
  }

  /** Round-12f: graph operators (Graph.triangleStats / pageRankFixed)
    * at ×1/×10/×100 on a SYNTHETIC hub-skewed similarity graph —
    * the kNN edge builder is deliberately bypassed (its brute kernel
    * is the bounded exact path; the graph ops must scale past it).
    * Shape: n nodes (100k ×mult), ~5 pseudo-random edges per node via
    * xxhash64 (deterministic, no RNG), one of which lands in a 100-node
    * HUB range — at ×100 each hub holds ~100k neighbors, exactly the
    * skew that breaks a naive wedge join (hub deg² ≈ 10^10 wedges) and
    * that degree orientation must neutralize (hubs never wedge-fan as
    * sources). Expected: near-linear for both ops; PageRank flat-ish
    * per iteration count. */
  private def gates12fSection(spark: SparkSession): Unit = {
    import graft.llm.Graph
    Seq(1, 10, 100).foreach { mult =>
      val n = 100000L * mult
      val dir = s"/tmp/graft_scale_g12f_x$mult"
      if (!new java.io.File(s"$dir/edges.parquet").exists()) {
        spark.range(n).toDF("src")
          .select(col("src"),
            explode(array((1 to 5).map(lit(_)): _*)).as("j"))
          .select(col("src"),
            when(col("j") === 1, pmod(xxhash64(col("src"), lit("hub")), lit(100L)))
              .otherwise(pmod(xxhash64(col("src"), col("j")), lit(n))).as("dst"))
          .where(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("id_a"),
            greatest(col("src"), col("dst")).as("id_b"))
          .dropDuplicates("id_a", "id_b")
          .repartition(32)
          .write.mode("overwrite").parquet(s"$dir/edges.parquet")
      }
      val edges = spark.read.parquet(s"$dir/edges.parquet")
      def time(label: String)(body: => Unit): Unit = {
        body // warm
        val t0 = System.nanoTime()
        body
        println(f"[g12f] x$mult%-4d $label%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      time("triangle_stats") { Bench.exec(Graph.triangleStats(edges)) }
      time("pagerank_fixed") { Bench.exec(Graph.pageRankFixed(edges, iters = 5)) }
    }
  }

  /** Round-12 operators at ×1/×10/×100: lineitem replicated with order-key
    * offsets (rj2 interval-overlap — span count scales linearly), orders
    * with key offsets (dq6 profile diff — a fixed-width aggregate over
    * growing rows), events with user offsets (t8 rolling anomalies — per-
    * user windows, user population scales), documents with id offsets +
    * replica suffix (x37 novelty — shingle vocabulary AND doc count
    * scale). Expected: near-linear, shuffles keyed on bucket/column/user/
    * shingle, no single-reducer stage. Results → PLANS.md round-12. */
  private def gates12Section(spark: SparkSession): Unit = {
    val lineBase = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val ordersBase = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    val eventsBase = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    val docsBase = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    Seq(1, 10, 100).foreach { mult =>
      val dir = s"/tmp/graft_scale_g12_x$mult"
      if (!new java.io.File(s"$dir/lineitem.parquet").exists()) {
        (0 until mult).map { i =>
          lineBase.select(
            (col("l_orderkey") + lit(i.toLong * 100000000L)).as("l_orderkey"),
            col("l_shipdate"))
        }.reduce(_ unionByName _).repartition(32)
          .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
        (0 until mult).map { i =>
          ordersBase.select(
            (col("o_orderkey") + lit(i.toLong * 100000000L)).as("o_orderkey"),
            col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
            col("o_orderpriority"))
        }.reduce(_ unionByName _).repartition(32)
          .write.mode("overwrite").parquet(s"$dir/orders.parquet")
        (0 until mult).map { i =>
          eventsBase.select(
            (col("event_id") + lit(i.toLong * 100000000L)).as("event_id"),
            col("ts"),
            (col("user_id") + lit(i.toLong * 1000000L)).as("user_id"),
            col("event_type"), col("value"), col("props"))
        }.reduce(_ unionByName _).repartition(32)
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
        (0 until mult).map { i =>
          docsBase.select(
            (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
            concat(col("text"), lit(s" v$i")).as("text"))
        }.reduce(_ unionByName _).repartition(32)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      }
      Seq("rj2_interval_overlap", "dq6_profile_diff", "t8_rolling_anomaly",
          "x37_ngram_novelty").foreach { name =>
        val fn = SparkEntry.queries(name)
        Bench.exec(fn(spark, dir)) // warm
        val t0 = System.nanoTime()
        Bench.exec(fn(spark, dir))
        println(f"[g12] x$mult%-4d $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
  }

  /** Round-12b operators at ×1/×10/×100 — the second batch of this
    * round's additions (FD/RI/skew audits, weighted quantiles,
    * distribution windows, tolerance as-of, leakage split, vocab OOV).
    * Replication recipe: orders/lineitem with order-key offsets
    * (custkeys and the customer/nation dims stay FIXED, so the dq8 FK
    * structure holds and per-key row counts grow — the legit key-growth
    * mode for dq9), events with user offsets (t2b's user population
    * scales), documents with id offsets + per-replica token suffixes
    * (x39's near-dup structure scales linearly, no cross-replica
    * pairs). Expected: near-linear everywhere; every shuffle keyed on
    * key/user/token/cluster; SinglePartition only above one-row
    * summaries. Results → PLANS.md round-12. */
  /** Build (once) and return the g12b replicated dir for `mult` — shared
    * by gates12b and gates12c (same replication recipe, see gates12b
    * scaladoc). */
  private def ensureG12bDir(spark: SparkSession, mult: Int): String = {
    val sf = "/root/testdata/sf0.1"
    val ordersBase = spark.read.parquet(s"$sf/orders.parquet")
    val lineBase = spark.read.parquet(s"$sf/lineitem.parquet")
    val eventsBase = spark.read.parquet(s"$sf/events.parquet")
    val docsBase = spark.read.parquet(s"$sf/documents.parquet")
    val dir = s"/tmp/graft_scale_g12b_x$mult"
    if (!new java.io.File(s"$dir/orders.parquet").exists()) {
        (0 until mult).map { i =>
          ordersBase.select(
            (col("o_orderkey") + lit(i.toLong * 100000000L)).as("o_orderkey"),
            col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
            col("o_orderdate"), col("o_orderpriority"))
        }.reduce(_ unionByName _).repartition(32)
          .write.mode("overwrite").parquet(s"$dir/orders.parquet")
        (0 until mult).map { i =>
          lineBase.select(
            (col("l_orderkey") + lit(i.toLong * 100000000L)).as("l_orderkey"),
            col("l_linenumber"),
            col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            col("l_returnflag"))
        }.reduce(_ unionByName _).repartition(32)
          .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
        (0 until mult).map { i =>
          eventsBase.select(
            (col("event_id") + lit(i.toLong * 100000000L)).as("event_id"),
            col("ts"),
            (col("user_id") + lit(i.toLong * 1000000L)).as("user_id"),
            col("event_type"), col("value"), col("props"))
        }.reduce(_ unionByName _).repartition(32)
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
        (0 until mult).map { i =>
          docsBase.select(
            (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
            concat_ws(" ", transform(split(col("text"), " "),
              t => concat(t, lit(s"_$i")))).as("text"),
            col("n_chars"), col("source"))
        }.reduce(_ unionByName _).repartition(32)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        spark.read.parquet(s"$sf/customer.parquet")
          .write.mode("overwrite").parquet(s"$dir/customer.parquet")
        spark.read.parquet(s"$sf/nation.parquet")
          .write.mode("overwrite").parquet(s"$dir/nation.parquet")
        spark.read.parquet(s"$sf/region.parquet")
          .write.mode("overwrite").parquet(s"$dir/region.parquet")
    }
    // region added later (gates13k — j16's third dimension hop) —
    // backfill into dirs built before
    if (!new java.io.File(s"$dir/region.parquet").exists()) {
      spark.read.parquet(s"$sf/region.parquet")
        .write.mode("overwrite").parquet(s"$dir/region.parquet")
    }
    // l_linenumber (gates13 — a28 ranks on it) and l_discount (gates13g
    // — a30's y column) added later — backfill into dirs built before by
    // rewriting ONLY the lineitem file
    if (new java.io.File(s"$dir/lineitem.parquet").exists() && {
        val cols = spark.read.parquet(s"$dir/lineitem.parquet").columns
        !cols.contains("l_linenumber") || !cols.contains("l_discount")
      }) {
      val rebuilt = (0 until mult).map { i =>
        lineBase.select(
          (col("l_orderkey") + lit(i.toLong * 100000000L)).as("l_orderkey"),
          col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_returnflag"))
      }.reduce(_ unionByName _).repartition(32) // reads sf0.1, not the target
      rebuilt.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    }
    // part added later (gates14a — w19 skyline) — backfill into dirs
    // built before; the per-replica PRICE offset keeps the distinct-price
    // frame (the frame withGlobalCumMax actually rides) growing with
    // mult instead of collapsing to the base vocabulary
    if (!new java.io.File(s"$dir/part.parquet").exists()) {
      val partBase = spark.read.parquet(s"$sf/part.parquet")
      (0 until mult).map { i =>
        partBase.select(
          (col("p_partkey") + lit(i.toLong * 10000000L)).as("p_partkey"),
          col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
          (col("p_retailprice") + lit(i * 0.01)).as("p_retailprice"))
      }.reduce(_ unionByName _).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/part.parquet")
    }
    // embeddings added later (gates12d) — backfill into dirs built before
    if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
      val embBase = spark.read.parquet(s"$sf/embeddings.parquet")
      (0 until mult).map { i =>
        embBase.select(
          (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          col("embedding"), col("label"))
      }.reduce(_ unionByName _).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    dir
  }

  private def gates12bSection(spark: SparkSession): Unit = {
    Seq(1, 10, 100).foreach { mult =>
      val dir = ensureG12bDir(spark, mult)
      Seq("dq7_functional_deps", "dq8_referential_integrity", "dq9_skew_profile",
          "a21_weighted_quantiles", "w14_distribution_windows", "t2b_asof_tolerance",
          "x39_leakage_safe_split", "x40_vocab_oov").foreach { name =>
        val fn = SparkEntry.queries(name)
        Bench.exec(fn(spark, dir)) // warm
        val t0 = System.nanoTime()
        Bench.exec(fn(spark, dir))
        println(f"[g12b] x$mult%-4d $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
  }

  /** Round-12d operators at ×1/×10/×100 (same g12b dirs + replicated
    * embeddings): dq10 one 9-group aggregate (linear scan cost only);
    * t11 user-keyed daily agg + window (users scale with data); x41
    * withGlobalRank over the type vocabulary (vocab grows slowly); x42
    * map-only corpus stream vs fixed broadcast eval set (should track
    * scan cost); st13 streaming replay with HLL state (state rows =
    * windows×types, constant). */
  private def gates12dSection(spark: SparkSession): Unit = {
    Seq(1, 10, 100).foreach { mult =>
      val dir = ensureG12bDir(spark, mult)
      Seq("dq10_benford", "t11_cusum_drift", "x41_zipf_slope",
          "x42_semantic_decontam", "st13_stream_hll_window").foreach { name =>
        val fn = SparkEntry.queries(name)
        Bench.exec(fn(spark, dir)) // warm
        val t0 = System.nanoTime()
        Bench.exec(fn(spark, dir))
        println(f"[g12d] x$mult%-4d $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
  }

  /** Round-12e operators at ×1/×10/×100 (same g12b dirs): p13 compaction
    * IO scales with bytes; st14 native session windows — state rows =
    * active sessions, users scale with data; n13 JL shortlist — map-only
    * projection + brute kernel over compressed vectors; v2 centroid/
    * distance/MAD — dim-keyed and label-keyed aggregates; d15 shares
    * d2/d6's pair-generation scaling (per-replica token suffixes keep
    * dup structure linear). */
  private def gates12eSection(spark: SparkSession): Unit = {
    Seq(1, 10, 100).foreach { mult =>
      val dir = ensureG12bDir(spark, mult)
      Seq("p13_compaction", "st14_session_window", "n13_ann_jl",
          "v2_embed_outliers", "d15_cluster_size_profile").foreach { name =>
        val fn = SparkEntry.queries(name)
        Bench.exec(fn(spark, dir)) // warm
        val t0 = System.nanoTime()
        Bench.exec(fn(spark, dir))
        println(f"[g12e] x$mult%-4d $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
  }

  /** Round-12c operators at ×1/×10/×100 (same g12b replicated dirs):
    * w14b — the withGroupRank rewrite whose whole point is beating w14's
    * parallelism=group-count wall (17 s at ×100); h6/h7 — sketch
    * build+merge should stay map-side-combined linear; t9/t10 — one
    * user-keyed window each, user population scales with data. */
  private def gates12cSection(spark: SparkSession): Unit = {
    Seq(1, 10, 100).foreach { mult =>
      val dir = ensureG12bDir(spark, mult)
      Seq("w14_distribution_windows", "w14b_distribution_scalable",
          "h6_hll_at_rest", "h7_kll_at_rest",
          "t9_scd2_intervals", "t10_attribution").foreach { name =>
        val fn = SparkEntry.queries(name)
        Bench.exec(fn(spark, dir)) // warm
        val t0 = System.nanoTime()
        Bench.exec(fn(spark, dir))
        println(f"[g12c] x$mult%-4d $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
  }

  /** st10/st11 rolling-ingest cross-scale evidence (VERDICT r11 #6):
    * per-batch ingest wall-clock as the AT-REST index grows ×1/×10/×100,
    * through the production [[RunIngest]] state layout.
    *
    * Text: sf0.1 documents replicated with id offsets + a per-replica
    * token SUFFIX ON EVERY WORD — replicas share no shingles, so each
    * replica reproduces the corpus's internal near-dup structure with
    * zero cross-replica pairs (the corpus grows, the dup structure scales
    * linearly, no quadratic blowup). After seeding the state, THREE
    * fresh 1000-doc batches (replica-0 texts at fresh ids — every batch
    * doc is a true near-dup of one at-rest doc, so the probe does real
    * verify work) are ingested and timed individually with
    * `summarize = false` (no O(state) recounts in the timed path).
    *
    * Embedding twin: sf0.1 embeddings replicated with dim-ROLLS
    * (cosine-invariant within a replica, decorrelated across; replicas
    * ≥ 64 also sign-flip), probed with three fresh 500-vector replica-0
    * batches via [[RunIngest.ingestEmbedOnce]].
    *
    * Expected: per-batch cost tracks BATCH size — near-flat as the
    * at-rest index grows 100× (the probe is a band equi-join against the
    * index with the batch side broadcast-small; at-rest growth shows up
    * only through index scan width). Results → PLANS.md round-12. */
  private def ingest12Section(spark: SparkSession): Unit = {
    import graft.llm.Dedup
    val docsBase = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val embBase = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def suffixed(r: Int) = docsBase.select(
      (col("doc_id") + lit(r.toLong * 10000000L)).as("doc_id"),
      concat_ws(" ", transform(split(col("text"), " "),
        t => concat(t, lit(s"_$r")))).as("text"))
    def rolled(r: Int) = {
      val k = r % 64
      val roll =
        if (k == 0) col("embedding")
        else concat(slice(col("embedding"), k + 1, 64 - k), slice(col("embedding"), 1, k))
      val v = if (r >= 64) transform(roll, x => -x) else roll
      embBase.select((col("vec_id") + lit(r.toLong * 10000000L)).as("vec_id"),
        v.as("embedding"))
    }
    Seq(1, 10, 100).foreach { mult =>
      val work = java.nio.file.Files.createTempDirectory(s"graft_ing12_x$mult")
      // ---- text (st10 family, RunIngest CLI layout) ----
      val seedPath = work.resolve("seed.parquet").toString
      (0 until mult).map(suffixed).reduce(_ unionByName _)
        .repartition(32).write.parquet(seedPath)
      val state = work.resolve("state").toString
      var t0 = System.nanoTime()
      RunIngest.ingestOnce(spark, seedPath, state, summarize = false)
      println(f"[ing12] x$mult%-4d text seed (${5000 * mult}%7d docs) " +
        f"${(System.nanoTime() - t0) / 1e9}%8.2f s")
      (1 to 3).foreach { b =>
        val bp = work.resolve(s"batch_$b.parquet").toString
        // disjoint 1000-doc slices so successive batches near-dup the
        // AT-REST corpus, not each other (pair count stays comparable)
        docsBase.where(col("doc_id") >= (b - 1) * 1000L && col("doc_id") < b * 1000L)
          .select(
            (col("doc_id") + lit(900000000L + b * 1000000L)).as("doc_id"),
            concat_ws(" ", transform(split(col("text"), " "),
              t => concat(t, lit("_0")))).as("text"))
          .repartition(8).write.parquet(bp)
        t0 = System.nanoTime()
        val s = RunIngest.ingestOnce(spark, bp, state, summarize = false)
        println(f"[ing12] x$mult%-4d text batch$b (1000 docs)  " +
          f"${(System.nanoTime() - t0) / 1e9}%8.2f s  $s")
      }
      println(s"[ing12] x$mult text band census: " + Dedup.bandBucketStats(
        spark.read.parquet(s"$state/index")).head().toString)
      // ---- embedding (st11 family) ----
      val eSeedPath = work.resolve("eseed.parquet").toString
      (0 until mult).map(rolled).reduce(_ unionByName _)
        .repartition(32).write.parquet(eSeedPath)
      val eState = work.resolve("estate").toString
      // 8-bit bands (64 planes / 8 bands): expected bucket ≈ N/256 stays
      // under the 1024 star-cap through ×100 (200k vecs) — the sizing
      // rule in ingestEmbedOnce's doc; the 16/8 default's 2-bit bands
      // measurably collapse probe recall at ×10 (capped buckets).
      // The at-rest state is built DIRECTLY (cosineIndex + vecs), as
      // production does: ingesting the whole corpus as one "seed batch"
      // would run the batch-internal pair join too, whose candidate mass
      // grows ~ buckets·(N/buckets)²/2 — measured OOM at ×100; bounded
      // daily batches never see that term.
      val eSeed = spark.read.parquet(eSeedPath)
      t0 = System.nanoTime()
      Dedup.cosineIndex(eSeed, "vec_id", "embedding", dim = 64,
          nPlanes = 64, nBands = 8)
        .write.parquet(s"$eState/index")
      eSeed.select(col("vec_id"), col("embedding")).write.parquet(s"$eState/vecs")
      println(f"[ing12] x$mult%-4d embed at-rest build (${2000 * mult}%7d vecs) " +
        f"${(System.nanoTime() - t0) / 1e9}%8.2f s")
      (1 to 3).foreach { b =>
        val bp = work.resolve(s"ebatch_$b.parquet").toString
        embBase.where(col("vec_id") >= (b - 1) * 500L && col("vec_id") < b * 500L)
          .select(
            (col("vec_id") + lit(900000000L + b * 1000000L)).as("vec_id"), col("embedding"))
          .repartition(8).write.parquet(bp)
        t0 = System.nanoTime()
        val s = RunIngest.ingestEmbedOnce(spark, bp, eState,
          nPlanes = 64, nBands = 8, summarize = false)
        println(f"[ing12] x$mult%-4d embed batch$b (500 vecs)   " +
          f"${(System.nanoTime() - t0) / 1e9}%8.2f s  $s")
      }
      println(s"[ing12] x$mult embed band census: " + Dedup.bandBucketStats(
        spark.read.parquet(s"$eState/index")).head().toString)
    }
  }

  /** Round-11 data-quality/time-series gates at ×1/×10/×100: orders
    * replicated with key offsets (dq2 PSI, dq3 MAD outliers), events
    * replicated with user-id offsets so the USER population scales
    * (t5 gap-fill calendar spine and t6 funnel state grow with users —
    * the dimension that matters for their windows). The expected curve:
    * near-linear in rows with shuffles keyed on bin/group/user — no
    * single-reducer stage anywhere. Results → PLANS.md round-11. */
  private def gatesSection(spark: SparkSession): Unit = {
    val ordersBase = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    val eventsBase = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    Seq(1, 10, 100).foreach { mult =>
      val dir = s"/tmp/graft_scale_gates_x$mult"
      if (!new java.io.File(s"$dir/orders.parquet").exists()) {
        (0 until mult).map { i =>
          ordersBase.select(
            (col("o_orderkey") + lit(i.toLong * 100000000L)).as("o_orderkey"),
            col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
            col("o_orderpriority"))
        }.reduce(_ unionByName _).repartition(32)
          .write.mode("overwrite").parquet(s"$dir/orders.parquet")
        (0 until mult).map { i =>
          eventsBase.select(
            (col("event_id") + lit(i.toLong * 100000000L)).as("event_id"),
            col("ts"),
            (col("user_id") + lit(i.toLong * 1000000L)).as("user_id"),
            col("event_type"), col("value"), col("props"))
        }.reduce(_ unionByName _).repartition(32)
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
      }
      Seq("dq2_drift_psi", "dq3_outlier_mad", "t5_gapfill", "t6_funnel").foreach { name =>
        val fn = SparkEntry.queries(name)
        Bench.exec(fn(spark, dir)) // warm
        val t0 = System.nanoTime()
        Bench.exec(fn(spark, dir))
        println(f"[gates] x$mult%-4d $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
  }

  /** n7–n9 at-rest ANN serving evidence (VERDICT r10 #7): probe
    * wall-clock and the MEASURED partition-pruning ratio as the corpus
    * grows ×1/×10/×100 (sf0.1 embeddings replicated with id offsets —
    * same recipe as [[annSection]]). For each scale the IVF assignments /
    * PQ codes / IVF+PQ residual codes are written in their at-rest
    * layouts (partitionBy(cell) where celled), then the warm
    * steady-state probe is timed and the fraction of index rows inside
    * the probed-cell union is counted — the bytes a cell-pruned scan
    * touches vs what an unpartitioned scan would. 3 queries × nprobe=4
    * keeps the union strictly under nlist=16 so the ratio is
    * informative. Results → PLANS.md round-11 section. */
  private def atrestSection(spark: SparkSession): Unit = {
    import graft.llm.Similarity
    val embBase = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val qs = embBase.where(col("vec_id") < 3).localCheckpoint(true)
    def timeWarm(mk: => DataFrame): Double = {
      Bench.exec(mk) // warm: plan analysis + codegen
      val t0 = System.nanoTime()
      Bench.exec(mk)
      (System.nanoTime() - t0) / 1e9
    }
    def rmTree(p: String): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
        .toSeq.reverseIterator.foreach(java.nio.file.Files.deleteIfExists(_))
    }
    Seq(1, 10, 100).foreach { mult =>
      val reps = (0 until mult).map { i =>
        embBase.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          col("embedding"))
      }
      val emb = reps.reduce(_ unionByName _).repartition(32).localCheckpoint(true)
      val nVec = emb.count()
      // IVF assignments at rest, celled
      val ivfDir = java.nio.file.Files.createTempDirectory("graft_dev_ivf").toString
      val (assigned, cents) = Similarity.ivfIndex(emb, "vec_id", "embedding")
      assigned.write.mode("overwrite").partitionBy("cell").parquet(ivfDir)
      val atRest = spark.read.parquet(ivfDir)
      val probe = Similarity.ivfTopKFromIndex(atRest, cents, qs, "vec_id", "embedding", k = 3)
      val plan = probe.queryExecution.executedPlan.toString
      // the pruned scan renders the cell filter as IN (...) below 10
      // values and INSET above — accept both
      val probedCells = "cell#\\d+L? (?:IN \\(([^)]*)\\)|INSET ([0-9, ]+))".r
        .findFirstMatchIn(plan)
        .map(m => Option(m.group(1)).getOrElse(m.group(2))
          .split(",").map(_.trim.toInt).toSeq)
        .getOrElse(Seq.empty)
      val prunedAtScan = plan.linesIterator
        .exists(l => l.contains("PartitionFilters") && l.contains("cell") &&
          (l.contains("IN (") || l.contains("INSET")))
      val rowsProbed =
        if (probedCells.isEmpty) -1L
        else atRest.where(col("cell").isin(probedCells: _*)).count()
      val tIvf = timeWarm(
        Similarity.ivfTopKFromIndex(atRest, cents, qs, "vec_id", "embedding", k = 3))
      println(f"[atrest] x$mult%-4d ivf:   corpus=$nVec%8d " +
        f"cells=${probedCells.size}%2d/16 rows_probed=$rowsProbed%8d " +
        f"(${100.0 * rowsProbed / (nVec max 1)}%5.1f%%) scan_pruned=$prunedAtScan " +
        f"probe=$tIvf%6.2f s")
      rmTree(ivfDir)
      // PQ codes at rest (unpartitioned — the ADC pass scans all codes;
      // the at-rest win is 8 bytes/vec vs 512 of raw doubles)
      val pqDir = java.nio.file.Files.createTempDirectory("graft_dev_pq").toString
      val (codes, books) = Similarity.pqIndex(emb, "vec_id", "embedding", dim = 64)
      codes.write.mode("overwrite").parquet(pqDir)
      val codesAtRest = spark.read.parquet(pqDir)
      val tPq = timeWarm(Similarity.pqTopKFromIndex(
        codesAtRest, books, emb, qs, "vec_id", "embedding", k = 3, refine = 22))
      println(f"[atrest] x$mult%-4d pq:    codes=$nVec%8d probe=$tPq%6.2f s")
      rmTree(pqDir)
      // IVF+PQ residual codes at rest, celled — pruning AND compactness
      val ipqDir = java.nio.file.Files.createTempDirectory("graft_dev_ivfpq").toString
      val built = Similarity.ivfPqIndex(emb, "vec_id", "embedding", dim = 64, nlist = 16)
      built.codes.write.mode("overwrite").partitionBy("cell").parquet(ipqDir)
      val idx = built.copy(codes = spark.read.parquet(ipqDir))
      val tIpq = timeWarm(Similarity.ivfPqTopKFromIndex(
        idx, emb, qs, "vec_id", "embedding", k = 3, nprobe = 8, refine = 22))
      println(f"[atrest] x$mult%-4d ivfpq: probe=$tIpq%6.2f s (nprobe=8/16)")
      rmTree(ipqDir)
    }
  }

  /** x28 heavy-hitters evidence: the recount exchange must be bounded
    * by the SKETCH (≤ partitions×k candidate terms), not the
    * vocabulary. Each replica row gains a UNIQUE hapax token (the
    * realistic web-corpus shape: vocabulary grows linearly with corpus
    * size while the head distribution stays put), so a naive
    * groupBy(term) exchange carries ~partitions×|vocab| post-combine
    * rows while the two-pass recount carries ≤ partitions×|candidates|
    * — candidates provably ≤ partitions×k however large the corpus. */
  private def hhSection(spark: SparkSession): Unit = {
    import graft.llm.{Frequency, Retrieval}
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val k = 40
    Seq(1, 10, 100).foreach { mult =>
      val reps = (0 until mult).map { i =>
        val id = col("doc_id") + lit(i.toLong * 10000000L)
        base.select(id.as("doc_id"),
          concat(col("text"), lit(" u"), id.cast("string")).as("text"))
      }
      val docs = reps.reduce(_ unionByName _).repartition(32)
      val toks = docs.select(explode(Retrieval.tokenize(col("text"))).as("term"))
      val nToks = toks.count()
      val vocab = toks.distinct().count()
      import org.apache.spark.sql.Encoders
      val candidates = toks.select(col("term")).as[String](Encoders.STRING)
        .mapPartitions(it => Frequency.misraGries(it, k).keysIterator)(Encoders.STRING)
        .toDF("term").distinct()
      val nCand = candidates.count()
      val t0 = System.nanoTime()
      Bench.exec(Frequency.heavyHitters(docs, "text", k))
      println(f"[hh-scale] x$mult%-4d tokens=$nToks%11d vocab=$vocab%9d " +
        f"candidates=$nCand%5d cand_bound=${32 * k} " +
        f"naive_exchange~${32L * vocab}%11d recount_exchange~${32L * nCand}%8d " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%6.2f s ok=${nCand <= 32L * k}")
    }
  }

  private def llmSection(spark: SparkSession): Unit = {
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    val linearOps = Seq("x18_gopher_gates", "d10_substring_dedup", "d1_exact_dedup",
      "x1_token_stats", "x2_lang_id", "x21_line_dedup", "x23_bpe_pairs")
    val queriesPerMult: Map[Int, Seq[String]] = Map(
      1 -> (linearOps :+ "d3_minhash_lsh"),
      10 -> (linearOps :+ "d3_minhash_lsh"),
      // ×100: pairwise-output dedup is intentionally excluded — a corpus
      // where every doc has 99 near-twins makes the PAIR OUTPUT itself
      // quadratic in dup multiplicity (24.7M true pairs); that is the
      // operator's contract, not a scaling defect. The linear-output ops
      // are the curve.
      100 -> linearOps)

    queriesPerMult.keys.toSeq.sorted.foreach { mult =>
      val dir = s"/tmp/graft_scale_x$mult"
      val docsPath = new java.io.File(s"$dir/documents.parquet")
      if (!docsPath.exists()) {
        val reps = (0 until mult).map { i =>
          base.select(
            (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
            concat(col("text"), lit(s" v$i")).as("text"),
            col("lang"), col("source"), col("n_chars"))
        }
        reps.reduce(_ unionByName _).repartition(32)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      }
      queriesPerMult(mult).foreach { name =>
        val fn = SparkEntry.queries(name)
        Bench.exec(fn(spark, dir)) // warm: plan/codegen absorbed
        val t0 = System.nanoTime()
        Bench.exec(fn(spark, dir))
        println(f"[scale] x$mult%-4d $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
  }

  private def annSection(spark: SparkSession): Unit = {
    // ANN two-level reduction evidence: the per-query top-k window must
    // see ≤ partitions×|Q|×k rows regardless of corpus size (pre-r8 it
    // saw |corpus|×|Q|). Replicate embeddings ×1/×10/×100 and count the
    // rows the pre-window stage actually emits.
    val embBase = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val queries10 = embBase.where(col("vec_id") < 10)
    import graft.llm.Similarity
    Seq(1, 10, 100).foreach { mult =>
      val reps = (0 until mult).map { i =>
        embBase.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          col("embedding"))
      }
      val corpus = reps.reduce(_ unionByName _).repartition(32)
      val nCorpus = corpus.count()
      val scored = Similarity.bruteScoredLocalTopK(corpus, queries10,
        "vec_id", "embedding", k = 3)
      val windowInput = scored.count()
      val bound = 32L * 10 * 3 // partitions × |Q| × k
      val t0 = System.nanoTime()
      Bench.exec(Similarity.bruteForceTopK(corpus, queries10, "vec_id", "embedding", k = 3))
      println(f"[ann-scale] x$mult%-4d corpus=$nCorpus%9d window_input=$windowInput%6d " +
        f"bound=$bound (naive=${nCorpus * 10}%10d) brute_topk=${(System.nanoTime() - t0) / 1e9}%6.2f s " +
        f"ok=${windowInput <= bound}")
    }
  }

  /** j8 salting evidence: a hot-key join where 90% of the big side
    * lands on ONE key. The small side (100k keys) models a dim too
    * large to broadcast at the 100-TB analogue (a 100M-row dim), so
    * broadcast is disabled for every run and the shapes compared are
    * all shuffle joins: (a) plain with AQE skew-split ON — note the
    * ~140 MB hot partition sits BELOW AQE's 256 MB
    * skewedPartitionThresholdInBytes default, so Spark's own runtime
    * mitigation does not even trigger here; (b) plain with AQE OFF —
    * the naive shape, one reducer sorts the 18M hot-key rows; (c)
    * [[graft.core.Joins.saltedJoin]] (salts=32) — the manual
    * mitigation j8 ships, which spreads the hot key across all
    * reducers regardless of thresholds and also covers the shapes AQE
    * can't re-split (stateful aggs over the join key, pre-AQE
    * clusters).
    *
    * Wall-clock on one shared-memory box understates the win (all 32
    * threads contend for the same bandwidth, and the map-side exchange
    * is common to every variant), so the headline number is
    * STRUCTURAL: rows landing on the hottest reducer under the exact
    * partitioning Spark uses (pmod(murmur3, parts) — what
    * HashPartitioning evaluates). On a real cluster the hot reducer is
    * the stage's critical path, so wall tracks this ratio directly.
    * Results → PLANS.md / FIXTURES.md skew section. */
  private def skewSection(spark: SparkSession): Unit = {
    val parts = 32
    val salts = 32
    val big = spark.range(0, 20000000L, 1, 32)
      .select(
        when(col("id") % 10 < 9, lit(0L))
          .otherwise(pmod(col("id"), lit(100000L))).as("k"),
        (col("id") % 997).cast("double").as("v"))
    val small = spark.range(0, 100000L, 1, 8)
      .select(col("id").as("k"), (col("id") % 31).cast("double").as("w"))

    // structural: max reducer load under plain vs salted partitioning
    // (same salt expression saltedJoin assigns)
    def maxReducer(keyed: DataFrame, exprs: Seq[org.apache.spark.sql.Column]): Long =
      keyed.groupBy(pmod(hash(exprs: _*), lit(parts)).as("__p"))
        .count().agg(max(col("count"))).head().getLong(0)
    val plainMax = maxReducer(big, Seq(col("k")))
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val saltedMax = maxReducer(saltedBig, Seq(col("k"), col("__salt")))
    println(f"[skew] hottest-reducer rows: plain=$plainMax%9d salted=$saltedMax%9d " +
      f"(ideal=${20000000L / parts}, ratio=${plainMax.toDouble / saltedMax}%.1fx)")

    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def run(label: String, aqe: Boolean, salted: Boolean): Unit = {
        spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
        val joined =
          if (salted) graft.core.Joins.saltedJoin(big, small, "k", salts = salts)
          else big.join(small, Seq("k"))
        val out = joined.agg(count(lit(1)).as("n"), sum(col("v") * col("w")).as("dot"))
        Bench.exec(out) // warm: plan/codegen absorbed
        val t0 = System.nanoTime()
        val row = out.collect().head
        println(f"[skew] $label%-14s n=${row.getLong(0)}%9d dot=${row.getDouble(1)}%18.1f " +
          f"wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
      run("plain_aqe", aqe = true, salted = false)
      run("plain_noaqe", aqe = false, salted = false)
      run("salted_noaqe", aqe = false, salted = true)
      run("salted_aqe", aqe = true, salted = true)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }
}
