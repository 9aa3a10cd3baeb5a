package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Relational.SingletonAttachOps

/** Distributed analytics over similarity graphs (the mutual k-NN graph
  * from [[Similarity.knnGraphEdges]], or any undirected edge list with
  * canonical `(id_a < id_b)` rows): triangle / clustering-coefficient
  * profiles and fixed-point PageRank. These are the graph-health and
  * node-importance statistics a curation pipeline reads off its
  * near-dup / semantic-similarity graph — dense triangles mark
  * paraphrase communities, high PageRank marks hub documents that
  * diversity filters down-weight.
  *
  * Scale stance: everything is edge-partitioned joins + map-side-
  * combined aggregates — no adjacency lists collected anywhere, no
  * per-node state beyond a degree. Triangle enumeration uses the
  * degree-orientation trick (each edge directed from its (degree, id)-
  * smaller endpoint) so every wedge join fans out from the LOW-degree
  * endpoint: the classic bound of sum(min-degree orientation out-deg²)
  * ≤ O(E^1.5) work instead of the hub-quadratic sum(deg²) a naive
  * wedge join pays on skewed graphs.
  */
object Graph {

  /** Fixed-point scale for [[pageRankFixed]]: PR mass 1.0 ≡ 10^12. */
  val PrScale: Long = 1000000000000L

  /** Per-node degree of an undirected canonical edge list. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("degree"))

  /** Per-node triangle count + local clustering coefficient over an
    * undirected `(id_a, id_b)` edge list (canonical `id_a < id_b`, no
    * duplicates — [[Similarity.knnGraphEdges]]'s contract).
    *
    * Orientation: every edge is directed from its (degree, id)-smaller
    * endpoint, making the directed graph acyclic under that total
    * order; a triangle {u,v,w} with u < v < w (orientation order) then
    * appears EXACTLY once, as wedge (u→v, u→w) closed by (v→w). The
    * wedge join therefore fans out only from low-degree endpoints — a
    * hub of degree d contributes d wedges as a *destination* but never
    * d² as a source, which is what keeps skewed similarity graphs
    * (every near-dup cluster is a hub) tractable at corpus scale.
    *
    * Output: one row per node — (id, degree, n_tri,
    * lcc = 2·n_tri / (degree·(degree−1)), 0 when degree < 2),
    * lcc rounded to 6dp (cross-engine float stance). */
  def triangleStats(edges: DataFrame): DataFrame = {
    val e = edges.select(col("id_a"), col("id_b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val deg = degrees(e)
      // orient by (degree, id): id_a < id_b already, so the tie keeps a→b
      val withDeg = e
        .join(deg.select(col("id").as("id_a"), col("degree").as("da")), Seq("id_a"))
        .join(deg.select(col("id").as("id_b"), col("degree").as("db")), Seq("id_b"))
      val aFirst = col("da") < col("db") ||
        (col("da") === col("db") && col("id_a") < col("id_b"))
      val dir = withDeg.select(
        when(aFirst, col("id_a")).otherwise(col("id_b")).as("src"),
        when(aFirst, col("id_b")).otherwise(col("id_a")).as("dst"),
        when(aFirst, col("db")).otherwise(col("da")).as("ddst"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        // wedges from a shared source, ordered dst₁ < dst₂ under the
        // SAME (degree, id) total order the orientation uses
        val wedges = dir.select(col("src"), col("dst").as("v"), col("ddst").as("dv"))
          .join(dir.select(col("src"), col("dst").as("w"), col("ddst").as("dw")), Seq("src"))
          .where(col("dv") < col("dw") || (col("dv") === col("dw") && col("v") < col("w")))
        val tri = wedges.join(
          dir.select(col("dst").as("w"), col("src").as("v")),
          Seq("v", "w"), "left_semi")
          .select(col("src").as("u"), col("v"), col("w"))
        val perNode = tri
          .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
          .groupBy("id").agg(count(lit(1)).as("n_tri"))
        deg.join(perNode, Seq("id"), "left")
          .select(col("id"), col("degree"),
            coalesce(col("n_tri"), lit(0L)).as("n_tri"),
            round(when(col("degree") >= 2,
              lit(2.0) * coalesce(col("n_tri"), lit(0L)) /
                (col("degree") * (col("degree") - 1)))
              .otherwise(lit(0.0)), 6).as("lcc"))
          .localCheckpoint(true) // eager: node-count-sized, valid after unpersist
      } finally dir.unpersist(blocking = false)
    } finally e.unpersist(blocking = false)
  }

  /** Fixed-iteration PageRank over an undirected canonical edge list,
    * computed in 10^-12 FIXED-POINT integer arithmetic so every
    * iteration is bit-exact and ORDER-INDEPENDENT — integer sums
    * commute, so the result is identical across partitionings, engines,
    * and replays (no floating accumulation order to pin down).
    *
    * Per iteration (damping d = 0.85, as 85/100 integer ops):
    * contrib = pr_fp div degree (per directed edge),
    * pr_fp' = (15·PrScale/100) div N + (85 · Σ contrib) div 100.
    * Truncation loses < 1 unit (10^-12) per division — total mass
    * drifts below 1.0 by at most E·iters·10^-12, documented, not
    * corrected (a correction would reintroduce order sensitivity).
    *
    * Nodes = endpoints of the edge list (an isolated vector with no
    * reciprocal neighbor is not part of the graph). Each undirected
    * edge contributes both directions; mutual-kNN degrees are ≥ 1 by
    * construction so there are no dangling nodes.
    *
    * Scale shape: per iteration ONE (src-keyed) join of the 2E directed
    * edges against the N-row rank frame and one map-side-combined sum —
    * the standard edge-partitioned PageRank step. The edge and degree
    * frames persist across iterations (computed once); iteration count
    * is fixed and small, so the plan tree stays shallow without
    * per-iteration checkpoints, and the final frame is eagerly
    * materialized before the caches release. */
  def pageRankFixed(edges: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    val dirE = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = dirE.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = deg.count()
      require(n > 0, "pageRankFixed: empty edge list")
      val base = (PrScale * 15L / 100L) / n
      var pr = deg.select(col("id"), col("degree"), lit(PrScale / n).as("pr_fp"))
      for (_ <- 1 to iters) {
        val contrib = dirE
          .join(pr.select(col("id").as("src"), col("degree"), col("pr_fp")), Seq("src"))
          .select(col("dst").as("id"), expr("pr_fp div degree").as("c"))
        val inSum = contrib.groupBy("id").agg(sum(col("c")).as("s"))
        pr = deg.join(inSum, Seq("id"), "left")
          .select(col("id"), col("degree"),
            (lit(base) + expr("coalesce(s, 0L) * 85 div 100")).as("pr_fp"))
      }
      // 9-dp display value rounded in INTEGER space: round(fp/1e12, 9)
      // rounded the shortest double REPR (Spark) vs the binary value
      // (DuckDB) and could tie at the 9th decimal (the Det.round6Bin
      // class — n22's sf0.001 envelope finding was exactly this, one
      // iteration landing on a repr tie). (fp + 500) div 1000 is exact
      // half-up on the fixed-point grid (fp ≥ 0 by construction); the
      // quotient ≤ 1e9 is double-exact and the single /1e9 division is
      // one identical IEEE op on both engines — no repr step anywhere.
      pr.select(col("id"), col("degree"), col("pr_fp"),
        (expr("(pr_fp + 500L) div 1000L").cast("double") / lit(1.0e9)).as("pr"))
        .localCheckpoint(true) // eager: N rows, valid after unpersist
    } finally {
      deg.unpersist(blocking = false)
      dirE.unpersist(blocking = false)
    }
  }

  /** k-CORE PEEL (fixed rounds): iteratively remove nodes of degree < k
    * together with their edges — after enough rounds the survivors are
    * the k-core, the densely-interlinked CORE of the similarity graph
    * (paraphrase/boilerplate nuclei), while peeled nodes are the
    * periphery (docs with only incidental similarity). The
    * core/periphery verdict drives opposite curation actions: cores
    * get aggressive dedup, periphery gets kept for diversity.
    *
    * Runs a FIXED `rounds` of peeling rather than to convergence so the
    * result is a deterministic closed form both engines replay exactly
    * (a data-dependent fixpoint would need an unbounded oracle); on
    * k-NN-sized degrees 3–4 rounds are empirically at or near the
    * fixpoint, and `in_core`/`core_degree` are exact for whatever
    * `rounds` says.
    *
    * Each round is one map-side-combined degree count + two key-keyed
    * semi-joins, with the surviving edge list MATERIALIZED eagerly per
    * round (columnar persist + count, previous generation released — at
    * most two generations resident, compressed and disk-spillable).
    * Eager per round is load-bearing twice over: (1) three lazily-
    * stacked consumers per round would recompute the base 3^rounds
    * times; (2) even WITH lazy caching, a round's degree-exchange and
    * two semi-join probe-exchange stages are independent siblings that
    * the scheduler runs concurrently, racing to compute the uncached
    * parent generation (measured 49 s vs 12 s at sf0.01 over a brute-
    * kNN input). The first cut held eager ROW-based localCheckpoints of
    * all generations instead and died of java-heap OOM at ×100/24M
    * edges (gates13e) — the peel is fully deterministic (no range
    * exchange, no id minting), so spillable cache-for-cost is correct
    * and checkpoint-for-consistency was never needed.
    *
    * COST NOTE: rounds dominate wall-clock as fixed per-round stage/
    * codegen overhead on small graphs (~1.5–3 s/round regardless of
    * size) — unlike pageRankFixed's single-consumer lazy chain, the
    * peel cannot fuse rounds into one job. Pick the smallest `rounds`
    * the analysis needs; n23 declares 2.
    *
    * Output: one row per ORIGINAL node — (id, degree, core_degree,
    * in_core), core_degree = surviving degree after the last peel. */
  def kCorePeel(edges: DataFrame, k: Int = 2, rounds: Int = 4): DataFrame = {
    require(k >= 1 && rounds >= 1 && rounds <= 10,
      s"need k >= 1 and rounds in [1, 10], got k=$k rounds=$rounds")
    def degrees(e: DataFrame): DataFrame =
      e.select(col("id_a").as("id")).unionAll(e.select(col("id_b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val orig = edges.select(col("id_a"), col("id_b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      orig.count() // one cache fill — every consumer below reads it
      var e = orig
      for (_ <- 1 to rounds) {
        val keep = degrees(e).where(col("deg") >= k).select(col("id"))
        val next = e
          .join(keep.withColumnRenamed("id", "id_a"), Seq("id_a"), "left_semi")
          .join(keep.withColumnRenamed("id", "id_b"), Seq("id_b"), "left_semi")
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize before releasing the parent generation
        if (e ne orig) e.unpersist(blocking = false)
        e = next
      }
      val res = degrees(orig).withColumnRenamed("deg", "degree")
        .join(degrees(e).withColumnRenamed("deg", "core_degree"), Seq("id"), "left")
        .select(col("id"), col("degree"),
          coalesce(col("core_degree"), lit(0L)).as("core_degree"),
          col("core_degree").isNotNull.as("in_core"))
        .localCheckpoint(true) // eager: N node rows, valid after unpersist
      if (e ne orig) e.unpersist(blocking = false)
      res
    } finally orig.unpersist(blocking = false)
  }

  /** PERSONALIZED PageRank (random walk with restart to a SEED SET) —
    * the seed-expansion primitive of curated-data pipelines: given a
    * small trusted set (hand-picked quality docs, a benchmark's topic
    * exemplars), rank every document by proximity in the similarity
    * graph and harvest the high-PPR non-seeds as expansion candidates.
    * Identical integer fixed-point arithmetic to [[pageRankFixed]]
    * (10^-12 units, `div` truncation, order-independent sums → bit-
    * exact and oracle-replayable); the only change is WHERE the 15%
    * restart mass lands — uniformly on the seeds instead of all nodes:
    *
    *   ppr' = [is_seed] · (15·PrScale/100) div |S| + (85 · Σ in) div 100
    *
    * Seeds not present in the graph are ignored (they have no edges to
    * walk); requires at least one seed to survive the intersection.
    * Scale shape: same as pageRankFixed — per iteration one src-keyed
    * edge join + one map-side-combined sum; the seed flag rides the
    * persisted node frame, never a broadcast of the seed list (the
    * seed set may itself be large).
    *
    * Output: (id, degree, is_seed, ppr_fp, ppr) per node. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iters: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    val dirE = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = dirE.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))
      .join(seeds.select(col("id")).distinct().withColumn("__seed", lit(true)),
        Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("__seed"), lit(false)).as("is_seed"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val ns = nodes.where(col("is_seed")).count()
      require(ns > 0, "personalizedPageRank: no seed id is a node of the graph")
      val init = PrScale / ns
      val base = (PrScale * 15L / 100L) / ns
      var ppr = nodes.select(col("id"), col("degree"), col("is_seed"),
        when(col("is_seed"), lit(init)).otherwise(lit(0L)).as("ppr_fp"))
      for (_ <- 1 to iters) {
        val contrib = dirE
          .join(ppr.select(col("id").as("src"), col("degree"), col("ppr_fp")),
            Seq("src"))
          .select(col("dst").as("id"), expr("ppr_fp div degree").as("c"))
        val inSum = contrib.groupBy("id").agg(sum(col("c")).as("s"))
        ppr = nodes.join(inSum, Seq("id"), "left")
          .select(col("id"), col("degree"), col("is_seed"),
            (when(col("is_seed"), lit(base)).otherwise(lit(0L)) +
              expr("coalesce(s, 0L) * 85 div 100")).as("ppr_fp"))
      }
      // same integer-space 9-dp rounding as pageRankFixed (and for the
      // same reason: this exact site produced n22's sf0.001 repr tie)
      ppr.select(col("id"), col("degree"), col("is_seed"), col("ppr_fp"),
        (expr("(ppr_fp + 500L) div 1000L").cast("double") / lit(1.0e9)).as("ppr"))
        .localCheckpoint(true) // eager: N rows, valid after unpersist
    } finally {
      nodes.unpersist(blocking = false)
      dirE.unpersist(blocking = false)
    }
  }

  /** Link-prediction scores for NON-adjacent node pairs sharing at least
    * one common neighbor — the "which documents are probably near-dups
    * the kNN cutoff missed" / "which edges should the similarity graph
    * grow next" ranking. Three classic neighborhood scores per pair:
    * common-neighbor count, Jaccard = cn/(d_u + d_v − cn), and
    * Adamic–Adar = Σ_{w ∈ Γu∩Γv} 1/ln(deg w) (every common neighbor has
    * degree ≥ 2 by construction, so ln is bounded away from 0).
    *
    * Scale shape: candidate pairs come from ONE wedge self-join of the
    * directed adjacency keyed on the shared neighbor w — the same
    * band-join shape as LSH candidate generation, with fan-out
    * Σ deg(w)² bounded by k²·N on a k-NN graph (deg ≤ k by
    * construction). [[Graph.triangleStats]]'s orientation does not
    * apply here (both wedge *ends* are wanted, ordered only u < v), so
    * for GENERAL graphs the quadratic guard is `maxHubDegree`: common
    * neighbors with degree above the cap are excluded from the wedge
    * join — the d³-LSH-bucket-cap argument, and semantically aligned
    * (a neighbor shared with half the corpus carries ~no link signal;
    * its AA weight 1/ln(d) is already the score family saying so).
    * With a cap, cn/aa are LOWER bounds and pairs whose only common
    * neighbors are super-hubs drop out — documented approximation,
    * default off. Existing edges leave via one anti-join; degrees
    * attach by two N-row joins. The ln terms are rounded to 1e-9 and
    * decimal-summed (order-independent, cross-engine-safe — the a24
    * entropy stance).
    *
    * Output: (id_a, id_b, cn, jaccard, adamic_adar), one row per
    * candidate pair. */
  def linkPrediction(edges: DataFrame, maxHubDegree: Option[Long] = None): DataFrame = {
    // convenience path for DERIVED edge lists (e.g. an in-query kNN
    // graph): pin the edge frame so its (possibly expensive) derivation
    // runs once across the plan's three edge branches, and eagerly
    // materialize the result so it stays valid after the unpersist.
    // The output is candidate-PAIR-sized, so this wrapper is for graphs
    // whose score table fits storage comfortably — at corpus scale use
    // [[linkPredictionPlan]] over at-rest edges and write the result
    // straight to its sink instead of checkpointing it.
    val e = edges.select(col("id_a"), col("id_b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try linkPredictionPlan(e, maxHubDegree).localCheckpoint(true)
    finally e.unpersist(blocking = false)
  }

  /** Synchronous label propagation (community detection) over an
    * undirected canonical edge list — the "which paraphrase community
    * does each document belong to" partitioner a curation pipeline runs
    * over its similarity graph (communities are coarser than connected
    * components: a CC chains through single weak edges, LPA groups by
    * neighborhood majority).
    *
    * Semantics (fully deterministic — classic LPA breaks ties randomly,
    * which can never hash-compare): labels start as node ids; each of
    * the `iters` SYNCHRONOUS rounds relabels every node to the most
    * frequent label among its NEIGHBORS (the node's own label does not
    * vote), ties broken by smallest label. Fixed iteration count, no
    * convergence test — the bounded-round fixed-point stance of
    * [[pageRankFixed]].
    *
    * Scale shape: per round ONE (neighbor-keyed) join of the 2E
    * directed edges against the N-row label frame, one map-side-
    * combined (id, label) count, and one min_by argmax agg — all
    * integer, order-independent. Edges persist across rounds; the label
    * frame is a shallow linear chain (each round reads only its
    * predecessor), so no per-round checkpoint is needed at small fixed
    * `iters`; the result is eagerly materialized before the cache
    * releases.
    *
    * Output: (id, label, community_size), one row per node. */
  def labelPropagation(edges: DataFrame, iters: Int = 4): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters must be in [1, 20], got $iters")
    val adj = edges.select(col("id_a").as("id"), col("id_b").as("nb"))
      .unionAll(edges.select(col("id_b").as("id"), col("id_a").as("nb")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = adj.select(col("id")).distinct().withColumn("lbl", col("id"))
      for (_ <- 1 to iters) {
        labels = adj
          .join(labels.select(col("id").as("nb"), col("lbl")), Seq("nb"))
          .groupBy(col("id"), col("lbl")).agg(count(lit(1)).as("c"))
          .groupBy(col("id"))
          .agg(min_by(col("lbl"), struct((-col("c")).as("nc"), col("lbl"))).as("lbl"))
      }
      val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("community_size"))
      labels.join(sizes, Seq("lbl"))
        .select(col("id"), col("lbl").as("label"), col("community_size"))
        .localCheckpoint(true) // eager: N rows, valid after unpersist
    } finally adj.unpersist(blocking = false)
  }

  /** Degree assortativity (Newman's r): the Pearson correlation of the
    * endpoint degrees over all directed edge instances (each undirected
    * edge counted in both directions) — ONE number saying whether
    * high-degree nodes attach to other high-degree nodes (r > 0,
    * "paraphrase cores link to each other") or to leaves (r < 0,
    * hub-and-spoke). The standard graph-health summary next to
    * [[triangleStats]]' local clustering.
    *
    * Determinism: degrees are integers, so all five sufficient sums
    * (Σx, Σy, Σxy, Σx², Σy²) are exact BIGINTs — the final correlation
    * is one double expression over identical integers in both engines,
    * rounded to 6dp per the house float stance. Scale shape: one degree
    * agg + two N-row joins onto the edge list + one map-side-combined
    * integer agg; nothing is node-quadratic. Symmetric by construction
    * (both directions), so Σx = Σy and the formula collapses — kept in
    * full so the code states the statistic, not a fixture identity.
    *
    * Output: single row (n_nodes, n_edges, assortativity). */
  def assortativity(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    // the plan reads `edges` four ways (degree agg + two degree-join
    // branches over both directions) — pin it so a derived edge list
    // (kNN) computes once; the 1-row result is eagerly materialized
    // before the cache releases
    val e = edges.select(col("id_a"), col("id_b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
    val deg = degrees(e)
    val dirDeg = e.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionAll(e.select(col("id_b").as("u"), col("id_a").as("v")))
      .join(deg.select(col("id").as("u"), col("degree").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("degree").as("dv")), Seq("v"))
    val s = dirDeg.agg(
      count(lit(1)).as("m"),
      sum(col("du")).as("sx"), sum(col("dv")).as("sy"),
      sum(col("du") * col("dv")).as("sxy"),
      sum(col("du") * col("du")).as("sxx"),
      sum(col("dv") * col("dv")).as("syy"))
    val m = col("m").cast(DoubleType)
    val cov = col("sxy").cast(DoubleType) / m -
      (col("sx").cast(DoubleType) / m) * (col("sy").cast(DoubleType) / m)
    val vx = col("sxx").cast(DoubleType) / m -
      (col("sx").cast(DoubleType) / m) * (col("sx").cast(DoubleType) / m)
    val vy = col("syy").cast(DoubleType) / m -
      (col("sy").cast(DoubleType) / m) * (col("sy").cast(DoubleType) / m)
    deg.agg(count(lit(1)).as("n_nodes")).attachSingleton(s) // 1-row scalar attach (BHJ on const key, not BNLJ)
      .select(col("n_nodes"), (col("m") / 2).cast("long").as("n_edges"),
        round(cov / sqrt(vx * vy), 6).as("assortativity"))
      .localCheckpoint(true) // eager: 1 row, valid after unpersist
    } finally e.unpersist(blocking = false)
  }

  /** [[linkPrediction]]'s pure PLAN — no caching, no materialization:
    * the corpus-scale entry point. `edges` must be cheap to re-scan
    * (at rest in parquet, or caller-persisted): the plan reads it three
    * times (two adjacency branches + the existing-edge anti-join).
    * Compose with a direct sink write so the pair-sized result streams
    * to storage instead of materializing twice. */
  def linkPredictionPlan(edges: DataFrame,
      maxHubDegree: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val e = edges.select(col("id_a"), col("id_b"))
    val adj = e.select(col("id_a").as("id"), col("id_b").as("nb"))
      .unionAll(e.select(col("id_b").as("id"), col("id_a").as("nb")))
    val deg = adj.groupBy(col("id")).agg(count(lit(1)).as("degree"))
    // attach the shared-neighbor degree BEFORE the self-join so a hub
    // cap prunes the fan-out on both sides of the wedge
    val wDeg = deg.select(col("id").as("w"),
      col("degree").as("dw"))
    val wSide = adj.select(col("nb").as("w"), col("id").as("u"))
      .join(maxHubDegree.fold(wDeg)(cap => wDeg.where(col("dw") <= cap)), Seq("w"))
    val wedges = wSide
      .join(wSide.select(col("w"), col("u").as("v")), Seq("w"))
      .where(col("u") < col("v"))
    val scored = wedges
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("cn"),
        sum(round(lit(1.0) / log(col("dw").cast(DoubleType)), 9)
          .cast(DecimalType(27, 9))).cast(DoubleType).as("aa"))
    scored
      .join(e.select(col("id_a").as("u"), col("id_b").as("v")),
        Seq("u", "v"), "left_anti")
      .join(deg.select(col("id").as("u"), col("degree").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("degree").as("dv")), Seq("v"))
      .select(col("u").as("id_a"), col("v").as("id_b"), col("cn"),
        round(col("cn").cast(DoubleType) /
          (col("du") + col("dv") - col("cn")).cast(DoubleType), 6).as("jaccard"),
        round(col("aa"), 6).as("adamic_adar"))
  }
}
