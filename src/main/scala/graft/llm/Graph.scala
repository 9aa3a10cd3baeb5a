package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
      pr.select(col("id"), col("degree"), col("pr_fp"),
        round(col("pr_fp").cast("double") / PrScale, 9).as("pr"))
        .localCheckpoint(true) // eager: N rows, valid after unpersist
    } finally {
      deg.unpersist(blocking = false)
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
