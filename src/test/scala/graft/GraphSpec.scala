package graft

import org.apache.spark.sql.functions._
import graft.llm.{Graph, Similarity}

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val knnEdges =
    Similarity.knnGraphEdges(emb, "vec_id", "embedding", k = 4)
      .select("id_a", "id_b")

  /** Driver-side naive truth on a collected edge list. */
  private def naiveTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = adj.keySet
    nodes.map { u =>
      val nb = adj(u).toSeq
      val t = (for {
        i <- nb.indices; j <- (i + 1) until nb.size
        if adj(nb(i)).contains(nb(j))
      } yield 1).size.toLong
      u -> t
    }.toMap
  }

  test("triangleStats equals the naive adjacency-set truth on the kNN graph") {
    val edges = knnEdges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(edges.nonEmpty)
    val truth = naiveTriangles(edges)
    val got = Graph.triangleStats(knnEdges).collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[Long]("degree"), r.getAs[Long]("n_tri"), r.getAs[Double]("lcc")))
      .toMap
    assert(got.keySet === truth.keySet)
    got.foreach { case (id, (d, t, lcc)) =>
      assert(t === truth(id), s"node $id")
      val expLcc = if (d >= 2) BigDecimal(2.0 * t / (d * (d - 1.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble else 0.0
      assert(math.abs(lcc - expLcc) < 1e-9, s"node $id lcc")
    }
    // the fixture graph must actually contain triangles, else vacuous
    assert(truth.values.sum > 0)
  }

  test("triangleStats hand fixtures: complete triangle lcc=1, path lcc=0") {
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    Graph.triangleStats(tri).collect().foreach { r =>
      assert(r.getAs[Long]("n_tri") === 1L && r.getAs[Double]("lcc") === 1.0)
    }
    val path = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    Graph.triangleStats(path).collect().foreach { r =>
      assert(r.getAs[Long]("n_tri") === 0L && r.getAs[Double]("lcc") === 0.0)
    }
  }

  /** Driver-side replication of the exact fixed-point iteration. */
  private def naivePageRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val dir = edges ++ edges.map(_.swap)
    val deg = dir.groupBy(_._1).map { case (k, vs) => k -> vs.size.toLong }
    val n = deg.size.toLong
    val base = (Graph.PrScale * 15L / 100L) / n
    var pr = deg.map { case (k, _) => k -> Graph.PrScale / n }
    for (_ <- 1 to iters) {
      val in = dir.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => pr(src) / deg(src) }.sum
      }
      pr = deg.map { case (k, _) => k -> (base + in.getOrElse(k, 0L) * 85L / 100L) }
    }
    pr
  }

  test("pageRankFixed is bit-exact vs the driver fixed-point replication") {
    val edges = knnEdges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val truth = naivePageRank(edges, iters = 5)
    val got = Graph.pageRankFixed(knnEdges, iters = 5).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("pr_fp")).toMap
    assert(got === truth)
    // mass conservation up to documented truncation: sum in (1 - eps, 1]
    val mass = got.values.sum
    assert(mass <= Graph.PrScale)
    assert(mass > Graph.PrScale - 5L * (2L * edges.size + got.size))
    // rank spread is real: hubs beat leaves
    assert(got.values.max > got.values.min)
  }

  test("pageRankFixed is partitioning-invariant (integer sums commute)") {
    val base = Graph.pageRankFixed(knnEdges, iters = 3).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("pr_fp"))).sortBy(_._1).toSeq
    Seq(1, 7).foreach { p =>
      val alt = Graph.pageRankFixed(knnEdges.repartition(p), iters = 3).collect()
        .map(r => (r.getLong(0), r.getAs[Long]("pr_fp"))).sortBy(_._1).toSeq
      assert(alt === base, s"partitions=$p")
    }
  }

  /** Driver replication of personalizedPageRank's integer fixed point. */
  private def naivePpr(edges: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int): Map[Long, Long] = {
    val dir = edges ++ edges.map(_.swap)
    val deg = dir.groupBy(_._1).map { case (k, vs) => k -> vs.size.toLong }
    val s = deg.keySet.intersect(seeds)
    val ns = s.size.toLong
    val base = (Graph.PrScale * 15L / 100L) / ns
    var pr = deg.map { case (k, _) =>
      k -> (if (s(k)) Graph.PrScale / ns else 0L) }
    for (_ <- 1 to iters) {
      val in = dir.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => pr(src) / deg(src) }.sum
      }
      pr = deg.map { case (k, _) =>
        k -> ((if (s(k)) base else 0L) + in.getOrElse(k, 0L) * 85L / 100L) }
    }
    pr
  }

  test("personalizedPageRank is bit-exact vs the driver replication; seeds pull rank") {
    val edges = knnEdges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val seedSet = edges.flatMap(e => Seq(e._1, e._2)).distinct.filter(_ % 17 == 0).toSet
    val seedsDf = seedSet.toSeq.toDF("id")
    val got = Graph.personalizedPageRank(knnEdges, seedsDf, iters = 5).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("ppr_fp"), r.getAs[Boolean]("is_seed"))).toMap
    val truth = naivePpr(edges, seedSet, iters = 5)
    assert(got.view.mapValues(_._1).toMap === truth)
    assert(got.filter(_._2._2).keySet === seedSet)
    // restart mass stays near the seed set: mean seed ppr > mean non-seed
    val (sv, nv) = got.values.partition(_._2)
    assert(sv.map(_._1).sum / sv.size > nv.map(_._1).sum / nv.size)
  }

  test("personalizedPageRank star graph: seed leaf outranks other leaves; no-seed rejected") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("id_a", "id_b")
    val ppr = Graph.personalizedPageRank(star, Seq(2L).toDF("id"), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("ppr_fp")).toMap
    assert(ppr(2L) > ppr(3L)) // the seed keeps its restart mass
    assert(ppr(3L) === ppr(4L)) // symmetric non-seed leaves tie exactly
    assert(ppr(1L) > ppr(3L)) // the hub drains the seed's walk
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(star, Seq(99L).toDF("id"), iters = 3)
    }
  }

  test("personalizedPageRank is partitioning-invariant (integer sums commute)") {
    // seed on ids known to be graph nodes (mutual-kNN may drop vec_ids)
    val seeds = knnEdges.select(col("id_a").as("id")).distinct()
      .orderBy(col("id")).limit(3)
    def run(df: org.apache.spark.sql.DataFrame) =
      Graph.personalizedPageRank(df, seeds, iters = 3).collect()
        .map(r => (r.getLong(0), r.getAs[Long]("ppr_fp"))).sortBy(_._1).toSeq
    val base = run(knnEdges)
    Seq(1, 7).foreach { p =>
      assert(run(knnEdges.repartition(p)) === base, s"partitions=$p")
    }
  }

  /** Driver replication of kCorePeel's fixed-round peel. */
  private def naiveKCore(edges: Seq[(Long, Long)], k: Int, rounds: Int)
      : Map[Long, (Long, Long, Boolean)] = {
    def degs(es: Seq[(Long, Long)]): Map[Long, Long] =
      (es ++ es.map(_.swap)).groupBy(_._1).map { case (n, vs) => n -> vs.size.toLong }
    val orig = degs(edges)
    var e = edges
    for (_ <- 1 to rounds) {
      val d = degs(e)
      e = e.filter { case (a, b) => d(a) >= k && d(b) >= k }
    }
    val fd = degs(e)
    orig.map { case (n, d0) => n -> (d0, fd.getOrElse(n, 0L), fd.contains(n)) }
  }

  test("kCorePeel: triangle survives the 2-core, the tail peels; naive parity on the kNN graph") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val r = Graph.kCorePeel(g, k = 2, rounds = 3).collect()
      .map(x => x.getLong(0) -> (x.getAs[Long]("degree"),
        x.getAs[Long]("core_degree"), x.getAs[Boolean]("in_core"))).toMap
    assert(r(4L) === ((1L, 0L, false)))
    assert(r(3L) === ((3L, 2L, true))) // loses the tail edge, keeps the triangle
    assert(r(1L) === ((2L, 2L, true)))
    assert(r(2L) === ((2L, 2L, true)))
    val edges = knnEdges.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    val got = Graph.kCorePeel(knnEdges, k = 3, rounds = 4).collect()
      .map(x => x.getLong(0) -> (x.getAs[Long]("degree"),
        x.getAs[Long]("core_degree"), x.getAs[Boolean]("in_core"))).toMap
    assert(got === naiveKCore(edges, k = 3, rounds = 4))
  }

  test("labelPropagation is partitioning-invariant (deterministic min-label tie-break)") {
    // n20's oracle replay only works because LPA's tie-break is the
    // deterministic min-label-among-modal-neighbors — a random or
    // arrival-order tie-break would give different communities per
    // partitioning. Pin it the way n16's integer PR is pinned.
    def run(df: org.apache.spark.sql.DataFrame) =
      Graph.labelPropagation(df, iters = 3).collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Long]("label"),
          r.getAs[Long]("community_size"))).sortBy(_._1).toSeq
    val base = run(knnEdges)
    Seq(1, 3, 32).foreach { p =>
      assert(run(knnEdges.repartition(p)) === base, s"partitions=$p")
    }
  }

  test("pageRankFixed star graph: hub outranks leaves; misuse rejected") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("id_a", "id_b")
    val pr = Graph.pageRankFixed(star, iters = 5).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("pr_fp")).toMap
    assert(pr(1L) > pr(2L) && pr(2L) === pr(3L) && pr(3L) === pr(4L))
    intercept[IllegalArgumentException] {
      Graph.pageRankFixed(star, iters = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRankFixed(star.where(lit(false)))
    }
  }

  /** Driver-side naive link-prediction truth from adjacency sets. */
  private def naiveLinkPred(edges: Seq[(Long, Long)]): Map[(Long, Long), (Long, Double, Double)] = {
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val es = edges.toSet
    val nodes = adj.keySet.toSeq.sorted
    (for {
      u <- nodes; v <- nodes if u < v
      if !es.contains((u, v))
      common = adj(u).intersect(adj(v)) if common.nonEmpty
    } yield {
      val cn = common.size.toLong
      val jac = cn.toDouble / (adj(u).size + adj(v).size - cn)
      val aa = common.toSeq.map { w =>
        BigDecimal(1.0 / math.log(adj(w).size.toDouble))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      (u, v) -> (cn, jac, aa)
    }).toMap
  }

  test("linkPrediction equals the naive adjacency-set truth on the kNN graph") {
    val edges = knnEdges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val truth = naiveLinkPred(edges)
    val got = Graph.linkPrediction(knnEdges).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        (r.getAs[Long]("cn"), r.getAs[Double]("jaccard"), r.getAs[Double]("adamic_adar")))
      .toMap
    assert(got.keySet === truth.keySet)
    assert(truth.nonEmpty) // else vacuous
    got.foreach { case (pair, (cn, jac, aa)) =>
      val (tcn, tjac, taa) = truth(pair)
      assert(cn === tcn, s"pair $pair cn")
      assert(math.abs(jac - tjac) < 2e-6, s"pair $pair jaccard")
      assert(math.abs(aa - taa) < 2e-6, s"pair $pair adamic_adar")
    }
  }

  test("linkPrediction hand fixture: square predicts both diagonals, no existing edges") {
    // 4-cycle 1-2-3-4: diagonals (1,3) and (2,4) each share two degree-2
    // neighbors → cn=2, jaccard=2/(2+2-2)=1, aa=2/ln(2)
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("id_a", "id_b")
    val got = Graph.linkPrediction(sq).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        (r.getAs[Long]("cn"), r.getAs[Double]("jaccard"), r.getAs[Double]("adamic_adar")))
      .toMap
    assert(got.keySet === Set((1L, 3L), (2L, 4L)))
    val expAa = 2 * BigDecimal(1.0 / math.log(2.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.values.foreach { case (cn, jac, aa) =>
      assert(cn === 2L && jac === 1.0)
      assert(math.abs(aa - expAa) < 1e-6)
    }
  }

  test("linkPrediction maxHubDegree drops hub-mediated candidates only") {
    // hub 0 touches 1..4; 1-2 is also a direct path via 5 (degree 2)
    val e = (Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (1L, 5L), (2L, 5L)))
      .toDF("id_a", "id_b")
    val full = Graph.linkPrediction(e).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Long]("cn")).toMap
    // capped at 3: hub 0 (degree 4) is excluded as an intermediate;
    // only the (1,2)-via-5 candidate survives, with cn reduced to 1
    val capped = Graph.linkPrediction(e, maxHubDegree = Some(3L)).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Long]("cn")).toMap
    // uncapped: hub wedges give (3,4) etc.; (0,5) is itself a candidate
    // (common neighbors 1 and 2)
    assert(full((1L, 2L)) === 2L && full((3L, 4L)) === 1L && full((0L, 5L)) === 2L)
    // capped at 3: hub 0 (degree 4) is excluded as an INTERMEDIATE — the
    // hub-only candidates (1,3)(1,4)(2,3)(2,4)(3,4) vanish, (1,2) drops
    // to its via-5 count, and (0,5) keeps both degree-2 intermediates
    assert(capped === Map((1L, 2L) -> 1L, (0L, 5L) -> 2L))
  }
}
