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
}
