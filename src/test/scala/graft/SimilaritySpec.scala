package graft

import org.apache.spark.sql.functions._
import graft.llm.Similarity

class SimilaritySpec extends SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val queries = emb.where(col("vec_id") < 8)
  private lazy val truth = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 3)

  test("bruteForceTopK returns exactly k ranked neighbors per query, self excluded") {
    val rows = truth.collect()
    val perQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(perQuery.size === 8)
    perQuery.foreach { case (q, rs) =>
      assert(rs.length === 3)
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq === Seq(1, 2, 3))
      assert(!rs.exists(_.getAs[Long]("corpus_id") == q))
      // ranks ordered by descending cosine
      val byRank = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("cos"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("knnGraphEdges: reciprocal-only edges, equals the naive directed-kNN intersection") {
    val k = 4
    val edges = Similarity.knnGraphEdges(emb, "vec_id", "embedding", k = k).collect()
    assert(edges.nonEmpty)
    // naive reference: directed kNN sets from bruteForceTopK, mutual = both directions
    val directed = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", k = k)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = directed.filter { case (a, b) => a < b && directed((b, a)) }
    assert(edges.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet === expected)
    // every edge is undirected-canonical and carries the symmetric cosine
    edges.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Double]("cos") <= 1.0 + 1e-9)
    }
    // mutuality genuinely filters: some directed edge must be asymmetric
    // (otherwise this test would pass vacuously on a symmetric fixture)
    assert(directed.exists { case (a, b) => !directed((b, a)) })
  }

  test("hardNegatives: never a same-label pair, and equals the filtered brute truth") {
    val hn = Similarity.hardNegatives(emb, queries, "vec_id", "embedding", "label", k = 3)
    val rows = hn.collect()
    assert(rows.nonEmpty)
    // label constraint holds pairwise
    val labels = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id"); val c = r.getAs[Long]("corpus_id")
      assert(labels(q) != labels(c), s"same-label pair ($q,$c)")
    }
    // the one-pass label-masked kernel must equal brute top-k computed
    // per label over the label-filtered corpus (the naive |labels|-scan
    // formulation)
    val perLabel = queries.select("label").distinct().collect().map(_.getInt(0)).flatMap { l =>
      Similarity.bruteForceTopK(
        emb.where(col("label") =!= l), queries.where(col("label") === l),
        "vec_id", "embedding", k = 3).collect()
    }
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("query_id"), r.getAs[Int]("rk")) -> r.getAs[Long]("corpus_id")
    assert(rows.map(key).toMap === perLabel.map(key).toMap)
  }

  test("lshTopK recall@3 vs brute force") {
    val ann = Similarity.lshTopK(emb, queries, "vec_id", "embedding", k = 3,
      dim = 64, nPlanes = 16, nBands = 8)
    val recall = Similarity.recallAtK(ann, truth)
    assert(recall >= 0.5, s"LSH recall@3 = $recall")
  }

  test("ivfTopK recall@3 vs brute force") {
    val ann = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 4)
    val recall = Similarity.recallAtK(ann, truth)
    assert(recall >= 0.7, s"IVF recall@3 = $recall")
  }

  test("pqTopK recall@3 vs brute force; full refine equals brute exactly") {
    // the fixture embeddings are near-uniform random (no cluster
    // structure), the hardest case for ADC ranking — a ~13% shortlist
    // still buys decent recall; real clustered corpora do far better
    val ann = Similarity.pqTopK(emb, queries, "vec_id", "embedding", k = 3,
      dim = 64, m = 8, ksub = 16, refine = 22)
    val recall = Similarity.recallAtK(ann, truth)
    assert(recall >= 0.7, s"PQ recall@3 = $recall")
    // refine covering the whole corpus → exact rerank over everything →
    // identical to brute force (the nprobe=nlist analog for PQ)
    val full = Similarity.pqTopK(emb, queries, "vec_id", "embedding", k = 3,
      dim = 64, m = 8, ksub = 16, refine = 1000)
    val a = full.select("query_id", "corpus_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val t = truth.select("query_id", "corpus_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(a === t)
  }

  test("ivfPqTopK recall@3 vs brute force; nprobe=nlist + full refine equals brute") {
    // production config (n5): nlist=16, nprobe=8 — the same ½-probe
    // ratio; observed 0.70/0.83/0.80 across SFs with the hash-bucket
    // codebook sample (DevRecall)
    val ann = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding", k = 3,
      dim = 64, nlist = 16, nprobe = 8, m = 8, ksub = 16, refine = 22)
    val recall = Similarity.recallAtK(ann, truth)
    assert(recall >= 0.6, s"IVFPQ recall@3 = $recall")
    // probe every cell + refine covering the corpus → exact rerank over
    // everything → identical to brute force regardless of codebooks
    val full = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding", k = 3,
      dim = 64, nlist = 8, nprobe = 8, m = 8, ksub = 16, refine = 1000)
    val a = full.select("query_id", "corpus_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val t = truth.select("query_id", "corpus_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(a === t)
  }

  // MIPS fixture: the parquet embeddings are unit-norm, where MIPS ≡
  // cosine — scale by a deterministic per-row weight so norms carry
  // signal (the n10/n11 view, same recipe).
  private lazy val memb = emb
    .withColumn("__w", (lit(1L) + pmod(col("vec_id"), lit(5L))).cast("double"))
    .select(col("vec_id"),
      transform(col("embedding").cast("array<double>"), x => x * col("__w"))
        .as("embedding"))
  private lazy val mqueries = memb.where(col("vec_id") < 8)

  test("mipsBruteTopK matches a driver-side exact inner-product ranking") {
    val mips = Similarity.mipsBruteTopK(memb, mqueries, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk")) ->
        r.getAs[Long]("corpus_id")).toMap
    val vecs = memb.select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val qids = mqueries.select(col("vec_id").cast("long")).collect().map(_.getLong(0))
    qids.foreach { q =>
      val expect = vecs.toSeq.filter(_._1 != q)
        .map { case (cid, cv) =>
          (cid, vecs(q).zip(cv).map { case (a, b) => a * b }.sum) }
        .sortBy { case (cid, d) => (-d, cid) }.take(3).map(_._1)
      val got = (1 to 3).map(rk => mips((q, rk)))
      assert(got === expect, s"query $q: got $got expect $expect")
    }
  }

  test("MIPS differs from cosine on the weighted view, and the augmentation recovers it") {
    val mipsTruth = Similarity.mipsBruteTopK(memb, mqueries, "vec_id", "embedding", k = 3)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // cosine is weight-invariant per vector direction, so the cosine top-k
    // on the weighted view ≈ the unweighted truth; MIPS must disagree —
    // otherwise n10/n11 would silently duplicate n1/n2
    val cosTruth = Similarity.bruteForceTopK(memb, mqueries, "vec_id", "embedding", k = 3)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mipsTruth != cosTruth, "weighted fixture still rank-identical to cosine")
    // norm-augmented LSH + exact-dot re-rank: decent recall of the MIPS truth
    val approx = Similarity.mipsTopKLsh(memb, mqueries, "vec_id", "embedding",
        k = 3, dim = 64)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx intersect mipsTruth).size.toDouble / mipsTruth.size
    assert(recall >= 0.8, s"mips lsh recall $recall") // measured 0.933 on sf0.001
    // reported dots are exact: every hit carries the true inner product
    val vecs = memb.select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    Similarity.mipsTopKLsh(memb, mqueries, "vec_id", "embedding", k = 3, dim = 64)
      .collect().foreach { r =>
        val exact = vecs(r.getAs[Long]("query_id"))
          .zip(vecs(r.getAs[Long]("corpus_id"))).map { case (a, b) => a * b }.sum
        assert(math.abs(r.getAs[Double]("dot") - exact) < 1e-9)
      }
  }

  test("edge cases: k past corpus size ranks everything; empty corpus yields no rows") {
    import spark.implicits._
    val tiny = Seq((1L, Seq.fill(64)(0.5)), (2L, Seq.fill(64)(0.25)),
      (3L, (0 until 64).map(i => if (i < 32) 1.0 else 0.0)))
      .toDF("vec_id", "embedding")
    val q1 = tiny.where(col("vec_id") === 1L)
    // k = 10 over a 3-vector corpus → both non-self rows, ranks 1..2
    val big = Similarity.bruteForceTopK(tiny, q1, "vec_id", "embedding", k = 10)
      .collect().sortBy(_.getAs[Int]("rk"))
    assert(big.map(_.getAs[Long]("corpus_id")).toSeq === Seq(2L, 3L))
    assert(big.map(_.getAs[Int]("rk")).toSeq === Seq(1, 2))
    val emptyCorpus = tiny.where(col("vec_id") > 100L)
    assert(Similarity.bruteForceTopK(emptyCorpus, q1, "vec_id", "embedding", k = 3)
      .count() === 0L)
    assert(Similarity.ivfPqTopK(emptyCorpus, q1, "vec_id", "embedding", k = 3,
      dim = 64).count() === 0L)
  }

  test("TopKHeap keeps exactly the top-k under (score desc, id asc), ties included") {
    val heap = new Similarity.TopKHeap(4)
    // ties at 0.5 must resolve by smaller id; worst elements evicted
    val items = Seq((7L, 0.5), (1L, 0.9), (2L, 0.5), (3L, 0.1), (4L, 0.5),
      (5L, 0.99), (6L, 0.5), (8L, 0.2))
    items.foreach { case (id, s) => heap.offer(id, s) }
    val kept = heap.drain.toSeq.sortBy { case (id, s) => (-s, id) }
    assert(kept === Seq((5L, 0.99), (1L, 0.9), (2L, 0.5), (4L, 0.5)))
  }

  test("codebook training sample is order-independent on a domain-sorted corpus") {
    import spark.implicits._
    // two domains on disjoint axes, each split into 4 well-separated
    // clusters of 50 near-identical vectors; the corpus is SORTED by
    // domain — the normal physical layout after curation
    def vec(i: Int): Array[Double] = {
      val cluster = (i / 200) * 4 + i % 4
      Array.tabulate(8) { d =>
        val h = (i * 31 + d) * 2654435761L % 1000
        0.01 * (h - 500) / 500.0 + (if (d == cluster) 1.0 else 0.0)
      }
    }
    val rows = (0 until 400).map(i => (i.toLong, vec(i)))
    val ds = rows.toDS // (_1, _2) tuple layout, as pqTopK's corpusNorm
    // the hazard, demonstrated: limit() on the sorted corpus sees ONLY
    // domain 0 (no vector with mass on coords 4..7)
    val limitSample = ds.limit(200).collect().map(_._2)
    assert(limitSample.forall(_.slice(4, 8).forall(_ < 0.5)),
      "limit-sample on a sorted corpus must expose the single-domain hazard")
    // the fix: the md5-bucket sample draws from both domains regardless
    // of physical order
    val bucketSample = Similarity.trainingSample(ds, 200, seed = 42L)
    assert(bucketSample.length === 200)
    val dom1 = bucketSample.count(_.slice(4, 8).exists(_ > 0.5))
    assert(dom1 > 50 && dom1 < 150,
      s"bucket sample should mix domains, got $dom1/200 from domain 1")
    // end-to-end: PQ codebooks trained with trainMax = half the corpus
    // still rank domain-1 queries correctly even though every domain-1
    // row sits in the second half of the physical order
    val sorted = rows.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val qs = sorted.where(col("vec_id") >= 396)
    val truthSorted = Similarity.bruteForceTopK(sorted, qs, "vec_id", "embedding", k = 3)
    val ann = Similarity.pqTopK(sorted, qs, "vec_id", "embedding", k = 3,
      dim = 8, m = 4, ksub = 16, refine = 50, trainMax = 200)
    val recall = Similarity.recallAtK(ann, truthSorted)
    assert(recall >= 0.9, s"domain-sorted PQ recall@3 = $recall")
  }

  test("ANN query-side misuse fails loudly: oversize query sets and k=0 rejected") {
    val ex = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 3, maxQueries = 10)
    }
    assert(ex.getMessage.contains("maxQueries"))
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(emb, emb, "vec_id", "embedding", k = 3, dim = 64, maxQueries = 10)
    }
    intercept[IllegalArgumentException] {
      Similarity.hardNegatives(emb, emb, "vec_id", "embedding", "label", k = 3, maxQueries = 10)
    }
    // k = 0 is rejected on the driver, not by an executor heap crash
    intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfTopK(emb, queries, "vec_id", "embedding", k = 0)
    }
  }

  test("ANN results never invent pairs: every ANN hit has the true cosine") {
    val ann = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", k = 3, nlist = 8, nprobe = 8)
    // nprobe = nlist → exhaustive scan → must equal brute force exactly
    val a = ann.select("query_id", "corpus_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val t = truth.select("query_id", "corpus_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(a === t)
  }

  test("at-rest index builds are deterministic: rebuild yields identical artifacts") {
    // the premise behind n7/n8's at-rest ≡ in-memory equality: a rebuild
    // from the same corpus + seed yields the identical index. PQ is
    // PARTITION-INVARIANT (the hash-bucket training sample is order-
    // independent by design); IVF's k-means|| init samples in partition
    // order, so its guarantee is same-input determinism — n7 relies on
    // exactly that (both builds see the same input frame).
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def codeMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("codes").toVector).toMap
    val (codes1, books1) = Similarity.pqIndex(emb, "vec_id", "embedding", dim = 64)
    val (codes2, books2) = Similarity.pqIndex(
      emb.repartition(7), "vec_id", "embedding", dim = 64)
    assert(books1.flatten.flatten.toSeq === books2.flatten.flatten.toSeq)
    assert(codeMap(codes1) === codeMap(codes2))
    def cellMap(df: org.apache.spark.sql.DataFrame) = df.select("corpus_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val (asg1, cents1) = Similarity.ivfIndex(emb, "vec_id", "embedding")
    val (asg2, cents2) = Similarity.ivfIndex(emb, "vec_id", "embedding")
    assert(cents1.flatten.toSeq === cents2.flatten.toSeq)
    assert(cellMap(asg1) === cellMap(asg2))
    // composed IVF+PQ: hash-bucket-sample training → partition-invariant
    // like PQ (own lloyd, not Spark ML k-means)
    val i1 = Similarity.ivfPqIndex(emb, "vec_id", "embedding", dim = 64)
    val i2 = Similarity.ivfPqIndex(emb.repartition(7), "vec_id", "embedding", dim = 64)
    assert(i1.centroids.flatten.toSeq === i2.centroids.flatten.toSeq)
    assert(i1.books.flatten.flatten.toSeq === i2.books.flatten.flatten.toSeq)
    def cellCodeMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getAs[Array[Byte]]("codes").toVector))).toMap
    assert(cellCodeMap(i1.codes) === cellCodeMap(i2.codes))
  }

  test("maxSimVsSet: brute parity, smallest-ref-id ties, oversize ref set rejected") {
    import spark.implicits._
    val got = Similarity.maxSimVsSet(
        emb.where(col("vec_id") >= 8), "vec_id", "embedding",
        queries, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // driver-side brute truth with the same formula and tie rule
    val refs = queries.select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val corpus = emb.where(col("vec_id") >= 8)
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    corpus.foreach { case (id, v) =>
      val naa = dot(v, v)
      val scored = refs.map { case (rid, rv) =>
        (rid, dot(v, rv) / math.sqrt(naa * dot(rv, rv)))
      }
      val best = scored.map(_._2).max
      val bestId = scored.filter(_._2 == best).map(_._1).min
      assert(got(id) === ((bestId, best)), s"mismatch for corpus id $id")
    }
    // duplicated ref vectors (identical cosine by construction) tie-break
    // to the SMALLEST ref id
    val dupRefs = Seq((100L, Array(1.0, 0.0)), (5L, Array(2.0, 0.0)))
      .toDF("vec_id", "embedding")
    val one = Seq((200L, Array(3.0, 0.0))).toDF("vec_id", "embedding")
    val tied = Similarity.maxSimVsSet(one, "vec_id", "embedding",
      dupRefs, "vec_id", "embedding").collect()
    assert(tied.head.getLong(1) === 5L)
    assert(tied.head.getDouble(2) === 1.0)
    // contract: the collect-and-broadcast side must be SMALL
    intercept[IllegalArgumentException] {
      Similarity.maxSimVsSet(one, "vec_id", "embedding",
        emb, "vec_id", "embedding", maxRefs = 3)
    }
  }

  test("jlProject: seeded determinism, dimensions, and mean distance preservation") {
    import spark.implicits._
    val p1 = Similarity.jlProject(emb, "vec_id", "embedding",
        dim = 64, outDim = 32, seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toVector).toMap
    val p2 = Similarity.jlProject(emb.repartition(5), "vec_id", "embedding",
        dim = 64, outDim = 32, seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toVector).toMap
    assert(p1 === p2, "projection must be partitioning-independent and seed-deterministic")
    assert(p1.values.forall(_.length === 32))
    // mean pairwise distance-ratio concentrates near 1 (JL expectation)
    val orig = emb.select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.indices.foldLeft(0.0)((s, i) => s + (a(i) - b(i)) * (a(i) - b(i)))
    val ratios = orig.sliding(2).collect { case Array((ia, va), (ib, vb)) =>
      val od = d2(va.toSeq, vb.toSeq)
      if (od > 0) Some(d2(p1(ia), p1(ib)) / od) else None
    }.flatten.toSeq
    val mean = ratios.sum / ratios.size
    assert(math.abs(mean - 1.0) < 0.15, s"mean distance ratio $mean drifted")
    // wrong input dimension fails loudly, not silently truncating
    val bad = Seq((1L, Array(1.0, 2.0))).toDF("vec_id", "embedding")
    intercept[org.apache.spark.SparkException] {
      Similarity.jlProject(bad, "vec_id", "embedding",
        dim = 64, outDim = 8, seed = 1L).collect()
    }
  }
}
