package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the correctness baseline, and two scale
  * paths — random-hyperplane LSH buckets and an IVF (inverted-file)
  * index built from k-means coarse centroids.
  *
  * Scale stance: the query set is small relative to the corpus (that is
  * what makes it a *search*), so queries are always the broadcast side;
  * the corpus is never collected or crossed with itself. IVF prunes the
  * corpus scan to nprobe/nlist of the data per query; LSH prunes to
  * matching buckets. Both trade recall for scan fraction — measured by
  * the recall spec against brute force.
  */
object Similarity {

  import Dedup.{cosine, dot}

  /** Brute-force cosine top-k: broadcast the query set against the
    * corpus, rank per query. Exact; cost = |corpus| × |queries| dots,
    * fully parallel over the corpus (the right baseline even at scale
    * for ≤ a few hundred queries). */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int = 0): DataFrame = {
    // Query set broadcast as primitive arrays; the corpus streams through
    // a mapPartitions dense kernel (a query⨯corpus non-equi join would be
    // an interpreted BroadcastNestedLoopJoin — ~30× slower measured).
    val spark = corpus.sparkSession
    import spark.implicits._
    val qArr = queries.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])].collect()
      .map { case (id, v) => (id, v, math.sqrt(Dedup.dotArr(v, v))) }
    val bc = spark.sparkContext.broadcast(qArr)
    val scored = corpus
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        it.flatMap { case (cid, cv) =>
          val nc = math.sqrt(Dedup.dotArr(cv, cv))
          bc.value.iterator
            .filter(_._1 != cid)
            .map { case (qid, qv, nq) => (qid, cid, Dedup.dotArr(qv, cv) / (nq * nc)) }
        }
      }.toDF("query_id", "corpus_id", "cos")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rk", row_number().over(w).cast("int"))
      .where(col("rk") <= k)
      .select("query_id", "corpus_id", "cos", "rk")
  }

  /** Random-hyperplane LSH top-k: corpus bucketed by sign-bit signature
    * bands; each query probes only its matching buckets. Recall rises
    * with nBands (more, narrower bands → more candidates). */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      dim: Int, nPlanes: Int = 16, nBands: Int = 8, seed: Long = 42L): DataFrame = {
    require(nPlanes % nBands == 0)
    val planes = Dedup.hyperplanes(nPlanes, dim, seed)
    val r = nPlanes / nBands
    val bandArr = array((0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("sig"), b * r).bitwiseAND(lit((1L << r) - 1)).as("key"))
    }: _*)
    def banded(df: DataFrame, id: String, vec: String): DataFrame =
      Dedup.withSignature(df, idCol, vecCol, planes, id, vec)
        .select(col(id), col(vec), explode(bandArr).as("bk"))
        .select(col(id), col(vec), col("bk.band").as("band"), col("bk.key").as("key"))
    val cb = banded(corpus, "corpus_id", "cv")
    val qb = banded(queries, "query_id", "qv")
    val cands = cb.join(broadcast(qb), Seq("band", "key"))
      .where(col("query_id") =!= col("corpus_id"))
      .select("query_id", "qv", "corpus_id", "cv")
      .dropDuplicates("query_id", "corpus_id")
      .withColumn("cos", cosine(col("qv"), col("cv"), dim))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("corpus_id"))
    cands.withColumn("rk", row_number().over(w).cast("int"))
      .where(col("rk") <= k)
      .select("query_id", "corpus_id", "cos", "rk")
  }

  /** IVF top-k: k-means coarse quantizer (nlist cells, fixed seed) over
    * the corpus; each query scans only its `nprobe` nearest cells. The
    * classic ANN shape: centroid table is tiny (broadcast), the corpus
    * is hash-partitioned by cell. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L, dim: Int = 0): DataFrame = {
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}

    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).cast("array<double>").as("cv"))
      .withColumn("features", array_to_vector(col("cv")))
    val km = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("features")
      .setPredictionCol("cell").setMaxIter(10) // coarse quantizer: 10 iters is plenty
    val model = km.fit(c)
    val assigned = model.transform(c).select("corpus_id", "cv", "cell")

    // Tiny centroid table → broadcast; each query ranks cells by
    // centroid distance and keeps nprobe.
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray.toSeq) }.toSeq
      .toDF("cell", "centroid")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val qCells = q.crossJoin(broadcast(cents))
      .withColumn("cdist", -cosine(col("qv"), col("centroid"), dim))
    val wq = Window.partitionBy("query_id").orderBy(col("cdist"), col("cell"))
    val probes = qCells.withColumn("crk", row_number().over(wq))
      .where(col("crk") <= nprobe)
      .select("query_id", "qv", "cell")

    val cands = assigned.join(broadcast(probes), Seq("cell"))
      .where(col("query_id") =!= col("corpus_id"))
      .withColumn("cos", cosine(col("qv"), col("cv"), dim))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("corpus_id"))
    cands.withColumn("rk", row_number().over(w).cast("int"))
      .where(col("rk") <= k)
      .select("query_id", "corpus_id", "cos", "rk")
  }

  // ---- product quantization ------------------------------------------------

  private def l2normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(Dedup.dotArr(v, v))
    if (n == 0.0) v else v.map(_ / n)
  }

  private def subVec(v: Array[Double], s: Int, dsub: Int): Array[Double] =
    java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub)

  /** Plain deterministic Lloyd k-means on a driver-side sample (the
    * FAISS-style codebook fit: codebooks are trained in memory on a
    * sample, never distributed). Empty clusters keep their old center. */
  private[llm] def lloyd(data: Array[Array[Double]], k: Int, iters: Int,
      seed: Long): Array[Array[Double]] = {
    require(data.nonEmpty)
    val rnd = new scala.util.Random(seed)
    val centers = rnd.shuffle(data.indices.toVector).distinct.take(k)
      .map(i => data(i).clone).toArray
    val kEff = centers.length
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kEff)(new Array[Double](data(0).length))
      val counts = new Array[Long](kEff)
      data.foreach { p =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < kEff) {
          var d = 0.0; var j = 0
          while (j < p.length) { val t = p(j) - centers(c)(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var j = 0
        while (j < p.length) { sums(best)(j) += p(j); j += 1 }
      }
      var c = 0
      while (c < kEff) {
        if (counts(c) > 0) {
          var j = 0
          while (j < centers(c).length) { centers(c)(j) = sums(c)(j) / counts(c); j += 1 }
        } // empty cluster: keep old center (deterministic)
        c += 1
      }
      it += 1
    }
    centers
  }

  private def nearestCode(books: Array[Array[Double]], p: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < books.length) {
      var d = 0.0; var j = 0
      while (j < p.length) { val t = p(j) - books(c)(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Product-quantization top-k — the memory-bound ANN shape for
    * billion-vector corpora: the (normalized) corpus is encoded as `m`
    * byte codes per vector (dim×8 bytes → m bytes), queries score
    * candidates by asymmetric distance computation (ADC: per query an
    * m×ksub table of subspace dots, scoring = m table lookups, no
    * original vectors touched), and the approx top `k·refine` get an
    * EXACT cosine rerank against the original vectors (candidate set is
    * tiny by then). Codebooks are Lloyd-fit on a guarded driver-side
    * sample and broadcast — exactly FAISS's train/encode/search split.
    * With `refine` large enough to cover the corpus the result equals
    * brute force (SimilaritySpec pins this). */
  def pqTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int,
      m: Int = 8, ksub: Int = 16, refine: Int = 4,
      trainMax: Int = 10000, seed: Long = 42L): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    require(ksub <= 127, "codes are stored as bytes")
    val dsub = dim / m
    val spark = corpus.sparkSession
    import spark.implicits._

    val corpusVec = corpus
      .select(col(idCol).cast("long").as("corpus_id"), col(vecCol).cast("array<double>").as("cv"))
    val corpusNorm = corpusVec.as[(Long, Array[Double])]
      .mapPartitions(_.map { case (id, v) => (id, l2normalize(v)) })

    // train codebooks on a driver-side sample
    val sample = corpusNorm.limit(trainMax).collect().map(_._2)
    if (sample.isEmpty) { // empty corpus: no codebooks, no neighbors
      return spark.emptyDataFrame
        .select(lit(0L).as("query_id"), lit(0L).as("corpus_id"),
          lit(0.0).as("cos"), lit(0).as("rk"))
        .limit(0)
    }
    val books: Array[Array[Array[Double]]] =
      Array.tabulate(m)(s => lloyd(sample.map(subVec(_, s, dsub)), ksub, iters = 10, seed + s))
    val bcBooks = spark.sparkContext.broadcast(books)

    // encode: m byte codes per corpus vector
    val encoded = corpusNorm.mapPartitions { it =>
      val bks = bcBooks.value
      it.map { case (id, v) =>
        (id, Array.tabulate(m)(s => nearestCode(bks(s), subVec(v, s, dsub)).toByte))
      }
    }

    // queries: broadcast (id, ADC lookup table m×ksub)
    val qArr = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])].collect()
      .map { case (qid, qv) =>
        val qn = l2normalize(qv)
        val lut = new Array[Double](m * ksub)
        var s = 0
        while (s < m) {
          val qs = subVec(qn, s, dsub)
          var c = 0
          while (c < books(s).length) {
            lut(s * ksub + c) = Dedup.dotArr(qs, books(s)(c))
            c += 1
          }
          s += 1
        }
        (qid, lut)
      }
    val bcQ = spark.sparkContext.broadcast(qArr)

    // ADC scoring: approx cosine = Σ_s lut(s, code_s)
    val approx = encoded.mapPartitions { it =>
      val qs = bcQ.value
      it.flatMap { case (cid, codes) =>
        qs.iterator.filter(_._1 != cid).map { case (qid, lut) =>
          var s = 0; var score = 0.0
          while (s < codes.length) { score += lut(s * ksub + codes(s)); s += 1 }
          (qid, cid, score)
        }
      }
    }.toDF("query_id", "corpus_id", "approx")
    val wa = Window.partitionBy("query_id").orderBy(col("approx").desc, col("corpus_id"))
    val shortlist = approx.withColumn("ark", row_number().over(wa))
      .where(col("ark") <= k * refine)
      .select("query_id", "corpus_id")

    // exact rerank of the shortlist against ORIGINAL vectors
    val qVec = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val reranked = shortlist
      .join(corpusVec, Seq("corpus_id"))
      .join(broadcast(qVec), Seq("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("corpus_id"))
    reranked.withColumn("rk", row_number().over(w).cast("int"))
      .where(col("rk") <= k)
      .select("query_id", "corpus_id", "cos", "rk")
  }

  /** Recall@k of an ANN result against the brute-force truth: fraction
    * of (query, corpus) truth pairs the ANN result recovered. */
  def recallAtK(ann: DataFrame, truth: DataFrame): Double = {
    val hit = truth.select("query_id", "corpus_id")
      .join(ann.select("query_id", "corpus_id"), Seq("query_id", "corpus_id"), "left_semi")
      .count()
    val total = truth.count()
    if (total == 0) 1.0 else hit.toDouble / total
  }
}
