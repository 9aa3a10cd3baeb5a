package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Similarity}

/** Scratch diagnostic (round 7): measure ANN/LSH recall on the fixtures
  * to decide which rows-only queries can carry a full value-checked
  * oracle (exact-equality vs brute truth) and which need a bounded
  * recall contract. */
object DevRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val q = emb.where(col("vec_id") < 10)

      def pairsOf(df: org.apache.spark.sql.DataFrame) =
        df.select("query_id", "corpus_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet

      val truth = pairsOf(Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 3, dim = 64))
      val lsh = pairsOf(Similarity.lshTopK(emb, q, "vec_id", "embedding", k = 3, dim = 64))
      val ivf = pairsOf(Similarity.ivfTopK(emb, q, "vec_id", "embedding", k = 3, dim = 64))
      val pq = pairsOf(Similarity.pqTopK(emb, q, "vec_id", "embedding", k = 3, dim = 64, refine = 22))
      val ivfpq = pairsOf(Similarity.ivfPqTopK(emb, q, "vec_id", "embedding", k = 3, dim = 64,
        nlist = 16, nprobe = 8, refine = 22))
      def rec(s: Set[(Long, Long)]) = f"${s.intersect(truth).size.toDouble / truth.size}%.4f"
      println(s"[recall] $sf n_truth=${truth.size} lsh=${rec(lsh)} ivf=${rec(ivf)} pq=${rec(pq)}" +
        s" ivfpq=${rec(ivfpq)}" +
        s" lsh_eq=${lsh == truth} ivf_eq=${ivf == truth} pq_eq=${pq == truth}")

      // d3: are ALL exact-J>=0.5 pairs inside the minhash candidate set?
      val exact = Dedup.jaccardPairs(docs, "doc_id", "text", w = 5, minJaccard = 0.5)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val cands = Dedup.minHashCandidates(docs, "doc_id", "text", w = 5, k = 64, bands = 32)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val verified = Dedup.minHashNearDup(docs, "doc_id", "text", w = 5, k = 64, bands = 32,
        minJaccard = 0.5).select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[d3] $sf n_exact=${exact.size} n_cand=${cands.size} " +
        s"missed=${exact.diff(cands).size} verified_eq_exact=${verified == exact}")

      // d5b: does LSH cosine near-dup equal brute on the fixture?
      val bruteCos = Dedup.cosinePairsBrute(emb, "vec_id", "embedding", minCos = 0.45)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val lshCos = Dedup.cosinePairsLsh(emb, "vec_id", "embedding", minCos = 0.45,
        dim = 64, nPlanes = 16, nBands = 8)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[d5b] $sf n_brute=${bruteCos.size} n_lsh=${lshCos.size} " +
        s"missed=${bruteCos.diff(lshCos).size} eq=${bruteCos == lshCos}")

      // n11: norm-augmented LSH MIPS recall vs brute inner-product truth
      // on the weighted (norm-carrying) view — sets the floor the n11
      // recall_ok boolean pins
      val memb = emb
        .withColumn("__w", (lit(1L) + pmod(col("vec_id"), lit(5L))).cast("double"))
        .select(col("vec_id"),
          transform(col("embedding").cast("array<double>"), x => x * col("__w"))
            .as("embedding"))
      val mq = memb.where(col("vec_id") < 10)
      val mipsTruth = pairsOf(Similarity.mipsBruteTopK(memb, mq, "vec_id", "embedding", k = 3))
      val mipsLsh = pairsOf(Similarity.mipsTopKLsh(memb, mq, "vec_id", "embedding",
        k = 3, dim = 64))
      println(f"[n11] $sf n_truth=${mipsTruth.size} " +
        f"recall=${(mipsLsh intersect mipsTruth).size.toDouble / mipsTruth.size}%.3f")

      // n13: JL compressed-shortlist recall vs brute cosine truth, at
      // several overscan settings — sets the n13 floor
      for (os <- Seq(2, 4, 8, 16)) {
        val jl = pairsOf(Similarity.jlTopK(emb, q, "vec_id", "embedding",
          k = 3, dim = 64, overscan = os))
        println(f"[n13] $sf overscan=$os%-3d recall=${rec(jl)}")
      }
      for (od <- Seq(64, 128, 256)) {
        val jl = pairsOf(Similarity.jlTopK(emb, q, "vec_id", "embedding",
          k = 3, dim = 64, outDim = od, overscan = 4))
        println(f"[n13] $sf outDim=$od%-4d recall=${rec(jl)}")
      }
      // value-competitiveness: avg exact cosine of the JL top-k vs the
      // true top-k (identity recall is noise-bound on this fixture —
      // near-random vectors have razor-thin neighbor margins)
      val truthDf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 3, dim = 64)
      for (os <- Seq(4, 8)) {
        val jlDf = Similarity.jlTopK(emb, q, "vec_id", "embedding",
          k = 3, dim = 64, overscan = os)
        val tAvg = truthDf.agg(avg("cos")).head.getDouble(0)
        val rAvg = jlDf.agg(avg("cos")).head.getDouble(0)
        println(f"[n13q] $sf overscan=$os truth_avg=$tAvg%.4f jl_avg=$rAvg%.4f gap=${tAvg - rAvg}%.4f")
      }
    }
    spark.stop()
  }
}
