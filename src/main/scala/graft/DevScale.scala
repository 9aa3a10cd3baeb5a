package graft

import org.apache.spark.sql.SparkSession
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
    spark.stop()
  }
}
