package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, NGramRunStats}

class NGramRunStatsSpec extends SparkSpec {

  /** Reference implementation in plain Scala (same tie rule: sorted order,
    * strictly-greater keeps the binary-lex smallest max gram). */
  private def ref(toks: Seq[String], n: Int): (Long, Long, Long) = {
    if (toks.length < n) return (0L, 0L, 0L)
    val grams = toks.sliding(n).map(_.mkString(" ")).toSeq.sorted
    var bestC = 0L; var bestLen = 0L; var dup = 0L
    grams.groupBy(identity).toSeq.sortBy(_._1).foreach { case (g, occ) =>
      val c = occ.length.toLong
      val len = g.codePointCount(0, g.length).toLong
      if (c > bestC) { bestC = c; bestLen = len }
      if (c > 1) dup += c * len
    }
    (bestC, bestLen, dup)
  }

  test("ngram_run_stats matches the reference on random token arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vocab = Vector("a", "bb", "ccc", "déjà", "x", "yy")
    val docs = (1 to 300).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
    }
    val df = docs.toDF("id", "toks")
    Seq(1, 2, 3).foreach { n =>
      val got = df.select(col("id"),
          NGramRunStats.ngram_run_stats(col("toks"), n).as("s"))
        .select(col("id"), col("s.best_c"), col("s.best_len"), col("s.dup"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      docs.foreach { case (id, toks) =>
        assert(got(id) === ref(toks, n), s"n=$n id=$id toks=$toks")
      }
    }
  }

  test("ngram_run_stats survives whole-stage codegen and aggregation") {
    import spark.implicits._
    // enough rows to stay in codegen; aggregate downstream of the struct
    val df = (1 to 500).map(i => (i.toLong, Seq("p", "q", "p", "q", "p"))).toDF("id", "toks")
    val total = df.select(NGramRunStats.ngram_run_stats(col("toks"), 2).as("s"))
      .agg(sum(col("s.dup"))).collect()(0).getLong(0)
    // grams: "p q"×2, "q p"×2 → dup = 2*3 + 2*3 = 12 per row
    assert(total === 500L * 12)
  }

  test("ngram_run_stats: null input, short arrays, SQL registration") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq((1L, Seq("only"))).toDF("id", "toks")
    df.createOrReplaceTempView("ngr")
    val r = spark.sql("SELECT ngram_run_stats(toks, 2) AS s FROM ngr").collect()(0)
    assert(r.getStruct(0).getLong(0) === 0L)
    val nul = df.select(NGramRunStats.ngram_run_stats(
      lit(null).cast("array<string>"), 2)).collect()(0)
    assert(nul.isNullAt(0))
  }
}
