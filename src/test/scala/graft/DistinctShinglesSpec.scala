package graft

import org.apache.spark.sql.functions._
import graft.functions.DistinctShingles

class DistinctShinglesSpec extends SparkSpec {

  /** The exact Column formula the kernel replaced — parity baseline. */
  private def lambdaForm(text: org.apache.spark.sql.Column, w: Int) = {
    val toks = split(text, " ")
    when(size(toks) < w, array(text)).otherwise(
      array_distinct(transform(
        sequence(lit(1), size(toks) - (w - 1)),
        i => concat_ws(" ", slice(toks, i, lit(w))))))
  }

  test("distinct_shingles matches the lambda formula on adversarial strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val vocab = Vector("a", "bb", "déjà", "", "x")
    val handPicked = Seq(
      "",                        // empty text
      "one",                     // single token
      "a  b",                    // consecutive spaces → empty token
      " lead", "trail ",         // leading/trailing space
      "a b a b a b",             // repeated grams
      "ü ü ü ü"                  // multi-byte tokens
    )
    val randoms = (1 to 200).map(_ =>
      Seq.fill(rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val df = (handPicked ++ randoms).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    Seq(1, 2, 3, 5).foreach { w =>
      val rows = df.select(
        DistinctShingles.distinct_shingles(col("text"), w).as("native"),
        lambdaForm(col("text"), w).as("lambda")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"w=$w")
      }
    }
  }

  test("distinct_shingles: nulls, codegen path, SQL registration") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((1L, "p q p q r")).toDF("id", "text")
    df.createOrReplaceTempView("dsh")
    assert(spark.sql("SELECT distinct_shingles(text, 2) FROM dsh").collect()(0)
      .getSeq[String](0) === Seq("p q", "q p", "q r"))
    assert(df.select(DistinctShingles.distinct_shingles(
      lit(null).cast("string"), 2)).collect()(0).isNullAt(0))
    // enough rows for whole-stage codegen, aggregate downstream
    val big = (1 to 400).map(i => (i.toLong, "a b a b")).toDF("id", "text")
    val total = big.select(explode(
      DistinctShingles.distinct_shingles(col("text"), 2)).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(total === Map("a b" -> 400L, "b a" -> 400L))
  }
}
