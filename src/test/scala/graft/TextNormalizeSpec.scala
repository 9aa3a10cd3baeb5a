package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{nfc_normalize, strip_accents}

class TextNormalizeSpec extends SparkSpec {

  // All non-ASCII content is spelled as \u escapes so the source can
  // never be silently renormalized by an editor.

  test("nfc_normalize composes decomposed sequences (known vectors)") {
    import spark.implicits._
    val df = Seq(
      "e\u0301", // e + combining acute -> U+00E9
      "A\u030a", // A + combining ring -> U+00C5
      "plain ascii", // already NFC: identity
      "caf\u00e9"    // already composed: identity
    ).toDF("s")
    val got = df.select(nfc_normalize(col("s")).as("n")).as[String].collect()
    assert(got === Array("\u00e9", "\u00c5", "plain ascii", "caf\u00e9"))
    // idempotence: normalize twice == normalize once
    val twice = df.select(nfc_normalize(nfc_normalize(col("s"))).as("n"))
      .as[String].collect()
    assert(twice === got)
  }

  test("strip_accents drops combining marks from composed AND decomposed forms") {
    import spark.implicits._
    val df = Seq(
      "\u00e1\u00e9\u00ed\u00f3\u00fa", // composed aeiou acutes
      "e\u0301u\u0308",                 // decomposed \u00e9 \u00fc
      "mixed caf\u00e9 re\u0301sume\u0301",
      "no accents here"
    ).toDF("s")
    val got = df.select(strip_accents(col("s")).as("n")).as[String].collect()
    assert(got === Array("aeiou", "eu", "mixed cafe resume", "no accents here"))
  }

  test("nulls propagate; SQL registration works") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(Some("e\u0301"), None).toDF("s")
    val rows = df.select(nfc_normalize(col("s")).as("n")).collect()
    assert(rows(0).getString(0) === "\u00e9" && rows(1).isNullAt(0))
    df.createOrReplaceTempView("tn")
    val sql = spark.sql(
      "SELECT nfc_normalize(s) AS n, strip_accents(s) AS t FROM tn WHERE s IS NOT NULL")
      .collect()(0)
    assert(sql.getString(0) === "\u00e9" && sql.getString(1) === "e")
  }

  test("both expressions stay inside whole-stage codegen") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = docs.select(
      strip_accents(nfc_normalize(col("text"))).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [strip_accents(nfc_normalize"), plan)
    // ASCII fast path: output identical to input on the ASCII fixture
    val diff = docs.select(col("text"))
      .except(df.withColumnRenamed("n", "text")).count()
    assert(diff === 0)
  }

  test("interpreted kernels agree with the codegen path") {
    import spark.implicits._
    val data = Seq("e\u0301 x", "ascii", "\u00e1 b", "A\u030a\u00fc")
    val df = data.toDF("s")
    val gen = df.select(nfc_normalize(col("s")).as("n"), strip_accents(col("s")).as("t"))
      .as[(String, String)].collect().toSeq
    val interp = data.map { s =>
      (graft.functions.TextNormalizeKernels.nfc(
         org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString,
       graft.functions.TextNormalizeKernels.stripAccents(
         org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString)
    }
    assert(gen === interp)
  }
}
