package graft

import org.apache.spark.sql.functions._
import graft.core.{Relational, Sampling, WideAgg}
import graft.io.Sinks
import graft.llm.{Curation, Dedup, TextStats}

/** Edge-case hardening: empty inputs, degenerate parameters, guards. */
class EdgeCaseSpec extends SparkSpec {

  private def emptyDocs = {
    import spark.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  }

  test("dedup operators on an empty corpus return empty, not errors") {
    assert(Dedup.exactStats(emptyDocs, "doc_id", "text").collect()(0).isNullAt(0) ||
      Dedup.exactStats(emptyDocs, "doc_id", "text").collect()(0).getAs[Any]("n_docs") == null)
    assert(Dedup.jaccardPairs(emptyDocs, "doc_id", "text", 3, 0.5).count() === 0)
    assert(Dedup.simHashPairs(emptyDocs, "doc_id", "text").count() === 0)
    import spark.implicits._
    assert(Dedup.dupClusters(Seq.empty[(Long, Long)].toDF("id_a", "id_b")).count() === 0)
  }

  test("round-7 curation ops survive empty and degenerate inputs") {
    import spark.implicits._
    // empty corpus against a non-empty eval set, and vice versa
    val evalSet = Seq((1L, "the quick brown fox jumps over it")).toDF("doc_id", "text")
    assert(Curation.contaminationBloom(emptyDocs, evalSet, "doc_id", "text").count() === 0)
    val full = Curation.contaminationBloom(evalSet, emptyDocs, "doc_id", "text").collect()
    assert(full.length === 1 && full(0).getAs[Long]("n_overlap") === 0L)
    assert(Curation.dedupLines(emptyDocs, "doc_id", "text").count() === 0)
    val emptyTok = Seq.empty[(Long, String, Long)].toDF("doc_id", "source", "n_tokens")
    assert(Curation.tokenBudgetCap(emptyTok, "doc_id", "source", "n_tokens", 10L, "s").count() === 0)
    // budget 0 keeps nothing (any positive doc overflows immediately)
    val one = Seq((1L, "a", 5L)).toDF("doc_id", "source", "n_tokens")
    assert(Curation.tokenBudgetCap(one, "doc_id", "source", "n_tokens", 0L, "s").count() === 0)
    assert(Sampling.exactKPerStratum(
      emptyDocs.withColumnRenamed("text", "source"), "doc_id", "source", 3, "s").count() === 0)
  }

  test("AUC on empty input returns no-signal row, not an exception") {
    import spark.implicits._
    val r = graft.stats.Auc.aucDf(
      Seq.empty[(Int, Double)].toDF("y", "s"), col("y") === 1, col("s")).collect()(0)
    assert(r.getAs[Double]("auc").isNaN || r.isNullAt(r.fieldIndex("auc")))
  }

  test("Sinks.writeCsv refuses oversized frames; quotes embedded commas") {
    import spark.implicits._
    val big = spark.range(100).toDF("id")
    intercept[IllegalArgumentException] {
      Sinks.writeCsv(big, "/tmp/graft_guard.csv", maxRows = 10)
    }
    val path = java.nio.file.Files.createTempDirectory("csv").resolve("q.csv").toString
    Sinks.writeCsv(Seq(("a,b", 1), ("c\"d", 2)).toDF("s", "n"), path)
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
    assert(lines.get(1) === "\"a,b\",1")
    assert(lines.get(2) === "\"c\"\"d\",2")
  }

  test("packSequences on empty input yields zero packs; sampler pct edges") {
    import spark.implicits._
    assert(Curation.packSequences(
      Seq.empty[(Long, Int)].toDF("doc_id", "n_tokens"), "doc_id", "n_tokens", 100).count() === 0)
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    assert(Sampling.modSample(orders, "o_orderkey", 0).count() === 0)
    assert(Sampling.modSample(orders, "o_orderkey", 100).count() === orders.count())
  }

  test("text stats on pathological strings: empty, single char, all punctuation") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "x"), (3L, "!!! ??? ...")).toDF("doc_id", "text")
    val out = TextStats.profile(df, "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size === 3)
    assert(out(1L).getAs[String]("lang_id") === "unknown")
    assert(out(2L).getAs[Int]("n_tokens") === 1)
    assert(out(3L).getAs[Int]("n_tokens_bpeish") === 9) // each mark is a token
    out.values.foreach { r =>
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0)
      assert(r.getAs[String]("fingerprint") != null)
    }
  }

  test("pqTopK on an empty corpus returns an empty result with the ANN schema") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Double])].toDF("vec_id", "embedding")
    val q = Seq((1L, Array.fill(8)(1.0))).toDF("vec_id", "embedding")
    val out = graft.llm.Similarity.pqTopK(empty, q, "vec_id", "embedding", k = 3, dim = 8, m = 2)
    assert(out.columns.toSeq === Seq("query_id", "corpus_id", "cos", "rk"))
    assert(out.count() === 0)
  }

  test("decile variants and global rank survive empty and single-row inputs") {
    import spark.implicits._
    import graft.core.Relational
    val empty = Seq.empty[Double].toDF("x")
    assert(Relational.decileExact(empty, Seq(col("x"))).count() === 0)
    assert(Relational.decileQcut(empty, "x").count() === 0)
    assert(Relational.whaleContingency(empty, Seq(col("x")), col("x") > 0).count() === 1)
    val one = Seq(7.0).toDF("x")
    val d1 = Relational.decileExact(one, Seq(col("x"))).collect()
    assert(d1.length === 1 && d1(0).getAs[Int]("decile") === 1) // ntile(10) of 1 row → bucket 1
    val q1 = Relational.decileQcut(one, "x").collect()
    assert(q1.length === 1 && q1(0).getAs[Int]("decile") === 0) // qcut codes 0-based
    val ranked = Relational.withGlobalRank(one, Seq(col("x")), "rk", "n").collect()
    assert(ranked.length === 1 &&
      ranked(0).getAs[Long]("rk") === 1L && ranked(0).getAs[Long]("n") === 1L)
  }

  test("bandLabel with empty bands puts everything in rest; topK k=0 empty") {
    import spark.implicits._
    val df = Seq(1.0, 2.0).toDF("x")
    val banded = df.withColumn("b", Relational.bandLabel(col("x"), Seq.empty, "all"))
    assert(banded.collect().forall(_.getString(1) === "all"))
    assert(Relational.topKPerGroup(df.withColumn("g", lit("a")), Seq("g"),
      Seq(col("x")), 0).count() === 0)
  }

  test("incremental near-dup paths handle empty batch and empty index") {
    import spark.implicits._
    import graft.llm.Dedup
    val docs = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val index = Dedup.nearDupIndex(docs, "doc_id", "text", w = 3, k = 16, bands = 4)
    // empty batch against a real index → no pairs, no crash
    assert(Dedup.incrementalNearDup(docs, index, emptyDocs, "doc_id", "text",
      w = 3, k = 16, bands = 4).count() === 0L)
    // real batch against an empty index → batch-internal pairs only
    val emptyIndex = Dedup.nearDupIndex(emptyDocs, "doc_id", "text", w = 3, k = 16, bands = 4)
    val internal = Dedup.incrementalNearDup(emptyDocs, emptyIndex, docs, "doc_id", "text",
      w = 3, k = 16, bands = 4, minJaccard = 0.9).collect()
    assert(internal.length === 1 &&
      internal(0).getAs[Long]("id_a") === 1L && internal(0).getAs[Long]("id_b") === 2L)
    // embedding twin: empty batch and empty index
    val vecs = Seq((1L, Array.fill(4)(1.0f)), (2L, Array.fill(4)(1.0f)))
      .toDF("vec_id", "embedding")
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val vIndex = Dedup.cosineIndex(vecs, "vec_id", "embedding", dim = 4, nPlanes = 8, nBands = 4)
    assert(Dedup.incrementalCosineNearDup(vecs, vIndex, emptyVecs, "vec_id", "embedding",
      minCos = 0.9, dim = 4, nPlanes = 8, nBands = 4).count() === 0L)
    val vEmptyIndex = Dedup.cosineIndex(emptyVecs, "vec_id", "embedding",
      dim = 4, nPlanes = 8, nBands = 4)
    val vInternal = Dedup.incrementalCosineNearDup(emptyVecs, vEmptyIndex, vecs,
      "vec_id", "embedding", minCos = 0.9, dim = 4, nPlanes = 8, nBands = 4).collect()
    assert(vInternal.length === 1 && vInternal(0).getAs[Double]("cos") > 0.999)
  }

  test("tokenDivergence: one-sided and empty corpora stay finite and well-defined") {
    import spark.implicits._
    import graft.llm.Frequency
    val a = Seq("alpha beta").toDF("text")
    val empty = Seq.empty[String].toDF("text")
    // empty B: smoothing keeps every pb > 0, so KL is finite, not NaN/Inf
    val r = Frequency.tokenDivergence(a, empty, "text").collect()(0)
    assert(r.getAs[Long]("n_tokens_a") === 2L && r.getAs[Long]("n_tokens_b") === 0L)
    assert(!r.getAs[Double]("kl_ab").isNaN && !r.getAs[Double]("kl_ab").isInfinite)
    assert(r.getAs[Double]("js") >= 0.0 && r.getAs[Double]("js") <= math.log(2) + 1e-12)
    // both empty: zero vocab, zero divergence row (sums over nothing)
    val z = Frequency.tokenDivergence(empty, empty, "text").collect()(0)
    assert(z.getAs[Long]("vocab") === 0L)
  }

  test("normalizeEventTs long branch is exact micros truncation for random nanos") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // random instants across the full sane window [1990, 2100)
    val lo = 631152000000000000L
    val span = 4102444800000000000L - lo
    val nanos = Seq.fill(200)(lo + math.abs(rnd.nextLong()) % span)
    val df = nanos.toDF("ts")
    val out = graft.core.Tables.normalizeEventTs(df)
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0))
    assert(out.toSeq === nanos.map(_ / 1000L))
  }

  test("normalizeEventTs fails loudly on micros-scale longs (1000× unit guard)") {
    import spark.implicits._
    // a bare-INT64 micros producer: 2023 instants at micros scale are 3
    // orders of magnitude below the nanos floor — must error, not shift
    val df = Seq(1700000000123456L).toDF("ts")
    val e = intercept[Exception] {
      graft.core.Tables.normalizeEventTs(df).collect()
    }
    assert(e.getMessage.contains("epoch range"), e.getMessage)
    // nulls pass through as null, no error
    val okNull = Seq[Option[Long]](None, Some(1700000000123456000L))
      .toDF("ts")
    val got = graft.core.Tables.normalizeEventTs(okNull)
      .select(unix_micros(col("ts"))).collect()
    assert(got(0).isNullAt(0) && got(1).getLong(0) === 1700000000123456L)
  }

  test("Verify artifact JSON survives control chars and quotes (failed.json path)") {
    // exception messages and builder-authored SQL both flow through
    // jsonStr/jsonObj into driver-parsed artifacts; a raw tab, newline,
    // or quote would make json.load fail and zero the round's correctness
    val obj = Verify.jsonObj(Seq(
      "q1" -> "DATATYPE_MISMATCH: \"(ts div 1000)\"\n\tat line 1",
      "q2" -> "back\\slash and  ctrl"))
    val parsed = spark.read.json(
      spark.createDataset(Seq(obj))(org.apache.spark.sql.Encoders.STRING))
    val row = parsed.select("q1", "q2").head
    assert(row.getString(0) === "DATATYPE_MISMATCH: \"(ts div 1000)\"\n\tat line 1")
    assert(row.getString(1) === "back\\slash and  ctrl")
  }

  test("ksTwoSample requires exactly two groups; degenerate same-sample gives ks 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val one = Seq(("a", 1.0, 1L), ("a", 2.0, 2L)).toDF("g", "v", "t")
    intercept[IllegalArgumentException] {
      graft.core.Validation.ksTwoSample(one, "g", "v", col("t"))
    }
    val three = Seq(("a", 1.0, 1L), ("b", 2.0, 2L), ("c", 3.0, 3L)).toDF("g", "v", "t")
    intercept[IllegalArgumentException] {
      graft.core.Validation.ksTwoSample(three, "g", "v", col("t"))
    }
    // identical distributions interleaved: D bounded by 1/n, far under crit
    val same = (1 to 50).flatMap(i =>
      Seq(("a", i.toDouble, i.toLong * 2), ("b", i.toDouble, i.toLong * 2 + 1)))
      .toDF("g", "v", "t")
    val r = graft.core.Validation.ksTwoSample(same, "g", "v", col("t")).head
    assert(r.getAs[Double]("ks_stat") <= 1.0 / 50 + 1e-12)
    assert(!r.getAs[Boolean]("drifted"))
  }

  test("compactParquet validates target bytes and compacts a fragmented dir losslessly") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val df = (1L to 1000L).toDF("id")
    df.repartition(32).write.mode("overwrite").parquet(s"$d/frag")
    intercept[IllegalArgumentException] {
      graft.io.Sinks.compactParquet(spark, s"$d/frag", s"$d/out", 0L)
    }
    val (before, after) = graft.io.Sinks.compactParquet(
      spark, s"$d/frag", s"$d/out", targetBytes = 64L * 1024 * 1024)
    assert(before === 32 && after === 1)
    val got = spark.read.parquet(s"$d/out").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === (1L to 1000L))
  }

  test("ksTwoSample: non-string group columns cast cleanly; null groups rejected loudly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // integer group labels must not ClassCastException (cast in the slim
    // projection, not getString on collect)
    val ints = (1 to 40).flatMap(i =>
      Seq((0, i.toDouble, i.toLong * 2), (1, i.toDouble, i.toLong * 2 + 1)))
      .toDF("g", "v", "t")
    val r = graft.core.Validation.ksTwoSample(ints, "g", "v", col("t")).head
    assert(r.getAs[Double]("ks_stat") <= 1.0 / 40 + 1e-12)
    // a null group label is a data bug, not a third group — loud error
    val withNull = Seq((Option("a"), 1.0, 1L), (Option.empty[String], 2.0, 2L),
      (Option("b"), 3.0, 3L)).toDF("g", "v", "t")
    val e = intercept[IllegalArgumentException] {
      graft.core.Validation.ksTwoSample(withNull, "g", "v", col("t"))
    }
    assert(e.getMessage.contains("null"))
  }

  test("snapshotDiff classifies by key PRESENCE, null-safe on null fingerprints") {
    import spark.implicits._
    // key 2 exists in BOTH snapshots with a null fingerprint (md5 of a
    // null payload) — presence flags must say 'unchanged' (null <=> null),
    // never 'added'/'removed'; key 3 goes value → null = 'changed'
    val prev = Seq((1L, Option("x")), (2L, Option.empty[String]), (3L, Option("y")))
      .toDF("k", "fp")
    val cur = Seq((2L, Option.empty[String]), (3L, Option.empty[String]), (4L, Option("z")))
      .toDF("k", "fp")
    val diff = graft.core.Merge.snapshotDiff(prev, cur, "k", "fp")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff === Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("maxSimVsSet: empty ref set and zero-norm vectors fail loudly, not NaN/-Inf") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val one = Seq((1L, Array(1.0, 0.0))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      graft.llm.Similarity.maxSimVsSet(one, "vec_id", "embedding",
        one.where(lit(false)), "vec_id", "embedding")
    }
    val zref = Seq((7L, Array(0.0, 0.0))).toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      graft.llm.Similarity.maxSimVsSet(one, "vec_id", "embedding",
        zref, "vec_id", "embedding")
    }
    assert(e1.getMessage.contains("zero-norm"))
    // zero-norm CORPUS vector surfaces from inside the job (wrapped)
    val e2 = intercept[Exception] {
      graft.llm.Similarity.maxSimVsSet(zref, "vec_id", "embedding",
        one, "vec_id", "embedding").collect()
    }
    assert(e2.getMessage.contains("zero-norm") ||
      Option(e2.getCause).exists(_.getMessage.contains("zero-norm")))
  }

  test("compactParquet refuses a hive-partitioned dir instead of collapsing it") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = java.nio.file.Files.createTempDirectory("graft_compact13").toString
    (1L to 10L).toDF("id").withColumn("p", col("id") % 2)
      .write.partitionBy("p").parquet(s"$d/part")
    val e = intercept[IllegalArgumentException] {
      graft.io.Sinks.compactParquet(spark, s"$d/part", s"$d/out", 1024L * 1024)
    }
    assert(e.getMessage.contains("per-partition"))
  }

  test("jlTopK/maxSimVsSet argument guards and empty-corpus behavior") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    intercept[IllegalArgumentException] {
      graft.llm.Similarity.jlTopK(emb, emb.where(col("vec_id") < 2),
        "vec_id", "embedding", k = 0, dim = 64)
    }
    intercept[IllegalArgumentException] {
      graft.llm.Similarity.jlTopK(emb, emb.where(col("vec_id") < 2),
        "vec_id", "embedding", k = 3, dim = 64, overscan = 0)
    }
    val emptyCorpus = emb.where(lit(false))
    val out = graft.llm.Similarity.maxSimVsSet(
      emptyCorpus, "vec_id", "embedding",
      emb.where(col("vec_id") < 3), "vec_id", "embedding")
    assert(out.count() === 0L)
  }
}
