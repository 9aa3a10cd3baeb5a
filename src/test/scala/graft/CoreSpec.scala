package graft

import org.apache.spark.sql.functions._
import graft.core.{FeatureCatalog, Relational, Validation, WideAgg}
import graft.llm.{Multimodal, TextStats}

class CoreSpec extends SparkSpec {

  test("targetFamily: reference >=3-token rule") {
    assert(FeatureCatalog.targetFamily("target_credit_1") === "credit")
    assert(FeatureCatalog.targetFamily("target_7") === "unknown")
    assert(FeatureCatalog.targetFamily("weird") === "unknown")
    assert(FeatureCatalog.targetFamily("target_a_b_c") === "a")
  }

  test("bandLabel assigns upper-bound-exclusive bands") {
    import spark.implicits._
    val df = Seq(0.01, 0.02, 0.049, 0.05, 0.2).toDF("x")
      .withColumn("band", Relational.bandLabel(col("x"),
        Seq("low" -> 0.02, "mid" -> 0.05), "high"))
    val got = df.collect().map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(got(0.01) === "low" && got(0.02) === "mid" && got(0.049) === "mid")
    assert(got(0.05) === "high" && got(0.2) === "high")
  }

  test("topKPerGroup keeps exactly k with deterministic tie-break") {
    import spark.implicits._
    val df = Seq(("a", 1, 10.0), ("a", 2, 10.0), ("a", 3, 5.0), ("b", 4, 1.0))
      .toDF("g", "id", "v")
    val top = Relational.topKPerGroup(df, Seq("g"), Seq(col("v").desc, col("id")), 2)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Int]("id"), r.getAs[Int]("rk")))
    assert(top.toSet === Set(("a", 1, 1), ("a", 2, 2), ("b", 4, 1)))
  }

  test("decileExact and decileByRange agree on distinct values") {
    import spark.implicits._
    val df = (1 to 1000).map(_.toDouble).toDF("x")
    val exact = Relational.decileExact(df, Seq(col("x")))
      .groupBy("decile").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(exact.values.forall(_ == 100L) && exact.size === 10)
    val ranged = Relational.decileByRange(df, "x", relErr = 1e-6)
      .groupBy("decile").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(ranged.size === 10 && ranged.values.sum === 1000L)
    assert(ranged.values.forall(n => n >= 90 && n <= 110)) // near-equal buckets
  }

  test("decileQcut drops duplicate edges like pd.qcut(duplicates=\"drop\")") {
    import spark.implicits._
    // 80% zeros: quantile edges at p=0..0.8 all collapse to 0.0 → pandas
    // qcut keeps 3 buckets: [0,0] code 0, (0,5] code 1, (5,10] code 2
    // (edges 0, 5.0 interpolated, 10). ntile would split the zero run.
    val xs = Seq.fill(80)(0.0) ++ (1 to 10).map(_.toDouble) ++ (1 to 10).map(_ + 90.0)
    val df = xs.toDF("x")
    val codes = Relational.decileQcut(df, "x")
      .groupBy("decile").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(codes(0) === 80L, codes)                     // the whole tie run in ONE bucket
    assert(codes.keys.max.toLong === codes.size - 1L, codes) // consecutive 0-based codes
    assert(codes.values.sum === 100L)
    // deciles of distinct uniform data match equal-count buckets
    val uni = Relational.decileQcut((1 to 1000).map(_.toDouble).toDF("x"), "x")
      .groupBy("decile").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(uni.size === 10 && uni.values.forall(_ === 100L), uni)
    // nulls get a null code
    val withNull = Relational.decileQcut(
      (Seq[java.lang.Double](null) ++ (1 to 9).map(d => java.lang.Double.valueOf(d.toDouble))).toDF("x"), "x")
    assert(withNull.where(col("x").isNull).collect().forall(_.isNullAt(1)))
  }

  test("upsert: updates win, inserts land, untouched rows pass through") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "v", "x")
    val updates = Seq((2L, "B", 99.0), (4L, "d", 40.0)).toDF("k", "v", "x")
    val out = graft.core.Relational.upsert(base, updates, Seq("k"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(out === Map(
      1L -> ("a", 10.0), 2L -> ("B", 99.0), 3L -> ("c", 30.0), 4L -> ("d", 40.0)))
  }

  test("unseenValues = left-distinct minus right-distinct") {
    import spark.implicits._
    val l = Seq("a", "b", "c", "c").toDF("k")
    val r = Seq("b", "d").toDF("k")
    assert(Relational.unseenValues(l, r, "k").collect().map(_.getString(0)).toSeq === Seq("a", "c"))
  }

  test("withGlobalCumSum equals the driver prefix sum at any partition count") {
    import spark.implicits._
    // unique order values (the documented contract: pre-aggregate so
    // ties cannot exist), deterministic pseudo-random weights
    val rows = (1 to 500).map(i => (((i * 37) % 499) * 1000 + i, (i % 7 + 1).toLong))
    val truth = rows.sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, acc), (v, w)) => (v.toLong, acc + w) }
      .drop(1).toMap
    for (p <- Seq(1, 3, 8)) {
      val df = rows.toDF("v", "w").repartition(p)
      val got = graft.core.Relational
        .withGlobalCumSum(df, Seq(col("v")), col("w"), "cum")
        .collect().map(r => r.getAs[Int]("v").toLong -> r.getAs[Long]("cum")).toMap
      assert(got === truth, s"partitions=$p")
    }
  }

  test("withGlobalCumMax equals the driver strict-prior max at any partition count") {
    import spark.implicits._
    // unique order values (same pre-aggregate contract as cumSum);
    // values chosen so the running max both advances and stalls
    val rows = (1 to 500).map(i => (((i * 37) % 499) * 1000 + i, ((i * 53) % 97).toLong))
    val sorted = rows.sortBy(_._1)
    val truth = sorted.indices.map { i =>
      val prior = sorted.take(i).map(_._2)
      sorted(i)._1.toLong -> (if (prior.isEmpty) None else Some(prior.max))
    }.toMap
    for (p <- Seq(1, 3, 8)) {
      val df = rows.toDF("v", "m").repartition(p)
      val got = graft.core.Relational
        .withGlobalCumMax(df, Seq(col("v")), col("m"), "rmax")
        .collect().map(r => r.getAs[Int]("v").toLong ->
          (if (r.isNullAt(r.fieldIndex("rmax"))) None
           else Some(r.getAs[Long]("rmax")))).toMap
      assert(got === truth, s"partitions=$p")
    }
  }

  test("withGlobalCumMax skyline identity: survivor set matches the O(n²) dominance filter") {
    import spark.implicits._
    // (price, size) points with duplicates, shared prices, and ties —
    // w19's exact operator contract: keep iff NOT dominated, where
    // dominance = (price ≤, size ≥) with at least one strict
    val pts = Seq((5, 3), (5, 3), (4, 7), (6, 9), (6, 9), (3, 2), (4, 5),
      (7, 9), (8, 10), (3, 1), (9, 10))
    val brute = pts.zipWithIndex.filterNot { case ((p, sz), i) =>
      pts.zipWithIndex.exists { case ((p2, s2), j) =>
        j != i && p2 <= p && s2 >= sz && (p2 < p || s2 > sz)
      }
    }.map(_._1).toSet
    val h = pts.toDF("pr", "sz").groupBy(col("pr"))
      .agg(max(col("sz")).as("ms"))
    val r = graft.core.Relational
      .withGlobalCumMax(h, Seq(col("pr")), col("ms"), "rmax")
    val got = pts.toDF("pr", "sz").join(r, Seq("pr"))
      .where(col("sz") === col("ms") &&
        (col("rmax").isNull || col("sz") > col("rmax")))
      .select(col("pr"), col("sz"))
      .collect().map(x => (x.getInt(0), x.getInt(1))).toSet
    assert(got === brute)
  }

  test("withGlobalCumSum on a histogram reproduces the doubled average tie rank (a28 identity)") {
    import spark.implicits._
    val vals = Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5).map(_.toDouble)
    val hist = vals.toDF("v").groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val got = graft.core.Relational
      .withGlobalCumSum(hist, Seq(col("v")), col("cnt"), "cum")
      .select(col("v"), (lit(2L) * col("cum") - col("cnt") + 1L).as("r2"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    // driver truth: 2 * average rank (ranks 1..n over the sorted multiset)
    val sorted = vals.sorted.zipWithIndex.map { case (v, i) => (v, i + 1) }
    val truth = sorted.groupBy(_._1).map { case (v, rs) =>
      v -> (2 * rs.map(_._2).sum / rs.size).toLong }
    assert(got === truth)
  }

  test("nullProfile preserves null vs value distinction") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Double)]((1.0, null), (2.0, null), (3.0, 1.0))
      .toDF("full", "sparse")
    val rates = WideAgg.nullProfile(df, Seq("full", "sparse"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("full") === 0.0)
    assert(math.abs(rates("sparse") - 2.0 / 3.0) < 1e-12)
  }

  test("horizontalSum adds columns as long") {
    import spark.implicits._
    val df = Seq((1, 2, 3), (4, 5, 6)).toDF("a", "b", "c")
    val s = df.select(WideAgg.horizontalSum(Seq("a", "b", "c")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(s === Seq(6L, 15L))
  }

  test("multimodal features compose with ANN search (decode → embed → top-k)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val feats = Multimodal.extractFeatures(Multimodal.fromDocuments(docs))
      .withColumnRenamed("media_id", "vec_id")
      .withColumnRenamed("features", "embedding")
    val queries = feats.where(col("vec_id") < 3)
    val top = graft.llm.Similarity.bruteForceTopK(feats, queries, "vec_id", "embedding",
      k = 2, dim = Multimodal.FeatureDim).collect()
    assert(top.groupBy(_.getAs[Long]("query_id")).size === 3)
    assert(top.forall(r => r.getAs[Double]("cos") >= -1.0 && r.getAs[Double]("cos") <= 1.0))
  }

  test("stratifiedModSample keeps exactly the per-stratum mod buckets") {
    import spark.implicits._
    import graft.core.Sampling
    val df = (0 until 1000).map(i => (i.toLong, if (i % 2 == 0) "a" else "b")).toDF("id", "src")
    val kept = Sampling.stratifiedModSample(df, "id", "src", Map("a" -> 30), defaultPct = 0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // stratum b fully dropped; stratum a keeps exactly id%100 < 30
    assert(kept.forall(_._2 == "a"))
    assert(kept.map(_._1).toSet === (0 until 1000).filter(i => i % 2 == 0 && i % 100 < 30).map(_.toLong).toSet)
    // default applies to unlisted strata
    val withDefault = Sampling.stratifiedModSample(df, "id", "src", Map("a" -> 0), defaultPct = 100)
      .collect().map(_.getString(1))
    assert(withDefault.nonEmpty && withDefault.forall(_ == "b"))
  }

  test("bigramPerplexity: in-distribution text scores lower than unseen text") {
    import spark.implicits._
    val ref = Seq((1L, "the cat sat on the mat"), (2L, "the cat ran to the mat"))
      .toDF("doc_id", "text")
    val score = Seq(
      (10L, "the cat sat on the mat"),   // exactly in-distribution
      (11L, "zeta qux blorp wib nix"),   // all-unseen bigrams
      (12L, "x")                         // single token → no bigrams → excluded
    ).toDF("doc_id", "text")
    val out = TextStats.bigramPerplexity(score, ref, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[Long]("n_bigrams"), r.getAs[Double]("ppl")))
      .toMap
    assert(out.keySet === Set(10L, 11L))
    assert(out(10L)._1 === 5L)
    assert(out(10L)._2 < out(11L)._2, s"in-dist ${out(10L)._2} !< unseen ${out(11L)._2}")
    assert(out(10L)._2 >= 1.0) // perplexity is bounded below by 1 for any proper model
  }

  test("scrubPii replaces emails, IPs and phone runs; leaves clean text alone") {
    import spark.implicits._
    val df = Seq(
      "contact me at john.doe+x@example.co.uk ok",
      "server at 192.168.1.100 responded",
      "call +1 555 123-4567 now",
      "plain text no pii at all").toDF("text")
    val out = df.select(TextStats.scrubPii(col("text"))).collect().map(_.getString(0))
    assert(out(0) === "contact me at <EMAIL> ok")
    assert(out(1) === "server at <IP> responded")
    assert(out(2) === "call <PHONE> now")
    assert(out(3) === "plain text no pii at all")
  }

  test("TextStats.wordRepetition: hand-computed rep_ratio and top_share") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a a"),          // 4 tokens, 1 distinct → rep 0.75, top 1.0
      (2L, "a b c d"),          // all distinct → rep 0.0, top 0.25
      (3L, "spam spam eggs")    // 3 tokens, 2 distinct → rep 1/3, top 2/3
    ).toDF("doc_id", "text")
    val out = TextStats.wordRepetition(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("rep_ratio"), r.getAs[Double]("top_share")))
      .toMap
    assert(out(1L) === ((4L, 0.75, 1.0)))
    assert(out(2L) === ((4L, 0.0, 0.25)))
    assert(out(3L)._1 === 3L)
    assert(math.abs(out(3L)._2 - 1.0 / 3) < 1e-12 && math.abs(out(3L)._3 - 2.0 / 3) < 1e-12)
  }

  test("TextStats.gopherGates: hand-computed n-gram fractions and pass flags") {
    import spark.implicits._
    val df = Seq(
      // "ab ab ab ab": bigrams "ab ab"×3 → top_bigram_frac = 3*5/11 (cap 1.0 → 1.0)
      // trigrams "ab ab ab"×2 → dup chars 2*8=16 → 16/11 capped to 1.0
      (1L, "ab ab ab ab"),
      // all-distinct words: top bigram count 1, no dup trigrams
      (2L, "one two three four five"),
      // single word: no bigrams/trigrams at all → 0.0 / 0.0, passes
      (3L, "solo")
    ).toDF("doc_id", "text")
    val out = TextStats.gopherGates(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("top_bigram_frac"), r.getAs[Double]("dup_trigram_frac"),
          r.getAs[Int]("gopher_pass"))).toMap
    assert(out(1L) === ((1.0, 1.0, 0)))
    // doc 2: top bigram "five four"? no — min lexicographic among count-1
    // ties; any has len 9? bigrams: "one two"(7) "two three"(9) "three four"(10)
    // "four five"(9); min lexicographic = "four five" (len 9), frac = 9/23
    assert(math.abs(out(2L)._1 - math.round(9.0 / 23 * 1e6) / 1e6) < 1e-12)
    // 9/23 ≈ 0.39 > 0.18: the Gopher top-bigram gate is aggressive on
    // tiny docs — doc 2 fails it despite having no repetition at all
    assert(out(2L)._2 === 0.0 && out(2L)._3 === 0)
    assert(out(3L) === ((0.0, 0.0, 1)))
  }

  test("TextStats: tokens, langId, fingerprint determinism") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog is here"),
      (2L, "der hund und die katze ist da"),
      (3L, "xyzzy plugh")).toDF("doc_id", "text")
    val out = TextStats.profile(df, "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("lang_id") === "en")
    assert(out(2L).getAs[String]("lang_id") === "de")
    assert(out(3L).getAs[String]("lang_id") === "unknown")
    assert(out(1L).getAs[Int]("n_tokens") === 7)
    // fingerprint is stable across runs
    val fp2 = TextStats.profile(df, "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fingerprint")).toMap
    out.foreach { case (id, r) => assert(r.getAs[String]("fingerprint") === fp2(id)) }
  }

  test("WideAgg batching survives 2241 columns (reference width, 6 batches)") {
    import spark.implicits._
    val n = 2241
    var df = spark.range(50).toDF("id")
    val exprs = (0 until n).map(i => (pmod(col("id") + i, lit(7))).cast("double").as(s"c$i"))
    df = df.select((col("id") +: exprs): _*)
    val sums = WideAgg.runBatched(df, (0 until n).map(i => s"c$i"), c => sum(col(c)))
    assert(sums.size === n)
    // spot-check c0: sum of (id % 7) over id=0..49
    val expect0 = (0 until 50).map(_ % 7).sum.toDouble
    assert(sums.toMap.apply("c0") === Some(expect0))
  }

  test("sketch twins: approx distinct within rsd, approx quantiles within relErr") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val exact = li.agg(
      countDistinct(col("l_partkey")).as("p"),
      countDistinct(col("l_suppkey")).as("s")).collect()(0)
    val approx = Relational.distinctCountApprox(li, Seq("l_partkey", "l_suppkey"), rsd = 0.02)
      .collect()(0)
    assert(math.abs(approx.getLong(0) - exact.getLong(0)).toDouble / exact.getLong(0) < 0.1)
    assert(math.abs(approx.getLong(1) - exact.getLong(1)).toDouble / exact.getLong(1) < 0.1)
    // h2's frozen oracle (approx_ok = TRUE) rests on this bound: surface the
    // observed error in the failure message so a future flip is legible.
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val h2 = ord.agg(
      countDistinct(col("o_custkey")).as("e"),
      approx_count_distinct(col("o_custkey"), 0.05).as("a")).collect()(0)
    val h2err = math.abs(h2.getLong(1) - h2.getLong(0)).toDouble / h2.getLong(0)
    assert(h2err <= 3 * 0.05, s"h2 window: observed relative error $h2err > 3*rsd")
    val Seq(p50, p99) = Relational.quantilesApprox(li, "l_extendedprice", Seq(0.5, 0.99), 1e-4)
    val exactQ = li.agg(
      percentile(col("l_extendedprice"), lit(0.5)),
      percentile(col("l_extendedprice"), lit(0.99))).collect()(0)
    assert(math.abs(p50 - exactQ.getDouble(0)) / exactQ.getDouble(0) < 0.01)
    assert(math.abs(p99 - exactQ.getDouble(1)) / exactQ.getDouble(1) < 0.01)
  }

  test("cmsTopK: exact counts, never-undercount, eps window on a skewed key") {
    import spark.implicits._
    // zipf-ish: key k appears 200/k times → heavy head, long tail
    val rows = (1 to 50).flatMap(k => Seq.fill(200 / k)(k.toLong)).toDF("key")
    val got = Relational.cmsTopK(rows, "key", k = 3, eps = 0.01).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 200L), (2L, 100L), (3L, 66L)))
    assert(got.forall(_.getBoolean(2)), "CMS must never undercount")
    assert(got.forall(_.getBoolean(3)), "CMS estimate outside the eps window")
  }

  test("Multimodal: stub decoder histogram sums to 1; frameSample slices payload") {
    val bins = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    assert(bins.length === 16)
    assert(math.abs(bins.sum - 1.0f) < 1e-5f)
    assert(Multimodal.decodeStub(Array.emptyByteArray).sum === 0.0f)

    import spark.implicits._
    val docs = Seq((1L, "a" * 100), (2L, "b" * 10)).toDF("doc_id", "text")
    val media = Multimodal.fromDocuments(docs)
    val frames = Multimodal.frameSample(media, n = 4, frameBytes = 10).collect()
    assert(frames.count(_.getAs[Long]("media_id") == 1L) === 4)
    val feats = Multimodal.extractFeatures(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Seq[Float]]("features")).toMap
    assert(feats(1L).length === 16)
    // 'a' = 0x61 → bin 6 gets everything
    assert(math.abs(feats(1L)(6) - 1.0f) < 1e-6f)
  }

  test("Validation: one-pass constraint report catches planted violations") {
    import spark.implicits._
    val df = Seq((1L, Some(10.0), "A"), (2L, None, "A"), (2L, Some(-5.0), "Z"))
      .toDF("id", "v", "cat")
    val rep = Validation.constraintReport(df, Seq(
      Validation.completeness("v"),
      Validation.uniqueness("id"),
      Validation.minBound("v", 0.0),
      Validation.inDomain("cat", Seq("A", "B"))))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(!rep("completeness_v")._2 && math.abs(rep("completeness_v")._1 - 2.0 / 3) < 1e-9)
    assert(!rep("uniqueness_id")._2 && math.abs(rep("uniqueness_id")._1 - 2.0 / 3) < 1e-9)
    assert(!rep("min_v")._2 && rep("min_v")._1 === -5.0)
    assert(!rep("domain_cat")._2 && rep("domain_cat")._1 === 1.0)
    val parent = Seq(Tuple1(1L)).toDF("pid")
    val ref = Validation.referentialCheck(df, parent, "id", "pid", "ref").collect()(0)
    assert(ref.getDouble(1) === 2.0 && !ref.getBoolean(2))
    // a clean frame passes everything
    val clean = Seq((1L, Some(1.0), "A"), (2L, Some(2.0), "B")).toDF("id", "v", "cat")
    val ok = Validation.constraintReport(clean, Seq(
      Validation.completeness("v"), Validation.uniqueness("id"),
      Validation.minBound("v", 0.0), Validation.inDomain("cat", Seq("A", "B"))))
      .collect()
    assert(ok.forall(_.getBoolean(2)))
  }

  test("Multimodal: real PNG decode — dims, mean luminance, histogram; stub fallback") {
    // closed-form gradient: pixel (x,y) = x + y → mean = (w + h - 2) / 2
    val png = Multimodal.syntheticPng(20, 10)
    // it IS a PNG (magic bytes), not a raw raster
    assert((png(0) & 0xFF) === 0x89 && png(1) === 'P'.toByte)
    val f = Multimodal.decodeImage(png).get
    assert(f.width === 20 && f.height === 10)
    assert(math.abs(f.meanLum - (20 + 10 - 2) / 2.0) < 1e-9)
    assert(math.abs(f.lumHist.sum - 1.0f) < 1e-5f)
    // gradient levels span [0, 28] → bins 0 and 1 only
    assert(f.lumHist(0) > 0f && f.lumHist(1) > 0f && f.lumHist.drop(2).forall(_ === 0f))
    // non-image bytes are not decodable → extractFeatures falls back to stub
    assert(Multimodal.decodeImage("not an image".getBytes("UTF-8")).isEmpty)

    import spark.implicits._
    val docs = Seq((0L, "x"), (7L, "y"), (30L, "z")).toDF("doc_id", "text")
    val media = Multimodal.fromDocumentsPng(docs)
    val decoded = Multimodal.decodeImages(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(decoded(7L).getAs[Int]("width") === 11)   // 7 % 32 + 4
    assert(decoded(7L).getAs[Int]("height") === 11)  // 7 % 24 + 4
    assert(math.abs(decoded(7L).getAs[Double]("mean_lum") - 10.0) < 1e-9)
    assert(decoded(30L).getAs[Int]("height") === 10) // 30 % 24 + 4
    // extractFeatures takes the REAL decode path for decodable image payloads
    val real = Multimodal.extractFeatures(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Seq[Float]]("features")).toMap
    assert(real(0L).drop(1).forall(_ === 0f)) // 4x4 gradient: levels ≤ 6 → bin 0 only
    assert(math.abs(real(0L).sum - 1.0f) < 1e-5f)
  }

  test("Multimodal: nearest-neighbor resize — exact pixels, round-trips the codec") {
    // 4x4 gradient (pixel = x+y) resized to 2x2: NN picks src (x*4/2, y*4/2)
    // = (0,0),(2,0),(0,2),(2,2) → values 0,2,2,4 → mean 2.0
    val png = Multimodal.syntheticPng(4, 4)
    val resized = Multimodal.resizeImage(png, 2, 2).get
    val f = Multimodal.decodeImage(resized).get
    assert(f.width === 2 && f.height === 2)
    assert(math.abs(f.meanLum - 2.0) < 1e-9)
    // upscale 2x2 -> 4x4 repeats each pixel 2x2: mean is preserved
    val small = Multimodal.syntheticPng(2, 2) // pixels 0,1,1,2 → mean 1.0
    val up = Multimodal.decodeImage(Multimodal.resizeImage(small, 4, 4).get).get
    assert(up.width === 4 && math.abs(up.meanLum - 1.0) < 1e-9)
    // undecodable input → None, not an exception
    assert(Multimodal.resizeImage("junk".getBytes("UTF-8"), 2, 2).isEmpty)
  }

  test("weightedQuantiles: hand-computed expansion semantics, two groups, w=0 dropped") {
    import spark.implicits._
    // g=a expands to [10,20,20,20]: p25 -> pos .75 -> 17.5; median -> pos 1.5
    // -> 20; p75 -> pos 2.25 -> 20. g=b single row: all quantiles = 5.
    val df = Seq(("a", 10.0, 1L), ("a", 20.0, 3L), ("b", 5.0, 2L), ("b", 99.0, 0L))
      .toDF("g", "v", "w")
    val out = graft.core.Relational
      .weightedQuantiles(df, "g", "v", "w", ps = Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("total_weight") == 4L)
    assert(a.getAs[Double]("q_0_25") == 17.5)
    assert(a.getAs[Double]("q_0_5") == 20.0)
    assert(a.getAs[Double]("q_0_75") == 20.0)
    val b = out("b")
    assert(b.getAs[Long]("total_weight") == 2L, "w=0 row must be dropped")
    assert(b.getAs[Double]("q_0_5") == 5.0)
  }

  test("Multimodal: aHash — hand-computed bits, identity, and sensitivity") {
    import javax.imageio.ImageIO
    import java.io.ByteArrayInputStream
    // 8x8 gradient hashes directly: v = x+y, mean 7.0, bit = (x+y) > 7
    val img8 = ImageIO.read(new ByteArrayInputStream(Multimodal.syntheticPng(8, 8)))
    val h8 = Multimodal.aHash(img8)
    val expected = (for (y <- 0 until 8; x <- 0 until 8)
      yield if (x + y > 7) '1' else '0').mkString
    assert(h8 === expected)
    assert(h8.length === 64 && h8.count(_ == '1') === 28) // strict upper triangle of 8x8
    // perceptually identical payloads → identical hash
    val again = ImageIO.read(new ByteArrayInputStream(Multimodal.syntheticPng(8, 8)))
    assert(Multimodal.aHash(again) === h8)
    // a 16x8 gradient NN-samples v = 2x+y (mean 10.5) — e.g. bit(0,7)
    // flips vs the 8x8 pattern, so the hashes must differ
    val img16 = ImageIO.read(new ByteArrayInputStream(Multimodal.syntheticPng(16, 8)))
    val h16 = Multimodal.aHash(img16)
    assert(h16.length === 64)
    assert(h16 !== h8)
    val expected16 = (for (y <- 0 until 8; x <- 0 until 8)
      yield if (2 * x + y > 10.5) '1' else '0').mkString
    assert(h16 === expected16)
  }

  test("Multimodal: imageNearDupClasses banded join equals brute all-pairs at r<=3") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.fromDocumentsPng(docs)
    val banded = Multimodal.imageNearDupClasses(media, maxHamming = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).toSet
    // brute truth: all-pairs over distinct classes, driver-side hamming
    val classes = Multimodal.imageDedup(media)
      .select("ahash", "n_images").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val brute = (for {
      (ha, na) <- classes; (hb, nb) <- classes if ha < hb
      d = ha.zip(hb).count { case (x, y) => x != y } if d <= 3
    } yield (ha, hb, d, na, nb)).toSet
    assert(banded === brute)
    assert(brute.nonEmpty) // the synthetic classes do contain near-dups
    // blocking that cannot be exact at the radius must refuse
    intercept[IllegalArgumentException] {
      Multimodal.imageNearDupClasses(media, maxHamming = 4, nBands = 4)
    }
  }

  test("Multimodal: imageNearDupResolve equals driver-side CC over brute pairs") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.fromDocumentsPng(docs)
    val resolved = Multimodal.imageNearDupResolve(media, maxHamming = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // brute truth: all-pairs hamming <= 3 over classes, union-find on the
    // driver, clusters labeled by min rep_id, singleton classes included
    val classes = Multimodal.imageDedup(media)
      .select("ahash", "n_images", "rep_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r); r
    }
    for {
      (ha, _, ra) <- classes; (hb, _, rb) <- classes if ha < hb
      if ha.zip(hb).count { case (x, y) => x != y } <= 3
    } {
      val (fa, fb) = (find(ra), find(rb))
      if (fa != fb) { if (fa < fb) parent(fb) = fa else parent(fa) = fb }
    }
    val expected = classes.groupBy { case (_, _, rep) => find(rep) }
      .map { case (cl, cs) =>
        val nImages = cs.map(_._2).sum
        cl -> ((cs.length.toLong, nImages, nImages - 1))
      }
    assert(resolved === expected)
    // at least one multi-class cluster exists on the fixture, and every
    // cluster label is the min media_id of its images (the keep contract)
    assert(expected.values.exists(_._1 > 1))
    val clusterOfRep = classes.map { case (_, _, rep) => rep -> find(rep) }.toMap
    assert(clusterOfRep.forall { case (rep, cl) => cl <= rep })
  }
}
