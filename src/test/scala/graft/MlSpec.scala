package graft

import org.apache.spark.sql.functions._
import graft.ml.{Adversarial, Clustering}

class MlSpec extends SparkSpec {

  test("averageLinkage recovers planted blocks on a two-block distance matrix") {
    // 6 points: {0,1,2} tight, {3,4,5} tight, far apart
    val d = Array.tabulate(6, 6) { (i, j) =>
      if (i == j) 0.0
      else if (i / 3 == j / 3) 0.1
      else 1.0
    }
    val labels = Clustering.averageLinkage(d, 2)
    assert(labels.toSeq === Seq(0, 0, 0, 1, 1, 1))
    val s = Clustering.silhouette(d, labels)
    assert(s > 0.85, s"silhouette $s") // (1.0-0.1)/1.0 = 0.9 per point
  }

  test("averageLinkage k=n gives singletons; k=1 gives one cluster") {
    val d = Array.tabulate(4, 4)((i, j) => if (i == j) 0.0 else (i + j).toDouble)
    assert(Clustering.averageLinkage(d, 4).toSeq === Seq(0, 1, 2, 3))
    assert(Clustering.averageLinkage(d, 1).distinct.length === 1)
  }

  test("silhouette matches hand computation on a 4-point example") {
    // points on a line at 0, 1, 10, 11; clusters {0,1},{2,3}
    val pos = Array(0.0, 1.0, 10.0, 11.0)
    val d = Array.tabulate(4, 4)((i, j) => math.abs(pos(i) - pos(j)))
    val labels = Array(0, 0, 1, 1)
    // point0: a=1, b=(10+11)/2=10.5 → 9.5/10.5; point1: a=1, b=9.5 → 8.5/9.5
    val expected = (9.5 / 10.5 + 8.5 / 9.5 + 8.5 / 9.5 + 9.5 / 10.5) / 4.0
    assert(math.abs(Clustering.silhouette(d, labels) - expected) < 1e-12)
  }

  test("cluster summaries report size, intra-distance, dominant group") {
    val d = Array.tabulate(4, 4)((i, j) => if (i == j) 0.0 else 0.5)
    val s = Clustering.summaries(d, Array(0, 0, 1, 1), Array("x", "x", "x", "y"))
    assert(s.map(_.size) === Seq(2, 2))
    assert(s.head.dominantGroup === "x" && s.head.dominantShare === 1.0)
    assert(s(1).dominantGroup === "x" && s(1).dominantShare === 0.5)
    assert(s.forall(c => math.abs(c.avgIntraDist - 0.5) < 1e-12))
  }

  test("stratifiedSplit keeps both classes in both splits") {
    import spark.implicits._
    val df = ((1 to 200).map(i => (i, 0.0)) ++ (1 to 50).map(i => (i, 1.0))).toDF("x", "y")
    val (tr, te) = Adversarial.stratifiedSplit(df, "y", 0.25, seed = 42L)
    assert(tr.count() + te.count() === 250)
    val teFrac = te.count().toDouble / 250
    assert(teFrac > 0.1 && teFrac < 0.4)
    assert(te.where(col("y") === 1.0).count() > 0 && tr.where(col("y") === 1.0).count() > 0)
  }

  test("adversarial AUC ~ 0.5 on identically-distributed halves (no shift)") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val a = orders.where(pmod(col("o_orderkey"), lit(2)) === 0)
    val b = orders.where(pmod(col("o_orderkey"), lit(2)) === 1)
    val (auc, na, nb) = Adversarial.adversarialAuc(
      a, b, Seq("o_totalprice", "o_custkey"), maxIter = 8, maxDepth = 3)
    assert(na > 0 && nb > 0)
    assert(auc > 0.35 && auc < 0.65, s"adversarial AUC $auc should be ~0.5")
  }

  test("adversarial AUC detects a planted shift") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val a = orders.where(pmod(col("o_orderkey"), lit(2)) === 0)
    val b = orders.where(pmod(col("o_orderkey"), lit(2)) === 1)
      .withColumn("o_totalprice", col("o_totalprice") * 3.0 + 100000.0)
    val (auc, _, _) = Adversarial.adversarialAuc(
      a, b, Seq("o_totalprice", "o_custkey"), maxIter = 8, maxDepth = 3)
    assert(auc > 0.8, s"shifted AUC $auc should be high")
  }

  test("quality classifier recovers a planted lexical gate (separable band)") {
    import spark.implicits._
    // positives carry a marker vocabulary; negatives a disjoint one —
    // exactly the "trusted-domain vs crawl" separable case.
    val docs = (
      (1 to 200).map(i => (i.toLong, s"good clean prose sample n$i", true)) ++
      (201 to 400).map(i => (i.toLong, s"spam noise garbage blob n$i", false))
    ).toDF("doc_id", "text", "lab")
    val (auc, scored) = graft.ml.QualityModel.distillFilter(
      docs, "doc_id", "text", col("lab"))
    assert(graft.ml.QualityModel.aucBand(auc) == "separable", s"auc=$auc")
    // scored frame covers exactly the held-out quarter, and the filter
    // score orders it: every positive's p1 above every negative's
    val rows = scored.collect()
    assert(rows.length == docs.where(pmod(col("doc_id"), lit(4)) === 0).count())
    val minPos = rows.filter(_.getDouble(1) == 1.0).map(_.getDouble(2)).min
    val maxNeg = rows.filter(_.getDouble(1) == 0.0).map(_.getDouble(2)).max
    assert(minPos > maxNeg, s"p1 must separate classes: $minPos vs $maxNeg")
  }

  test("quality classifier reports no signal on text-independent labels") {
    import spark.implicits._
    // label = a multiplicative hash of the id over a SHARED vocabulary:
    // nothing lexical to learn (and the label is independent of the
    // id%4 eval split, unlike plain parity which would leave the
    // held-out slice single-class), so held-out AUC must sit near 0.5.
    val docs = (1 to 400).map { i =>
      (i.toLong, s"alpha beta gamma delta w${i % 7}", (i * 31) % 97 < 48)
    }.toDF("doc_id", "text", "lab")
    val (auc, _) = graft.ml.QualityModel.distillFilter(
      docs, "doc_id", "text", col("lab"))
    assert(auc < 0.85, s"text-independent label must not be separable, auc=$auc")
  }

  test("quality classifier learns a length gate (the m3 contract shape)") {
    import spark.implicits._
    // token count >= 6 is a linear functional of the hashed TF vector;
    // the model must recover it from text alone.
    val words = Array("lorem", "ipsum", "dolor", "sit", "amet", "sed", "magna")
    val docs = (1 to 400).map { i =>
      val n = 2 + (i * 13 % 9) // 2..10 tokens, deterministic
      val txt = (0 until n).map(j => words((i + j) % words.length)).mkString(" ")
      (i.toLong, txt, n >= 6)
    }.toDF("doc_id", "text", "lab")
    val (auc, _) = graft.ml.QualityModel.distillFilter(
      docs, "doc_id", "text", col("lab"))
    assert(auc > 0.9, s"length gate must be recoverable, auc=$auc")
  }
}
