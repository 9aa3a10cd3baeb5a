package graft

import org.apache.spark.sql.functions._
import graft.llm.{Frequency, Importance, Retrieval}
import graft.core.Merge

/** Contracts for the round-8 corpus operators: BM25 retrieval, DSIR
  * selection, Misra–Gries heavy hitters, and the latest-wins merge. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------------------------- BM25

  private val corpus = Seq(
    (1L, "spark shuffle join join join"),     // tf(join)=3, has both terms
    (2L, "spark join"),                       // both terms, short doc
    (3L, "spark spark spark spark shuffle"),  // only one query term
    (4L, "window functions only"),            // no query terms
    (5L, "join")                              // one term, shortest doc
  ).toDF("doc_id", "text")

  test("bm25: only docs containing a query term are returned, capped at k") {
    val qs = Seq((1, "join"), (1, "shuffle")).toDF("query_id", "term")
    val res = Retrieval.bm25TopK(corpus, qs, "doc_id", "text", k = 3).collect()
    assert(res.forall(_.getInt(res.head.fieldIndex("rk")) <= 3))
    val docs = res.map(_.getLong(res.head.fieldIndex("doc_id"))).toSet
    assert(!docs.contains(4L), "doc with no query term must not appear")
    assert(res.length == 3)
  }

  test("bm25: a doc matching both terms outranks docs matching one") {
    val qs = Seq((1, "join"), (1, "shuffle")).toDF("query_id", "term")
    val res = Retrieval.bm25TopK(corpus, qs, "doc_id", "text", k = 5)
      .orderBy(col("rk")).collect()
    val top = res.head.getLong(res.head.fieldIndex("doc_id"))
    assert(top == 1L || top == 2L,
      s"two-term docs must rank above single-term docs, got $top first")
    // rank column is dense 1..n per query
    assert(res.map(_.getInt(res.head.fieldIndex("rk"))).toSeq == (1 to res.length))
  }

  test("bm25: idf favors the rarer term at equal tf") {
    // 'rare' appears in 1 doc, 'common' in all 4 — same per-doc tf.
    val c2 = Seq(
      (1L, "rare common"), (2L, "common x"), (3L, "common y"), (4L, "common z")
    ).toDF("doc_id", "text")
    val qs = Seq((1, "rare"), (2, "common")).toDF("query_id", "term")
    val res = Retrieval.bm25TopK(c2, qs, "doc_id", "text", k = 1)
      .collect().map(r => r.getInt(r.fieldIndex("query_id")) ->
        r.getDouble(r.fieldIndex("score"))).toMap
    assert(res(1) > res(2), s"rare-term hit must outscore common-term hit: $res")
  }

  // --------------------------------------------------------------- RRF

  test("rrf: a doc ranked by both retrievers outranks single-source docs") {
    // doc 10 is rank-2 in BOTH rankings; docs 1/2 are rank-1 in one
    // ranking each. 2/(60+2) > 1/(60+1), so consensus wins.
    val lex = Seq((1, 1L, 1), (1, 10L, 2)).toDF("query_id", "doc_id", "rk")
    val dense = Seq((1, 2L, 1), (1, 10L, 2)).toDF("query_id", "doc_id", "rk")
    val res = Retrieval.rrfFuse(Seq(lex, dense), k = 3)
      .orderBy(col("rk")).collect()
    assert(res.head.getLong(res.head.fieldIndex("doc_id")) == 10L,
      s"consensus doc must fuse to rank 1: ${res.toSeq}")
    assert(res.map(_.getInt(res.head.fieldIndex("rk"))).toSeq == Seq(1, 2, 3))
  }

  test("rrf: ties at equal contribution break by doc_id, capped at k") {
    val a = Seq((1, 5L, 1), (1, 3L, 2), (1, 9L, 3)).toDF("query_id", "doc_id", "rk")
    val b = Seq((1, 3L, 1), (1, 5L, 2), (1, 7L, 3)).toDF("query_id", "doc_id", "rk")
    // docs 3 and 5 both score 1/61+1/62; tie breaks to doc 3 first
    val res = Retrieval.rrfFuse(Seq(a, b), k = 2).orderBy(col("rk")).collect()
    assert(res.map(_.getLong(res.head.fieldIndex("doc_id"))).toSeq == Seq(3L, 5L))
  }

  // -------------------------------------------------------------- DSIR

  test("dsir: target-vocabulary docs outweigh off-target docs") {
    // target docs share a distinct vocabulary; raw-only docs another.
    val docs = (
      (1 to 20).map(i => (i.toLong, "alpha beta gamma delta", "en")) ++
      (21 to 40).map(i => (i.toLong, "zeta eta theta iota", "de"))
    ).toDF("doc_id", "text", "lang")
    val res = Importance.dsirSelect(docs, "doc_id", "text",
      col("lang") === "en", keep = 20).collect()
    val kept = res.filter(_.getBoolean(res.head.fieldIndex("kept")))
      .map(_.getLong(res.head.fieldIndex("doc_id"))).toSet
    assert(kept == (1L to 20L).toSet,
      s"top-20 must be exactly the target-vocabulary docs, got $kept")
    // and every target doc's weight is strictly positive, off-target negative
    val w = res.map(r => r.getLong(r.fieldIndex("doc_id")) ->
      r.getDouble(r.fieldIndex("log_w"))).toMap
    assert((1L to 20L).forall(w(_) > 0) && (21L to 40L).forall(w(_) < 0))
  }

  test("dsir: zero-token docs survive with weight 0 and rank last") {
    val docs = Seq((1L, "alpha alpha", "en"), (2L, "!!!", "de"))
      .toDF("doc_id", "text", "lang")
    val res = Importance.dsirSelect(docs, "doc_id", "text",
      col("lang") === "en", keep = 1).collect()
    val byId = res.map(r => r.getLong(r.fieldIndex("doc_id")) -> r).toMap
    assert(byId(2L).getLong(res.head.fieldIndex("n_toks")) == 0L)
    assert(byId(2L).getDouble(res.head.fieldIndex("log_w")) == 0.0)
    assert(!byId(2L).getBoolean(res.head.fieldIndex("kept")))
    assert(byId(1L).getBoolean(res.head.fieldIndex("kept")))
  }

  // ----------------------------------------------------- heavy hitters

  test("misra-gries: eviction path retains all true heavy hitters") {
    // stream where 'a' holds 40%, 'b' 30%, and 30 rare fillers share the
    // rest — k=4 counters must evict fillers yet keep a and b.
    val stream = Seq.fill(400)("a") ++ Seq.fill(300)("b") ++
      (1 to 300).map(i => s"f${i % 30}")
    val sketch = Frequency.misraGries(stream.iterator, 4)
    assert(sketch.contains("a") && sketch.contains("b"))
    assert(sketch.size <= 4)
  }

  test("heavyHitters: exact counts equal a full groupBy on a skewed corpus") {
    // 64 distinct tokens across 8 partitions with k=8 counters: the
    // sketch must evict, and the final result must still be exact.
    val docs = (1 to 512).map { i =>
      val tok = if (i % 2 == 0) "hot" else if (i % 4 == 1) "warm" else s"cold${i % 61}"
      (i.toLong, s"$tok $tok filler${i % 31}")
    }.toDF("doc_id", "text").repartition(8)
    val res = Frequency.heavyHitters(docs, "text", k = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs.select(explode(Retrieval.tokenize(col("text"))).as("t"))
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val expected = exact.filter { case (_, c) => c * 8 > n }
    assert(res == expected, s"got $res expected $expected")
    assert(res.contains("hot"))
  }

  // -------------------------------------------------------------- merge

  private val base = Seq(
    (1L, "v1", 1, false), (2L, "v1", 1, false), (3L, "v1", 1, false)
  ).toDF("k", "payload", "version", "deleted")

  test("merge: update wins, tombstone deletes, untouched rows intact") {
    val updates = Seq(
      (1L, "v2", 2, false),   // update key 1
      (3L, "v1", 2, true),    // delete key 3
      (4L, "new", 2, false)   // insert key 4
    ).toDF("k", "payload", "version", "deleted")
    val res = Merge.latestWins(base, updates, "k", "version", Some("deleted"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(res == Map(1L -> ("v2", 2), 2L -> ("v1", 1), 4L -> ("new", 2)))
  }

  test("merge: re-applying the same batch is a no-op (idempotent)") {
    val updates = Seq((1L, "v2", 2, false), (3L, "v1", 2, true))
      .toDF("k", "payload", "version", "deleted")
    val once = Merge.latestWins(base, updates, "k", "version", Some("deleted"))
    // rebuild the merged state WITH the bookkeeping columns to re-merge
    val onceFull = once.withColumn("deleted", lit(false))
    val twice = Merge.latestWins(onceFull, updates, "k", "version", Some("deleted"))
    val a = once.orderBy(col("k")).collect().map(_.toSeq).toSeq
    val b = twice.orderBy(col("k")).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("merge: same-version tie goes to the update side") {
    val updates = Seq((2L, "rewritten", 1, false))
      .toDF("k", "payload", "version", "deleted")
    val res = Merge.latestWins(base, updates, "k", "version", Some("deleted"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(res(2L) == "rewritten")
  }

  test("scd2: intervals chain, exactly one current row per key") {
    val log = Seq(
      (1L, "a", 1), (1L, "b", 3), (1L, "c", 7), // three versions
      (2L, "x", 2)                              // single version
    ).toDF("k", "payload", "version")
    val res = Merge.scd2FromChangelog(log, "k", "version")
      .orderBy(col("k"), col("valid_from")).collect()
    val k1 = res.filter(_.getLong(0) == 1L).map(r =>
      (r.getAs[Int]("valid_from"), Option(r.getAs[Integer]("valid_to")),
        r.getAs[Boolean]("is_current")))
    assert(k1.toSeq == Seq((1, Some(3), false), (3, Some(7), false), (7, None, true)))
    val k2 = res.filter(_.getLong(0) == 2L)
    assert(k2.length == 1 && k2.head.getAs[Boolean]("is_current"))
    // global invariant: per key, exactly one open interval
    assert(res.filter(_.getAs[Boolean]("is_current")).map(_.getLong(0)).toSeq.sorted
      == Seq(1L, 2L))
  }

  test("tokenDivergence matches the driver-side formula; self-divergence is zero") {
    import spark.implicits._
    val a = Seq("a a b", "a").toDF("text")
    val b = Seq("a c").toDF("text")
    val row = Frequency.tokenDivergence(a, b, "text").collect()(0)
    // driver-side replay of the add-1-smoothed formula over union vocab
    val cntA = Map("a" -> 3.0, "b" -> 1.0); val cntB = Map("a" -> 1.0, "c" -> 1.0)
    val vocab = (cntA.keySet ++ cntB.keySet).toSeq
    val (na, nb, v) = (cntA.values.sum, cntB.values.sum, vocab.size.toDouble)
    def pA(t: String) = (cntA.getOrElse(t, 0.0) + 1) / (na + v)
    def pB(t: String) = (cntB.getOrElse(t, 0.0) + 1) / (nb + v)
    val klAb = vocab.map(t => pA(t) * math.log(pA(t) / pB(t))).sum
    val klBa = vocab.map(t => pB(t) * math.log(pB(t) / pA(t))).sum
    val js = vocab.map { t =>
      val m = (pA(t) + pB(t)) / 2
      pA(t) * math.log(pA(t) / m) / 2 + pB(t) * math.log(pB(t) / m) / 2
    }.sum
    assert(row.getAs[Long]("n_tokens_a") === 4L && row.getAs[Long]("n_tokens_b") === 2L)
    assert(row.getAs[Long]("vocab") === 3L)
    assert(math.abs(row.getAs[Double]("kl_ab") - klAb) < 1e-6)
    assert(math.abs(row.getAs[Double]("kl_ba") - klBa) < 1e-6)
    assert(math.abs(row.getAs[Double]("js") - js) < 1e-6)
    assert(klAb > 0 && js > 0 && js <= math.log(2) + 1e-12)
    // identical corpora → all divergences exactly zero
    val same = Frequency.tokenDivergence(a, a, "text").collect()(0)
    assert(same.getAs[Double]("kl_ab") === 0.0 && same.getAs[Double]("js") === 0.0)
  }
}
