package graft

import org.apache.spark.sql.functions._
import graft.llm.Bpe

class BpeSpec extends SparkSpec {

  test("train learns the hand-computed merge sequence on a toy corpus") {
    import spark.implicits._
    // "aaab" x3, "aab" x1 → symbols per word: a a a b (3), a a b (1)
    // round 1 pairs: (a,a): 2*3 + 1*1 = 7, (a,b): 3 + 1 = 4 → merge (a,a)
    // round 2 words: [aa a b] x3, [aa b] x1 → (aa,a): 3, (aa,b): 1, (a,b): 3
    //   tie 3 vs 3 → lexicographic: ("a","b") < ("aa","a") → merge (a,b)
    // round 3 words: [aa ab] x3, [aa b] x1 → (aa,ab): 3, (aa,b): 1 → merge (aa,ab)
    val docs = Seq("aaab aaab", "aaab aab").toDF("text")
    val m = Bpe.train(docs, "text", numMerges = 3)
    assert(m.merges === Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("train stops early when no pair reaches minPairCount; cap guard fires") {
    import spark.implicits._
    val unique = Seq("ab cd ef").toDF("text") // every pair occurs once
    assert(Bpe.train(unique, "text", numMerges = 5).merges.isEmpty)
    val docs = Seq("aaab aaab aab").toDF("text")
    intercept[IllegalArgumentException] {
      Bpe.train(docs, "text", numMerges = 1, maxVocabWords = 1L)
    }
  }

  test("encode applies merges by rank; tokens reassemble the word; determinism") {
    import spark.implicits._
    val docs = Seq("aaab aaab", "aaab aab").toDF("text")
    val m = Bpe.train(docs, "text", numMerges = 3)
    // "aaab": a a a b → (a,a) → aa a b → (a,b) → aa ab → (aa,ab) → aaab
    assert(Bpe.encodeWord(m, "aaab") === Seq("aaab"))
    // "aab": a a b → aa b (no (aa,b) merge learned)
    assert(Bpe.encodeWord(m, "aab") === Seq("aa", "b"))
    // unseen symbols pass through untouched
    assert(Bpe.encodeWord(m, "xyz") === Seq("x", "y", "z"))
    val enc = Bpe.encode(m, Seq((1L, "aaab aab xyz!")).toDF("id", "text"), "text")
      .select("tokens").collect()(0).getSeq[String](0)
    assert(enc === Seq("aaab", "aa", "b", "x", "y", "z", "!"))
    // tokens always reassemble their word
    val words = Seq("aaab", "aab", "abab", "bbbb", "a")
    words.foreach(w => assert(Bpe.encodeWord(m, w).mkString === w))
    // same corpus → same merges (deterministic tie-breaks)
    assert(Bpe.train(docs.repartition(7), "text", 3).merges === m.merges)
  }

  test("train on the real fixture is deterministic and merges are high-frequency") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m1 = Bpe.train(docs, "text", numMerges = 8)
    val m2 = Bpe.train(docs.repartition(13), "text", numMerges = 8)
    assert(m1.merges === m2.merges && m1.merges.length === 8)
  }

  test("incremental trainer equals the naive recompute-per-round reference") {
    import spark.implicits._
    // naive reference: recount every pair over every word each round —
    // the O(vocab x merges) loop the incremental trainer replaces
    def merge1(syms: Array[String], a: String, b: String): Array[String] = {
      val out = Array.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    def naive(wordFreqs: Seq[(String, Long)], numMerges: Int,
        minPairCount: Long): Seq[(String, String)] = {
      var words = wordFreqs.map { case (w, f) =>
        (w.codePoints().toArray.map(cp => new String(Character.toChars(cp))), f)
      }
      val out = Seq.newBuilder[(String, String)]
      var done = false
      var round = 0
      while (round < numMerges && !done) {
        val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
        words.foreach { case (syms, f) =>
          syms.indices.dropRight(1).foreach { i =>
            val p = (syms(i), syms(i + 1))
            counts.update(p, counts.getOrElse(p, 0L) + f)
          }
        }
        val best = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
        best match {
          case Some(((a, b), c)) if c >= minPairCount =>
            out += ((a, b))
            words = words.map { case (syms, f) => (merge1(syms, a, b), f) }
            round += 1
          case _ => done = true
        }
      }
      out.result()
    }
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      // random corpus over a tiny alphabet → dense pair collisions, ties,
      // overlapping pairs ("aaa"), multi-merge cascades
      val docs = (1 to 40).map { i =>
        (i.toLong, Seq.fill(rnd.nextInt(6) + 1)(
          Seq.fill(rnd.nextInt(8) + 1)("abc" (rnd.nextInt(3))).mkString).mkString(" "))
      }
      val df = docs.toDF("id", "text")
      val wf = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }.toSeq
      val expected = naive(wf, numMerges = 12, minPairCount = 2L)
      val got = Bpe.train(df, "text", numMerges = 12).merges
      assert(got === expected, s"trial $trial: incremental drifted from naive")
    }
  }
}
