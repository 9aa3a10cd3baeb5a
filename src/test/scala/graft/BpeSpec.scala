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
}
