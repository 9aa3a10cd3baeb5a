package graft

import graft.llm.Unigram

class UnigramSpec extends SparkSpec {

  test("train recovers a planted piece; Viterbi prefers it over chars") {
    import spark.implicits._
    // "ab" dominates the corpus: the trained LM must give the piece
    // "ab" enough mass that Viterbi("abab") = [ab, ab], not chars
    val docs = Seq.fill(50)("ab ab abab cd").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m = Unigram.train(docs, "text", vocabSize = 8, maxPieceLen = 4)
    assert(m.logProb.size === 8)
    assert(m.logProb.contains("ab"), s"expected piece 'ab' in ${m.logProb.keys}")
    assert(Unigram.encodeWord(m, "abab") === Seq("ab", "ab"))
    assert(Unigram.encodeWord(m, "ab") === Seq("ab"))
    // alphabet chars all retained (a, b, c, d)
    Seq("a", "b", "c", "d").foreach(c => assert(m.logProb.contains(c)))
    // probabilities normalize
    assert(math.abs(m.logProb.values.map(math.exp).sum - 1.0) < 1e-9)
  }

  test("Viterbi hand-check: max-prob segmentation, longer-piece tie-break") {
    val m = Unigram.UnigramModel(
      Map("a" -> math.log(0.3), "b" -> math.log(0.3), "ab" -> math.log(0.4)),
      maxPieceLen = 2, unkLogProb = math.log(1e-9))
    // P(ab)=0.4 > P(a)P(b)=0.09
    assert(Unigram.encodeWord(m, "ab") === Seq("ab"))
    // exact tie: P(xy) == P(x)P(y) → longer piece wins
    val t = Unigram.UnigramModel(
      Map("x" -> math.log(0.5), "y" -> math.log(0.5), "xy" -> math.log(0.25)),
      maxPieceLen = 2, unkLogProb = math.log(1e-9))
    assert(Unigram.encodeWord(t, "xy") === Seq("xy"))
    // unseen codepoint falls back to a single-char unk piece
    assert(Unigram.encodeWord(m, "azb") === Seq("a", "z", "b"))
    assert(Unigram.encodeWord(m, "") === Seq.empty)
  }

  test("unknown astral codepoint segments as ONE surrogate-pair piece") {
    val m = Unigram.UnigramModel(
      Map("a" -> math.log(0.5), "b" -> math.log(0.5)),
      maxPieceLen = 1, unkLogProb = math.log(1e-9))
    val rocket = new String(Character.toChars(0x1F680)) // U+1F680, 2 chars
    // one 2-char pair piece (1×unk), never two lone surrogates (2×unk)
    assert(Unigram.encodeWord(m, s"a${rocket}b") === Seq("a", rocket, "b"))
    // every emitted piece is a valid UTF-16 string (no lone surrogates)
    Unigram.encodeWord(m, rocket + rocket).foreach { p =>
      assert(p === rocket, s"expected whole pair piece, got ${p.length} chars")
    }
    // malformed input (a lone surrogate) still segments rather than crash
    val lone = "\uD83D"
    assert(Unigram.encodeWord(m, s"a${lone}b") === Seq("a", lone, "b"))
  }

  test("trained model is bit-identical across partitionings") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val texts = (0 until 200).map { i =>
      (i.toLong, (0 until 12).map(_ => Seq("spark", "scala", "shuffle", "scan",
        "sort", "skew")(rnd.nextInt(6))).mkString(" "))
    }
    val a = Unigram.train(texts.toDF("doc_id", "text").repartition(1),
      "text", vocabSize = 24)
    val b = Unigram.train(texts.toDF("doc_id", "text").repartition(17),
      "text", vocabSize = 24)
    assert(a.logProb === b.logProb)
    assert(a.unkLogProb === b.unkLogProb)
  }

  test("encode is map-only over the corpus and round-trips text") {
    import spark.implicits._
    val docs = Seq((1L, "spark scan"), (2L, "scala")).toDF("doc_id", "text")
    val m = Unigram.train(docs, "text", vocabSize = 12)
    val enc = Unigram.encode(m, docs, "text").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
    // concatenating the pieces of each word reconstructs the word
    assert(enc(2L).mkString === "scala")
    assert(enc(1L).mkString === "sparkscan")
    // no shuffle in the encode plan
    val plan = Unigram.encode(m, docs, "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must be map-only:\n$plan")
  }

  test("vocabSize below alphabet size refuses") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghij")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Unigram.train(docs, "text", vocabSize = 3)
    }
  }
}
