package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (Kudo 2018, the SentencePiece `unigram` model) —
  * the other major subword family next to [[Bpe]]: pieces carry
  * probabilities, training is EM over the segmentation lattice, and
  * encoding is the Viterbi max-probability segmentation.
  *
  * Scale split, identical to [[Bpe.train]]: the corpus-scale work is ONE
  * distributed explode + map-side-combined groupBy (word counting —
  * counts stand in for repetition); seeding, EM, and pruning then run
  * over the bounded (guarded `maxVocabWords`) word-frequency table on
  * the driver, exactly how production SentencePiece trains (its
  * `--input_sentence_size` corpus pass feeds an in-memory suffix/EM
  * loop). Per EM round the driver does O(Σ |word|·maxPieceLen) lattice
  * work — vocabulary-scale, never corpus-scale.
  *
  * Determinism: the collected word table is sorted before any float
  * accumulation, piece iteration orders are lexicographic, and every
  * tie (seed selection, pruning, Viterbi) breaks on (count/prob desc,
  * piece asc) — the trained model is bit-identical across partitionings
  * (UnigramSpec pins this).
  */
object Unigram {

  /** Trained model: piece → log-probability. Single-codepoint pieces
    * cover the training alphabet, so every training word is encodable;
    * unseen codepoints at encode time get `unkLogProb`. */
  final case class UnigramModel(
      logProb: Map[String, Double], maxPieceLen: Int, unkLogProb: Double)

  /** Train a unigram LM of exactly `vocabSize` pieces (all training
    * alphabet codepoints + the best multi-char pieces; requires enough
    * distinct substrings — the synthetic fixtures and any real corpus
    * have orders of magnitude more than a reasonable `vocabSize`).
    *
    * Loop shape (the SentencePiece recipe, deterministically
    * simplified): seed with the `seedMultiplier`×`vocabSize` most
    * frequent substrings (≤ `maxPieceLen` chars), then alternate
    * `emIters` EM rounds (forward–backward expected counts over each
    * word's segmentation lattice) with pruning the lowest-probability
    * multi-char pieces — `pruneFrac` per round, floored at the target —
    * until `vocabSize` remains, then run one final EM pass. */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 8, seedMultiplier: Int = 4,
      emIters: Int = 2, pruneFrac: Double = 0.25,
      maxVocabWords: Long = 1000000L, minWordCount: Long = 1L): UnigramModel = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(pruneFrac > 0.0 && pruneFrac < 1.0, s"pruneFrac in (0,1), got $pruneFrac")
    val wc = Bpe.wordCounts(df, textCol).where(col("n") >= minWordCount)
    val nWords = wc.count()
    require(nWords <= maxVocabWords,
      s"word vocabulary $nWords exceeds maxVocabWords=$maxVocabWords; " +
        "raise the cap or pre-filter the corpus (minWordCount >= 2 drops " +
        "the hapax tail)")
    // vocabulary-scale from here on; SORTED so float accumulation order
    // (and thus the model, bit-for-bit) is partition-independent
    val words: Array[(String, Long)] = wc.collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    require(words.nonEmpty, "empty corpus: nothing to train on")

    // alphabet: every single codepoint, always retained
    val charPieces: Array[String] = words.iterator.flatMap(_._1.codePoints()
        .toArray.iterator.map(cp => new String(Character.toChars(cp))))
      .toArray.distinct.sorted

    // seed: most frequent substrings (2..maxPieceLen chars), count = Σ
    // word freq × occurrences; ties break lexicographic
    val subCounts = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, f) =>
      val n = w.length
      var i = 0
      while (i < n) {
        var l = 2
        while (l <= maxPieceLen && i + l <= n) {
          val s = w.substring(i, i + l)
          subCounts.update(s, subCounts.getOrElse(s, 0L) + f)
          l += 1
        }
        i += 1
      }
    }
    val seedTarget = math.max(vocabSize * seedMultiplier - charPieces.length, 0)
    val seeds: Array[String] = subCounts.toArray
      .sortBy { case (p, c) => (-c, p) }.take(seedTarget).map(_._1)

    // piece set + probs, init ∝ seed/char counts
    val charCounts: Map[String, Long] = {
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (w, f) =>
        w.codePoints().toArray.foreach { cp =>
          val s = new String(Character.toChars(cp))
          m.update(s, m.getOrElse(s, 0L) + f)
        }
      }
      m.toMap
    }
    var pieceArr: Array[String] = (charPieces ++ seeds).sorted
    var probs: scala.collection.mutable.HashMap[String, Double] = {
      val m = scala.collection.mutable.HashMap.empty[String, Double]
      var total = 0.0
      pieceArr.foreach { p =>
        val c = (if (p.length == 1) charCounts.getOrElse(p, 1L)
                 else subCounts(p)).toDouble
        m.update(p, c); total += c
      }
      pieceArr.foreach(p => m.update(p, m(p) / total))
      m
    }

    /** One EM round: E = forward–backward expected piece counts over
      * every word's lattice (plain doubles — pre-tokens are short, no
      * underflow), M = renormalize. Iteration orders are fixed. */
    def emRound(): Unit = {
      val exp = scala.collection.mutable.HashMap.empty[String, Double]
      words.foreach { case (w, f) =>
        val n = w.length
        val alpha = new Array[Double](n + 1)
        val beta = new Array[Double](n + 1)
        alpha(0) = 1.0; beta(n) = 1.0
        var j = 1
        while (j <= n) {
          var s = 0.0
          var l = 1
          while (l <= maxPieceLen && l <= j) {
            if (alpha(j - l) > 0.0)
              probs.get(w.substring(j - l, j)).foreach(p => s += alpha(j - l) * p)
            l += 1
          }
          alpha(j) = s; j += 1
        }
        var i = n - 1
        while (i >= 0) {
          var s = 0.0
          var l = 1
          while (l <= maxPieceLen && i + l <= n) {
            if (beta(i + l) > 0.0)
              probs.get(w.substring(i, i + l)).foreach(p => s += p * beta(i + l))
            l += 1
          }
          beta(i) = s; i -= 1
        }
        val z = alpha(n)
        if (z > 0.0) {
          i = 0
          while (i < n) {
            var l = 1
            while (l <= maxPieceLen && i + l <= n) {
              val piece = w.substring(i, i + l)
              probs.get(piece) match {
                case Some(p) =>
                  val e = alpha(i) * p * beta(i + l) / z
                  if (e > 0.0) exp.update(piece, exp.getOrElse(piece, 0.0) + f * e)
                case None =>
              }
              l += 1
            }
            i += 1
          }
        }
      }
      var total = 0.0
      pieceArr.foreach(p => total += exp.getOrElse(p, 0.0))
      // a piece with zero expected count keeps an epsilon so chars never
      // vanish from the alphabet (they must stay encodable)
      val eps = 1e-12
      var t2 = 0.0
      pieceArr.foreach { p => t2 += math.max(exp.getOrElse(p, 0.0), eps) }
      pieceArr.foreach { p =>
        probs.update(p, math.max(exp.getOrElse(p, 0.0), eps) / t2)
      }
      require(total > 0.0, "EM collapsed: no piece has expected mass")
    }

    // prune loop: EM, then drop the weakest multi-char pieces — at most
    // pruneFrac of them per round (gradual, the SentencePiece shape),
    // never past the target
    while (pieceArr.length > vocabSize) {
      var it = 0
      while (it < emIters) { emRound(); it += 1 }
      val multi = pieceArr.filter(_.length > 1)
      require(multi.nonEmpty,
        s"vocabSize $vocabSize is below the alphabet size ${charPieces.length}")
      val need = pieceArr.length - vocabSize
      val perRound = math.max(1, math.ceil(multi.length * pruneFrac).toInt)
      val k = math.min(multi.length, math.min(need, perRound))
      val dropSet = multi.sortBy(p => (probs(p), p)).take(k).toSet
      pieceArr = pieceArr.filterNot(dropSet.contains)
      dropSet.foreach(probs.remove)
      val renorm = pieceArr.iterator.map(probs(_)).sum
      pieceArr.foreach(p => probs.update(p, probs(p) / renorm))
    }
    var it = 0
    while (it < emIters) { emRound(); it += 1 }

    val minLog = pieceArr.iterator.map(p => math.log(probs(p))).min
    UnigramModel(
      pieceArr.iterator.map(p => p -> math.log(probs(p))).toMap,
      maxPieceLen, minLog - 10.0)
  }

  /** Viterbi encode one word: the max-log-prob segmentation. DP over
    * end positions; ties prefer the LONGER final piece (deterministic).
    * Codepoints outside the model's alphabet segment as single-CODEPOINT
    * pieces at `unkLogProb` — an unknown astral codepoint becomes one
    * 2-char surrogate-pair piece (mirroring the codepoint-based training
    * alphabet), never two lone-surrogate invalid strings: the pair piece
    * costs one `unkLogProb` where the split costs two, so the DP always
    * prefers it. Lone surrogates (malformed UTF-16 input) keep the
    * single-char fallback so every input still has a segmentation. */
  def encodeWord(model: UnigramModel, word: String): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val n = word.length
    val best = new Array[Double](n + 1)
    val bestLen = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    // the surrogate-pair unk path needs l=2 even for a 1-char-piece model
    val maxL = math.max(model.maxPieceLen, 2)
    var j = 1
    while (j <= n) {
      var l = 1
      while (l <= maxL && l <= j) {
        if (best(j - l) != Double.NegativeInfinity) {
          val piece = word.substring(j - l, j)
          val isOneCodepoint = l == 1 ||
            (l == 2 && Character.isSurrogatePair(piece.charAt(0), piece.charAt(1)))
          val lp = model.logProb.getOrElse(piece,
            if (isOneCodepoint) model.unkLogProb else Double.NegativeInfinity)
          if (lp != Double.NegativeInfinity) {
            val cand = best(j - l) + lp
            if (cand > best(j) || (cand == best(j) && l > bestLen(j))) {
              best(j) = cand; bestLen(j) = l
            }
          }
        }
        l += 1
      }
      j += 1
    }
    val stack = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val l = bestLen(pos)
      stack += word.substring(pos - l, pos)
      pos -= l
    }
    stack.reverseIterator.toSeq
  }

  /** Tokenize a text column: pre-tokenize (same regex family as
    * [[Bpe]]/x1), Viterbi-encode each word. Map-only — the model rides
    * a broadcast, the corpus never shuffles. Adds `tokens`. */
  def encode(model: UnigramModel, df: DataFrame, textCol: String): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val enc = udf((text: String) =>
      if (text == null) Seq.empty[String]
      else Bpe.PreTokenPattern.r.findAllIn(text)
        .flatMap(w => encodeWord(bc.value, w)).toSeq)
    df.withColumn("tokens", enc(col(textCol)))
  }
}
