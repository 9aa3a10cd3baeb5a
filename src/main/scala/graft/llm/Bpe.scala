package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and application over a corpus —
  * the vocabulary-building step of an LLM data pipeline.
  *
  * Scale split (how production trainers work, e.g. the HF tokenizers
  * design): the CORPUS-scale work — pre-tokenizing terabytes of text and
  * counting distinct words — is one distributed explode + groupBy; the
  * merge loop then runs over the (vocabulary-scale, bounded) word
  * frequency table, which is orders of magnitude smaller than the corpus
  * (counts stand in for repetition). The driver-side loop is guarded by
  * `maxVocabWords`, same bounded-driver discipline as
  * [[Dedup.dupClusters]].
  *
  * Determinism: merge selection orders by (count desc, pair lexicographic
  * asc) — ties never depend on hash-map iteration order, so the merge
  * sequence is reproducible across runs and partitionings.
  */
object Bpe {

  /** BPE-ish pre-tokenizer (same public regex family as
    * `TextStats.tokenCountBpeish` / x1's oracle): word runs and single
    * non-word-non-space marks. */
  val PreTokenPattern = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"

  /** Corpus-scale word counting: (word, n). The only step that touches
    * every byte of the corpus — one explode + one map-side-combined
    * groupBy. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(regexp_extract_all(col(textCol),
        lit(PreTokenPattern), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  final case class BpeModel(merges: Seq[(String, String)]) {
    /** rank by merge priority; lower = earlier merge */
    lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
  }

  /** Train `numMerges` BPE merges from a corpus. Words start as codepoint
    * symbol sequences; each round merges the globally most frequent
    * adjacent symbol pair (count desc, then pair asc). Stops early when
    * no pair occurs at least `minPairCount` times. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxVocabWords: Long = 1000000L, minPairCount: Long = 2L): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val wc = wordCounts(df, textCol)
    val vocabSize = wc.count()
    require(vocabSize <= maxVocabWords,
      s"word vocabulary $vocabSize exceeds maxVocabWords=$maxVocabWords; " +
        "raise the cap or pre-filter the corpus")
    // vocabulary-scale from here on: (symbols, freq) pairs on the driver
    var words: Array[(Array[String], Long)] = wc.collect().map { r =>
      (r.getString(0).codePoints().toArray
        .map(cp => new String(Character.toChars(cp))), r.getLong(1))
    }
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var best: ((String, String), Long) = null
        counts.foreach { case (p, c) =>
          if (best == null || c > best._2 || (c == best._2 &&
              (p._1 < best._1._1 || (p._1 == best._1._1 && p._2 < best._1._2))))
            best = (p, c)
        }
        if (best._2 < minPairCount) done = true
        else {
          val (a, b) = best._1
          merges += ((a, b))
          words = words.map { case (syms, f) => (mergePair(syms, a, b), f) }
          round += 1
        }
      }
    }
    BpeModel(merges.result())
  }

  /** Apply one merge to a symbol sequence (left-to-right, non-overlapping
    * — after merging at i the scan resumes past the new symbol). */
  private[llm] def mergePair(syms: Array[String], a: String, b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Encode one word with a trained model: repeatedly apply the
    * lowest-rank applicable merge (the standard greedy BPE apply). */
  def encodeWord(model: BpeModel, word: String): Seq[String] = {
    var syms = word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = model.ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bi = i }
        i += 1
      }
      if (bi < 0) continue = false
      else {
        syms = mergePair(syms, syms(bi), syms(bi + 1))
        if (syms.length < 2) continue = false
      }
    }
    syms.toSeq
  }

  /** Tokenize a text column with a trained model: pre-tokenize, then
    * greedy-merge each word. Map-only — the (small) merge table rides a
    * broadcast, the corpus never shuffles. Adds `tokens: array<string>`. */
  def encode(model: BpeModel, df: DataFrame, textCol: String): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val enc = udf((text: String) =>
      if (text == null) Seq.empty[String]
      else PreTokenPattern.r.findAllIn(text)
        .flatMap(w => encodeWord(bc.value, w)).toSeq)
    df.withColumn("tokens", enc(col(textCol)))
  }
}
