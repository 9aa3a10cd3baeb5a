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
    * no pair occurs at least `minPairCount` times.
    *
    * The merge loop maintains pair counts INCREMENTALLY (the standard
    * trainer optimization): each round touches only the words that
    * contain the merged pair (tracked by an inverted pair→word index
    * with lazy staleness checks), subtracting their old adjacencies and
    * re-adding the new ones, instead of rescanning the whole vocabulary.
    * Best-pair selection is a lazy max-heap — stale entries (count
    * changed since push) are dropped or re-pushed with the live count on
    * pop, so a round costs O(touched words + log-heap), not O(vocab).
    * The merge sequence is IDENTICAL to the naive recompute-per-round
    * trainer (BpeSpec pins this property on random corpora).
    *
    * Real web corpora exceed `maxVocabWords` distinct words; the
    * standard recipe is frequency pre-filtering — set `minWordCount`
    * ≥ 2 to drop hapax legomena before the cap check (tokenizer
    * trainers do exactly this; the dropped tail contributes ~nothing to
    * merge counts but dominates the distinct-word count). */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxVocabWords: Long = 1000000L, minPairCount: Long = 2L,
      minWordCount: Long = 1L): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val wc = wordCounts(df, textCol).where(col("n") >= minWordCount)
    val vocabSize = wc.count()
    require(vocabSize <= maxVocabWords,
      s"word vocabulary $vocabSize exceeds maxVocabWords=$maxVocabWords; " +
        "raise the cap or pre-filter the corpus (minWordCount >= 2 drops " +
        "the hapax tail)")
    // vocabulary-scale from here on: (symbols, freq) pairs on the driver
    val words: Array[(Array[String], Long)] = wc.collect().map { r =>
      (r.getString(0).codePoints().toArray
        .map(cp => new String(Character.toChars(cp))), r.getLong(1))
    }

    type Pair = (String, String)
    val counts = scala.collection.mutable.HashMap.empty[Pair, Long]
    // pair → indices of words that contained the pair at SOME point;
    // entries go stale (append-only) and are re-verified against the
    // word's live symbols on use
    val index = scala.collection.mutable.HashMap
      .empty[Pair, scala.collection.mutable.ArrayBuffer[Int]]
    // lazy max-heap over (count desc, pair asc); every count INCREASE
    // pushes an exact entry, decreases are reconciled on pop
    final case class Entry(a: String, b: String, count: Long)
    val heap = new java.util.PriorityQueue[Entry](11,
      new java.util.Comparator[Entry] {
        def compare(x: Entry, y: Entry): Int = {
          val c = java.lang.Long.compare(y.count, x.count) // desc
          if (c != 0) c
          else {
            val ca = x.a.compareTo(y.a)
            if (ca != 0) ca else x.b.compareTo(y.b)
          }
        }
      })

    def addWordPairs(wi: Int, sign: Long): Unit = {
      val (syms, f) = words(wi)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val nc = counts.getOrElse(p, 0L) + sign * f
        if (nc == 0L) counts.remove(p) else counts.update(p, nc)
        if (sign > 0) {
          index.getOrElseUpdate(p, scala.collection.mutable.ArrayBuffer.empty) += wi
          heap.add(Entry(p._1, p._2, nc))
        }
        i += 1
      }
    }
    words.indices.foreach(addWordPairs(_, 1L))

    def containsPair(syms: Array[String], a: String, b: String): Boolean = {
      var i = 0
      while (i < syms.length - 1) {
        if (syms(i) == a && syms(i + 1) == b) return true
        i += 1
      }
      false
    }

    /** Pop the true maximum: drop entries for vanished pairs, re-push
      * with the live count when stale (classic lazy-deletion heap — the
      * live count of every pair always has an entry at or above its
      * true heap position, so the first verified pop is the max). */
    def popBest(): Option[(Pair, Long)] = {
      while (!heap.isEmpty) {
        val e = heap.poll()
        val cur = counts.getOrElse((e.a, e.b), 0L)
        if (cur == e.count) return Some(((e.a, e.b), cur))
        else if (cur > 0L) heap.add(Entry(e.a, e.b, cur))
      }
      None
    }

    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      popBest() match {
        case None => done = true
        case Some((_, c)) if c < minPairCount => done = true
        case Some(((a, b), c)) =>
          merges += ((a, b))
          // touch ONLY the words that (may) contain the merged pair
          val touched = index.remove((a, b)).getOrElse(
            scala.collection.mutable.ArrayBuffer.empty)
          val seen = new java.util.HashSet[Int]()
          touched.foreach { wi =>
            if (seen.add(wi)) {
              val (syms, f) = words(wi)
              if (containsPair(syms, a, b)) {
                addWordPairs(wi, -1L)
                words(wi) = (mergePair(syms, a, b), f)
                addWordPairs(wi, 1L)
              }
            }
          }
          round += 1
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
