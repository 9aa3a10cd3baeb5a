package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Relational.SingletonAttachOps

/** Text-analysis operators for the training-data-pipeline surface:
  * tokenization, quality scoring, language-ID, and document
  * fingerprinting. Everything here is a pure per-row projection — no
  * shuffle, fully codegen'd `functions._` expressions, pushdown-safe —
  * so it scales linearly with input bytes (the 100 TB shape: a map-only
  * stage over the documents table).
  */
object TextStats {

  /** Whitespace tokens (the cheap tokenizer). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish token count: word runs and single non-word-non-space marks
    * each count as one token (a common pre-tokenizer approximation). */
  def tokenCountBpeish(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Per-language marker stopwords (public small lists). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "zu", "ein"),
    "es" -> Seq("el", "la", "de", "y", "es", "un", "en"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "不"))

  /** Count of tokens in `markers` (total occurrences, not distinct). */
  def hits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => markers.map(m => t === m).reduce(_ || _)))

  /** Same count via one codegen'd regex pass over the raw text —
    * equivalent to [[hits]] on whitespace tokens (markers matched as
    * space-delimited tokens), ~10× faster than the interpreted
    * higher-order filter. */
  def hitsRegex(text: Column, markers: Seq[String]): Column = {
    val pat = "(?:^| )(?:" +
      markers.map(java.util.regex.Pattern.quote).mkString("|") + ")(?= |$)"
    size(regexp_extract_all(text, lit(pat), lit(0)))
  }

  /** Language-ID by marker-stopword voting: argmax of per-language hit
    * counts; ties break to the FIRST language in [[LangMarkers]] order;
    * zero hits → "unknown". A pure stopword heuristic — no model. */
  def langId(text: Column): Column = {
    val scored = LangMarkers.map { case (lang, ms) => lang -> hitsRegex(text, ms) }
    val maxScore = greatest(scored.map(_._2): _*)
    scored.foldRight(lit("unknown")) { case ((lang, s), elseCol) =>
      when(s === maxScore && maxScore > 0, lit(lang)).otherwise(elseCol)
    }
  }

  /** Quality score in [0,1]: blend of length band, mean token length,
    * stopword presence, and alphanumeric ratio — the usual cheap
    * pretraining-quality heuristics (length/punct/stopword ratios). */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val nChars = length(text).cast("double")
    val meanTokLen = (nChars - (nTok - 1)) / nTok // chars net of separators
    val stopHits = hitsRegex(text, LangMarkers.flatMap(_._2)).cast("double")
    val alnum = length(regexp_replace(text, "[^A-Za-z0-9一-鿿]", "")).cast("double")
    val lenScore = least(nTok / 64.0, lit(1.0))
    val tokLenScore = when(meanTokLen.between(2.0, 12.0), 1.0).otherwise(0.5)
    val stopScore = least(stopHits * 8.0 / greatest(nTok, lit(1.0)), lit(1.0))
    val alnumScore = alnum / greatest(nChars, lit(1.0))
    // round6Bin, not round: the blend is a raw double ratio score, and
    // Spark's repr-based round diverges from the oracle's binary ROUND
    // exactly at shortest-repr ties (see Det.round6Bin — the r16 sf0.1
    // sweep's x31 doc-2240 find)
    graft.queries.Det.round6Bin(
      lenScore * 0.35 + tokLenScore * 0.15 + stopScore * 0.2 + alnumScore * 0.3)
  }

  /** DuckDB twin of [[qualityScore]] (shared by the x3/x31 oracles):
    * identical blend, engine-portable constructs only.
    *
    * Every term chain is anchored in DOUBLE with an explicit CAST —
    * DuckDB types bare numeric literals as DECIMAL and keeps
    * decimal×decimal arithmetic EXACT, where the JVM computes the same
    * products in IEEE double (0.34375·0.35 is 0.1203125 exactly in
    * decimal but 0.12031249999999999 in double). The blends then differ
    * by one ulp, which is invisible until a document's score lands
    * astride a round-6 boundary — found by the r16 sf0.1 full-Verify
    * sweep (doc 2240: 0.520313 vs 0.520312). One double operand
    * poisons the whole chain to double on DuckDB's side, making the op
    * sequence bit-identical to Spark's. */
  def qualityScoreSql(textExpr: String = "text"): String = {
    val allMarkers = LangMarkers.flatMap(_._2).map(m => s"'$m'").mkString("(", ",", ")")
    s"""LEAST(CAST(len(string_split($textExpr,' ')) AS DOUBLE) / 64.0, 1.0) * 0.35
       | + CAST(CASE WHEN (CAST(length($textExpr) AS DOUBLE) - (len(string_split($textExpr,' ')) - 1.0)) / len(string_split($textExpr,' '))
       |      BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END AS DOUBLE) * 0.15
       | + LEAST(CAST(len(list_filter(string_split($textExpr,' '), t -> t IN $allMarkers)) AS DOUBLE) * 8.0
       |      / GREATEST(len(string_split($textExpr,' ')), 1), 1.0) * 0.2
       | + CAST(length(regexp_replace($textExpr, '[^A-Za-z0-9一-鿿]', '', 'g')) AS DOUBLE)
       |      / GREATEST(length($textExpr), 1.0) * 0.3""".stripMargin
  }

  /** Rolling-hash document fingerprint (winnowing-lite): the minimum
    * md5 over all `w`-char sliding windows of the text. Documents
    * sharing any window can collide to the same fingerprint → cheap
    * near-dup blocking key. Short texts (< w chars) hash whole. */
  def fingerprint(text: Column, w: Int = 16): Column =
    when(length(text) < w, md5(text)).otherwise(
      array_min(transform(
        sequence(lit(1), length(text) - (w - 1)),
        i => md5(text.substr(i, lit(w))))))

  /** Shannon entropy (bits) of the per-document character distribution —
    * a cheap gibberish/repetition signal (low entropy = repeated chars,
    * high = noise). Distributed explode → per-(doc,char) counts →
    * per-doc entropy; shuffles on (id, char) then id. */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chars = df.select(col(idCol).as("id"), length(col(textCol)).as("len"),
      explode(split(col(textCol), "")).as("ch"))
    chars.groupBy("id", "len", "ch").agg(count(lit(1)).as("n"))
      .groupBy("id", "len")
      .agg(sum(
        -(col("n") / col("len")) * log(2.0, col("n") / col("len"))).as("char_entropy"))
      .select(col("id"), col("char_entropy"))
  }

  /** PII scrubbing (C4-style): emails, then IPv4 addresses, then
    * phone-like digit runs are replaced with typed placeholder tokens.
    * Map-only projection; the patterns deliberately stay in the portable
    * regex subset shared by Java regex and RE2 (`\b \d {m,}` character
    * classes, no lookaround), so the same scrub is expressible in the
    * DuckDB oracle. Order matters: IPs are scrubbed before phone runs so
    * dotted quads never half-match as phone numbers. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhoneRe = "\\+?\\d[\\d -]{7,}\\d"

  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Word-repetition profile — duplicate-token fraction and top-token
    * share per document (the RefinedWeb/Gopher-style repetition quality
    * gates: high rep_ratio / top_share flags boilerplate and spam).
    * rep_ratio = 1 − distinct/total tokens; top_share = most frequent
    * token count / total. One explode + two grouped aggregations —
    * shuffles on (id, term) then id, fully distributed (same shape as
    * [[tfIdf]]). Returns (id, n_tokens, rep_ratio, top_share). */
  def wordRepetition(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("n"))
      .groupBy("id")
      .agg(sum("n").as("n_tokens"), count(lit(1)).as("n_distinct"), max("n").as("max_n"))
      .select(col("id"), col("n_tokens"),
        (lit(1.0) - col("n_distinct") / col("n_tokens")).as("rep_ratio"),
        (col("max_n") / col("n_tokens")).as("top_share"))

  /** TF-IDF over whitespace tokens: term frequency per (doc, term),
    * idf = ln((N+1)/(df+1)) + 1 (smoothed, sklearn-style), score =
    * tf · idf. One explode + two grouped aggregations — shuffles on
    * (doc, term) then term; fully distributed, no vocabulary collected.
    * Returns (id, term, tf, df, tfidf). */
  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    val n = df.count().toDouble
    val terms = df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "term")
      .withColumn("tfidf", col("tf") * (log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0))
      .select("id", "term", "tf", "df", "tfidf")
  }

  /** CCNet-style LM quality score: a bigram language model with add-α
    * smoothing is "trained" on `reference` (distributed counts — the
    * model stays a TABLE and is joined, never collected to the driver)
    * and every document in `df` is scored by per-bigram log2 perplexity:
    *   P(w2|w1) = (c(w1,w2) + α) / (c(w1·) + α·V)
    * where c(w1·) counts bigrams with left word w1 and V = |{w1}| in the
    * reference. ppl = 2^(−avg log2 P); high perplexity = unlike the
    * reference distribution (the classic gibberish/boilerplate filter).
    * Documents with fewer than two tokens have no bigrams and are
    * excluded. Shuffles on the bigram key (vocab-bounded at any corpus
    * size) then on the doc id. Returns (id, n_bigrams, ppl). */
  def bigramPerplexity(df: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, alpha: Double = 0.1): DataFrame = {
    def bigrams(src: DataFrame): DataFrame = {
      val toks = tokens(col(textCol))
      val n = size(toks)
      src.where(n >= 2)
        .select(col(idCol).as("id"),
          explode(transform(sequence(lit(1), n - 1),
            i => struct(element_at(toks, i).as("w1"), element_at(toks, i + 1).as("w2"))))
            .as("bg"))
        .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    }
    // the reference bigram frame feeds three consumers (c2, c1, V) — cache
    // it so the tokenize+explode pass runs once; when scoring the training
    // frame itself (df eq reference) it is a fourth consumer of the same
    // cached frame rather than a fresh tokenize+explode
    val refBg = bigrams(reference).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c2 = refBg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = refBg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = refBg.select(countDistinct(col("w1")).as("v"))
    (if (df eq reference) refBg else bigrams(df))
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .attachSingleton(v)
      .select(col("id"),
        log(2.0,
          (coalesce(col("c2"), lit(0L)) + alpha) /
            (coalesce(col("c1"), lit(0L)) + lit(alpha) * col("v"))).as("lp"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), (-avg(col("lp"))).as("nll"))
      .select(col("id"), col("n_bigrams"), pow(lit(2.0), col("nll")).as("ppl"))
  }

  /** Cross-source LM cross-entropy matrix — the domain-similarity
    * signal behind LM-based data selection (the "score candidate data
    * under the target domain's cheap LM" idea of CCNet/DSIR, lifted to
    * an all-pairs corpus diagnostic): for every ordered source pair,
    * the mean bits/bigram of eval-source text under the model-source's
    * add-α bigram LM (same smoothing as [[bigramPerplexity]]). Low
    * xent ⇒ eval text looks like model text; each row's minimum is
    * normally its diagonal — a violated diagonal marks mislabeled or
    * heavily-mixed sources.
    *
    * Scale shape: bigrams aggregate ONCE to per-(source, bigram)
    * counts (vocab-bounded, map-side combined); the ×S model expansion
    * is a map-only literal-array explode over those COUNT rows (never
    * raw tokens), the model lookups are slim bigram-keyed left joins,
    * and the S-row V table broadcasts. Per-term log2 values are
    * rounded then decimal-summed weighted by the integer counts, so
    * the matrix is bit-stable across engines and partitionings. */
  def crossEntropyMatrix(docs: DataFrame, srcCol: String, textCol: String,
      alpha: Double = 0.1): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val toks = tokens(col(textCol))
    val n = size(toks)
    val bg = docs.where(n >= 2)
      .select(col(srcCol).as("src"),
        explode(transform(sequence(lit(1), n - 1),
          i => struct(element_at(toks, i).as("w1"), element_at(toks, i + 1).as("w2"))))
          .as("b"))
      .select(col("src"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("src", "w1", "w2").agg(count(lit(1)).as("m"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val c1 = bg.groupBy(col("src").as("model_src"), col("w1"))
        .agg(sum(col("m")).as("c1"))
      val v = bg.groupBy(col("src").as("model_src"))
        .agg(countDistinct(col("w1")).as("v"))
      val sources = bg.select("src").distinct()
        .collect().map(_.getString(0)).sorted
      bg.select(col("src").as("eval_src"), col("w1"), col("w2"), col("m"))
        .withColumn("model_src",
          explode(typedLit(sources.toSeq)))
        .join(bg.select(col("src").as("model_src"), col("w1"), col("w2"),
          col("m").as("c2")), Seq("model_src", "w1", "w2"), "left")
        .join(c1, Seq("model_src", "w1"), "left")
        .join(broadcast(v), Seq("model_src"))
        .select(col("model_src"), col("eval_src"), col("m"),
          round(log2((coalesce(col("c2"), lit(0L)) + alpha) /
            (coalesce(col("c1"), lit(0L)) + lit(alpha) * col("v"))), 6)
            .cast(DecimalType(27, 6)).as("lp"))
        .groupBy(col("model_src"), col("eval_src"))
        .agg(sum(col("m")).as("n_bigrams"),
          sum(col("lp") * col("m")).cast("double").as("slp"))
        .select(col("model_src"), col("eval_src"),
          col("n_bigrams").cast("long").as("n_bigrams"),
          round(-col("slp") / col("n_bigrams"), 6).as("xent"))
        .localCheckpoint(true) // eager: S² rows, valid after unpersist
    } finally bg.unpersist(blocking = false)
  }

  /** Gopher-style word-n-gram repetition gates (Rae et al. 2021 §A1.1,
    * the "repetitious text" filters RefinedWeb/FineWeb reuse): per
    * document,
    *   - `top_bigram_frac`  — characters covered by occurrences of the
    *     single most frequent word bigram / total characters (ties break
    *     to the lexicographically smallest bigram, so the metric is
    *     deterministic);
    *   - `dup_trigram_frac` — characters covered by ALL word trigrams
    *     that occur more than once / total characters, capped at 1.0
    *     (overlaps are counted per occurrence — the standard cheap
    *     over-approximation of Gopher's span-union measure).
    * A document passes when top_bigram_frac ≤ 0.18 and
    * dup_trigram_frac ≤ 0.30 (Gopher's published thresholds for n=2
    * top-n-gram and n=3 dup-n-gram). Entirely map-side — one native
    * expression per n ([[graft.functions.NGramRunStats]]), no shuffle,
    * no driver-side state. Returns
    * (id, n_chars, top_bigram_frac, dup_trigram_frac, gopher_pass). */
  def gopherGates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Per-doc n-gram counting needs NO shuffle — and no per-gram Catalyst
    // lambdas either: the run-length scan over the sorted gram array is
    // the native [[graft.functions.NGramRunStats]] expression (the first
    // cut exploded to an (id, gram) shuffle; the second was an
    // `aggregate()` higher-order fold, which Catalyst evaluates
    // interpreted — ~24M struct-allocating lambda calls at sf0.1, the
    // single most expensive query in the bench at 6.9 s warm).
    val toks = tokens(col(textCol))
    df.select(col(idCol).as("id"),
        length(col(textCol)).cast("long").as("n_chars"),
        graft.functions.NGramRunStats.ngram_run_stats(toks, 2).as("bi"),
        graft.functions.NGramRunStats.ngram_run_stats(toks, 3).as("tri"))
      .select(col("id"), col("n_chars"),
        when(col("bi.best_c") > 0,
          round(least(lit(1.0),
            col("bi.best_c") * col("bi.best_len") / col("n_chars")), 6))
          .otherwise(0.0).as("top_bigram_frac"),
        round(least(lit(1.0), col("tri.dup") / col("n_chars")), 6)
          .as("dup_trigram_frac"))
      .withColumn("gopher_pass",
        (col("top_bigram_frac") <= 0.18 && col("dup_trigram_frac") <= 0.30)
          .cast("int"))
  }

  /** Full per-document text-stats projection. */
  def profile(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", size(tokens(t)))
      .withColumn("n_tokens_bpeish", tokenCountBpeish(t))
      .withColumn("lang_id", langId(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
