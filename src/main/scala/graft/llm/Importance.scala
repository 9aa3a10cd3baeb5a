package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Relational.SingletonAttachOps

/** DSIR-style data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every raw
  * document by how target-like its hashed n-gram profile is, then keep
  * the top slice. The reference pipeline has no analog (its quality
  * gates are per-doc heuristics); this is the corpus-level selection
  * operator a pretraining mix actually uses to up-weight a target
  * domain from a web crawl.
  *
  * Model: unigram bag-of-hashed-tokens. Tokens hash into `nBuckets`
  * buckets via the first 3 hex chars of md5 (engine-portable, so the
  * whole weight computation is DuckDB-oracle-checkable — the same trick
  * the exact-k sampler uses). Target and raw bucket distributions are
  * add-alpha smoothed; a document's log importance weight is
  *   sum over token instances of  ln p_target(b) − ln p_raw(b).
  *
  * Scale shape (two linear passes, no all-pairs anything):
  *   1. tokenize → bucket → ONE map-side-combined groupBy over at most
  *      `nBuckets` keys builds both distributions in a single pass (the
  *      target counts ride as a conditional sum — no second scan, no
  *      join between target and raw).
  *   2. the distribution table (≤ nBuckets rows) broadcasts back onto
  *      the token stream; per-doc weights reduce with one
  *      map-side-combined groupBy on doc id.
  *   At 100 TB the bucket table is still 4096 rows — the broadcast
  *   never grows with the corpus; only the per-doc reduce shuffles, and
  *   it carries (doc_id, partial-sum) pairs, never text.
  *
  * Selection is deterministic top-K by (rounded weight DESC, doc_id
  * ASC) — the rank-and-keep form of importance resampling (the paper
  * adds Gumbel noise; a seeded-hash Gumbel would slot into the same
  * ORDER BY, but the deterministic form is what the cross-engine
  * contract can pin exactly).
  */
object Importance {

  val DefaultBuckets = 4096 // 16^3 — first 3 md5 hex chars

  /** 16^6 — first 6 md5 hex chars: the DRAW-KEY granularity. Feature
    * hashing (DSIR) wants a small dense table, so it stays at 4096;
    * per-row uniforms (Pareto keep, Efraimidis–Spirakis keys) want
    * effectively-unique values, so they use this — at 16.7M levels the
    * probability of ANY collision among 10^5 rows is < 0.3‰, killing
    * the equal-key bands whose id tiebreak skewed inclusion odds. */
  val FineBuckets = 16777216 // 16^6

  /** md5-prefix bucket in [0, 4096): engine-portable hashed feature. */
  def bucket(term: Column): Column =
    conv(substring(md5(term.cast("binary")), 1, 3), 16, 10).cast("int")

  /** md5-prefix bucket in [0, 16^6): engine-portable fine uniform. */
  def bucket6(term: Column): Column =
    conv(substring(md5(term.cast("binary")), 1, 6), 16, 10).cast("int")

  private def bucketSqlN(t: String, n: Int): String =
    (1 to n).map { i =>
      val p = math.pow(16, n - i).toLong
      s"(instr('0123456789abcdef', substr(md5($t), $i, 1)) - 1) * $p"
    }.mkString("(", " +\n ", ")")

  val BucketSql: String => String = bucketSqlN(_, 3)

  /** DuckDB twin of [[bucket6]]. */
  val Bucket6Sql: String => String = bucketSqlN(_, 6)

  /** Per-document DSIR log importance weights + deterministic top-`keep`
    * selection flag. `targetPred` marks the target-domain rows (e.g.
    * `col("lang") === "en"`); weights are computed for EVERY doc
    * (target docs included — they score high by construction, which is
    * the paper's sanity check).
    *
    * Output: (doc_id, n_toks, log_w, kept) ordered by doc_id.
    */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, keep: Int, alpha: Double = 0.5): DataFrame = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val b = DefaultBuckets

    val toks = docs.select(col(idCol).as("doc_id"),
        targetPred.as("is_target"),
        explode(Retrieval.tokenize(col(textCol))).as("term"))
      .withColumn("bkt", bucket(col("term")))

    // One pass, both distributions: raw count + conditional target count.
    val counts = toks.groupBy(col("bkt"))
      .agg(count(lit(1)).as("c_raw"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("c_tgt"))
    val totals = counts.agg(sum(col("c_raw")).as("tot_raw"),
      sum(col("c_tgt")).as("tot_tgt"))

    val perTok = toks
      .join(broadcast(counts), Seq("bkt"))
      .attachSingleton(totals)
      .withColumn("lw",
        log((col("c_tgt") + lit(alpha)) / (col("tot_tgt") + lit(alpha * b))) -
        log((col("c_raw") + lit(alpha)) / (col("tot_raw") + lit(alpha * b))))

    val weights = perTok.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), round(sum(col("lw")), 6).as("log_w"))

    // Zero-token docs never appear in `toks`; reattach with weight 0 so
    // the selection universe is the full corpus (they rank last).
    val all = docs.select(col(idCol).as("doc_id"))
      .join(weights, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        coalesce(col("log_w"), lit(0.0)).as("log_w"))

    graft.core.Relational.withGlobalRank(all,
        Seq(col("log_w").desc, col("doc_id").asc), "rk", "total")
      .withColumn("kept", col("rk") <= keep)
      .select(col("doc_id"), col("n_toks"), col("log_w"), col("kept"))
      .orderBy(col("doc_id"))
  }

  /** Oracle twin of [[dsirSelect]] for target = `lang = '<targetLang>'`. */
  def dsirOracleSql(targetLang: String, keep: Int, alpha: Double = 0.5): String = {
    val b = DefaultBuckets
    s"""WITH toks AS (
       |  SELECT doc_id, lang = '$targetLang' AS is_target, t AS term,
       |    ${BucketSql("t")} AS bkt
       |  FROM (SELECT doc_id, lang,
       |          unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t
       |        FROM documents)
       |  WHERE t <> ''),
       |counts AS (
       |  SELECT bkt, COUNT(*) AS c_raw,
       |    SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS c_tgt
       |  FROM toks GROUP BY 1),
       |totals AS (SELECT SUM(c_raw) AS tot_raw, SUM(c_tgt) AS tot_tgt FROM counts),
       |weights AS (
       |  SELECT doc_id, COUNT(*) AS n_toks,
       |    ROUND(SUM(
       |      LN((c.c_tgt + $alpha) / (t2.tot_tgt + ${alpha * b})) -
       |      LN((c.c_raw + $alpha) / (t2.tot_raw + ${alpha * b}))), 6) AS log_w
       |  FROM toks JOIN counts c USING (bkt) CROSS JOIN totals t2
       |  GROUP BY 1),
       |all_docs AS (
       |  SELECT d.doc_id, COALESCE(w.n_toks, 0) AS n_toks,
       |    COALESCE(w.log_w, 0.0) AS log_w
       |  FROM documents d LEFT JOIN weights w USING (doc_id))
       |SELECT doc_id, n_toks, log_w,
       |  (row_number() OVER (ORDER BY log_w DESC, doc_id ASC)) <= $keep AS kept
       |FROM all_docs
       |ORDER BY doc_id""".stripMargin
  }
}
