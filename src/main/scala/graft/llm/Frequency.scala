package graft.llm

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import graft.core.Relational.SingletonAttachOps

/** Exact corpus heavy hitters without a vocabulary-sized shuffle — the
  * two-pass Misra–Gries shape (candidates sketch, then exact recount of
  * candidates only). A plain `groupBy(term).count()` over a 100-TB
  * corpus shuffles the ENTIRE vocabulary (web-scale: billions of
  * distinct tokens, heavy skew); this operator shuffles nothing in pass
  * one (the sketch is per-partition, driver never involved) and in pass
  * two only the candidate tokens — at most `partitions × k` terms —
  * survive the map-side broadcast filter, so the recount shuffle is
  * bounded by the sketch size, not the vocabulary.
  *
  * Exactness guarantee (why this is oracle-checkable, unlike a plain
  * sketch): Misra–Gries with k counters on a partition retains every
  * term with partition frequency > n_p/(k+1). If a term has GLOBAL
  * frequency > N/k, then by pigeonhole some partition has local
  * frequency > n_p/k > n_p/(k+1), so the term is a candidate in at
  * least one partition. The exact recount then gives true counts for
  * all candidates, and the final `count·k > N` filter returns EXACTLY
  * the set a full count would — false candidates are eliminated by
  * their true counts, true heavy hitters can never be missed.
  */
object Frequency {

  /** Count-Min sketch with EXPLICIT universal hashes — shared by the
    * at-rest build (h9) and the streaming maintenance twin (st17) so
    * stream ≡ batch is an identity of the SAME arithmetic, and by the
    * DuckDB oracles, which replay `((a·x + b) mod p) mod w` exactly.
    * Counters are (depth, bucket) → count rows; merge = keyed SUM
    * (elementwise add — any batch/shard/stream decomposition folds to
    * the identical table). Estimate = min over depths. */
  object Cms {
    val P: Long = 2147483647L // 2^31 − 1 (Mersenne prime)
    val W: Int = 1024
    val Params: Seq[(Long, Long)] =
      Seq((1103515245L, 12345L), (1234567891L, 54321L), (987654321L, 192837465L))

    // The key is reduced mod p BEFORE the multiply: a·(x mod p) ≡ a·x
    // (mod p) with identical results, but a·x directly overflows Long
    // for x above ~8.4e9 (Spark wraps silently, ANSI mode and the
    // DuckDB oracle both throw) — reduced, a·(x mod p) ≤ ~2.7e18 stays
    // in range on both engines at any NON-NEGATIVE key magnitude.
    // Negative keys are outside the contract: Spark's pmod returns the
    // non-negative residue while the oracle's % is sign-preserving, so
    // cross-engine replay requires u ≥ 0 (all current callers hash
    // xxhash64/abs-derived or natural-id keys, which satisfy it).
    // Oracles mirror the same reduction.
    def bucket(u: org.apache.spark.sql.Column, a: Long, b: Long)
        : org.apache.spark.sql.Column =
      pmod(pmod(lit(a) * pmod(u, lit(P)) + lit(b), lit(P)), lit(W))

    /** (depth, bucket) per input row of `keyCol` — group + count to get
      * partial counters; sum partials to merge. */
    def expand(df: DataFrame, keyCol: String): DataFrame =
      df.select(col(keyCol), posexplode(array(
          Params.map { case (a, b) => bucket(col(keyCol), a, b) }: _*))
        .as(Seq("depth", "bucket")))

    /** Serve min-over-depths point estimates for `probes`(u) from a
      * merged `counters`(depth, bucket, c) table. */
    def estimates(probes: DataFrame, counters: DataFrame): DataFrame =
      probes.select(col("u"), posexplode(array(
          Params.map { case (a, b) => bucket(col("u"), a, b) }: _*))
          .as(Seq("depth", "bucket")))
        .join(counters, Seq("depth", "bucket"), "left")
        .groupBy(col("u")).agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
  }

  /** Bloom filter with EXPLICIT universal hashes — [[Cms]]'s stance
    * applied to membership: because the hash family is
    * `((a·x + b) mod p) mod m` (not an engine-private digest), the
    * DuckDB oracle can replay the ENTIRE filter — including which
    * probes are false positives — so the membership answers themselves
    * are exact-checkable, not just the no-false-negative floor.
    *
    * State is (idx, w) 64-bit words (m = 65536 bits = ≤1024 rows);
    * merge = keyed BIT_OR, which is idempotent AND commutative — any
    * batch/shard/stream decomposition, including at-least-once
    * REDELIVERY, folds to the identical bitset (counting sketches like
    * [[Cms]] only get commutativity). Serving a probe batch is a
    * broadcast join against the ≤1024-row state — membership at any
    * corpus size without rescanning keys (u11's contract). */
  object Bloom {
    val P: Long = 2147483647L // 2^31 − 1 (Mersenne prime)
    val MBits: Long = 65536L
    val Params: Seq[(Long, Long)] =
      Seq((1103515245L, 12345L), (1234567891L, 54321L), (987654321L, 192837465L))

    // Same pre-reduction as Cms.bucket: a·(x mod p) never overflows,
    // a·x does for x above ~8.4e9 — the 'oracle replays the whole
    // filter at any corpus size' claim needs the hash to be total.
    def bitPos(u: org.apache.spark.sql.Column, a: Long, b: Long)
        : org.apache.spark.sql.Column =
      pmod(pmod(lit(a) * pmod(u, lit(P)) + lit(b), lit(P)), lit(MBits))

    private def withWord(df: DataFrame, extra: Seq[String]): DataFrame =
      df.select(extra.map(col) ++ Seq(
        expr("cast(bit div 64 as int)").as("idx"),
        expr("shiftleft(cast(1 as bigint), cast(pmod(bit, 64) as int))")
          .as("w")): _*)

    /** Partial bitset of a key batch: (idx, w) word rows. */
    def build(keys: DataFrame, keyCol: String): DataFrame =
      withWord(keys.select(explode(array(
          Params.map { case (a, b) => bitPos(col(keyCol), a, b) }: _*))
        .as("bit")), Nil)
        .groupBy(col("idx")).agg(expr("bit_or(w)").as("w"))

    /** Fold a partial into the at-rest bitset (keyed BIT_OR). */
    def merge(state: DataFrame, partial: DataFrame): DataFrame =
      state.unionByName(partial)
        .groupBy(col("idx")).agg(expr("bit_or(w)").as("w"))

    /** (key, bloom_hit) per probe: hit iff EVERY hash bit is set. A
      * probe whose hashes collide contributes duplicate (idx, mask)
      * rows — the all-rows-set test is still correct. */
    def memberHits(probes: DataFrame, state: DataFrame, keyCol: String)
        : DataFrame =
      withWord(probes.select(col(keyCol), explode(array(
          Params.map { case (a, b) => bitPos(col(keyCol), a, b) }: _*))
        .as("bit")), Seq(keyCol))
        .withColumnRenamed("w", "m")
        .join(broadcast(state), Seq("idx"), "left")
        .withColumn("set",
          coalesce(col("w"), lit(0L)).bitwiseAND(col("m")) =!= 0)
        .groupBy(col(keyCol))
        .agg((sum(when(col("set"), 1L).otherwise(0L)) === count(lit(1)))
          .as("bloom_hit"))
  }

  /** Classic Misra–Gries: k counters over a token stream. Total work is
    * O(n): each decrement-all sweep cancels k prior increments. */
  private[graft] def misraGries(it: Iterator[String], k: Int): mutable.HashMap[String, Long] = {
    val m = mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      m.get(t) match {
        case Some(c) => m.update(t, c + 1)
        case None if m.size < k => m.update(t, 1L)
        case None =>
          val dead = mutable.ArrayBuffer.empty[String]
          m.mapValuesInPlace((_, c) => c - 1)
          m.foreach { case (key, c) => if (c == 0) dead += key }
          dead.foreach(m.remove)
      }
    }
    m
  }

  /** All tokens with corpus frequency strictly greater than N/k, with
    * their EXACT counts and the exact corpus token total N.
    *
    * Exactly TWO tokenize scans of the corpus: pass 1 emits the sketch
    * candidates AND a per-partition token total from the same
    * `mapPartitions` (a `(null, n_p)` sentinel row per partition — the
    * stream length falls out of the sketch consuming it), so the exact
    * corpus total is the sum of sentinels and needs no separate
    * `count()` scan. The pass-1 output is bounded (≤ partitions×(k+1)
    * rows), so checkpointing it is cheap and lets the candidate filter
    * and the total read it without re-tokenizing.
    *
    * Output: (term, n, n_total) ordered by (n DESC, term ASC).
    */
  def heavyHitters(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")

    val toks = docs.select(
      explode(Retrieval.tokenize(col(textCol))).as("term"))

    // Pass 1 (tokenize scan #1): per-partition sketch → candidate terms
    // (≤ partitions×k) plus one (null, n_p) total sentinel per partition.
    val pass1 = toks.select(col("term")).as[String](Encoders.STRING)
      .mapPartitions { it =>
        var np = 0L
        val sketch = misraGries(it.map { t => np += 1; t }, k)
        sketch.keysIterator.map((_, 0L)) ++ Iterator((null: String, np))
      }(Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .toDF("term", "np")
      .localCheckpoint()

    val candidates = pass1.where(col("term").isNotNull).select("term").distinct()
    val total = pass1.where(col("term").isNull)
      .agg(coalesce(sum(col("np")), lit(0L)).cast("long").as("n_total"))

    // Pass 2 (tokenize scan #2): exact recount of candidates only
    // (broadcast semi-filter before the shuffle).
    toks.join(broadcast(candidates), Seq("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .attachSingleton(total)
      .filter(col("n") * k > col("n_total"))
      .orderBy(col("n").desc, col("term").asc)
  }

  /** Oracle twin of [[heavyHitters]]: the full count-and-filter the
    * two-pass form provably equals. */
  def heavyHittersOracleSql(k: Int): String =
    s"""WITH toks AS (
       |  SELECT t AS term
       |  FROM (SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t
       |        FROM documents)
       |  WHERE t <> ''),
       |counts AS (SELECT term, COUNT(*) AS n FROM toks GROUP BY 1),
       |total AS (SELECT COUNT(*) AS n_total FROM toks)
       |SELECT term, n, n_total FROM counts CROSS JOIN total
       |WHERE n * $k > n_total
       |ORDER BY n DESC, term ASC""".stripMargin

  /** Token-distribution divergence between two corpora — the data-mixing
    * drift diagnostic (is corpus B statistically like corpus A?): add-1-
    * smoothed unigram distributions over the UNION vocabulary, reporting
    * token totals, vocab size, KL(A‖B), KL(B‖A), and Jensen–Shannon.
    *
    * Scale stance: one tokenize + map-side-combined count pass per
    * corpus; everything after the two counts is vocab-sized (full-outer
    * join on the term key, one aggregate) — the corpus never rides a
    * second shuffle, and the 1-row totals frame broadcasts under the
    * cross join. The vocab-sized join frame is persisted so the counts
    * feed both the totals and the divergence aggregate once, then
    * released after the (1-row) result materializes. */
  def tokenDivergence(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def counts(df: DataFrame) = df
      .select(explode(Retrieval.tokenize(col(textCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val joined = counts(a).withColumnRenamed("c", "ca")
      .join(counts(b).withColumnRenamed("c", "cb"), Seq("t"), "full_outer")
      .na.fill(0L, Seq("ca", "cb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val totals = joined.agg(
        sum(col("ca")).cast("double").as("na"),
        sum(col("cb")).cast("double").as("nb"),
        count(lit(1)).cast("double").as("v"))
      val pa = (col("ca") + 1) / (col("na") + col("v"))
      val pb = (col("cb") + 1) / (col("nb") + col("v"))
      val m = (pa + pb) / 2
      joined.attachSingleton(totals)
        .agg(
          max(col("na")).cast("long").as("n_tokens_a"),
          max(col("nb")).cast("long").as("n_tokens_b"),
          count(lit(1)).as("vocab"),
          round(sum(pa * log(pa / pb)), 6).as("kl_ab"),
          round(sum(pb * log(pb / pa)), 6).as("kl_ba"),
          round(sum(pa * log(pa / m)) / 2 + sum(pb * log(pb / m)) / 2, 6).as("js"))
        .localCheckpoint(true)
    } finally joined.unpersist(blocking = false)
  }
}
