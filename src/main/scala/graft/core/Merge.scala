package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot maintenance: latest-wins merge (the MERGE INTO / upsert a
  * lakehouse table format runs on every ingest cycle, expressed as a
  * pure batch operator). The reference pipeline reads immutable drops;
  * a 100-TB production corpus instead receives daily update batches —
  * new docs, re-crawls, takedowns — and the engine needs the merge
  * primitive to apply them without rewriting history by hand.
  *
  * Semantics: rows from `snapshot` and `updates` are unioned by name;
  * within each `key` group the row with the highest `versionCol` wins,
  * with ties going to `updates` (so re-applying a batch is idempotent
  * even when versions collide). Within ONE batch, (key, version) must
  * be unique — two same-version rows for a key in the same input tie
  * on both sort keys and the survivor is partition-order dependent;
  * that is a caller contract, not something the operator can repair.
  * Rows whose `deletedCol` is true are
  * tombstones: they win their key like any other row (suppressing older
  * versions) and are then dropped from the output — a takedown deletes
  * the document.
  *
  * Scale shape: ONE hash shuffle on `key`; the keep-latest window is
  * `row_number() <= 1` over (key → version DESC), which Spark compiles
  * to WindowGroupLimit — a per-partition top-1 heap on each map side
  * before the shuffle, so the exchange carries at most one surviving
  * row per (partition, key), not every historical version. At real
  * scale the big win sits one level up: updates touch few partitions,
  * so partition-prune the snapshot side by the update batch's key range
  * (or bucket both sides on `key` — j14's layout — and the merge
  * becomes shuffle-free); the operator is that inner merge step.
  */
object Merge {

  /** Incremental aggregate maintenance (materialized-view delta merge):
    * hold per-key ALGEBRAIC partials (cnt, decimal sum, min, max) at
    * rest, fold each arriving batch's partials in with one key-keyed
    * aggregate — never rescan history. `sum` must already be
    * decimal-accumulated (exact, so merge order can't change it);
    * derived stats (avg = sum/cnt) are computed at READ time from the
    * merged partials, never stored. Returns the same partial schema, so
    * the output is the next at-rest state. The 100 TB point: the MV
    * update cost is O(batch + touched keys), not O(history). */
  def mergeAggState(state: DataFrame, deltaPartials: DataFrame,
      keys: Seq[String]): DataFrame =
    state.unionByName(deltaPartials)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("cnt")).as("cnt"),
        sum(col("sum")).as("sum"),
        min(col("mn")).as("mn"),
        max(col("mx")).as("mx"))

  /** The partial-building twin of [[mergeAggState]]: per-key algebraic
    * partials of `valueCol` with an exact decimal sum. */
  def aggPartials(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(col(valueCol)).as("cnt"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(27, 6))).as("sum"),
        min(col(valueCol)).as("mn"),
        max(col(valueCol)).as("mx"))

  /** Second-order CO-MOMENT partials (the [[aggPartials]] of
    * correlation/covariance: cnt + five exact-decimal sums Σx Σy Σx²
    * Σy² Σxy per key). Decimal accumulation is order-independent, so
    * partials built per batch and folded with [[mergeCorrState]] equal
    * a one-shot build EXACTLY — not just approximately — and the
    * read-time Pearson r / covariance derive from six bit-identical
    * doubles. Caller contract: x and y non-null together (cnt counts
    * rows; route through a pair-null filter first if the source can
    * hold one-sided nulls). */
  def corrPartials(df: DataFrame, keys: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(27, 6)
    val (x, y) = (col(xCol), col(yCol))
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        sum(x.cast(dec)).as("sx"), sum(y.cast(dec)).as("sy"),
        sum((x * x).cast(dec)).as("sxx"), sum((y * y).cast(dec)).as("syy"),
        sum((x * y).cast(dec)).as("sxy"))
  }

  /** Fold a delta batch's [[corrPartials]] into the at-rest state: one
    * key-keyed aggregate of exact decimal sums — O(batch + touched
    * keys), never O(history); same schema out, so the output is the
    * next at-rest state. */
  def mergeCorrState(state: DataFrame, deltaPartials: DataFrame,
      keys: Seq[String]): DataFrame =
    state.unionByName(deltaPartials)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("cnt")).as("cnt"),
        sum(col("sx")).as("sx"), sum(col("sy")).as("sy"),
        sum(col("sxx")).as("sxx"), sum(col("syy")).as("syy"),
        sum(col("sxy")).as("sxy"))

  def latestWins(snapshot: DataFrame, updates: DataFrame, key: String,
      versionCol: String, deletedCol: Option[String] = None): DataFrame = {
    val tagged = snapshot.withColumn("__side", lit(0))
      .unionByName(updates.withColumn("__side", lit(1)))
    val w = Window.partitionBy(col(key))
      .orderBy(col(versionCol).desc, col("__side").desc)
    val latest = tagged.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk", "__side")
    deletedCol.map(d => latest.filter(!col(d)).drop(d)).getOrElse(latest)
  }

  /** SCD-2 history reconstruction from a change log: given the full
    * event stream (key, versionCol, attrs…), emit one row per event
    * with its validity interval — `valid_from` = the event's version,
    * `valid_to` = the NEXT version for that key (null while current),
    * `is_current` = no successor. This is the "rebuild the dimension
    * history from CDC events" batch job every lakehouse runs after
    * backfills or compliance rewrites.
    *
    * Caller contract mirrors [[latestWins]]: (key, version) unique in
    * the input — duplicate versions would make `lead` order-dependent.
    *
    * Scale shape: ONE hash shuffle on `key`; `lead` needs each key's
    * events sorted together, and a key's history is bounded by its
    * change count (ingest cadence), never by corpus size — so group
    * skew is structurally bounded. At real scale the changelog is
    * already key-bucketed by the ingest layout and the shuffle
    * disappears (j14's discipline).
    */
  def scd2FromChangelog(events: DataFrame, key: String, versionCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(versionCol).asc)
    events
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** ATTRIBUTE-COMPRESSED SCD2 history from raw events: one interval row
    * per attribute RUN (consecutive events with the same `attrCol`
    * collapse), unlike [[scd2FromChangelog]] where every changelog row is
    * a version. `(tsCol, idCol)` must order each key's events uniquely.
    * Output: (key, attr, valid_from_ts, valid_from_id, valid_to_ts,
    * valid_to_id), open interval = null valid_to.
    *
    * Scale shape: ONE key-keyed shuffle; the lag-filter and the lead
    * over surviving change rows share the same partitioning (one
    * exchange, two sorts), and a key's row count is its change count —
    * bounded by ingest cadence, never corpus size. */
  def scd2Compressed(events: DataFrame, key: String, tsCol: String,
      idCol: String, attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol), col(idCol))
    val changes = events.select(col(key), col(tsCol), col(idCol), col(attrCol))
      .withColumn("__p", lag(col(attrCol), 1).over(w))
      .where(col("__p").isNull || col("__p") =!= col(attrCol))
    changes.select(col(key), col(attrCol).as("attr"),
      col(tsCol).as("valid_from_ts"), col(idCol).as("valid_from_id"),
      lead(col(tsCol), 1).over(w).as("valid_to_ts"),
      lead(col(idCol), 1).over(w).as("valid_to_id"))
  }

  /** Incremental SCD2 maintenance: fold one append batch of raw events
    * into an at-rest [[scd2Compressed]] dimension WITHOUT rescanning
    * history — the u2/u4 stance applied to the dimension table itself.
    * Contract: `scd2Fold(scd2Compressed(E₁), E₂) ≡ scd2Compressed(E₁∪E₂)`
    * whenever every batch event sorts strictly after every at-rest event
    * of the same key (append-only ingest — a time-cutoff split satisfies
    * it). The fold:
    * 1. compresses the batch internally ([[scd2Compressed]] on the batch
    *    alone — O(batch)),
    * 2. drops each key's FIRST batch change when it matches the key's
    *    open at-rest attr (the run continues across the boundary),
    * 3. closes affected open rows at the surviving chain's first change,
    * 4. appends the surviving chain.
    * Closed at-rest rows pass through UNTOUCHED — per cycle the work is
    * O(batch + touched keys), never O(history); at real scale the
    * touched-key joins are the only shuffles and both sides are
    * batch-sized or key-bucketed. */
  def scd2Fold(state: DataFrame, batch: DataFrame, key: String,
      tsCol: String, idCol: String, attrCol: String): DataFrame = {
    val cols = Seq(col(key), col("attr"),
      col("valid_from_ts"), col("valid_from_id"),
      col("valid_to_ts"), col("valid_to_id"))
    val bc = scd2Compressed(batch, key, tsCol, idCol, attrCol)
    val open = state.where(col("valid_to_ts").isNull)
    val closed = state.where(col("valid_to_ts").isNotNull)
    // first change per batch key: min over (ts, id, attr) struct — the
    // unique (ts, id) prefix carries the attr along, aggregate not window
    val first = bc.groupBy(col(key)).agg(
      min(struct(col("valid_from_ts"), col("valid_from_id"), col("attr"))).as("f"))
      .select(col(key), col("f.valid_from_ts").as("__f_ts"),
        col("f.valid_from_id").as("__f_id"), col("f.attr").as("__f_attr"))
    // keys whose open run continues across the boundary → their first
    // batch change is not a change at all
    val dropFirst = open.select(col(key), col("attr").as("__open_attr"))
      .join(first, Seq(key))
      .where(col("__open_attr") === col("__f_attr"))
      .select(col(key), col("__f_ts"), col("__f_id"))
    val chain = bc.join(dropFirst, bc(key) === dropFirst(key) &&
        col("valid_from_ts") === col("__f_ts") &&
        col("valid_from_id") === col("__f_id"), "left_anti")
    // close open rows at the surviving chain's first change (none → the
    // key's run is still open, valid_to stays null)
    val chainFirst = chain.groupBy(col(key)).agg(
      min(struct(col("valid_from_ts"), col("valid_from_id"))).as("cf"))
      .select(col(key), col("cf.valid_from_ts").as("__n_ts"),
        col("cf.valid_from_id").as("__n_id"))
    val openUpd = open.drop("valid_to_ts", "valid_to_id")
      .join(chainFirst, Seq(key), "left")
      .withColumn("valid_to_ts", col("__n_ts"))
      .withColumn("valid_to_id", col("__n_id"))
    closed.select(cols: _*)
      .unionByName(openUpd.select(cols: _*))
      .unionByName(chain.select(cols: _*))
  }

  /** CDC-style snapshot diff: classify every key across two corpus
    * versions as added / removed / changed / unchanged by comparing a
    * caller-supplied row fingerprint (md5 of the payload, a version
    * hash — anything equality-comparable). The "what changed between
    * yesterday's and today's crawl" primitive that decides how much of
    * an incremental pipeline (dedup index, embeddings, sketches)
    * actually needs recomputing.
    *
    * Caller contract: `keyCol` unique within each snapshot.
    *
    * Scale shape: ONE key-keyed full-outer hash join of slim
    * (key, fingerprint) projections — payload columns never ride the
    * shuffle; at real scale both snapshots are key-bucketed by the
    * ingest layout and the shuffle disappears entirely. */
  def snapshotDiff(prev: DataFrame, cur: DataFrame, keyCol: String,
      fpCol: String): DataFrame =
    // presence is carried by EXPLICIT per-side flags, never inferred from
    // fingerprint nullness: a key present in both snapshots with a NULL
    // fingerprint (md5 of a null payload) must classify by the null-safe
    // <=> compare (null <=> null → unchanged), not masquerade as added/
    // removed
    prev.select(col(keyCol).as("k"), col(fpCol).as("fp_prev"),
        lit(true).as("in_prev"))
      .join(cur.select(col(keyCol).as("k"), col(fpCol).as("fp_cur"),
        lit(true).as("in_cur")), Seq("k"), "full_outer")
      .select(col("k").as(keyCol),
        when(col("in_prev").isNull, lit("added"))
          .when(col("in_cur").isNull, lit("removed"))
          .when(col("fp_prev") <=> col("fp_cur"), lit("unchanged"))
          .otherwise(lit("changed")).as("change_type"))

  /** Bounded TOP-K maintenance (the leaderboard materialized view —
    * the ranking member of the incremental triad next to
    * [[mergeAggState]]'s aggregates and [[scd2Fold]]'s dimension
    * history): hold the current top-k rows per group at rest, fold each
    * arriving batch in by unioning candidates and keeping the k best per
    * group under `order`. Returns the same shape, so the output is the
    * next at-rest state.
    *
    * Correctness: top-k under a TOTAL order is a commutative,
    * associative fold over row sets — topK(topK(A) ∪ B) = topK(A ∪ B) —
    * so the maintained state equals a one-shot recompute REGARDLESS of
    * batch order or boundaries (TopKFoldSpec property-tests random
    * splits and shuffled batch arrival). Caller contract: `order` must
    * totally order rows within a group (include a unique tie-break
    * column — at a rank-k tie the survivor would otherwise be
    * partition-order dependent), and a given row arrives in exactly one
    * batch (exactly-once replay; a re-delivered row would occupy two of
    * the k slots).
    *
    * Scale shape: ONE hash shuffle on the group keys carrying
    * |state| (= k·groups rows, bounded) + |batch|; the keep-k filter is
    * `row_number() <= k`, which Spark compiles to WindowGroupLimit —
    * a per-partition top-k heap on each map side, so the exchange
    * carries at most k surviving rows per (map partition, group).
    * History beyond the current top-k is never revisited: per-trigger
    * cost is O(batch + k·touched groups), not O(history). */
  def topKFold(state: DataFrame, batch: DataFrame, groupCols: Seq[String],
      order: Seq[org.apache.spark.sql.Column], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    state.unionByName(batch)
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__rk")
  }

  /** Exact DISTINCT-SET maintenance (the first-seen fold behind an
    * exactly-maintained COUNT(DISTINCT) materialized view — the
    * aggregate streaming engines cannot maintain natively because its
    * state IS the key set): given the at-rest set of already-seen key
    * tuples and a new batch, return ONLY the batch's genuinely-new
    * tuples (batch-distinct → left_anti against state). The caller
    * APPENDS the result to the at-rest state — append-only state is
    * what keeps maintenance cheap (no rewrite of history), and the
    * read-time view is a plain count per group over the state.
    *
    * Fold ≡ recompute: state after folding batches B₁…Bₙ in any order
    * is exactly distinct(B₁ ∪ … ∪ Bₙ) — new(B) ∩ state = ∅ by the
    * anti-join and every tuple of B is either in state or in new(B)
    * (FirstSeenFoldSpec property-tests random splits).
    *
    * Scale shape: one distinct shuffle over the BATCH (map-side
    * combined) + one key-keyed anti-join against state. The anti-join
    * is the O(state) term; at real scale the state side is key-bucketed
    * (j14's layout) so the probe prunes to the batch's buckets, or the
    * exactness knob is dropped entirely for h6's mergeable HLL when ±2%
    * serves. */
  def firstSeenNew(state: DataFrame, batch: DataFrame,
      cols: Seq[String]): DataFrame =
    batch.select(cols.map(col): _*).distinct()
      .join(state.select(cols.map(col): _*), cols, "left_anti")
}
