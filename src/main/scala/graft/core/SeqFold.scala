package graft.core

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Distributed per-key SEQUENTIAL fold with O(1) per-key state — the
  * engine behind the order-dependent recurrences (EWMA t18, Holt t27,
  * CUSUM t29, Kalman t32, the st23 MV read) whose per-step arithmetic
  * cannot be re-associated, so neither a window frame nor a commutative
  * aggregate can express them.
  *
  * The shape is the classic secondary sort: ONE hash exchange on the
  * key, a per-partition EXTERNAL sort on (key, order), then a streaming
  * `mapPartitions` that folds each key's run off the sorted iterator.
  * Per-key state is the fold accumulator alone — O(1), independent of
  * the key's event count — which is the whole point versus the
  * `collect_list → functions.aggregate` formulation this replaces: that
  * one materializes a key's ENTIRE history as one in-memory array per
  * aggregation buffer, so a hot key at 100 TB is an executor OOM. Here
  * a hot key costs sort spill (disk-backed, Tungsten UnsafeExternalSorter)
  * and a longer run walk — never memory. The sort itself is the standard
  * shuffle-sort any per-key window pays; no single-partition stage, no
  * driver involvement.
  *
  * Determinism contract: `(o1, o2)` must be a TOTAL order within each
  * key (pass a unique tie-break like event_id as o2); the fold then
  * visits rows in exactly one order, so IEEE-double recurrences are
  * bit-reproducible across partition counts and engines (the DuckDB
  * oracles replay the identical op sequence via recursive CTEs).
  */
object SeqFold {

  /** Canonical input row: key, two order components (micros + unique
    * tie-break), payload value. */
  case class KeyedEvent(k: Long, o1: Long, o2: Long, v: Double)

  /** One output row per surviving key: key, run length, fold result. */
  case class KeyedFold(k: Long, n: Long, out: Double)

  /** [[KeyedFold]]'s multi-value sibling for folds whose final state
    * carries several numbers (CUSUM: two accumulators + two alarm
    * counters). Fixed-width per key — still O(1) state. */
  case class KeyedFoldVec(k: Long, n: Long, out: Array[Double])

  /** [[KeyedEvent]]'s multi-value sibling for folds whose INPUT rows
    * carry several numbers (a segment summary's (mn, mx, dd, cnt)). */
  case class KeyedRow(k: Long, o1: Long, o2: Long, vs: Array[Double])

  private implicit val evEnc: Encoder[KeyedEvent] = Encoders.product[KeyedEvent]
  private implicit val rowEnc: Encoder[KeyedRow] = Encoders.product[KeyedRow]
  private implicit val outEnc: Encoder[KeyedFold] = Encoders.product[KeyedFold]
  private implicit val vecEnc: Encoder[KeyedFoldVec] =
    Encoders.product[KeyedFoldVec]

  /** Project `df` into the canonical fold shape. `o1` is cast to long
    * AS GIVEN — pass `unix_micros(ts)`, not a raw timestamp (a
    * timestamp cast to long truncates to seconds and would merge
    * sub-second orderings). */
  def keyedEvents(df: DataFrame, key: Column, o1: Column, o2: Column,
      value: Column): Dataset[KeyedEvent] =
    df.select(key.cast("long").as("k"), o1.cast("long").as("o1"),
      o2.cast("long").as("o2"), value.cast("double").as("v")).as[KeyedEvent]

  /** Fold each key's (o1, o2)-sorted run: `init` seeds state from the
    * run's first row, `step` advances it one row at a time, `finish`
    * maps (key, runLength, finalState) to the output value — or None to
    * drop the key (the "needs ≥ 2 observations" contract). State `S`
    * lives only inside one executor thread for one run; it is never
    * serialized. */
  def fold[S](ev: Dataset[KeyedEvent])(init: KeyedEvent => S)(
      step: (S, KeyedEvent) => S)(
      finish: (Long, Long, S) => Option[Double]): Dataset[KeyedFold] =
    foldWith[S, KeyedFold](ev)(init)(step)(
      (k, n, st) => finish(k, n, st).map(v => KeyedFold(k, n, v)))

  /** [[fold]] with a fixed-width vector result — `finish` maps the
    * final state to the output doubles (positional; name them in the
    * caller's select). */
  def foldVec[S](ev: Dataset[KeyedEvent])(init: KeyedEvent => S)(
      step: (S, KeyedEvent) => S)(
      finish: (Long, Long, S) => Option[Array[Double]]): Dataset[KeyedFoldVec] =
    foldWith[S, KeyedFoldVec](ev)(init)(step)(
      (k, n, st) => finish(k, n, st).map(v => KeyedFoldVec(k, n, v)))

  /** Multi-value-row projection: like [[keyedEvents]] but each row
    * carries `values.length` doubles. */
  def keyedRows(df: DataFrame, key: Column, o1: Column, o2: Column,
      values: Seq[Column]): Dataset[KeyedRow] =
    df.select(key.cast("long").as("k"), o1.cast("long").as("o1"),
      o2.cast("long").as("o2"),
      array(values.map(_.cast("double")): _*).as("vs")).as[KeyedRow]

  /** [[foldVec]] over multi-value rows — the vector-in, vector-out
    * sequential fold (drives e.g. the segment-summary MV read: per key,
    * walk segments in order with an O(1) running state). */
  def foldRows[S](ev: Dataset[KeyedRow])(init: KeyedRow => S)(
      step: (S, KeyedRow) => S)(
      finish: (Long, Long, S) => Option[Array[Double]]): Dataset[KeyedFoldVec] =
    foldRowsWith[S, KeyedFoldVec](ev)(init)(step)(
      (k, n, st) => finish(k, n, st).map(v => KeyedFoldVec(k, n, v)))

  private def foldWith[S, R: Encoder](ev: Dataset[KeyedEvent])(
      init: KeyedEvent => S)(
      step: (S, KeyedEvent) => S)(
      finish: (Long, Long, S) => Option[R]): Dataset[R] =
    ev.repartition(col("k"))
      .sortWithinPartitions(col("k"), col("o1"), col("o2"))
      .mapPartitions(rows =>
        runIterator[KeyedEvent, S, R](rows, _.k, init, step, finish))

  private def foldRowsWith[S, R: Encoder](ev: Dataset[KeyedRow])(
      init: KeyedRow => S)(
      step: (S, KeyedRow) => S)(
      finish: (Long, Long, S) => Option[R]): Dataset[R] =
    ev.repartition(col("k"))
      .sortWithinPartitions(col("k"), col("o1"), col("o2"))
      .mapPartitions(rows =>
        runIterator[KeyedRow, S, R](rows, _.k, init, step, finish))

  /** Streaming run walk over a (key, order)-sorted iterator: O(1) state
    * per run, one output per surviving run. */
  private def runIterator[T, S, R](rows: Iterator[T], keyOf: T => Long,
      init: T => S, step: (S, T) => S,
      finish: (Long, Long, S) => Option[R]): Iterator[R] = {
    val it = rows.buffered
    new Iterator[R] {
      private var pending: Option[R] = None
      private def advance(): Unit = {
        while (pending.isEmpty && it.hasNext) {
          val first = it.next()
          val k = keyOf(first)
          var st = init(first)
          var n = 1L
          while (it.hasNext && keyOf(it.head) == k) {
            st = step(st, it.next()); n += 1
          }
          pending = finish(k, n, st)
        }
      }
      override def hasNext: Boolean = {
        if (pending.isEmpty) advance()
        pending.nonEmpty
      }
      override def next(): R = {
        if (!hasNext) throw new NoSuchElementException("exhausted fold")
        val r = pending.get; pending = None; r
      }
    }
  }
}
