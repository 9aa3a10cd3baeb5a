package graft.core

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Distributed per-key SEQUENTIAL fold with O(1) per-key state — the
  * engine behind the order-dependent recurrences (EWMA t18, Holt t27,
  * drawdown t29) whose per-step arithmetic cannot be re-associated, so
  * neither a window frame nor a commutative aggregate can express them.
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

  private implicit val evEnc: Encoder[KeyedEvent] = Encoders.product[KeyedEvent]
  private implicit val outEnc: Encoder[KeyedFold] = Encoders.product[KeyedFold]

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
    ev.repartition(col("k"))
      .sortWithinPartitions(col("k"), col("o1"), col("o2"))
      .mapPartitions { rows =>
        val it = rows.buffered
        new Iterator[KeyedFold] {
          private var pending: KeyedFold = null
          private def advance(): Unit = {
            while (pending == null && it.hasNext) {
              val first = it.next()
              var st = init(first)
              var n = 1L
              while (it.hasNext && it.head.k == first.k) {
                st = step(st, it.next()); n += 1
              }
              finish(first.k, n, st)
                .foreach(v => pending = KeyedFold(first.k, n, v))
            }
          }
          override def hasNext: Boolean = {
            if (pending == null) advance()
            pending != null
          }
          override def next(): KeyedFold = {
            if (!hasNext) throw new NoSuchElementException("exhausted fold")
            val r = pending; pending = null; r
          }
        }
      }
}
