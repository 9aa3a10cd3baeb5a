package graft

import graft.core.Merge
import org.apache.spark.sql.DataFrame

/** Pins Merge.scd2Fold's advertised contract —
  * `scd2Fold(scd2Compressed(E₁), E₂) ≡ scd2Compressed(E₁ ∪ E₂)` under
  * append-only ingest — including every boundary case the scaladoc
  * promises: open-run CONTINUATION across the batch split (the first
  * batch change that matches the open at-rest attr is not a change),
  * multi-change batches, keys untouched by the batch, and keys that are
  * new in the batch. u5_scd2_incremental verifies the same identity
  * against the DuckDB oracle on real events; this spec pins the exact
  * row-level intervals on a fixture where every case is present by
  * construction. */
class Scd2FoldSpec extends SparkSpec {

  private def compress(df: DataFrame): DataFrame =
    Merge.scd2Compressed(df, "k", "ts", "id", "attr")

  // At-rest events (all ts < 10): key 1 runs a[1,2] then b[3]; key 2 one
  // open run x; key 3 runs p[5] then q[6]. Batch events (all ts ≥ 10):
  // key 1 continues b at 10 (NOT a change), then c, then b again
  // (multi-change); key 3 changes q→r; key 4 is brand new with two runs;
  // key 2 has no batch events.
  private lazy val e1 = {
    val s = spark; import s.implicits._
    Seq((1L, 1L, 1L, "a"), (1L, 2L, 2L, "a"), (1L, 3L, 3L, "b"),
        (2L, 1L, 4L, "x"),
        (3L, 5L, 5L, "p"), (3L, 6L, 6L, "q"))
      .toDF("k", "ts", "id", "attr")
  }
  private lazy val e2 = {
    val s = spark; import s.implicits._
    Seq((1L, 10L, 10L, "b"), (1L, 11L, 11L, "c"), (1L, 12L, 12L, "b"),
        (3L, 10L, 13L, "r"),
        (4L, 10L, 14L, "n"), (4L, 11L, 15L, "m"))
      .toDF("k", "ts", "id", "attr")
  }

  private def rows(df: DataFrame): Set[(Long, String, Long, Long, Option[Long], Option[Long])] = {
    val s = spark; import s.implicits._
    df.select("k", "attr", "valid_from_ts", "valid_from_id", "valid_to_ts", "valid_to_id")
      .as[(Long, String, Long, Long, Option[Long], Option[Long])]
      .collect().toSet
  }

  test("fold ≡ full recompute on the all-cases fixture") {
    val folded = Merge.scd2Fold(compress(e1), e2, "k", "ts", "id", "attr")
    assert(rows(folded) == rows(compress(e1.unionByName(e2))))
  }

  test("open-run continuation: the boundary-straddling run keeps its ORIGINAL valid_from") {
    val folded = rows(Merge.scd2Fold(compress(e1), e2, "k", "ts", "id", "attr"))
    // key 1's 'b' run started at-rest (ts=3) and continues through the
    // batch's ts=10 'b' event; it must close at the batch's first REAL
    // change (c at ts=11) — one interval, original start, no phantom
    // [10,11) row
    assert(folded.contains((1L, "b", 3L, 3L, Some(11L), Some(11L))))
    assert(!folded.exists(r => r._1 == 1L && r._2 == "b" && r._3 == 10L))
  }

  test("multi-change batch: later changes land as their own intervals, last stays open") {
    val folded = rows(Merge.scd2Fold(compress(e1), e2, "k", "ts", "id", "attr"))
    assert(folded.contains((1L, "c", 11L, 11L, Some(12L), Some(12L))))
    assert(folded.contains((1L, "b", 12L, 12L, None, None)))
  }

  test("untouched keys pass through byte-identical; changed keys close at the batch change") {
    val folded = rows(Merge.scd2Fold(compress(e1), e2, "k", "ts", "id", "attr"))
    assert(folded.contains((2L, "x", 1L, 4L, None, None))) // no batch events
    assert(folded.contains((3L, "q", 6L, 6L, Some(10L), Some(13L))))
    assert(folded.contains((3L, "r", 10L, 13L, None, None)))
  }

  test("keys new in the batch get their full compressed chain") {
    val folded = rows(Merge.scd2Fold(compress(e1), e2, "k", "ts", "id", "attr"))
    assert(folded.contains((4L, "n", 10L, 14L, Some(11L), Some(15L))))
    assert(folded.contains((4L, "m", 11L, 15L, None, None)))
  }

  test("empty batch is the identity; fold into empty state ≡ compress(batch)") {
    val empty = e2.where("false")
    assert(rows(Merge.scd2Fold(compress(e1), empty, "k", "ts", "id", "attr"))
      == rows(compress(e1)))
    assert(rows(Merge.scd2Fold(compress(empty), e2, "k", "ts", "id", "attr"))
      == rows(compress(e2)))
  }
}
