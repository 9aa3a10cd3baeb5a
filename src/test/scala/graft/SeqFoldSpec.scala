package graft

import org.apache.spark.sql.functions._
import graft.core.SeqFold

/** Pins the secondary-sort sequential fold (core.SeqFold — the O(1)
  * per-key-state engine under t18/t27): run boundaries, in-run order,
  * finish-filtering, and bit-equality with the collect_list-array
  * formulation it replaced. */
class SeqFoldSpec extends SparkSpec {

  // Deterministic interleaved fixture: keys round-robin across rows so
  // every partition sees every key — run detection must come from the
  // sort, never from input adjacency. o1 descends as rows ascend so an
  // unsorted fold would visit runs backwards.
  private def fixture(nKeys: Int, perKey: Int) = {
    val s = spark; import s.implicits._
    val rows = for (i <- 0 until perKey; k <- 0 until nKeys)
      yield (k.toLong, (perKey - i).toLong * 10, (i * nKeys + k).toLong,
        (k + 1) * 100.0 + (perKey - i))
    rows.toDF("k", "o1", "o2", "v")
  }

  test("fold visits each key's run in (o1, o2) order with correct n") {
    val ev = SeqFold.keyedEvents(fixture(7, 13),
      col("k"), col("o1"), col("o2"), col("v"))
    // positional checksum: sum of v * 2^position is order-sensitive —
    // any permutation of the run changes it.
    val out = SeqFold.fold(ev)(e => e.v)(
        (acc, e) => acc * 2.0 + e.v)(
        (_, _, st) => Some(st))
      .collect().map(r => r.k -> (r.n, r.out)).toMap
    assert(out.keySet === (0L until 7L).toSet)
    for (k <- 0L until 7L) {
      val vs = (0 until 13).map(i => (k + 1) * 100.0 + (13 - i)).reverse
      val expect = vs.tail.foldLeft(vs.head)((a, v) => a * 2.0 + v)
      assert(out(k) === ((13L, expect)), s"key $k")
    }
  }

  test("finish = None drops the key; n counts the whole run") {
    val ev = SeqFold.keyedEvents(fixture(5, 4),
      col("k"), col("o1"), col("o2"), col("v"))
    val out = SeqFold.fold(ev)(_ => 0.0)(
        (acc, e) => acc + e.v)(
        (k, n, st) => if (k % 2 == 0) Some(st + n) else None)
      .collect()
    assert(out.map(_.k).sorted === Array(0L, 2L, 4L))
    assert(out.forall(_.n == 4L))
  }

  test("single-row runs seed via init and never call step") {
    val s = spark; import s.implicits._
    val ev = SeqFold.keyedEvents(
      Seq((1L, 5L, 1L, 42.0), (2L, 3L, 2L, 7.0)).toDF("k", "o1", "o2", "v"),
      col("k"), col("o1"), col("o2"), col("v"))
    val out = SeqFold.fold(ev)(e => e.v)(
        (_, _) => sys.error("step on a 1-row run"): Double)(
        (_, _, st) => Some(st))
      .collect().map(r => r.k -> r.out).toMap
    assert(out === Map(1L -> 42.0, 2L -> 7.0))
  }

  test("fold result is invariant to shuffle partition count") {
    val s = spark
    def run(parts: String): Map[Long, (Long, Double)] = {
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val ev = SeqFold.keyedEvents(fixture(9, 23),
          col("k"), col("o1"), col("o2"), col("v"))
        SeqFold.fold(ev)(e => e.v)(
            (acc, e) => acc * 2.0 + e.v)(
            (_, _, st) => Some(st))
          .collect().map(r => r.k -> ((r.n, r.out))).toMap
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val at1 = run("1")
    assert(run("7") === at1)
    assert(run("32") === at1)
  }

  test("t18 EWMA via SeqFold is bit-equal to the array-aggregate fold") {
    val raw = graft.core.Tables.readEvents(spark, "/root/testdata/sf0.001")
    // the replaced formulation, verbatim (oracle-green through r14)
    val legacy = raw
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("value")))).as("evs"))
      .select(col("user_id"),
        size(col("evs")).cast("long").as("n_events"),
        aggregate(
          expr("slice(evs, 2, size(evs) - 1)"),
          element_at(col("evs"), 1).getField("value"),
          (acc, e) => lit(0.25) * e.getField("value") + lit(0.75) * acc)
          .as("ewma"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val ev = SeqFold.keyedEvents(raw, col("user_id"),
      unix_micros(col("ts")), col("event_id"), col("value"))
    val got = SeqFold.fold(ev)(e => e.v)(
        (acc, e) => 0.25 * e.v + 0.75 * acc)(
        (_, _, st) => Some(st))
      .collect().map(r => (r.k, (r.n, r.out))).toMap
    assert(got.size === legacy.size)
    // bit-equal, not approx: same IEEE op sequence by construction
    for ((k, (n, v)) <- legacy) assert(got(k) === ((n, v)), s"user $k")
  }
}
