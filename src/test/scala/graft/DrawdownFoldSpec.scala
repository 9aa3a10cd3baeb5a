package graft

/** Pins the mergeable max-drawdown interval summary behind st23:
  * dd(A|B) = max(dd_A, dd_B, mx_A − mn_B) for A entirely before B —
  * folding ANY ordered partition of a series through the identity must
  * equal the one-shot running-peak drawdown, bit-for-bit (every
  * candidate is a pick or a subtraction of observed doubles).
  *
  * HISTORY: this spec's first run went red against an earlier MV that
  * merged same-segment partials EAGERLY per micro-batch — under
  * out-of-order batch arrival a state summary can SPAN a
  * still-in-flight middle chunk, and "merging after the span" breaks
  * the ordered-concatenation premise (overcounts mx_A − mn_B). The fix
  * is structural: the fold only APPENDS summaries; all ordering happens
  * at read time, where lo (disjoint id ranges) is the concatenation
  * order. The third test pins exactly that arrival-order trap. */
class DrawdownFoldSpec extends SparkSpec {

  private case class Summ(mn: Double, mx: Double, dd: Double)

  private def summarize(xs: Seq[Double]): Summ = {
    var peak = Double.NegativeInfinity
    var dd = Double.NegativeInfinity
    xs.foreach { x =>
      peak = math.max(peak, x)
      dd = math.max(dd, peak - x)
    }
    Summ(xs.min, xs.max, dd)
  }

  private def merge(a: Summ, b: Summ): Summ =
    Summ(math.min(a.mn, b.mn), math.max(a.mx, b.mx),
      math.max(a.dd, math.max(b.dd, a.mx - b.mn)))

  private def series(seed: Int, n: Int): Seq[Double] =
    (0 until n).map(i => ((i.toLong * 48271 + seed) % 9973).abs / 7.0)

  private def splitAt(xs: Seq[Double], cuts: Seq[Int]): Seq[Seq[Double]] =
    (0 +: cuts.filter(c => c > 0 && c < xs.length).distinct.sorted :+ xs.length)
      .sliding(2).map { case Seq(a, b) => xs.slice(a, b) }
      .filter(_.nonEmpty).toSeq

  test("segment fold equals one-shot drawdown under any ordered split") {
    for (seed <- Seq(1, 7, 23); n <- Seq(1, 2, 17, 400)) {
      val xs = series(seed, n)
      val oneShot = summarize(xs)
      val cutSets = Seq(
        (1 until n),                         // singletons
        (0 until n by 3),                    // runs of 3
        Seq(1, 2, n / 2, n - 1),             // uneven
        Seq.empty[Int])                      // one chunk
      for (cuts <- cutSets) {
        val folded = splitAt(xs, cuts.toSeq).map(summarize).reduce(merge)
        assert(folded === oneShot, s"seed=$seed n=$n cuts=${cuts.take(5)}")
      }
    }
  }

  test("arrival-order trap: eager merge of non-adjacent chunks is wrong; " +
      "lo-ordered read-time fold is right") {
    val xs = series(5, 120)
    val oneShot = summarize(xs)
    val chunks = splitAt(xs, Seq(30, 60, 90)).map(summarize) // 4 contiguous
    // arrival order 0, 2, 1, 3: eagerly merging (0|2) spans chunk 1
    val eager = merge(merge(merge(chunks(0), chunks(2)), chunks(1)), chunks(3))
    // at least one seed/order must expose the trap, else the test is vacuous
    // (for this seed it does — pinned)
    assert(eager.dd !== oneShot.dd,
      "expected the eager non-adjacent merge to be wrong for this fixture")
    // read-time fold: sort by position (lo), then ordered reduce
    val readTime = chunks.reduce(merge) // already lo-ordered
    assert(readTime === oneShot)
  }

  // ---- compaction ---------------------------------------------------------

  /** st23's read, verbatim: lo-ordered SeqFold over the slice state. */
  private def readDrawdown(state: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Double, Double)] = {
    import org.apache.spark.sql.functions._
    val rows = graft.core.SeqFold.keyedRows(state, col("user_id"),
      col("lo"), col("hi"), Seq(col("mn"), col("mx"), col("dd"), col("cnt")))
    graft.core.SeqFold.foldRows(rows)(r => (r.vs(1), r.vs(2), r.vs(3)))(
        (acc, r) => (math.max(acc._1, r.vs(1)),
          math.max(acc._2, math.max(r.vs(2), acc._1 - r.vs(0))),
          acc._3 + r.vs(3)))(
        (_, _, st) => Some(Array(st._2, st._1, st._3)))
      .collect()
      .map(f => f.k -> ((f.out(2).toLong, f.out(0), f.out(1)))).toMap
  }

  test("compacted MV state reads bit-equal to uncompacted and is bounded by user count") {
    import org.apache.spark.sql.functions._
    val path = "/root/testdata/sf0.001/events.parquet"
    // same replay twice: aggressive compaction vs never — the READ must
    // be bit-identical (no tolerance: every merged dd candidate is a
    // pick or subtraction of the same observed doubles)
    val compacted = graft.streaming.EventStream
      .runDrawdownMvOnce(spark, path, nChunks = 4, compactEvery = 1)
    val raw = graft.streaming.EventStream
      .runDrawdownMvOnce(spark, path, nChunks = 4, compactEvery = Int.MaxValue)
    assert(readDrawdown(compacted) === readDrawdown(raw))
    // final compaction ran with full coverage → exactly one run per user
    val users = compacted.select(col("user_id")).distinct().count()
    assert(compacted.count() === users,
      "full-coverage compaction should leave one summary row per user")
    assert(raw.count() > compacted.count(),
      "fixture produced no batch-boundary splits — compaction test is vacuous")
  }

  test("compaction is exact under RANDOM batch orders (incremental fold + compact each step)") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    // synthetic series: 3 users interleaved over ids 0..299, values from
    // the spec's own generator; 5 chunks of 60 ids, folded in several
    // permutations with compaction after EVERY batch — the strongest
    // cadence, hitting every partial-coverage shape the order produces
    val rows = (0L until 300L).map(i =>
      (i, i % 3, ((i * 48271 + 11) % 9973).toDouble / 7.0))
    val oneShot: Map[Long, (Long, Double, Double)] = rows.groupBy(_._2).map {
      case (u, rs) =>
        val xs = rs.sortBy(_._1).map(_._3)
        val sm = summarize(xs)
        u -> ((xs.size.toLong, sm.dd, sm.mx))
    }
    val chunks = rows.grouped(60).toSeq // contiguous id ranges, like the source
    def summarizeChunk(c: Seq[(Long, Long, Double)]) = {
      val byUser = c.groupBy(_._2)
      byUser.toSeq.map { case (u, rs) =>
        val sorted = rs.sortBy(_._1)
        val sm = summarize(sorted.map(_._3))
        (u, sorted.head._1 / 1000L, sorted.head._1, sorted.last._1,
          sorted.size.toLong, sorted.map(_._3).min, sorted.map(_._3).max, sm.dd)
      }
    }
    val orders = Seq(
      Seq(0, 1, 2, 3, 4), Seq(4, 3, 2, 1, 0), Seq(0, 2, 4, 1, 3),
      Seq(2, 0, 4, 3, 1), Seq(3, 1, 4, 0, 2))
    for (order <- orders) {
      var state = Seq.empty[(Long, Long, Long, Long, Long, Double, Double, Double)]
        .toDF("user_id", "seg", "lo", "hi", "cnt", "mn", "mx", "dd")
      for (ci <- order) {
        val c = chunks(ci)
        val sentinel = Seq((-1L, -1L, c.map(_._1).min, c.map(_._1).max,
          0L, 0.0, 0.0, 0.0))
        state = graft.streaming.EventStream.compactDrawdownState(spark,
          state.unionByName((summarizeChunk(c) ++ sentinel)
            .toDF("user_id", "seg", "lo", "hi", "cnt", "mn", "mx", "dd")))
      }
      val got = readDrawdown(state.where(col("user_id") >= 0L))
      assert(got === oneShot, s"order $order diverged from the one-shot answer")
      // and with FULL coverage at the end, state is fully compacted
      assert(state.where(col("user_id") >= 0L).count() === 3L,
        s"order $order left uncompacted runs under full coverage")
    }
  }

  test("compaction never merges across an UNPROVEN gap, and merges once the hole fills") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    // user 7 has slices [0,99] and [200,299]; coverage sentinels say
    // chunks [0,99] and [200,299] were ingested — ids 100..199 may
    // still arrive (the DrawdownFoldSpec trap, now at the compactor)
    def row(u: Long, lo: Long, hi: Long, cnt: Long, mn: Double, mx: Double,
        dd: Double) = (u, lo / 1000L, lo, hi, cnt, mn, mx, dd)
    val withHole = Seq(
      row(7L, 0L, 99L, 10L, 1.0, 9.0, 2.0),
      row(7L, 200L, 299L, 10L, 0.5, 4.0, 1.0),
      row(-1L, 0L, 99L, 0L, 0.0, 0.0, 0.0),
      row(-1L, 200L, 299L, 0L, 0.0, 0.0, 0.0))
      .toDF("user_id", "seg", "lo", "hi", "cnt", "mn", "mx", "dd")
    val still = graft.streaming.EventStream
      .compactDrawdownState(spark, withHole)
    assert(still.where(col("user_id") === 7L).count() === 2L,
      "compactor merged across a gap no coverage proves complete")
    // the middle chunk arrives (no events for user 7 in it) → the gap
    // becomes provable and the two slices merge: dd = max(2, 1, 9-0.5)
    val filled = withHole.unionByName(
      Seq(row(-1L, 100L, 199L, 0L, 0.0, 0.0, 0.0))
        .toDF("user_id", "seg", "lo", "hi", "cnt", "mn", "mx", "dd"))
    val merged = graft.streaming.EventStream
      .compactDrawdownState(spark, filled)
    val u7 = merged.where(col("user_id") === 7L).collect()
    assert(u7.length === 1)
    val r = u7.head
    assert((r.getAs[Long]("lo"), r.getAs[Long]("hi"), r.getAs[Long]("cnt"),
      r.getAs[Double]("mn"), r.getAs[Double]("mx"), r.getAs[Double]("dd")) ===
      ((0L, 299L, 20L, 0.5, 9.0, 8.5)))
    // sentinels collapsed to the single covered range
    val sent = merged.where(col("user_id") === -1L)
      .select(col("lo"), col("hi")).collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(sent.toSeq === Seq((0L, 299L)))
  }

  test("fragmented coverage (>64 intervals) still re-merges sentinels — " +
      "state stays O(in-flight holes), not O(stream age)") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    // 66 permanently-separated coverage islands (always > the 64-interval
    // inlining cap, so EVERY cycle takes the row-merge skip path), each
    // fed by 2 abutting chunks → 132 micro-batches total. Before the
    // skip-path fix, each skipped cycle left its sentinel row unmerged:
    // 132 sentinel rows, growing one per batch forever until the
    // mergeIntervals 100k require killed the replay. After it, the
    // sentinels are collapsed to the merged coverage every cycle — 66
    // rows, the in-flight hole structure, regardless of batch count.
    val islands = 66
    var state = Seq.empty[(Long, Long, Long, Long, Long, Double, Double, Double)]
      .toDF("user_id", "seg", "lo", "hi", "cnt", "mn", "mx", "dd")
    for (r <- 0 until 2; j <- 0 until islands) {
      val lo = j * 1000L + r * 10L
      val hi = lo + 9L
      val batch = Seq(
        (7L, lo / 1000L, lo, hi, 10L, 1.0, 2.0, 0.5),
        (-1L, -1L, lo, hi, 0L, 0.0, 0.0, 0.0))
        .toDF("user_id", "seg", "lo", "hi", "cnt", "mn", "mx", "dd")
      state = graft.streaming.EventStream
        .compactDrawdownState(spark, state.unionByName(batch))
        .localCheckpoint(true) // the replay's per-generation parquet write
    }
    val sentinels = state.where(col("user_id") === -1L).count()
    assert(sentinels === islands.toLong,
      s"$sentinels sentinel rows after 132 fragmented batches — the skip " +
        "path no longer re-merges coverage (O(stream age) growth is back)")
    // and the skip path must not have TOUCHED the data rows: with the
    // row merge skipped every cycle, all 132 per-chunk summaries survive
    assert(state.where(col("user_id") >= 0L).count() === 2L * islands,
      "row merge ran despite fragmented coverage — the >64-interval cap is gone")
  }

  test("MV built at a NON-DEFAULT slice width reads bit-equal compacted vs uncompacted") {
    import org.apache.spark.sql.functions._
    // the fold keys summaries by seg = event_id div width and the
    // compactor REASSIGNS seg = lo div width after a merge — one shared
    // width definition (EventStream.SliceWidth, threaded through both);
    // this case pins that a non-default width keeps them in sync (a
    // drifted literal would mis-key compacted rows and corrupt the read)
    val path = "/root/testdata/sf0.001/events.parquet"
    val compacted = graft.streaming.EventStream
      .runDrawdownMvOnce(spark, path, nChunks = 4, compactEvery = 1, sliceWidth = 128L)
    val raw = graft.streaming.EventStream
      .runDrawdownMvOnce(spark, path, nChunks = 4, compactEvery = Int.MaxValue, sliceWidth = 128L)
    assert(readDrawdown(compacted) === readDrawdown(raw))
    assert(raw.count() > compacted.count(),
      "width-128 replay produced no batch-boundary splits — the case is vacuous")
    // the compacted rows' seg keying matches the non-default width
    val bad = compacted.where(col("seg") =!= expr("lo div 128")).count()
    assert(bad === 0L, "compacted rows keyed by a different slice width than the fold's")
  }

  test("compacted autocorr MV state reads to identical decimal moments") {
    import org.apache.spark.sql.functions._
    val path = "/root/testdata/sf0.001/events.parquet"
    def moments(state: org.apache.spark.sql.DataFrame)
        : Map[Long, (Long, String, String, String, String, String)] = {
      import org.apache.spark.sql.types.DecimalType
      val dec = DecimalType(37, 6)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("lo"))
      val rk = state.withColumn("rk", row_number().over(w))
      val bounds = rk.select(col("user_id"), col("rk"), col("lastv"))
        .join(rk.select(col("user_id"), (col("rk") - 1).as("rk"),
          col("firstv")), Seq("user_id", "rk"))
        .select(col("user_id"), lit(1L).as("np"),
          col("lastv").cast(dec).as("sx"), col("firstv").cast(dec).as("sy"),
          (col("lastv") * col("lastv")).cast(dec).as("sxx"),
          (col("firstv") * col("firstv")).cast(dec).as("syy"),
          (col("lastv") * col("firstv")).cast(dec).as("sxy"))
      state.select(col("user_id"), col("np"), col("sx").cast(dec).as("sx"),
          col("sy").cast(dec).as("sy"), col("sxx").cast(dec).as("sxx"),
          col("syy").cast(dec).as("syy"), col("sxy").cast(dec).as("sxy"))
        .unionByName(bounds)
        .groupBy(col("user_id"))
        .agg(sum(col("np")).as("np"), sum(col("sx")).as("sx"),
          sum(col("sy")).as("sy"), sum(col("sxx")).as("sxx"),
          sum(col("syy")).as("syy"), sum(col("sxy")).as("sxy"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1),
          r.getDecimal(2).toPlainString, r.getDecimal(3).toPlainString,
          r.getDecimal(4).toPlainString, r.getDecimal(5).toPlainString,
          r.getDecimal(6).toPlainString))).toMap
    }
    val compacted = graft.streaming.EventStream
      .runAutocorrMvOnce(spark, path, nChunks = 4, compactEvery = 1)
    val raw = graft.streaming.EventStream
      .runAutocorrMvOnce(spark, path, nChunks = 4, compactEvery = Int.MaxValue)
    assert(moments(compacted) === moments(raw))
    assert(raw.count() > compacted.count(),
      "fixture produced no batch-boundary splits — compaction test is vacuous")
  }

  test("st23's MV read on the real fixture equals the one-shot window") {
    import org.apache.spark.sql.functions._
    val ev = graft.core.Tables.readEvents(spark, "/root/testdata/sf0.001")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Long.MinValue, 0L)
    // reference rounds with the SAME Spark round(…,6) the query uses —
    // the comparison is exact, no tolerance
    val oneShot = ev
      .withColumn("peak", max(col("value")).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(max(col("peak") - col("value")), 6).as("dd"),
        round(max(col("peak")), 6).as("pk"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val got = SparkEntry.queries("st23_stream_drawdown_mv")(
        spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got === oneShot)
  }
}
