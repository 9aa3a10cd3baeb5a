package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function depth: analytic functions (rank family, lag/lead)
  * and the batch sessionization shape (lag + cumulative sum over a
  * per-user window) — the batch twin of streaming sessionize, fully
  * DuckDB-oracle-checked. */
object WindowQueries {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    s.read.parquet(s"$dir/$n.parquet")

  private def events(s: SparkSession, d: String): DataFrame =
    graft.core.Tables.readEvents(s, d)

  import Det._

  val all: Seq[Q] = Seq(

    // Backward as-of join (graft.core.Joins.asofJoin): each click joins
    // the user's latest purchase at-or-before it — ONE shuffle
    // (union + window), no nested-loop join. Oracle: DuckDB's native
    // ASOF JOIN on epoch micros (both engines compare at Spark's
    // microsecond precision; the raw fixture carries nanos).
    Q("t2_asof_join",
      (s, d) => {
        val ev = events(s, d)
        val clicks = ev.where(col("event_type") === "click")
          .select(col("user_id"), col("ts"))
        val purchases = ev.where(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))  // unique per (user, ts): tie-free as-of
          .agg(max(col("value")).as("purchase_value"))
          .withColumn("purchase_ts", col("ts"))
        graft.core.Joins.asofJoin(clicks, purchases, Seq("user_id"), "ts",
            Seq("purchase_value", "purchase_ts"))
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_clicks"),
            count(col("purchase_value")).as("n_matched"),
            sumExact(col("purchase_value")).as("sum_purchase"),
            sum(unix_micros(col("ts")) - unix_micros(col("purchase_ts"))).as("gap_us"))
          .orderBy(col("user_id"))
      },
      Some(s"""WITH p AS (
              |  SELECT user_id, epoch_us(ts) AS tsu, MAX(value) AS purchase_value
              |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
              |c AS (SELECT user_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'click')
              |SELECT c.user_id, COUNT(*) AS n_clicks,
              |  COUNT(p.purchase_value) AS n_matched,
              |  ${sumExactSql("p.purchase_value")} AS sum_purchase,
              |  CAST(SUM(c.tsu - p.tsu) AS BIGINT) AS gap_us
              |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.tsu >= p.tsu
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Tolerance-bounded as-of (the pandas merge_asof `tolerance` knob /
    // sensor-fusion staleness bound): t2's backward as-of, but a match
    // older than 24 h is DISCARDED (value nulled, click kept) — same
    // single-shuffle union+window plan, the gate is a pure projection.
    // Oracle: DuckDB ASOF LEFT JOIN with the gap CASE applied after.
    // At sf0.01 the bound keeps 731 of 1865 raw matches — discriminating.
    Q("t2b_asof_tolerance",
      (s, d) => {
        val ev = events(s, d)
        val clicks = ev.where(col("event_type") === "click")
          .select(col("user_id"), col("ts"))
        val purchases = ev.where(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("purchase_value"))
          .withColumn("purchase_ts", col("ts"))
        graft.core.Joins.asofJoin(clicks, purchases, Seq("user_id"), "ts",
            Seq("purchase_value", "purchase_ts"), toleranceMs = Some(86400000L))
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_clicks"),
            count(col("purchase_value")).as("n_matched"),
            sumExact(col("purchase_value")).as("sum_purchase"),
            sum(unix_micros(col("ts")) - unix_micros(col("purchase_ts"))).as("gap_us"))
          .orderBy(col("user_id"))
      },
      Some(s"""WITH p AS (
              |  SELECT user_id, epoch_us(ts) AS tsu, MAX(value) AS v
              |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
              |c AS (SELECT user_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'click'),
              |m AS (
              |  -- gate replicates Spark's unix_millis truncation exactly
              |  -- (each side floored to ms BEFORE subtracting)
              |  SELECT c.user_id, c.tsu,
              |    CASE WHEN (c.tsu // 1000) - (p.tsu // 1000) <= 86400000
              |      THEN p.v END AS purchase_value,
              |    CASE WHEN (c.tsu // 1000) - (p.tsu // 1000) <= 86400000
              |      THEN p.tsu END AS ptsu
              |  FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.tsu >= p.tsu)
              |SELECT user_id, COUNT(*) AS n_clicks,
              |  COUNT(purchase_value) AS n_matched,
              |  ${sumExactSql("purchase_value")} AS sum_purchase,
              |  CAST(SUM(tsu - ptsu) AS BIGINT) AS gap_us
              |FROM m GROUP BY 1 ORDER BY 1""".stripMargin)),

    // NEAREST as-of (Joins.asofJoinNearest — pandas merge_asof
    // direction='nearest' parity, closing the as-of family:
    // backward/forward/tolerance/nearest): each click takes the
    // purchase with the smallest |gap| within ±24 h, ties backward.
    // Two key-keyed window passes (one per direction), per-row pick;
    // the matched ts rides as a value column so the winning gap is
    // part of the checked output. Oracle: two chained DuckDB ASOF
    // joins + the identical ms-truncated gates and pick.
    Q("t3b_asof_nearest",
      (s, d) => {
        val ev = events(s, d)
        val clicks = ev.where(col("event_type") === "click")
          .select(col("user_id"), col("ts"))
        val purchases = ev.where(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("purchase_value"))
          .withColumn("purchase_ts", col("ts"))
        graft.core.Joins.asofJoinNearest(clicks, purchases, Seq("user_id"), "ts",
            Seq("purchase_value", "purchase_ts"), toleranceMs = Some(86400000L))
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_clicks"),
            count(col("purchase_value")).as("n_matched"),
            countIf(col("__asof_dir") === "b").as("n_backward"),
            countIf(col("__asof_dir") === "f").as("n_forward"),
            sumExact(col("purchase_value")).as("sum_purchase"),
            sum(abs(unix_millis(col("ts")) - unix_millis(col("purchase_ts"))))
              .as("gap_ms"))
          .orderBy(col("user_id"))
      },
      Some(s"""WITH p AS (
              |  SELECT user_id, epoch_us(ts) AS tsu, MAX(value) AS v
              |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
              |c AS (SELECT user_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'click'),
              |j AS (
              |  SELECT c.user_id, c.tsu,
              |    CASE WHEN (c.tsu // 1000) - (pb.tsu // 1000) <= 86400000
              |      THEN pb.tsu END AS tb,
              |    CASE WHEN (c.tsu // 1000) - (pb.tsu // 1000) <= 86400000
              |      THEN pb.v END AS vb,
              |    CASE WHEN (pf.tsu // 1000) - (c.tsu // 1000) <= 86400000
              |      THEN pf.tsu END AS tf,
              |    CASE WHEN (pf.tsu // 1000) - (c.tsu // 1000) <= 86400000
              |      THEN pf.v END AS vf
              |  FROM c
              |  ASOF LEFT JOIN p pb ON c.user_id = pb.user_id AND c.tsu >= pb.tsu
              |  ASOF LEFT JOIN p pf ON c.user_id = pf.user_id AND c.tsu <= pf.tsu),
              |pick AS (
              |  SELECT user_id, tsu,
              |    tb IS NOT NULL AND (tf IS NULL
              |      OR (tsu // 1000) - (tb // 1000) <= (tf // 1000) - (tsu // 1000)) AS use_b,
              |    tb, vb, tf, vf FROM j),
              |r AS (
              |  SELECT user_id, tsu,
              |    CASE WHEN use_b THEN vb ELSE vf END AS purchase_value,
              |    CASE WHEN use_b THEN tb ELSE tf END AS ptsu,
              |    CASE WHEN use_b THEN 'b' WHEN tf IS NOT NULL THEN 'f' END AS dir
              |  FROM pick)
              |SELECT user_id, COUNT(*) AS n_clicks,
              |  COUNT(purchase_value) AS n_matched,
              |  ${countIfSql("dir = 'b'")} AS n_backward,
              |  ${countIfSql("dir = 'f'")} AS n_forward,
              |  ${sumExactSql("purchase_value")} AS sum_purchase,
              |  CAST(SUM(ABS((tsu // 1000) - (ptsu // 1000))) AS BIGINT) AS gap_ms
              |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Time-bucket OHLC resample (the downsampling shape every
    // event-series store serves: per (type, hour) open/high/low/close):
    // open/close via min_by/max_by under the (us, event_id) TOTAL order
    // — deterministic even for same-instant events; ONE map-side-
    // combined aggregate onto (type × hour) keys, no window over raw
    // events anywhere.
    Q("w16_resample_ohlc",
      (s, d) => {
        events(s, d)
          .select(col("event_type"),
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH").as("hour"),
            unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
          .groupBy(col("event_type"), col("hour"))
          .agg(count(lit(1)).as("n"),
            expr("min_by(value, struct(us, event_id))").as("open"),
            max(col("value")).as("high"),
            min(col("value")).as("low"),
            expr("max_by(value, struct(us, event_id))").as("close"))
          .orderBy(col("event_type"), col("hour"))
      },
      Some("""WITH e AS (
             |  SELECT event_type,
             |    STRFTIME(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, value,
             |    ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
             |      ORDER BY ts, event_id) AS rn_a,
             |    ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
             |      ORDER BY ts DESC, event_id DESC) AS rn_d
             |  FROM events)
             |SELECT event_type, hour, COUNT(*) AS n,
             |  MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
             |  MAX(value) AS high, MIN(value) AS low,
             |  MAX(CASE WHEN rn_d = 1 THEN value END) AS close
             |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // FORWARD as-of: each click joins the user's NEXT purchase at-or-after
    // it (time-to-conversion shape). Same single-shuffle plan with the
    // scan order reversed; oracle flips the ASOF inequality.
    Q("t3_asof_forward",
      (s, d) => {
        val ev = events(s, d)
        val clicks = ev.where(col("event_type") === "click")
          .select(col("user_id"), col("ts"))
        val purchases = ev.where(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("purchase_value"))
          .withColumn("purchase_ts", col("ts"))
        graft.core.Joins.asofJoin(clicks, purchases, Seq("user_id"), "ts",
            Seq("purchase_value", "purchase_ts"), direction = "forward")
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_clicks"),
            count(col("purchase_value")).as("n_matched"),
            sumExact(col("purchase_value")).as("sum_purchase"),
            sum(unix_micros(col("purchase_ts")) - unix_micros(col("ts"))).as("wait_us"))
          .orderBy(col("user_id"))
      },
      Some(s"""WITH p AS (
              |  SELECT user_id, epoch_us(ts) AS tsu, MAX(value) AS purchase_value
              |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
              |c AS (SELECT user_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'click')
              |SELECT c.user_id, COUNT(*) AS n_clicks,
              |  COUNT(p.purchase_value) AS n_matched,
              |  ${sumExactSql("p.purchase_value")} AS sum_purchase,
              |  CAST(SUM(p.tsu - c.tsu) AS BIGINT) AS wait_us
              |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.tsu <= p.tsu
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Event-time rolling aggregate: trailing-1-hour count/sum per user
    // via a RANGE window over epoch micros (value-based frame — tie-safe
    // across engines, unlike ROWS), reduced to each user's peak burst.
    // The decimal cast inside the windowed SUM keeps the rolling sum
    // exact, so MAX over it is cross-engine deterministic.
    Q("w9_rolling_window",
      (s, d) => {
        import org.apache.spark.sql.types.{DecimalType, DoubleType}
        val w = Window.partitionBy(col("user_id")).orderBy(col("tsu"))
          .rangeBetween(-3600L * 1000000L, Window.currentRow)
        events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("tsu"), col("value"))
          .select(col("user_id"),
            count(lit(1)).over(w).as("c"),
            sum(col("value").cast(DecimalType(27, 6))).over(w).as("sv"))
          .groupBy(col("user_id"))
          .agg(max(col("c")).as("peak_events_1h"),
            max(col("sv")).cast(DoubleType).as("peak_value_1h"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, value FROM events),
             |r AS (SELECT user_id,
             |    COUNT(*) OVER w AS c,
             |    SUM(CAST(value AS DECIMAL(27,6))) OVER w AS sv
             |  FROM e
             |  WINDOW w AS (PARTITION BY user_id ORDER BY tsu
             |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW))
             |SELECT user_id, CAST(MAX(c) AS BIGINT) AS peak_events_1h,
             |  CAST(MAX(sv) AS DOUBLE) AS peak_value_1h
             |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Exponentially weighted moving average per user over daily value
    // sums — expressed CLOSED-FORM with two running sums instead of a
    // recursive scan (which Spark has no operator for):
    //   ewma_i = Σ_j≤i x_j·w^(i-j) / Σ_j≤i w^(i-j)
    //          = cumsum(x_j·w^(-j)) / cumsum(w^(-j))   (w^i cancels)
    // One shuffle (user partition) and an ordered running frame — the
    // same plan shape at any scale. The w^(-j) terms grow as the series
    // lengthens (j ≤ 29 on this fixture: 0.8^-29 ≈ 6.4e2); unbounded
    // series need segment-wise renormalization, noted here for the
    // 100-TB reader. Cross-engine note: both engines sum the identical
    // term sequence, but DuckDB evaluates windowed SUM with a segment
    // tree (pairwise combine), not strictly sequentially — so the fp
    // error patterns can differ. With the inputs decimal-exact and the
    // ~650× weight spread of this fixture, the residual error sits far
    // below the round(...,6) grid; an adversarial series could in
    // principle straddle a rounding boundary (h2-style caveat).
    Q("w12_ewma",
      (s, d) => {
        val wgt = 0.8 // = 1 - alpha, alpha = 0.2, pandas ewm adjust=True
        val daily = events(s, d)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(sumExact(col("value")).as("x"))
        val byDay = Window.partitionBy(col("user_id")).orderBy(col("day"))
        val cum = Window.partitionBy(col("user_id")).orderBy(col("i"))
        val scored = daily
          .withColumn("i", row_number().over(byDay) - 1)
          .withColumn("nume", sum(col("x") * pow(lit(wgt), -col("i"))).over(cum))
          .withColumn("deno", sum(pow(lit(wgt), -col("i"))).over(cum))
          .select(col("user_id"), col("i"),
            round(col("nume") / col("deno"), 6).as("ewma"))
        scored.groupBy(col("user_id"))
          .agg((max(col("i")) + 1).cast("long").as("n_days"),
            expr("max_by(ewma, i)").as("ewma_last"))
          .orderBy(col("user_id"))
      },
      Some(s"""WITH daily AS (
              |  SELECT user_id, CAST(ts AS DATE) AS day,
              |    ${sumExactSql("value")} AS x
              |  FROM events GROUP BY 1, 2),
              |r AS (SELECT user_id, x,
              |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) - 1 AS i
              |  FROM daily),
              |c AS (SELECT user_id, i,
              |    SUM(x * POWER(0.8, -i)) OVER (PARTITION BY user_id ORDER BY i) AS nume,
              |    SUM(POWER(0.8, -i)) OVER (PARTITION BY user_id ORDER BY i) AS deno
              |  FROM r),
              |lastrow AS (SELECT user_id, MAX(i) AS imax FROM c GROUP BY 1)
              |SELECT c.user_id, CAST(l.imax + 1 AS BIGINT) AS n_days,
              |  ROUND(nume / deno, 6) AS ewma_last
              |FROM c JOIN lastrow l ON c.user_id = l.user_id AND c.i = l.imax
              |ORDER BY c.user_id""".stripMargin)),

    // Time-series calendar gap-fill + forward-fill: per user, the daily
    // value series is completed over the user's [first, last] day span
    // (`sequence` explode — the calendar spine) and missing days carry
    // the last observed value forward via the gaps-and-islands trick
    // (grp = running count of non-nulls; ffill = MAX over (user, grp) —
    // each island holds exactly one non-null). Engine-portable: no
    // IGNORE NULLS dependence. Two event scans (daily feeds the span and
    // the re-join — at scale you persist `daily`); windows ride ONE
    // user-keyed shuffle.
    Q("t5_gapfill",
      (s, d) => {
        val daily = events(s, d)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(sumExact(col("value")).as("x"))
        val span = daily.groupBy(col("user_id"))
          .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        val cal = span.select(col("user_id"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
        val byDay = Window.partitionBy(col("user_id")).orderBy(col("day"))
        cal.join(daily, Seq("user_id", "day"), "left")
          .withColumn("grp", count(col("x")).over(byDay))
          .withColumn("ffill",
            max(col("x")).over(Window.partitionBy(col("user_id"), col("grp"))))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_days"),
            countIf(col("x").isNull).as("n_gap_days"),
            sumExact(col("ffill")).as("sum_filled"))
          .orderBy(col("user_id"))
      },
      Some(s"""WITH daily AS (
              |  SELECT user_id, CAST(ts AS DATE) AS day, ${sumExactSql("value")} AS x
              |  FROM events GROUP BY 1, 2),
              |span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1),
              |cal AS (SELECT user_id,
              |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
              |  FROM span),
              |f AS (SELECT c.user_id, c.day, daily.x
              |  FROM cal c LEFT JOIN daily ON c.user_id = daily.user_id AND c.day = daily.day),
              |g AS (SELECT *, COUNT(x) OVER (PARTITION BY user_id ORDER BY day) AS grp FROM f),
              |h AS (SELECT *, MAX(x) OVER (PARTITION BY user_id, grp) AS ffill FROM g)
              |SELECT user_id, COUNT(*) AS n_days,
              |  ${countIfSql("x IS NULL")} AS n_gap_days,
              |  ${sumExactSql("ffill")} AS sum_filled
              |FROM h GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Ordered funnel conversion (view → click ≥ t_view → purchase ≥
    // t_click): the step times chain as three window MINs over the SAME
    // user partition — one shuffle, no self-joins (the naive per-step
    // join-back formulation scans events once per step). The per-user
    // collapse reuses the window's hash partitioning (no second
    // exchange). Output: one summary row with step counts, conversion
    // rates, and total view→purchase latency.
    Q("t6_funnel",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
        events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"))
          .withColumn("t1",
            min(when(col("event_type") === "view", col("ts"))).over(w))
          .withColumn("t2",
            min(when(col("event_type") === "click" && col("ts") >= col("t1"), col("ts"))).over(w))
          .withColumn("t3",
            min(when(col("event_type") === "purchase" && col("ts") >= col("t2"), col("ts"))).over(w))
          .groupBy(col("user_id"))
          .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"), max(col("t3")).as("t3"))
          .agg(
            count(lit(1)).as("n_users"),
            count(col("t1")).as("n_view"),
            count(col("t2")).as("n_view_click"),
            count(col("t3")).as("n_full_funnel"),
            round(count(col("t2")) * lit(1.0) / count(col("t1")), 6).as("conv_view_click"),
            round(count(col("t3")) * lit(1.0) / count(col("t2")), 6).as("conv_click_purchase"),
            sum(when(col("t3").isNotNull,
              unix_micros(col("t3")) - unix_micros(col("t1")))).as("funnel_us"))
      },
      Some("""WITH w1 AS (SELECT user_id, event_type, ts,
             |    MIN(CASE WHEN event_type = 'view' THEN ts END)
             |      OVER (PARTITION BY user_id) AS t1 FROM events),
             |w2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND ts >= t1 THEN ts END)
             |    OVER (PARTITION BY user_id) AS t2 FROM w1),
             |w3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts >= t2 THEN ts END)
             |    OVER (PARTITION BY user_id) AS t3 FROM w2),
             |per AS (SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
             |  FROM w3 GROUP BY 1)
             |SELECT COUNT(*) AS n_users, COUNT(t1) AS n_view,
             |  COUNT(t2) AS n_view_click, COUNT(t3) AS n_full_funnel,
             |  ROUND(COUNT(t2) * 1.0 / COUNT(t1), 6) AS conv_view_click,
             |  ROUND(COUNT(t3) * 1.0 / COUNT(t2), 6) AS conv_click_purchase,
             |  CAST(SUM(CASE WHEN t3 IS NOT NULL
             |    THEN date_diff('microsecond', t1, t3) END) AS BIGINT) AS funnel_us
             |FROM per""".stripMargin)),

    // Time-series downsampling to OHLC bars (the resample shape market /
    // metrics pipelines run): one groupBy(hour) with open/close as
    // min_by/max_by over the event-time order key — single shuffle keyed
    // on the bar, no window. Order key = epoch micros; `ts` is verified
    // unique at every fixture SF (so min_by/arg_min tie-breaks can never
    // diverge across engines).
    Q("t7_ohlc_bars",
      (s, d) => events(s, d)
        .select(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH").as("hour"),
          unix_micros(col("ts")).as("tsu"), col("value"))
        .groupBy(col("hour"))
        .agg(
          count(lit(1)).as("n"),
          round(expr("min_by(value, tsu)"), 6).as("open"),
          round(expr("max_by(value, tsu)"), 6).as("close"),
          round(max(col("value")), 6).as("high"),
          round(min(col("value")), 6).as("low"),
          sumExact(col("value")).as("volume"))
        .orderBy(col("hour")),
      Some(s"""SELECT STRFTIME(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
              |  COUNT(*) AS n,
              |  ROUND(arg_min(value, epoch_us(ts)), 6) AS open,
              |  ROUND(arg_max(value, epoch_us(ts)), 6) AS close,
              |  ROUND(MAX(value), 6) AS high, ROUND(MIN(value), 6) AS low,
              |  ${sumExactSql("value")} AS volume
              |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // SCD2 validity-interval build (the warehouse change-log → slowly-
    // changing-dimension shape): each (user, ts) state change is valid
    // from its own ts until the user's NEXT change (lead over ONE
    // user-keyed window shuffle); the latest change per user stays open
    // (valid_to null). Durations in micros — both engines already agree
    // at that precision (t2's convention). The (user, ts) pre-aggregate
    // makes the state log key-unique (MERGE's multiple-matches contract)
    // and is a no-op on this fixture (ts verified unique), so the lead
    // chain is deterministic.
    Q("t9_scd2_intervals",
      (s, d) => {
        val st = events(s, d)
          .groupBy(col("user_id"), unix_micros(col("ts")).as("tsu"))
          .agg(max(col("event_type")).as("state"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("tsu"))
        st.withColumn("nxt", lead(col("tsu"), 1).over(w))
          .groupBy(col("state"))
          .agg(
            count(lit(1)).as("n_versions"),
            countIf(col("nxt").isNull).as("n_open"),
            sumLong(col("nxt") - col("tsu")).as("dur_us_total"))
          .orderBy(col("state"))
      },
      Some(s"""WITH st AS (
              |  SELECT user_id, epoch_us(ts) AS tsu, MAX(event_type) AS state
              |  FROM events GROUP BY 1, 2),
              |iv AS (SELECT state, tsu,
              |    LEAD(tsu) OVER (PARTITION BY user_id ORDER BY tsu) AS nxt
              |  FROM st)
              |SELECT state, COUNT(*) AS n_versions,
              |  ${countIfSql("nxt IS NULL")} AS n_open,
              |  ${sumLongSql("nxt - tsu")} AS dur_us_total
              |FROM iv GROUP BY 1 ORDER BY 1""".stripMargin)),

    // First-touch / last-touch click attribution: every purchase is
    // attributed to the user's earliest and latest click AT OR BEFORE it
    // — two conditional window extremes over a ts-ordered RANGE frame
    // (value-based, so same-instant click+purchase rows are included
    // deterministically regardless of sort tie order). ONE user-keyed
    // shuffle serves both touches; the naive formulation is two as-of
    // joins (two more shuffles + a second events scan each).
    Q("t10_attribution",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("tsu"))
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, d)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("tsu"), col("value"))
          .withColumn("first_click",
            min(when(col("event_type") === "click", col("tsu"))).over(w))
          .withColumn("last_click",
            max(when(col("event_type") === "click", col("tsu"))).over(w))
          .where(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_purchases"),
            countIf(col("first_click").isNotNull).as("n_attributed"),
            sumLong(col("tsu") - col("first_click")).as("first_gap_us"),
            sumLong(col("tsu") - col("last_click")).as("last_gap_us"),
            sumExact(when(col("last_click").isNotNull, col("value")))
              .as("attributed_value"))
          .orderBy(col("user_id"))
      },
      Some(s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tsu, value
              |  FROM events),
              |t AS (SELECT user_id, event_type, tsu, value,
              |    MIN(CASE WHEN event_type = 'click' THEN tsu END) OVER w AS first_click,
              |    MAX(CASE WHEN event_type = 'click' THEN tsu END) OVER w AS last_click
              |  FROM e
              |  WINDOW w AS (PARTITION BY user_id ORDER BY tsu
              |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              |SELECT user_id, COUNT(*) AS n_purchases,
              |  ${countIfSql("first_click IS NOT NULL")} AS n_attributed,
              |  ${sumLongSql("tsu - first_click")} AS first_gap_us,
              |  ${sumLongSql("tsu - last_click")} AS last_gap_us,
              |  ${sumExactSql("CASE WHEN last_click IS NOT NULL THEN value END")} AS attributed_value
              |FROM t WHERE event_type = 'purchase'
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // CUSUM level-shift detection (the changepoint complement of t8's
    // pointwise z-scores: a run of small same-sign deviations that never
    // trips 3σ accumulates in the cumulative sum): per user,
    // S_i = Σ_{j≤i}(x_j − μ) over the daily series, drift statistic
    // max|S|/(σ√n) — the Kolmogorov-style normalization whose ~1.36
    // critical value flags a level shift. μ/σ come from exact decimal
    // sums (bit-identical doubles both engines); each CUSUM term
    // (x−μ) is quantized to DECIMAL(27,6) so the running sum is exact
    // and association-order-independent (t8's stance — no dependence on
    // either engine's windowed-double fold order), so S_i — not just
    // the verdict — hash-matches. One user-keyed shuffle serves the
    // daily agg, the moments, and the window.
    Q("t11_cusum_drift",
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val daily = events(s, d)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(sumExact(col("value")).as("x"))
        val st = daily.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_days"),
            avgExact(col("x")).as("mu"),
            stdExact(col("x")).as("sd"))
        val wc = Window.partitionBy(col("user_id")).orderBy(col("day"))
        daily.join(st, Seq("user_id"))
          .withColumn("cusum",
            sum((col("x") - col("mu")).cast(DecimalType(27, 6))).over(wc)
              .cast("double"))
          .groupBy(col("user_id"))
          .agg(max(col("n_days")).as("n_days"),
            round(
              max(abs(col("cusum"))) /
                (max(col("sd")) * sqrt(max(col("n_days")).cast("double"))),
              6).as("drift_stat"))
          .withColumn("drifted", col("drift_stat") > 1.36)
          .orderBy(col("user_id"))
      },
      Some(s"""WITH daily AS (
              |  SELECT user_id, CAST(ts AS DATE) AS day, ${sumExactSql("value")} AS x
              |  FROM events GROUP BY 1, 2),
              |st AS (
              |  SELECT user_id, COUNT(*) AS n_days, ${avgExactSql("x")} AS mu,
              |    ${stdExactSql("x")} AS sd
              |  FROM daily GROUP BY 1),
              |c AS (
              |  SELECT daily.user_id, st.n_days, st.sd,
              |    CAST(SUM(CAST(daily.x - st.mu AS DECIMAL(27,6)))
              |      OVER (PARTITION BY daily.user_id ORDER BY daily.day) AS DOUBLE) AS cusum
              |  FROM daily JOIN st ON daily.user_id = st.user_id)
              |SELECT user_id, MAX(n_days) AS n_days,
              |  ROUND(MAX(ABS(cusum)) / (MAX(sd) * SQRT(CAST(MAX(n_days) AS DOUBLE))), 6)
              |    AS drift_stat,
              |  ROUND(MAX(ABS(cusum)) / (MAX(sd) * SQRT(CAST(MAX(n_days) AS DOUBLE))), 6)
              |    > 1.36 AS drifted
              |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Markov transition matrix over per-user event sequences (behavior-
    // model / session-sequence training-data statistic): one lag window
    // under the (ts, event_id) TOTAL order (event_id unique ⇒ the
    // sequence — hence the bigram multiset — is deterministic even for
    // same-instant events), then the (prev → next) contingency with
    // row-normalized transition probabilities. ONE user-keyed shuffle
    // serves the lag; the (T×T)-key aggregate is map-side combined and
    // tiny, as is the per-prev normalization window — nothing here
    // grows with corpus size except the embarrassingly-parallel lag.
    Q("t12_event_transitions",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .where(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type"))
          .agg(count(lit(1)).as("n_transitions"))
          .withColumn("p_transition",
            round(col("n_transitions").cast("double") /
              sum(col("n_transitions")).over(Window.partitionBy(col("prev_type")))
                .cast("double"), 6))
          .orderBy(col("prev_type"), col("event_type"))
      },
      Some("""WITH seq AS (
             |  SELECT event_type,
             |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |      AS prev_type
             |  FROM events)
             |SELECT prev_type, event_type, COUNT(*) AS n_transitions,
             |  ROUND(CAST(COUNT(*) AS DOUBLE) /
             |    CAST(SUM(COUNT(*)) OVER (PARTITION BY prev_type) AS DOUBLE), 6)
             |    AS p_transition
             |FROM seq WHERE prev_type IS NOT NULL
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Lag-k autocorrelation of daily event volume (k = 1..7): the
    // pipeline-health time-series fingerprint — a strong weekly ACF
    // peak means volume seasonality the sampler must stratify over;
    // near-zero ACF on a series that should be seasonal flags broken
    // ingestion. Classic sample ACF: r_k = Σ(x_t−x̄)(x_{t−k}−x̄) /
    // Σ(x_t−x̄)², mean over the FULL series. Scale shape: the daily
    // aggregate is map-side combined (one shuffle onto ~days keys);
    // all seven lags ride ONE window pass over the tiny daily frame
    // (days, not events) before an unpivot + 7-key aggregate. Each
    // product term is rounded then decimal-summed (x15 stance) so
    // cross-engine sums are order-independent; x̄ and the final ratio
    // are single deterministic divisions.
    Q("t13_daily_acf",
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val daily = events(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("x"))
        // ONE scan: mean, denominator, and all seven lags ride windows
        // over the DAYS-sized aggregate (never the event rows) — the
        // SinglePartition exchanges below hold the tiny daily series,
        // which is the only frame a global-order ACF can be defined on.
        val wAll = Window.partitionBy()
        val wOrd = Window.orderBy(col("day"))
        val lagCols = (1 to 7).map(k => lag(col("x"), k).over(wOrd).as(s"l$k"))
        val base = daily
          .withColumn("mean",
            sum(col("x")).over(wAll).cast("double") / count(lit(1)).over(wAll))
          .withColumn("den",
            sum(round((col("x") - col("mean")) * (col("x") - col("mean")), 6)
              .cast(DecimalType(27, 6))).over(wAll))
        val stacked = base
          .select(col("x") +: col("mean") +: col("den") +: lagCols: _*)
          .select(col("x"), col("mean"), col("den"),
            expr("stack(7, 1, l1, 2, l2, 3, l3, 4, l4, 5, l5, 6, l6, 7, l7) AS (lg, xl)"))
          .where(col("xl").isNotNull)
        stacked
          .groupBy(col("lg").as("lag"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(round((col("x") - col("mean")) * (col("xl") - col("mean")), 6)
              .cast(DecimalType(27, 6))).cast("double").as("num"),
            max(col("den")).cast("double").as("den"))
          .select(col("lag"), col("n_pairs"),
            round(col("num") / col("den"), 6).as("acf"))
          .orderBy(col("lag"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS x FROM events GROUP BY 1),
             |m AS (SELECT CAST(SUM(x) AS DOUBLE) / COUNT(*) AS mean FROM daily),
             |lagged AS (
             |  SELECT x, LAG(x, 1) OVER (ORDER BY day) AS l1,
             |    LAG(x, 2) OVER (ORDER BY day) AS l2,
             |    LAG(x, 3) OVER (ORDER BY day) AS l3,
             |    LAG(x, 4) OVER (ORDER BY day) AS l4,
             |    LAG(x, 5) OVER (ORDER BY day) AS l5,
             |    LAG(x, 6) OVER (ORDER BY day) AS l6,
             |    LAG(x, 7) OVER (ORDER BY day) AS l7
             |  FROM daily),
             |st AS (
             |  SELECT lg, xl, x FROM lagged,
             |  LATERAL (VALUES (1, l1), (2, l2), (3, l3), (4, l4),
             |                  (5, l5), (6, l6), (7, l7)) AS u(lg, xl)
             |  WHERE xl IS NOT NULL),
             |den AS (
             |  SELECT CAST(SUM(CAST(ROUND((x - mean) * (x - mean), 6)
             |    AS DECIMAL(27,6))) AS DOUBLE) AS den FROM daily, m),
             |num AS (
             |  SELECT lg AS lag, COUNT(*) AS n_pairs,
             |    CAST(SUM(CAST(ROUND((x - mean) * (xl - mean), 6)
             |      AS DECIMAL(27,6))) AS DOUBLE) AS num
             |  FROM st, m GROUP BY 1)
             |SELECT lag, n_pairs, ROUND(num / den, 6) AS acf
             |FROM num, den ORDER BY lag""".stripMargin)),

    // Day-of-week seasonal profile of event volume + seasonality-
    // adjusted anomaly count: per-weekday mean/std of daily counts
    // (population std from EXACT integer sums — bit-identical across
    // engines), and how many days sit beyond 2σ of their own weekday's
    // baseline. The seasonal twin of t11's CUSUM: a Tuesday dip is only
    // an anomaly vs Tuesdays. Scale shape: one map-side-combined daily
    // aggregate; everything after runs windows/aggregates over the
    // DAYS-sized frame, dow-partitioned.
    Q("t14_seasonal_profile",
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val daily = events(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("x"))
          .withColumn("dow", expr("weekday(day)").cast("int"))
        val w = Window.partitionBy(col("dow"))
        val sx = sum(col("x")).over(w).cast("double")
        val sxx = sum((col("x").cast(DecimalType(19, 0)) *
          col("x").cast(DecimalType(19, 0)))).over(w).cast("double")
        val n = count(lit(1)).over(w).cast("double")
        val mean = sx / n
        val std = sqrt(sxx / n - mean * mean)
        daily
          .withColumn("mean", mean).withColumn("std", std)
          .groupBy(col("dow"))
          .agg(count(lit(1)).as("n_days"),
            round(max(col("mean")), 6).as("mean_x"),
            round(max(col("std")), 6).as("std_x"),
            countIf(abs(col("x") - col("mean")) > lit(2.0) * col("std"))
              .as("n_anomalous"))
          .orderBy(col("dow"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS x FROM events GROUP BY 1),
             |dw AS (SELECT CAST(isodow(day) - 1 AS INT) AS dow, x FROM daily),
             |st AS (SELECT dow, x,
             |    CAST(SUM(x) OVER (PARTITION BY dow) AS DOUBLE) AS sx,
             |    CAST(SUM(x * x) OVER (PARTITION BY dow) AS DOUBLE) AS sxx,
             |    CAST(COUNT(*) OVER (PARTITION BY dow) AS DOUBLE) AS n
             |  FROM dw),
             |sc AS (SELECT dow, x, sx / n AS mean,
             |    SQRT(sxx / n - (sx / n) * (sx / n)) AS std
             |  FROM st)
             |SELECT dow, COUNT(*) AS n_days,
             |  ROUND(MAX(mean), 6) AS mean_x, ROUND(MAX(std), 6) AS std_x,
             |  CAST(SUM(CASE WHEN ABS(x - mean) > 2.0 * std THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_anomalous
             |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Per-user inter-event burstiness (bot / scripted-traffic signal in
    // behavioral training data): gaps in EXACT integer micros under the
    // (ts, event_id) total order, per-user mean/std from exact sums,
    // Goh-Barabási burstiness B = (σ−μ)/(σ+μ) ∈ [−1, 1] (−1 periodic
    // ≈ bot, 0 Poisson, →1 bursty ≈ human). Corpus-level report: one
    // B-decile histogram row set (users, not events). One user-keyed
    // shuffle serves the lag; the per-user aggregate is map-side
    // combined; the decile bucketing is a static-band groupBy.
    Q("t15_burstiness",
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        val gaps = events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
          .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
          .where(col("gap").isNotNull)
        val perUser = gaps.groupBy(col("user_id"))
          .agg(count(lit(1)).cast("double").as("n"),
            sum(col("gap")).cast("double").as("sx"),
            sum(col("gap").cast(DecimalType(19, 0)) *
              col("gap").cast(DecimalType(19, 0))).cast("double").as("sxx"))
          .where(col("n") >= 2)
          .select(col("user_id"),
            (col("sx") / col("n")).as("mean"),
            sqrt(col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n")))
              .as("std"))
          .select(col("user_id"),
            when(col("std") + col("mean") > 0.0,
              (col("std") - col("mean")) / (col("std") + col("mean")))
              .otherwise(lit(0.0)).as("b"))
        perUser
          .groupBy(least(floor((col("b") + 1.0) * 5.0), lit(9.0)).cast("int").as("b_decile"))
          .agg(count(lit(1)).as("n_users"),
            round(avgExact(col("b")), 6).as("mean_b"))
          .orderBy(col("b_decile"))
      },
      Some(s"""WITH g AS (
             |  SELECT user_id,
             |    epoch_us(ts) - LAG(epoch_us(ts)) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS gap
             |  FROM events),
             |pu AS (
             |  SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS n,
             |    CAST(SUM(gap) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(gap AS DECIMAL(19,0)) * CAST(gap AS DECIMAL(19,0))) AS DOUBLE) AS sxx
             |  FROM g WHERE gap IS NOT NULL GROUP BY 1),
             |ms AS (
             |  SELECT user_id, sx / n AS mean,
             |    SQRT(sxx / n - (sx / n) * (sx / n)) AS std
             |  FROM pu WHERE n >= 2),
             |bb AS (
             |  SELECT user_id, CASE WHEN std + mean > 0.0
             |    THEN (std - mean) / (std + mean) ELSE 0.0 END AS b
             |  FROM ms)
             |SELECT CAST(LEAST(FLOOR((b + 1.0) * 5.0), 9.0) AS INT) AS b_decile,
             |  COUNT(*) AS n_users, ROUND(${avgExactSql("b")}, 6) AS mean_b
             |FROM bb GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Strict-order conversion funnel view → click → purchase, capped
    // at 7 days from the first view (the classic product/behavior
    // funnel; for training data it is the label-generation shape for
    // next-action models). Each stage's earliest QUALIFYING instant is
    // a per-user conditional MIN after a user-keyed join against the
    // previous stage — three key-keyed joins, no window over raw
    // events, stage counts fold to a 3-row report with conversion
    // ppm vs the funnel head.
    Q("t17_funnel",
      (s, d) => {
        val cap = 7L * 86400L * 1000000L
        val ev = events(s, d)
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
        val v = ev.where(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("us")).as("t_v"))
        val c = ev.where(col("event_type") === "click")
          .join(v, Seq("user_id"))
          .where(col("us") >= col("t_v") && col("us") <= col("t_v") + cap)
          .groupBy(col("user_id"), col("t_v")).agg(min(col("us")).as("t_c"))
        val p = ev.where(col("event_type") === "purchase")
          .join(c, Seq("user_id"))
          .where(col("us") >= col("t_c") && col("us") <= col("t_v") + cap)
          .groupBy(col("user_id")).agg(min(col("us")).as("t_p"))
        val stages = v.agg(count(lit(1)).as("n_users"))
          .select(lit(1).as("stage_idx"), lit("view").as("stage"), col("n_users"))
          .unionByName(c.agg(count(lit(1)).as("n_users"))
            .select(lit(2).as("stage_idx"), lit("click_after_view").as("stage"),
              col("n_users")))
          .unionByName(p.agg(count(lit(1)).as("n_users"))
            .select(lit(3).as("stage_idx"), lit("purchase_after_click").as("stage"),
              col("n_users")))
        // head count rides a 3-row window — conversion as exact ppm
        val wAll = Window.partitionBy()
        stages
          .withColumn("head_n", max(when(col("stage_idx") === 1, col("n_users"))).over(wAll))
          .select(col("stage_idx"), col("stage"), col("n_users"),
            expr("(n_users * 1000000) div head_n").as("conv_ppm"))
          .orderBy(col("stage_idx"))
      },
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
             |v AS (SELECT user_id, MIN(us) AS t_v FROM ev
             |  WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT ev.user_id, v.t_v, MIN(ev.us) AS t_c
             |  FROM ev JOIN v ON v.user_id = ev.user_id
             |  WHERE ev.event_type = 'click' AND ev.us >= v.t_v
             |    AND ev.us <= v.t_v + 604800000000 GROUP BY 1, 2),
             |p AS (SELECT ev.user_id, MIN(ev.us) AS t_p
             |  FROM ev JOIN c ON c.user_id = ev.user_id
             |  WHERE ev.event_type = 'purchase' AND ev.us >= c.t_c
             |    AND ev.us <= c.t_v + 604800000000 GROUP BY 1),
             |st AS (
             |  SELECT 1 AS stage_idx, 'view' AS stage, COUNT(*) AS n_users FROM v
             |  UNION ALL SELECT 2, 'click_after_view', COUNT(*) FROM c
             |  UNION ALL SELECT 3, 'purchase_after_click', COUNT(*) FROM p),
             |h AS (SELECT stage_idx, stage, n_users,
             |    MAX(CASE WHEN stage_idx = 1 THEN n_users END) OVER () AS head_n
             |  FROM st)
             |SELECT stage_idx, stage, n_users, (n_users * 1000000) // head_n AS conv_ppm
             |FROM h ORDER BY stage_idx""".stripMargin)),

    // Rolling z-score anomaly gate (Validation.rollingAnomalies): each
    // event scored against its user's TRAILING 24 hours (value-based RANGE
    // frame, exclusive of the current instant — tie-safe), flagged when
    // |x − μ| > 3σ with ≥ 5 prior points. The windowed moments
    // accumulate in DECIMAL (exact, order-independent); μ/σ/z evaluate
    // as one fixed double expression over those exact inputs, identical
    // on both engines. One user-keyed shuffle — the w9 plan shape.
    Q("t8_rolling_anomaly",
      (s, d) => {
        val ev = events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("tsu"), col("value"))
        graft.core.Validation.rollingAnomalies(ev, "user_id", "tsu", "value",
            windowMicros = 86400L * 1000000L, minPoints = 5, k = 3.0)
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_events"),
            countIf(col("n_prior") >= 5).as("n_scored"),
            countIf(col("is_anomaly")).as("n_anomalies"),
            round(max(abs(col("z"))), 6).as("max_abs_z"))
          .orderBy(col("user_id"))
      },
      Some(s"""WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, value FROM events),
              |r AS (SELECT user_id, value,
              |    COUNT(value) OVER w AS c,
              |    SUM(CAST(value AS DECIMAL(18,6))) OVER w AS sv,
              |    SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))
              |      AS DECIMAL(38,12))) OVER w AS svv
              |  FROM e
              |  WINDOW w AS (PARTITION BY user_id ORDER BY tsu
              |    RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING)),
              |z AS (SELECT user_id, c,
              |    CASE WHEN c >= 5 THEN ROUND(
              |      (value - CAST(sv AS DOUBLE) / CAST(c AS DOUBLE)) /
              |      SQRT(GREATEST((CAST(svv AS DOUBLE) -
              |          CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / CAST(c AS DOUBLE))
              |        / (CAST(c AS DOUBLE) - 1), 0) + 1e-9), 6)
              |    END AS z FROM r)
              |SELECT user_id, COUNT(*) AS n_events,
              |  ${countIfSql("c >= 5")} AS n_scored,
              |  ${countIfSql("ABS(z) > 3.0")} AS n_anomalies,
              |  ROUND(MAX(ABS(z)), 6) AS max_abs_z
              |FROM z GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("w6_window_funcs",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        T(s, d, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("rk", rank().over(w).cast("int"))
          .withColumn("drk", dense_rank().over(w).cast("int"))
          .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
          .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
          .withColumn("pct_rank", round(percent_rank().over(w), 6))
          .where(col("rk") <= 5)
          .orderBy(col("o_orderpriority"), col("rk"), col("o_orderkey"))
      },
      Some("""SELECT * FROM (
             |  SELECT o_orderpriority, o_orderkey, o_totalprice,
             |    CAST(RANK() OVER w AS INTEGER) AS rk,
             |    CAST(DENSE_RANK() OVER w AS INTEGER) AS drk,
             |    LAG(o_totalprice, 1) OVER w AS prev_price,
             |    LEAD(o_totalprice, 1) OVER w AS next_price,
             |    ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey))
             |WHERE rk <= 5 ORDER BY o_orderpriority, rk, o_orderkey""".stripMargin)),

    // Batch sessionization: lag-gap flag → cumulative-sum session id →
    // per-session stats → session-size histogram (small deterministic
    // output). The batch twin of streaming/EventStream.sessionize.
    Q("st2_sessions_batch",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val gapMin = 30L
        events(s, d)
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapMin * 60, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum(col("new_session")).over(byUser))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"))
          .groupBy(col("n_events"))
          .agg(count(lit(1)).as("n_sessions"))
          .orderBy(col("n_events"))
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts,
             |    LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |  FROM events),
             |f AS (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN prev_ts IS NULL
             |      OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_session
             |  FROM g),
             |sess AS (
             |  SELECT user_id,
             |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
             |  FROM f),
             |per AS (SELECT user_id, session_id, COUNT(*) AS n_events FROM sess GROUP BY 1, 2)
             |SELECT n_events, COUNT(*) AS n_sessions FROM per
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Distribution window functions (percent_rank / cume_dist / ntile):
    // the percentile-position family w6 doesn't cover. The window order
    // is made TOTAL (price then key) so every function is deterministic
    // and tie-free on both engines; the output filter applies AFTER the
    // windows (a mod-key slim-down, not a window predicate).
    Q("w14_distribution_windows",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        T(s, d, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("pct_rank", round(percent_rank().over(w), 6))
          .withColumn("cume", round(cume_dist().over(w), 6))
          .withColumn("quartile", ntile(4).over(w))
          .where(pmod(col("o_orderkey"), lit(50)) === 0)
          .select(col("o_orderpriority"), col("o_orderkey"),
            col("pct_rank"), col("cume"), col("quartile"))
          .orderBy(col("o_orderpriority"), col("o_orderkey"))
      },
      Some("""WITH win AS (
             |  SELECT o_orderpriority, o_orderkey,
             |    ROUND(percent_rank() OVER w, 6) AS pct_rank,
             |    ROUND(cume_dist() OVER w, 6) AS cume,
             |    CAST(ntile(4) OVER w AS INTEGER) AS quartile
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_orderpriority
             |    ORDER BY o_totalprice, o_orderkey))
             |SELECT o_orderpriority, o_orderkey, pct_rank, cume, quartile
             |FROM win WHERE o_orderkey % 50 = 0
             |ORDER BY o_orderpriority, o_orderkey""".stripMargin)),

    // w14's SCALE twin: the same three distribution functions computed
    // from graft.core.Relational.withGroupRank (range-shuffled grouped
    // rank) instead of a stock per-group window — the stock plan's
    // parallelism is the GROUP COUNT (5 priorities = 5 tasks = 17 s at
    // ×100, DevScale gates12b), while this one spreads each group over
    // the full range shuffle. Closed forms from (rank, group_total):
    // percent_rank = (rk−1)/(N−1), cume_dist = rk/N (tie-free total
    // order), ntile via the decile formula. Oracle: IDENTICAL SQL to
    // w14 — same functions, same window — proving the distributed rank
    // reproduces the stock window's values exactly.
    Q("w14b_distribution_scalable",
      (s, d) => {
        val ranked = graft.core.Relational.withGroupRank(
          T(s, d, "orders")
            .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice")),
          Seq("o_orderpriority"),
          Seq(col("o_totalprice"), col("o_orderkey")),
          "__rk", "__n")
        ranked
          .withColumn("pct_rank",
            round(when(col("__n") > 1,
                (col("__rk") - 1).cast("double") / (col("__n") - 1).cast("double"))
              .otherwise(lit(0.0)), 6))
          .withColumn("cume",
            round(col("__rk").cast("double") / col("__n").cast("double"), 6))
          .withColumn("quartile",
            graft.core.Relational.ntileFromRank(col("__rk"), col("__n"), 4).cast("int"))
          .where(pmod(col("o_orderkey"), lit(50)) === 0)
          .select(col("o_orderpriority"), col("o_orderkey"),
            col("pct_rank"), col("cume"), col("quartile"))
          .orderBy(col("o_orderpriority"), col("o_orderkey"))
      },
      Some("""WITH win AS (
             |  SELECT o_orderpriority, o_orderkey,
             |    ROUND(percent_rank() OVER w, 6) AS pct_rank,
             |    ROUND(cume_dist() OVER w, 6) AS cume,
             |    CAST(ntile(4) OVER w AS INTEGER) AS quartile
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_orderpriority
             |    ORDER BY o_totalprice, o_orderkey))
             |SELECT o_orderpriority, o_orderkey, pct_rank, cume, quartile
             |FROM win WHERE o_orderkey % 50 = 0
             |ORDER BY o_orderpriority, o_orderkey""".stripMargin)),

    // Cumulative distinct users (users-to-date — the growth-curve
    // metric): running COUNT(DISTINCT) is quadratic done naively, but
    // each user contributes exactly once at their FIRST day, so one
    // user-keyed min-day aggregate + a cumsum over the tiny day spine
    // gives the exact curve (the spine window rides partitionBy(lit(0))
    // — calendar-bounded rows, never the data path).
    Q("w15_cumulative_distinct",
      (s, d) => {
        val firstSeen = events(s, d)
          .groupBy(col("user_id"))
          .agg(min(to_date(col("ts"))).as("day"))
        val w = Window.partitionBy(lit(0)).orderBy(col("day"))
        firstSeen.groupBy(col("day"))
          .agg(count(lit(1)).as("n_new_users"))
          .withColumn("cum_users", sum(col("n_new_users")).over(w))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n_new_users"), col("cum_users"))
          .orderBy(col("day"))
      },
      Some("""WITH fs AS (
             |  SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY 1),
             |pd AS (SELECT day, COUNT(*) AS n_new_users FROM fs GROUP BY 1)
             |SELECT STRFTIME(day, '%Y-%m-%d') AS day, n_new_users,
             |  CAST(SUM(n_new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
             |FROM pd ORDER BY 1""".stripMargin)),

    // OLAP completeness beyond the reference surface: hierarchical
    // rollup totals and a pivoted cross-tab.
    Q("w7_rollup",
      (s, d) => T(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), Det.sumLong(floor(col("l_quantity"))).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("qty"))
        .orderBy(col("rf"), col("ls")),
      Some("""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
             |  COALESCE(l_linestatus, 'ALL') AS ls,
             |  COUNT(*) AS n, CAST(SUM(FLOOR(l_quantity)) AS BIGINT) AS qty
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY 1, 2""".stripMargin)),

    // Full grouping-sets lattice (cube = rollup ∪ cross-slices): the
    // remaining OLAP grouping shape. Same coalesce-to-'ALL' convention as
    // w7 so null ordering never differs across engines.
    Q("w10_cube",
      (s, d) => T(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sumExact(col("o_totalprice")).as("sum_price"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("sum_price"))
        .orderBy(col("status"), col("priority")),
      Some(s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
              |  COALESCE(o_orderpriority, 'ALL') AS priority,
              |  COUNT(*) AS n, ${sumExactSql("o_totalprice")} AS sum_price
              |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
              |ORDER BY 1, 2""".stripMargin)),

    // Unpivot/melt — the inverse of w8: a wide per-status metrics row
    // melts to the long (status, measure, value) shape a report/plotting
    // sink consumes. Spark's native unpivot is a zero-shuffle projection
    // over the already-aggregated frame (the expensive part, the groupBy,
    // happened on the wide side).
    Q("w11_unpivot",
      (s, d) => T(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).cast("double").as("n_orders"),
          round(avgExact(col("o_totalprice")), 6).cast("double").as("avg_price"),
          round(max(col("o_totalprice")), 6).cast("double").as("max_price"))
        .unpivot(
          Array(col("o_orderstatus")),
          Array(col("n_orders"), col("avg_price"), col("max_price")),
          "measure", "value")
        .orderBy(col("o_orderstatus"), col("measure")),
      Some(s"""WITH wide AS (
              |  SELECT o_orderstatus,
              |    CAST(COUNT(*) AS DOUBLE) AS n_orders,
              |    CAST(ROUND(${avgExactSql("o_totalprice")}, 6) AS DOUBLE) AS avg_price,
              |    CAST(ROUND(MAX(o_totalprice), 6) AS DOUBLE) AS max_price
              |  FROM orders GROUP BY 1)
              |SELECT o_orderstatus, measure, value FROM (
              |  SELECT o_orderstatus, 'n_orders' AS measure, n_orders AS value FROM wide
              |  UNION ALL SELECT o_orderstatus, 'avg_price', avg_price FROM wide
              |  UNION ALL SELECT o_orderstatus, 'max_price', max_price FROM wide)
              |ORDER BY 1, 2""".stripMargin)),

    // Arbitrary GROUPING SETS lattice — the grouping shape rollup/cube
    // can't express: ((rf, ls), (ls)) skips the (rf) and () levels
    // entirely. One aggregate pass produces both levels (Spark expands
    // the sets into a single Expand + aggregate, not one job per set).
    Q("w13_grouping_sets",
      (s, d) => T(s, d, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), Det.sumLong(floor(col("l_quantity"))).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("qty"))
        .orderBy(col("rf"), col("ls")),
      Some("""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
             |  COALESCE(l_linestatus, 'ALL') AS ls,
             |  COUNT(*) AS n, CAST(SUM(FLOOR(l_quantity)) AS BIGINT) AS qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus))
             |ORDER BY 1, 2""".stripMargin)),

    Q("w8_pivot",
      (s, d) => T(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnRenamed("F", "n_f").withColumnRenamed("O", "n_o")
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
             |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Semi-structured column: events.props is a JSON string — parse with
    // from_json (vectorized, no UDF) and aggregate on an extracted field.
    Q("x5_json_props",
      (s, d) => events(s, d)
        .withColumn("k",
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType)))).getField("k"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("k").cast("long")).as("sum_k"),
          count(when(col("k") > 50, 1)).as("n_high"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, COUNT(*) AS n,
             |CAST(SUM(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS sum_k,
             |CAST(SUM(CASE WHEN CAST(props->>'k' AS INTEGER) > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Per-series EWMA (exponential smoothing, the classic trend filter):
    // s₁ = v₁, sᵢ = α·vᵢ + (1−α)·sᵢ₋₁, α = 0.25 (exact in binary, so
    // both factors are representable). The fold is inherently SEQUENTIAL
    // per series — the parallelism axis is users — and rides
    // core.SeqFold: one user-keyed exchange, per-partition EXTERNAL sort
    // on (user, ts, event_id), then a streaming run fold whose per-user
    // state is the single accumulator double — O(1), so a hot key costs
    // sort spill, never memory (the collect_list-array formulation this
    // replaced held a user's whole history per aggregation buffer).
    // Cross-engine: both engines run the IDENTICAL sequence of IEEE
    // double ops (0.25·v + 0.75·s in order), so the result is bit-equal;
    // the oracle replays the recurrence as a recursive CTE.
    Q("t18_ewma",
      (s, d) => {
        val ev = graft.core.SeqFold.keyedEvents(events(s, d),
          col("user_id"), unix_micros(col("ts")), col("event_id"),
          col("value"))
        graft.core.SeqFold.fold(ev)(e => e.v)(
            (acc, e) => 0.25 * e.v + 0.75 * acc)(
            (_, _, st) => Some(st))
          .select(col("k").as("user_id"), col("n").as("n_events"),
            round(col("out"), 6).as("ewma"))
          .orderBy(col("user_id"))
      },
      Some("""WITH RECURSIVE ev AS MATERIALIZED (
             |  SELECT user_id, value,
             |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |  FROM events),
             |mx AS (SELECT user_id, MAX(rn) AS n FROM ev GROUP BY 1),
             |r AS (
             |  SELECT user_id, rn, value AS s FROM ev WHERE rn = 1
             |  UNION ALL
             |  SELECT e.user_id, e.rn, 0.25 * e.value + 0.75 * r.s
             |  FROM r JOIN ev e ON e.user_id = r.user_id AND e.rn = r.rn + 1)
             |SELECT m.user_id, m.n AS n_events, ROUND(r.s, 6) AS ewma
             |FROM mx m JOIN r ON r.user_id = m.user_id AND r.rn = m.n
             |ORDER BY m.user_id""".stripMargin)),

    // Peak concurrency via the SWEEP-LINE (the "max concurrent
    // sessions / connections / jobs" capacity question): sessions are
    // the st2/st14 30-min-gap islands per user (end = last event + 1µs,
    // end-EXCLUSIVE so a session ending exactly when another starts
    // never overlaps it, and single-event sessions still span 1µs);
    // each session emits a +1 boundary at start and −1 at end, deltas
    // at the same instant pre-aggregate to one net row (making the
    // global order tie-free — withGlobalCumSum's contract), and the
    // DISTRIBUTED cumulative sum over boundary time IS the concurrency
    // curve. Reported per day as the max over that day's boundary
    // points (a curve segment spanning midnight is attributed to the
    // day of its defining boundary — same convention both engines).
    // Scale shape: one user-keyed shuffle (sessionize), one boundary-ts
    // shuffle (net deltas), then withGlobalCumSum's range exchange over
    // the BOUNDARY table (2 rows per session, ≪ events) — no
    // single-partition stage anywhere.
    Q("t19_max_concurrency",
      (s, d) => {
        val gapUs = 1800000000L
        val w = Window.partitionBy(col("user_id")).orderBy(col("tsu"))
        val sess = events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("tsu"))
          .withColumn("brk",
            when(col("tsu") - lag(col("tsu"), 1).over(w) > gapUs ||
              lag(col("tsu"), 1).over(w).isNull, 1).otherwise(0))
          .withColumn("sid", sum(col("brk")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sid"))
          .agg(min(col("tsu")).as("st"), (max(col("tsu")) + 1).as("en"))
        val bounds = sess.select(col("st").as("tsu"), lit(1L).as("d"))
          .unionByName(sess.select(col("en").as("tsu"), lit(-1L).as("d")))
          .groupBy(col("tsu")).agg(sum(col("d")).as("nd"))
        graft.core.Relational.withGlobalCumSum(
            bounds, Seq(col("tsu")), col("nd"), "conc")
          .groupBy(date_format(timestamp_micros(col("tsu")), "yyyy-MM-dd").as("day"))
          .agg(max(col("conc")).as("max_concurrency"),
            count(lit(1)).as("n_boundaries"))
          .orderBy(col("day"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tsu FROM events),
             |m AS (SELECT user_id, tsu, CASE WHEN tsu - LAG(tsu) OVER w > 1800000000
             |    OR LAG(tsu) OVER w IS NULL THEN 1 ELSE 0 END AS brk
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu)),
             |s AS (SELECT user_id, tsu,
             |    SUM(brk) OVER (PARTITION BY user_id ORDER BY tsu) AS sid FROM m),
             |iv AS (SELECT user_id, sid, MIN(tsu) AS st, MAX(tsu) + 1 AS en
             |  FROM s GROUP BY 1, 2),
             |b AS (SELECT st AS tsu, 1 AS d FROM iv
             |  UNION ALL SELECT en, -1 FROM iv),
             |agg AS (SELECT tsu, SUM(d) AS nd FROM b GROUP BY 1),
             |c AS (SELECT tsu, SUM(nd) OVER (ORDER BY tsu) AS conc FROM agg)
             |SELECT STRFTIME(make_timestamp(tsu), '%Y-%m-%d') AS day,
             |  CAST(MAX(conc) AS BIGINT) AS max_concurrency,
             |  COUNT(*) AS n_boundaries
             |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Period-over-period deltas (the WoW/MoM reporting shape): weekly
    // revenue from one groupBy(week) pass, then lag/delta/pct-change
    // over the PRE-AGGREGATED week frame — the unpartitioned window is
    // the documented safe pattern (≤ O(weeks) rows, never row-scale;
    // same class as the Heaps-bucket and daily windows). The delta is
    // computed in exact DECIMAL before the double cast so subtraction
    // can't reintroduce accumulation-order noise.
    Q("t20_period_over_period",
      (s, d) => {
        val wk = Window.partitionBy(lit(0)).orderBy(col("week"))
        T(s, d, "orders")
          .groupBy(date_format(date_trunc("week", col("o_orderdate")), "yyyy-MM-dd")
            .as("week"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(27, 6)))
              .as("revd"))
          .withColumn("prevd", lag(col("revd"), 1).over(wk))
          .select(col("week"), col("n_orders"),
            col("revd").cast("double").as("revenue"),
            (col("revd") - col("prevd")).cast("double").as("delta"),
            round((col("revd") - col("prevd")).cast("double") /
              col("prevd").cast("double"), 6).as("pct_change"))
          .orderBy(col("week"))
      },
      Some("""WITH wk AS (
             |  SELECT STRFTIME(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week,
             |    COUNT(*) AS n_orders,
             |    SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS revd
             |  FROM orders GROUP BY 1),
             |l AS (SELECT week, n_orders, revd,
             |    LAG(revd) OVER (ORDER BY week) AS prevd FROM wk)
             |SELECT week, n_orders, CAST(revd AS DOUBLE) AS revenue,
             |  CAST(revd - prevd AS DOUBLE) AS delta,
             |  ROUND(CAST(revd - prevd AS DOUBLE) / CAST(prevd AS DOUBLE), 6)
             |    AS pct_change
             |FROM l ORDER BY week""".stripMargin)),

    // Per-series OLS trend slope (the "is this user's activity trending
    // up" regression a30's weighted-moment machinery answers per key):
    // x = days since 2024-01-01 (long subtraction then one float
    // divide — bit-identical both engines), four moments accumulate in
    // ONE map-side-combined exact-DECIMAL pass (no window, no sort),
    // and the closed form runs over bit-identical doubles. Degenerate
    // series (single event / zero x-variance) yield EXPLICIT nulls via
    // a denominator guard on both sides — never an engine-specific
    // NaN/error. Round 6 on the O(1) ratios.
    Q("t21_trend_slope",
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        def m(c: org.apache.spark.sql.Column) =
          sum(c.cast(DecimalType(27, 6))).cast("double")
        val x = (unix_micros(col("ts")) - lit(1704067200000000L)) /
          lit(86400000000.0)
        val stats = events(s, d)
          .select(col("user_id"), x.as("x"), col("value").as("y"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            m(col("x")).as("sx"), m(col("y")).as("sy"),
            m(col("x") * col("x")).as("sxx"), m(col("x") * col("y")).as("sxy"))
        val nD = col("n_events").cast("double")
        val denom = nD * col("sxx") - col("sx") * col("sx")
        stats.select(col("user_id"), col("n_events"),
            when(denom === 0.0, lit(null).cast("double"))
              .otherwise(round((nD * col("sxy") - col("sx") * col("sy")) / denom, 6))
              .as("slope"),
            when(denom === 0.0, lit(null).cast("double"))
              .otherwise(round((col("sy") * col("sxx") - col("sx") * col("sxy")) / denom, 6))
              .as("intercept"))
          .orderBy(col("user_id"))
      },
      Some {
        def m(e: String) = s"CAST(SUM(CAST(($e) AS DECIMAL(27,6))) AS DOUBLE)"
        s"""WITH e AS (SELECT user_id,
           |    (epoch_us(ts) - 1704067200000000) / 86400000000.0 AS x,
           |    value AS y FROM events),
           |s AS (SELECT user_id, COUNT(*) AS n_events,
           |    ${m("x")} AS sx, ${m("y")} AS sy,
           |    ${m("x*x")} AS sxx, ${m("x*y")} AS sxy
           |  FROM e GROUP BY 1),
           |f AS (SELECT user_id, n_events,
           |    CAST(n_events AS DOUBLE) * sxx - sx * sx AS denom,
           |    CAST(n_events AS DOUBLE) * sxy - sx * sy AS num_s,
           |    sy * sxx - sx * sxy AS num_i
           |  FROM s)
           |SELECT user_id, n_events,
           |  CASE WHEN denom = 0.0 THEN NULL
           |    ELSE ROUND(num_s / denom, 6) END AS slope,
           |  CASE WHEN denom = 0.0 THEN NULL
           |    ELSE ROUND(num_i / denom, 6) END AS intercept
           |FROM f ORDER BY user_id""".stripMargin
      }),

    // Rolling EXACT median (the order-statistic complement of w9's
    // rolling sums — robust smoothing that a spike can't drag): per
    // user, trailing 5-row frame, median = the LOWER-MIDDLE element of
    // the sorted frame (no interpolation — the value is an observed
    // datum, bit-exact across engines; for a partial leading frame of
    // n rows it's element ⌈n/2⌉). Spark side sorts the collected frame
    // (bounded at 5 elements — the frame bound, never row-scale);
    // DuckDB's windowed QUANTILE_DISC(0.5) picks the identical element
    // (floor((n−1)/2)+1 = (n+1) div 2). Per-user rollup pins the whole
    // rolling series: each median is an observed double datum, so the
    // per-user sum goes through the standard exact-decimal accumulation,
    // plus rounded min/max. ONE user-keyed shuffle; frame state is 5 rows.
    Q("t22_rolling_median",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tsu"), col("event_id"))
          .rowsBetween(-4, Window.currentRow)
        events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
            col("event_id"), col("value"))
          .withColumn("win", sort_array(collect_list(col("value")).over(w)))
          .withColumn("rmed",
            expr("element_at(win, CAST((size(win) + 1) div 2 AS INT))"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sumExact(col("rmed")).as("med_sum"),
            round(min(col("rmed")), 6).as("med_min"),
            round(max(col("rmed")), 6).as("med_max"))
          .orderBy(col("user_id"))
      },
      Some(s"""WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, event_id, value
              |  FROM events),
              |r AS (SELECT user_id,
              |    QUANTILE_DISC(value, 0.5) OVER (PARTITION BY user_id
              |      ORDER BY tsu, event_id
              |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS rmed
              |  FROM e)
              |SELECT user_id, COUNT(*) AS n_events,
              |  ${sumExactSql("rmed")} AS med_sum,
              |  ROUND(MIN(rmed), 6) AS med_min,
              |  ROUND(MAX(rmed), 6) AS med_max
              |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)),

    // SEASONAL-ADJUSTED anomaly gate (t8 z-scores against a rolling
    // window; t14 profiles day-of-week counts; this one z-scores each
    // VALUE against its (dow, hour) seasonal cell — the deseasonalized
    // residual monitor that doesn't page on every Monday-morning ramp):
    // the 168-cell profile comes from ONE exact-decimal moment pass and
    // broadcasts back onto the stream, so the scan is the only
    // row-scale work. All z inputs are decimal-exact doubles; the
    // per-day rollup keys on the event's day. Threshold 1.5σ (the
    // fixture's value distribution is bounded — 3σ would never fire;
    // the gate's JOB here is firing deterministically, both engines
    // replay the same counts).
    Q("t23_seasonal_anomaly",
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val ev = events(s, d).select(col("ts"), col("value"),
          expr("weekday(ts)").cast("int").as("dow"), hour(col("ts")).as("hr"))
        val prof = ev.groupBy(col("dow"), col("hr"))
          .agg(count(col("value")).as("n"),
            sum(col("value").cast(DecimalType(27, 6))).cast("double").as("sv"),
            sum((col("value") * col("value")).cast(DecimalType(27, 6)))
              .cast("double").as("svv"))
          .select(col("dow"), col("hr"), (col("sv") / col("n")).as("mu"),
            // clamp the variance at 0 (a 1-event cell's quantized
            // svv/n − mu² can land a hair NEGATIVE → Spark sqrt gives
            // NaN, DuckDB sqrt ERRORS) and take zero-variance cells
            // out of contract on BOTH engines — otherwise the z
            // division is a DIVIDE_BY_ZERO under Spark's ANSI default
            // the moment any (dow, hr) cell is constant (seen live at
            // sf0.001's ~6-events-per-cell density).
            sqrt(greatest(
              col("svv") / col("n") -
                (col("sv") / col("n")) * (col("sv") / col("n")),
              lit(0.0))).as("sd"))
          .where(col("sd") > 0)
        ev.join(broadcast(prof), Seq("dow", "hr"))
          .withColumn("z", (col("value") - col("mu")) / col("sd"))
          .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n_events"),
            countIf(abs(col("z")) > 1.5).as("n_anomalies"),
            round(max(abs(col("z"))), 6).as("max_abs_z"))
          .orderBy(col("day"))
      },
      Some(s"""WITH e AS (SELECT ts, value, CAST(isodow(ts) - 1 AS INT) AS dow,
              |    EXTRACT(hour FROM ts) AS hr FROM events),
              |p AS (SELECT dow, hr, COUNT(value) AS n,
              |    ${sumExactSql("value")} AS sv,
              |    ${sumExactSql("value*value")} AS svv
              |  FROM e GROUP BY 1, 2),
              |m AS (SELECT dow, hr, sv / n AS mu,
              |    SQRT(GREATEST(svv / n - (sv / n) * (sv / n), 0)) AS sd
              |  FROM p WHERE sd > 0),
              |z AS (SELECT STRFTIME(date_trunc('day', e.ts), '%Y-%m-%d') AS day,
              |    (value - mu) / sd AS z
              |  FROM e JOIN m USING (dow, hr))
              |SELECT day, COUNT(*) AS n_events,
              |  ${countIfSql("ABS(z) > 1.5")} AS n_anomalies,
              |  ROUND(MAX(ABS(z)), 6) AS max_abs_z
              |FROM z GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Sliding-window EXACT distinct (trailing-7-day active users per
    // day — the DAU/WAU report, and the op naive plans get wrong at
    // scale: a range join of calendar × events is a nested loop, and a
    // windowed countDistinct is unsupported). The scale-correct rewrite:
    // distinct (day, user) pairs FIRST (one shuffle, day-level rows ≪
    // events), then each pair EXPLODES to the ≤7 window-end days it
    // covers (a bounded 7× fan of the small pair table — the band-join
    // rewrite rj1 uses, materialized as an equi-groupBy), exact
    // countDistinct per target day, semi-joined back to observed days
    // (no ghost days past the corpus end). w15's cumulative distinct is
    // the unbounded-window sibling.
    Q("w17_sliding_distinct",
      (s, d) => {
        val pairs = events(s, d)
          .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
        val cal = pairs.select(col("day")).distinct()
        val expanded = pairs
          .select(col("user_id"),
            explode(sequence(lit(0), lit(6))).as("off"), col("day"))
          .select(date_add(col("day"), col("off")).as("day"), col("user_id"))
        expanded.join(cal, Seq("day"), "left_semi")
          .groupBy(col("day"))
          .agg(countDistinct(col("user_id")).as("n_active_7d"))
          .join(pairs.groupBy(col("day"))
            .agg(count(lit(1)).as("n_active_1d")), Seq("day"))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n_active_1d"), col("n_active_7d"))
          .orderBy(col("day"))
      },
      Some("""WITH p AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
             |  FROM events),
             |cal AS (SELECT DISTINCT day FROM p),
             |w AS (SELECT c.day AS day, p.user_id
             |  FROM cal c JOIN p ON p.day BETWEEN c.day - 6 AND c.day)
             |SELECT STRFTIME(w.day, '%Y-%m-%d') AS day,
             |  (SELECT COUNT(*) FROM p WHERE p.day = w.day) AS n_active_1d,
             |  COUNT(DISTINCT user_id) AS n_active_7d
             |FROM w GROUP BY w.day ORDER BY 1""".stripMargin)),

    // RFM segmentation (recency / frequency / monetary quartiles — the
    // classic lifecycle segmentation, and a reuse test for the
    // DISTRIBUTED quartile machinery: each NTILE(4) rides
    // Relational.decileExact's range-exchange rank, never a global
    // single-partition window, because at corpus scale the user frame
    // is billions of rows). Unique user_id tie-breaks make every
    // quartile boundary deterministic; monetary is decimal-exact before
    // the double ordering. Output: the 4×4×4 segment grid with user
    // counts and monetary mass.
    Q("t25_rfm_segments",
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val u = events(s, d)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("f"),
            sum(col("value").cast(DecimalType(27, 6))).cast("double").as("m"),
            max(to_date(col("ts"))).as("last_day"))
        // Recency never needs the global max attached: rec =
        // datediff(gmax, last_day) is a strictly decreasing function of
        // last_day, so NTILE over (rec ASC, user_id) ≡ NTILE over
        // (last_day DESC, user_id) — identical ties, identical
        // tie-break, identical quartile labels. Ordering the rq pass on
        // last_day DESC drops the 1-row crossJoin(broadcast) that
        // planned as the banned BroadcastNestedLoopJoin AND avoids the
        // constant-partition-window alternative (a single-partition
        // exchange of the full user frame — worse at corpus scale).
        val base = u.select(col("user_id"), col("last_day"), col("f"), col("m"))
        def quartile(df: DataFrame, order: Seq[org.apache.spark.sql.Column],
            name: String) =
          graft.core.Relational.decileExact(df, order, n = 4)
            .withColumnRenamed("decile", name)
        val q = quartile(quartile(quartile(base,
            Seq(col("last_day").desc, col("user_id")), "rq"),
            Seq(col("f"), col("user_id")), "fq"),
            Seq(col("m"), col("user_id")), "mq")
        q.groupBy(col("rq"), col("fq"), col("mq"))
          .agg(count(lit(1)).as("n_users"), sumExact(col("m")).as("monetary"))
          .orderBy(col("rq"), col("fq"), col("mq"))
      },
      Some(s"""WITH u AS (SELECT user_id, COUNT(*) AS f,
              |    CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS m,
              |    MAX(CAST(ts AS DATE)) AS last_day
              |  FROM events GROUP BY 1),
              |g AS (SELECT MAX(last_day) AS gmax FROM u),
              |r AS (SELECT user_id, f, m, (gmax - last_day) AS rec FROM u, g),
              |q AS (SELECT m,
              |    NTILE(4) OVER (ORDER BY rec, user_id) AS rq,
              |    NTILE(4) OVER (ORDER BY f, user_id) AS fq,
              |    NTILE(4) OVER (ORDER BY m, user_id) AS mq
              |  FROM r)
              |SELECT rq, fq, mq, COUNT(*) AS n_users,
              |  ${sumExactSql("m")} AS monetary
              |FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // Top WoW movers per week (the "what changed most" report layered
    // on t20's period-over-period): weekly revenue per market segment
    // (orders ⋈ broadcast customer), per-segment lag over the
    // O(weeks×segments) pre-aggregated frame, then the top-3 absolute
    // movers per week via row_number ≤ 3 — WindowGroupLimit, so even a
    // high-cardinality segment axis would heap-prune map-side. Deltas
    // computed in exact DECIMAL; first-week rows (no prior) drop on
    // both sides.
    Q("w18_top_movers",
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val wk = T(s, d, "orders")
          .join(broadcast(T(s, d, "customer")
            .select(col("c_custkey"), col("c_mktsegment"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy(date_format(date_trunc("week", col("o_orderdate")), "yyyy-MM-dd")
            .as("week"), col("c_mktsegment"))
          .agg(sum(col("o_totalprice").cast(DecimalType(27, 6))).as("revd"))
        val wSeg = Window.partitionBy(col("c_mktsegment")).orderBy(col("week"))
        val wWeek = Window.partitionBy(col("week"))
          .orderBy(abs(col("delta")).desc, col("c_mktsegment"))
        wk.withColumn("delta", (col("revd") - lag(col("revd"), 1).over(wSeg))
            .cast("double"))
          .where(col("delta").isNotNull)
          .withColumn("rk", row_number().over(wWeek))
          .where(col("rk") <= 3)
          .select(col("week"), col("rk"), col("c_mktsegment"),
            col("revd").cast("double").as("revenue"), col("delta"))
          .orderBy(col("week"), col("rk"))
      },
      Some("""WITH wk AS (
             |  SELECT STRFTIME(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week,
             |    c_mktsegment,
             |    SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS revd
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1, 2),
             |l AS (SELECT week, c_mktsegment, revd,
             |    CAST(revd - LAG(revd) OVER (PARTITION BY c_mktsegment ORDER BY week)
             |      AS DOUBLE) AS delta
             |  FROM wk),
             |r AS (SELECT week, c_mktsegment, revd, delta,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY week
             |      ORDER BY ABS(delta) DESC, c_mktsegment) AS INTEGER) AS rk
             |  FROM l WHERE delta IS NOT NULL)
             |SELECT week, rk, c_mktsegment, CAST(revd AS DOUBLE) AS revenue, delta
             |FROM r WHERE rk <= 3 ORDER BY week, rk""".stripMargin)),

    // 2-D SKYLINE (Pareto front): parts not dominated on
    // (p_retailprice min-better, p_size max-better). The naive operator
    // is the O(n²) NOT-EXISTS dominance join; the distributed rewrite is
    // O(n log n): collapse to the per-price max-size frame, take the
    // STRICT-prior running max over the price order with
    // Relational.withGlobalCumMax (range exchange + per-partition
    // window + broadcast prefix maxima — no single-partition stage, no
    // pair join anywhere), and a part survives iff it carries its
    // price's max size AND beats every strictly-cheaper part's best
    // size. Equal (price, size) duplicates are both kept (dominance
    // needs one strict inequality) — both engines agree by
    // construction. The oracle replays the same one-pass window form,
    // which is provably the dominance definition.
    Q("w19_skyline",
      (s, d) => {
        val h = T(s, d, "part").groupBy(col("p_retailprice").as("pr"))
          .agg(max(col("p_size")).as("ms"))
        val r = graft.core.Relational.withGlobalCumMax(
          h, Seq(col("pr")), col("ms"), "rmax")
        T(s, d, "part")
          .join(r, col("p_retailprice") === col("pr"))
          .where(col("p_size") === col("ms") &&
            (col("rmax").isNull || col("p_size") > col("rmax")))
          .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
          .orderBy(col("p_retailprice"), col("p_partkey"))
      },
      Some("""WITH h AS (SELECT p_retailprice AS pr, MAX(p_size) AS ms
             |  FROM part GROUP BY 1),
             |r AS (SELECT pr, ms, MAX(ms) OVER (ORDER BY pr
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rmax
             |  FROM h)
             |SELECT p.p_partkey, p.p_retailprice, p.p_size
             |FROM part p JOIN r ON p.p_retailprice = r.pr
             |WHERE p.p_size = r.ms AND (r.rmax IS NULL OR p.p_size > r.rmax)
             |ORDER BY p.p_retailprice, p.p_partkey""".stripMargin)),

    // Lead-lag CROSS-CORRELATION between two event streams (does a
    // click surge predict purchases h days later?): daily counts per
    // type, then for each lag 0..7 the Pearson correlation of
    // clicks[t] vs purchases[t+lag] over days present in BOTH series
    // (inner-join contract, mirrored in the oracle). Everything after
    // the scan rides the O(days) daily frame; the 8-lag expansion is a
    // bounded explode + date-key equi join (hash join, never a range
    // nested loop). Counts are integers, so every corr input sum is
    // BIGINT-exact — the only doubles are the final closed form,
    // rounded on both sides.
    Q("w20_lag_xcorr",
      (s, d) => {
        val daily = events(s, d)
          .groupBy(to_date(col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).as("c"))
        val a = daily.where(col("event_type") === "click")
          .select(col("day").as("day_a"), col("c").as("ca"))
          .withColumn("lag", explode(sequence(lit(0), lit(7))))
        val b = daily.where(col("event_type") === "purchase")
          .select(col("day").as("day_b"), col("c").as("cb"))
        a.join(b, date_add(col("day_a"), col("lag")) === col("day_b"))
          .groupBy(col("lag"))
          .agg(count(lit(1)).as("n_days"),
            sumLong(col("ca")).as("sa"), sumLong(col("cb")).as("sb"),
            sumLong(col("ca") * col("ca")).as("saa"),
            sumLong(col("cb") * col("cb")).as("sbb"),
            sumLong(col("ca") * col("cb")).as("sab"))
          .select(col("lag"), col("n_days"),
            round((col("n_days") * col("sab") - col("sa") * col("sb"))
              .cast("double") /
              sqrt((col("n_days") * col("saa") - col("sa") * col("sa"))
                .cast("double") *
                (col("n_days") * col("sbb") - col("sb") * col("sb"))
                  .cast("double")), 6).as("xcorr"))
          .orderBy(col("lag"))
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day, event_type,
             |    COUNT(*) AS c
             |  FROM events GROUP BY 1, 2),
             |a AS (SELECT day AS day_a, c AS ca, CAST(l.lag AS INTEGER) AS lag
             |  FROM daily, range(8) l(lag) WHERE event_type = 'click'),
             |b AS (SELECT day AS day_b, c AS cb FROM daily
             |  WHERE event_type = 'purchase'),
             |j AS (SELECT lag, ca, cb FROM a JOIN b
             |  ON day_a + lag = day_b),
             |g AS (SELECT lag, COUNT(*) AS n_days,
             |    CAST(SUM(ca) AS BIGINT) AS sa, CAST(SUM(cb) AS BIGINT) AS sb,
             |    CAST(SUM(ca*ca) AS BIGINT) AS saa,
             |    CAST(SUM(cb*cb) AS BIGINT) AS sbb,
             |    CAST(SUM(ca*cb) AS BIGINT) AS sab
             |  FROM j GROUP BY 1)
             |SELECT lag, n_days,
             |  ROUND(CAST(n_days*sab - sa*sb AS DOUBLE) /
             |    SQRT(CAST(n_days*saa - sa*sa AS DOUBLE) *
             |      CAST(n_days*sbb - sb*sb AS DOUBLE)), 6) AS xcorr
             |FROM g ORDER BY lag""".stripMargin)),

    // Sessionized conversion funnel (st2's gap sessionization carried
    // into an ORDER-AWARE per-session funnel — t6/t17 count step
    // sequences per user, this one per session): sessions break on
    // >30-min gaps under the (tsu, event_id) total order, and a session
    // CONVERTS iff a purchase lands strictly after its first click
    // (min click tsu < max purchase tsu — equal-timestamp edges are
    // deliberately non-conversions on both engines). Two user-keyed
    // window passes (per-key rows = the user's event cadence, never
    // corpus size) + one session-grained aggregate; gap math stays in
    // integer micros.
    Q("t24_session_conversion",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("tsu"), col("event_id"))
        graft.core.Tables.readEvents(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
            col("event_id"), col("event_type"))
          .withColumn("new_s",
            when(lag(col("tsu"), 1).over(byUser).isNull ||
              col("tsu") - lag(col("tsu"), 1).over(byUser) > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("sid", sum(col("new_s")).over(byUser))
          .groupBy(col("user_id"), col("sid"))
          .agg(min(when(col("event_type") === "click", col("tsu"))).as("c0"),
            max(when(col("event_type") === "purchase", col("tsu"))).as("p1"))
          .agg(count(lit(1)).as("n_sessions"),
            countIf(col("c0").isNotNull).as("n_with_click"),
            countIf(col("c0").isNotNull && col("p1") > col("c0"))
              .as("n_converted"))
          .select(col("n_sessions"), col("n_with_click"), col("n_converted"),
            round(col("n_converted").cast("double") / col("n_with_click"), 6)
              .as("conv_rate"))
      },
      Some(s"""WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, event_id,
              |    event_type FROM events),
              |g AS (SELECT user_id, tsu, event_id, event_type,
              |    CASE WHEN LAG(tsu) OVER (PARTITION BY user_id
              |        ORDER BY tsu, event_id) IS NULL
              |      OR tsu - LAG(tsu) OVER (PARTITION BY user_id
              |        ORDER BY tsu, event_id) > 1800000000
              |      THEN 1 ELSE 0 END AS new_s
              |  FROM e),
              |sess AS (SELECT user_id, event_type, tsu,
              |    SUM(new_s) OVER (PARTITION BY user_id
              |      ORDER BY tsu, event_id) AS sid
              |  FROM g),
              |per AS (SELECT user_id, sid,
              |    MIN(CASE WHEN event_type='click' THEN tsu END) AS c0,
              |    MAX(CASE WHEN event_type='purchase' THEN tsu END) AS p1
              |  FROM sess GROUP BY 1, 2)
              |SELECT COUNT(*) AS n_sessions,
              |  ${countIfSql("c0 IS NOT NULL")} AS n_with_click,
              |  ${countIfSql("c0 IS NOT NULL AND p1 > c0")} AS n_converted,
              |  ROUND(CAST(${countIfSql("c0 IS NOT NULL AND p1 > c0")} AS DOUBLE) /
              |    ${countIfSql("c0 IS NOT NULL")}, 6) AS conv_rate
              |FROM per""".stripMargin)),

    // Inter-arrival-time distribution per event type (latency/cadence
    // SLO reporting): per-(user, type) consecutive gaps from ONE keyed
    // lag window, then p50/p90/p99 via weightedQuantiles' histogram-
    // compressed pass — the percentile-class rule (PLANS.md): never
    // feed raw rows into built-in exact `percentile` with few groups;
    // the per-group window here only ever scans DISTINCT gap values.
    // Gap values are micro-precise seconds, so the histogram genuinely
    // compresses (cadences repeat); interpolation matches QUANTILE_CONT
    // (a21's proven contract).
    Q("t26_interarrival",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("tsu"), col("event_id"))
        // gaps in SECONDS, not micros: the two engines' quantile
        // interpolation trees differ in the last ulp, and at 1e11-micro
        // magnitudes that ulp is ~1e-4 — visible through round(…,6).
        // At second magnitudes it is ~1e-11, invisible. The integer→
        // double division is bit-identical on both sides.
        val gaps = graft.core.Tables.readEvents(s, d)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("tsu"), col("event_id"))
          .withColumn("gap",
            (col("tsu") - lag(col("tsu"), 1).over(w)) / lit(1000000.0))
          .where(col("gap").isNotNull)
          .withColumn("w1", lit(1L))
        graft.core.Relational.weightedQuantiles(
            gaps, "event_type", "gap", "w1", ps = Seq(0.5, 0.9, 0.99))
          .select(col("event_type"), col("total_weight").as("n_gaps"),
            round(col("q_0_5"), 6).as("p50"),
            round(col("q_0_9"), 6).as("p90"),
            round(col("q_0_99"), 6).as("p99"))
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tsu,
             |    event_id FROM events),
             |g AS (SELECT event_type,
             |    (tsu - LAG(tsu) OVER (PARTITION BY user_id, event_type
             |      ORDER BY tsu, event_id)) / 1000000.0 AS gap
             |  FROM e)
             |SELECT event_type, COUNT(gap) AS n_gaps,
             |  ROUND(QUANTILE_CONT(gap, 0.5), 6) AS p50,
             |  ROUND(QUANTILE_CONT(gap, 0.9), 6) AS p90,
             |  ROUND(QUANTILE_CONT(gap, 0.99), 6) AS p99
             |FROM g WHERE gap IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Longest consecutive-active-day streak per user (engagement's
    // classic gaps-and-islands: day − row_number is constant within a
    // run). Rides the distinct (user, day) frame (day-level rows ≪
    // events); one user-keyed window + two keyed aggregates; output is
    // the longest-streak histogram.
    Q("t28_active_streaks",
      (s, d) => {
        val days = graft.core.Tables.readEvents(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        days
          .withColumn("grp",
            datediff(col("day"), lit("1970-01-01").cast("date")) -
              row_number().over(w))
          .groupBy(col("user_id"), col("grp"))
          .agg(count(lit(1)).as("len"))
          .groupBy(col("user_id")).agg(max(col("len")).as("longest"))
          .groupBy(col("longest")).agg(count(lit(1)).as("n_users"))
          .orderBy(col("longest"))
      },
      Some("""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
             |  FROM events),
             |g AS (SELECT user_id,
             |    CAST(day - DATE '1970-01-01' AS BIGINT) -
             |      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
             |  FROM days),
             |st AS (SELECT user_id, grp, COUNT(*) AS len FROM g GROUP BY 1, 2),
             |lg AS (SELECT user_id, MAX(len) AS longest FROM st GROUP BY 1)
             |SELECT longest, COUNT(*) AS n_users FROM lg
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Holt linear trend (double exponential smoothing — t18's EWMA with
    // a TREND state, the level+slope forecaster): l' = α·x + (1−α)(l+b),
    // b' = β(l'−l) + (1−β)b, α = 0.5, β = 0.25 (binary-exact factors).
    // Seed l = x₂, b = x₂−x₁ (users with one event are out of contract —
    // SeqFold's finish drops them). Rides core.SeqFold (t18's stance):
    // one user-keyed exchange, per-partition external sort, streaming
    // run fold with O(1) per-user state — the (seeded?, l, b) triple,
    // never the event history. The Scala fold binds l' once and reuses
    // it for b' — identical ops and doubles to the oracle's recursive
    // CTE, which recomputes the l' expression verbatim.
    Q("t27_holt_linear",
      (s, d) => {
        val ev = graft.core.SeqFold.keyedEvents(events(s, d),
          col("user_id"), unix_micros(col("ts")), col("event_id"),
          col("value"))
        graft.core.SeqFold.fold(ev)(
            // state: (seeded, l, b); before the 2nd row l holds x₁.
            e => (false, e.v, 0.0))(
            (st, e) =>
              if (!st._1) (true, e.v, e.v - st._2)
              else {
                val lNew = 0.5 * e.v + 0.5 * (st._2 + st._3)
                (true, lNew, 0.25 * (lNew - st._2) + 0.75 * st._3)
              })(
            (_, n, st) => if (n >= 2) Some(st._2 + st._3) else None)
          .select(col("k").as("user_id"), col("n").as("n_events"),
            round(col("out"), 6).as("holt_forecast"))
          .orderBy(col("user_id"))
      },
      Some("""WITH RECURSIVE ev AS MATERIALIZED (
             |  SELECT user_id, value,
             |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |  FROM events),
             |mx AS (SELECT user_id, MAX(rn) AS n FROM ev GROUP BY 1
             |  HAVING MAX(rn) >= 2),
             |seed AS (SELECT a.user_id, 2 AS rn,
             |    CAST(b.value AS DOUBLE) AS l,
             |    CAST(b.value - a.value AS DOUBLE) AS b
             |  FROM ev a JOIN ev b ON a.user_id = b.user_id
             |    AND a.rn = 1 AND b.rn = 2),
             |r AS (
             |  SELECT user_id, rn, l, b FROM seed
             |  UNION ALL
             |  SELECT e.user_id, e.rn,
             |    0.5*e.value + 0.5*(r.l + r.b),
             |    0.25*((0.5*e.value + 0.5*(r.l + r.b)) - r.l) + 0.75*r.b
             |  FROM r JOIN ev e ON e.user_id = r.user_id AND e.rn = r.rn + 1)
             |SELECT m.user_id, m.n AS n_events, ROUND(r.l + r.b, 6) AS holt_forecast
             |FROM mx m JOIN r ON r.user_id = m.user_id AND r.rn = m.n
             |ORDER BY m.user_id""".stripMargin)),

    // Tabular CUSUM change detector (the ONLINE sequential drift alarm
    // with threshold-and-RESET semantics — t11_cusum_drift computes the
    // retrospective max|S|/(σ√n) drift STATISTIC over daily aggregates;
    // this one runs the per-event alarm PROCESS itself, counting
    // threshold crossings and resetting the accumulator, which is what
    // a monitor deploys): s⁺' = max(0, s⁺ + (x −
    // (μ+κ))), s⁻' = max(0, s⁻ + ((μ−κ) − x)); crossing h resets the
    // accumulator and counts an alarm. μ = 50, κ = 10, h = 200 (the
    // fixture's value mean is ~49.6, so drift accrues only on genuine
    // runs). The RESET makes this genuinely sequential — no window
    // frame or commutative aggregate expresses it — so it rides
    // core.SeqFold: one user-keyed exchange, O(1) per-user state (two
    // accumulators + two counters), spillable sort. max(0, ·) is
    // written as a strict `> 0` branch on BOTH engines so a tie at
    // exactly 0 yields literal 0.0, never GREATEST's −0.0 ambiguity.
    // Same IEEE op sequence both sides → bit-equal; the oracle replays
    // the 4-column recurrence as a recursive CTE.
    Q("t29_cusum",
      (s, d) => {
        val ev = graft.core.SeqFold.keyedEvents(events(s, d),
          col("user_id"), unix_micros(col("ts")), col("event_id"),
          col("value"))
        // state: (s_up, s_dn, alarms_up, alarms_dn)
        def stepFn(st: (Double, Double, Long, Long), x: Double) = {
          val tu = { val z = st._1 + (x - 60.0); if (z > 0.0) z else 0.0 }
          val td = { val z = st._2 + (40.0 - x); if (z > 0.0) z else 0.0 }
          (if (tu >= 200.0) 0.0 else tu,
            if (td >= 200.0) 0.0 else td,
            st._3 + (if (tu >= 200.0) 1L else 0L),
            st._4 + (if (td >= 200.0) 1L else 0L))
        }
        graft.core.SeqFold.foldVec(ev)(
            e => stepFn((0.0, 0.0, 0L, 0L), e.v))(
            (st, e) => stepFn(st, e.v))(
            (_, _, st) => Some(Array(st._1, st._2,
              st._3.toDouble, st._4.toDouble)))
          .select(col("k").as("user_id"), col("n").as("n_events"),
            col("out").getItem(2).cast("long").as("alarms_up"),
            col("out").getItem(3).cast("long").as("alarms_dn"),
            round(col("out").getItem(0), 6).as("cusum_up"),
            round(col("out").getItem(1), 6).as("cusum_dn"))
          .orderBy(col("user_id"))
      },
      Some("""WITH RECURSIVE ev AS MATERIALIZED (
             |  SELECT user_id, value,
             |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |  FROM events),
             |mx AS (SELECT user_id, MAX(rn) AS n FROM ev GROUP BY 1),
             |r AS (
             |  SELECT user_id, rn,
             |    CASE WHEN (CASE WHEN 0.0 + (value - 60.0) > 0.0
             |        THEN 0.0 + (value - 60.0) ELSE 0.0 END) >= 200.0 THEN 0.0
             |      ELSE (CASE WHEN 0.0 + (value - 60.0) > 0.0
             |        THEN 0.0 + (value - 60.0) ELSE 0.0 END) END AS su,
             |    CASE WHEN (CASE WHEN 0.0 + (40.0 - value) > 0.0
             |        THEN 0.0 + (40.0 - value) ELSE 0.0 END) >= 200.0 THEN 0.0
             |      ELSE (CASE WHEN 0.0 + (40.0 - value) > 0.0
             |        THEN 0.0 + (40.0 - value) ELSE 0.0 END) END AS sd,
             |    CASE WHEN (CASE WHEN 0.0 + (value - 60.0) > 0.0
             |        THEN 0.0 + (value - 60.0) ELSE 0.0 END) >= 200.0
             |      THEN 1 ELSE 0 END AS au,
             |    CASE WHEN (CASE WHEN 0.0 + (40.0 - value) > 0.0
             |        THEN 0.0 + (40.0 - value) ELSE 0.0 END) >= 200.0
             |      THEN 1 ELSE 0 END AS ad
             |  FROM ev WHERE rn = 1
             |  UNION ALL
             |  SELECT e.user_id, e.rn,
             |    CASE WHEN (CASE WHEN r.su + (e.value - 60.0) > 0.0
             |        THEN r.su + (e.value - 60.0) ELSE 0.0 END) >= 200.0 THEN 0.0
             |      ELSE (CASE WHEN r.su + (e.value - 60.0) > 0.0
             |        THEN r.su + (e.value - 60.0) ELSE 0.0 END) END,
             |    CASE WHEN (CASE WHEN r.sd + (40.0 - e.value) > 0.0
             |        THEN r.sd + (40.0 - e.value) ELSE 0.0 END) >= 200.0 THEN 0.0
             |      ELSE (CASE WHEN r.sd + (40.0 - e.value) > 0.0
             |        THEN r.sd + (40.0 - e.value) ELSE 0.0 END) END,
             |    r.au + CASE WHEN (CASE WHEN r.su + (e.value - 60.0) > 0.0
             |        THEN r.su + (e.value - 60.0) ELSE 0.0 END) >= 200.0
             |      THEN 1 ELSE 0 END,
             |    r.ad + CASE WHEN (CASE WHEN r.sd + (40.0 - e.value) > 0.0
             |        THEN r.sd + (40.0 - e.value) ELSE 0.0 END) >= 200.0
             |      THEN 1 ELSE 0 END
             |  FROM r JOIN ev e ON e.user_id = r.user_id AND e.rn = r.rn + 1)
             |SELECT m.user_id, m.n AS n_events,
             |  CAST(r.au AS BIGINT) AS alarms_up, CAST(r.ad AS BIGINT) AS alarms_dn,
             |  ROUND(r.su, 6) AS cusum_up, ROUND(r.sd, 6) AS cusum_dn
             |FROM mx m JOIN r ON r.user_id = m.user_id AND r.rn = m.n
             |ORDER BY m.user_id""".stripMargin)),

    // Running-peak max drawdown per series (the risk/stability metric:
    // how far below its historical peak did the series ever fall). A
    // prefix MAX is window-expressible, so this is NOT a SeqFold case —
    // the idiomatic distributed plan is one user-keyed shuffle + a
    // per-user running-max frame (O(1) window state), then a plain
    // per-user aggregate. peak − value subtracts two observed doubles —
    // deterministic on both engines; max picks one.
    Q("t30_drawdown",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tsu"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
            col("event_id"), col("value"))
          .withColumn("peak", max(col("value")).over(w))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            round(max(col("peak") - col("value")), 6).as("max_drawdown"),
            round(max(col("peak")), 6).as("peak_value"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, event_id, value
             |  FROM events),
             |p AS (SELECT user_id, value,
             |    MAX(value) OVER (PARTITION BY user_id ORDER BY tsu, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
             |  FROM e)
             |SELECT user_id, COUNT(*) AS n_events,
             |  ROUND(MAX(peak - value), 6) AS max_drawdown,
             |  ROUND(MAX(peak), 6) AS peak_value
             |FROM p GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Lag-1 autocorrelation per series (is each user's VALUE signal
    // trending/mean-reverting or white noise? — the number that
    // justifies t18/t27's smoothing constants; t13_daily_acf is the
    // different axis: lag-1..7 ACF of the single global daily VOLUME
    // series): Pearson over consecutive (xᵢ, xᵢ₊₁) pairs.
    // One user-keyed shuffle; LAG is an O(1)-state frame; all six
    // moment sums accumulate in DECIMAL(27,6) (the a35 quantize-then-
    // sum pattern — double products are bit-identical cross-engine, the
    // decimal cast rounds identically, the decimal SUM is order-free),
    // so r is one double expression over identical inputs. Degenerate
    // series (under 2 pairs, zero variance) are out of contract —
    // filtered by the same predicate on both engines.
    Q("t31_autocorr",
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val dec = DecimalType(27, 6)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tsu"), col("event_id"))
        val m = events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
            col("event_id"), col("value").as("y"))
          .withColumn("x", lag(col("y"), 1).over(w))
          .where(col("x").isNotNull)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("np"),
            sum(col("x").cast(dec)).cast("double").as("sx"),
            sum(col("y").cast(dec)).cast("double").as("sy"),
            sum((col("x") * col("x")).cast(dec)).cast("double").as("sxx"),
            sum((col("y") * col("y")).cast(dec)).cast("double").as("syy"),
            sum((col("x") * col("y")).cast(dec)).cast("double").as("sxy"))
        val vx = col("np") * col("sxx") - col("sx") * col("sx")
        val vy = col("np") * col("syy") - col("sy") * col("sy")
        m.where(col("np") >= 2 && vx > 0 && vy > 0)
          .select(col("user_id"), col("np").as("n_pairs"),
            round((col("np") * col("sxy") - col("sx") * col("sy")) /
              sqrt(vx * vy), 6).as("autocorr_lag1"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, event_id, value
             |  FROM events),
             |p AS (SELECT user_id, value AS y,
             |    LAG(value) OVER (PARTITION BY user_id ORDER BY tsu, event_id)
             |      AS x
             |  FROM e),
             |m AS (SELECT user_id, COUNT(*) AS np,
             |    CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(y AS DECIMAL(27,6))) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(x*x AS DECIMAL(27,6))) AS DOUBLE) AS sxx,
             |    CAST(SUM(CAST(y*y AS DECIMAL(27,6))) AS DOUBLE) AS syy,
             |    CAST(SUM(CAST(x*y AS DECIMAL(27,6))) AS DOUBLE) AS sxy
             |  FROM p WHERE x IS NOT NULL GROUP BY 1)
             |SELECT user_id, np AS n_pairs,
             |  ROUND((np*sxy - sx*sy) /
             |    SQRT((np*sxx - sx*sx) * (np*syy - sy*sy)), 6) AS autocorr_lag1
             |FROM m
             |WHERE np >= 2 AND np*sxx - sx*sx > 0 AND np*syy - sy*sy > 0
             |ORDER BY 1""".stripMargin)),

    // 1-D local-level Kalman filter per series (t18's EWMA with a
    // LEARNED gain — the filter converges its own smoothing factor from
    // the noise model): K = (P+q)/(P+q+r), l' = l + K·(x−l),
    // P' = (1−K)·(P+q), with q = 1 (process noise), r = 4 (observation
    // noise); seed l = x₁, P = r. The gain makes each step depend on
    // the EVOLVING P — genuinely sequential, like t29's reset. Rides
    // core.SeqFold.foldVec: O(1) per-user state (l, P). The Scala fold
    // binds K once; the oracle's recursive CTE recomputes the K
    // expression verbatim — same ops, same doubles (t27's precedent),
    // so the filtered level is bit-equal cross-engine.
    Q("t32_kalman",
      (s, d) => {
        val ev = graft.core.SeqFold.keyedEvents(events(s, d),
          col("user_id"), unix_micros(col("ts")), col("event_id"),
          col("value"))
        graft.core.SeqFold.foldVec(ev)(
            e => Array(e.v, 4.0))(
            (st, e) => {
              val k = (st(1) + 1.0) / (st(1) + 1.0 + 4.0)
              Array(st(0) + k * (e.v - st(0)), (1.0 - k) * (st(1) + 1.0))
            })(
            (_, _, st) => Some(st))
          .select(col("k").as("user_id"), col("n").as("n_events"),
            round(col("out").getItem(0), 6).as("kalman_level"),
            round(col("out").getItem(1), 6).as("kalman_var"))
          .orderBy(col("user_id"))
      },
      Some("""WITH RECURSIVE ev AS MATERIALIZED (
             |  SELECT user_id, value,
             |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |  FROM events),
             |mx AS (SELECT user_id, MAX(rn) AS n FROM ev GROUP BY 1),
             |r AS (
             |  SELECT user_id, rn, CAST(value AS DOUBLE) AS l,
             |    CAST(4.0 AS DOUBLE) AS p
             |  FROM ev WHERE rn = 1
             |  UNION ALL
             |  SELECT e.user_id, e.rn,
             |    r.l + ((r.p + 1.0) / (r.p + 1.0 + 4.0)) * (e.value - r.l),
             |    (1.0 - ((r.p + 1.0) / (r.p + 1.0 + 4.0))) * (r.p + 1.0)
             |  FROM r JOIN ev e ON e.user_id = r.user_id AND e.rn = r.rn + 1)
             |SELECT m.user_id, m.n AS n_events,
             |  ROUND(r.l, 6) AS kalman_level, ROUND(r.p, 6) AS kalman_var
             |FROM mx m JOIN r ON r.user_id = m.user_id AND r.rn = m.n
             |ORDER BY m.user_id""".stripMargin)),

    // Kaplan–Meier survival curve over user lifetimes (the churn
    // analysis t4's retention cohorts approximate — KM handles RIGHT
    // CENSORING correctly: a user still active at observation end is
    // "at risk" up to their observed lifetime but never counted as
    // churned, which naive retention gets wrong). Lifetime = HOURS
    // between a user's first and last event (integer div — exact; the
    // fixture spans ~30 days, so hours is the grid where the curve has
    // resolution); churned iff inactive ≥ 12 h at corpus end, else
    // censored — the fixture's inactivity p90 is ~17 h, so both
    // branches are populated at every SF.
    // S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over death times, where the
    // at-risk counts come from a suffix sum over the DURATION
    // HISTOGRAM — bounded by the day grid, never users. The KM product
    // is inherently ordered, and the curve frame is day-grid-bounded,
    // so it folds on the driver (the audited S7 bounded-collect class,
    // require-capped): both engines multiply the identical doubles in
    // ascending duration order — Scala fold here, recursive CTE there —
    // so the curve is bit-equal. Row-scale work is ONE user-keyed
    // aggregate; everything after is O(days).
    Q("t33_kaplan_meier",
      (s, d) => {
        val HourUs = 3600000000L
        val ev = events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("tsu"))
        val users = ev.groupBy(col("user_id"))
          .agg(min(col("tsu")).as("f"), max(col("tsu")).as("l"))
        val lab = graft.core.Relational.attachSingleton(users,
            ev.agg(max(col("tsu")).as("ce")))
          .select(expr(s"CAST((l - f) div $HourUs AS BIGINT)").as("dur"),
            when(col("ce") - col("l") >= lit(12L * HourUs), 1L).otherwise(0L)
              .as("death"))
        val h = lab.groupBy(col("dur"))
          .agg(count(lit(1)).as("n_all"), sumLong(col("death")).as("dd"))
        val w = Window.orderBy(col("dur").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val deaths = h
          .withColumn("n_risk", sum(col("n_all")).over(w))
          .where(col("dd") > 0)
          .select(col("dur"), col("n_risk"), col("dd"))
          .orderBy(col("dur"))
          .collect()
        require(deaths.length <= 100000,
          s"t33: death-time grid ${deaths.length} exceeds the curve cap")
        var sAcc = 1.0
        val curve = deaths.map { r =>
          val (dur, nRisk, dd) = (r.getLong(0), r.getLong(1), r.getLong(2))
          sAcc = sAcc * (1.0 - dd.toDouble / nRisk)
          (dur, nRisk, dd, sAcc)
        }.toSeq
        val s2 = s; import s2.implicits._
        curve.toDF("duration_hours", "n_at_risk", "n_deaths", "s")
          .select(col("duration_hours"), col("n_at_risk"), col("n_deaths"),
            round(col("s"), 6).as("km_survival"))
          .orderBy(col("duration_hours"))
      },
      Some("""WITH RECURSIVE e AS (SELECT user_id, epoch_us(ts) AS tsu
             |  FROM events),
             |u AS (SELECT user_id, MIN(tsu) AS f, MAX(tsu) AS l
             |  FROM e GROUP BY 1),
             |ce AS (SELECT MAX(tsu) AS ce FROM e),
             |lab AS (SELECT (l - f) // 3600000000 AS dur,
             |    CASE WHEN ce - l >= 12 * 3600000000 THEN 1 ELSE 0 END
             |      AS death
             |  FROM u CROSS JOIN ce),
             |h AS (SELECT dur, COUNT(*) AS n_all,
             |    CAST(SUM(death) AS BIGINT) AS d FROM lab GROUP BY 1),
             |r AS (SELECT dur, d, CAST(SUM(n_all) OVER (ORDER BY dur DESC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS n_risk
             |  FROM h),
             |dd AS (SELECT dur, n_risk, d,
             |    ROW_NUMBER() OVER (ORDER BY dur) AS rn
             |  FROM r WHERE d > 0),
             |km AS (
             |  SELECT dur, n_risk, d, rn,
             |    CAST(1.0 * (1.0 - CAST(d AS DOUBLE) / n_risk) AS DOUBLE) AS s
             |  FROM dd WHERE rn = 1
             |  UNION ALL
             |  SELECT dd.dur, dd.n_risk, dd.d, dd.rn,
             |    km.s * (1.0 - CAST(dd.d AS DOUBLE) / dd.n_risk)
             |  FROM km JOIN dd ON dd.rn = km.rn + 1)
             |SELECT dur AS duration_hours, n_risk AS n_at_risk,
             |  d AS n_deaths, ROUND(s, 6) AS km_survival
             |FROM km ORDER BY 1""".stripMargin)),

    // Holt-Winters ADDITIVE seasonal smoothing over the per-type daily
    // series (t27's Holt + a rotating length-7 seasonal register —
    // proving SeqFold's O(1)-per-key contract extends to O(period)
    // fixed-width state, still independent of the key's event count).
    // Recurrence (α=0.3, β=0.1, γ=0.2, m=7, positional seasons over
    // OBSERVED days — gaps advance the register by position, a
    // documented convention, not calendar-filled):
    //   l' = α(x − s_old) + (1−α)(l + b)
    //   b' = β(l' − l) + (1−β)b
    //   s' = γ(x − l − b) + (1−γ)s_old ; register = tail ++ [s']
    // seeded l=x₁, b=0, s=0⁷ (the uniform t27-style convention both
    // engines replay verbatim). Keys are event types — SeqFold wants a
    // long key, so the ≤5-value vocabulary gets a dense rank from
    // withGlobalRank (mirrored by DENSE_RANK in the oracle) and maps
    // back after the fold via a broadcast-sized join. Daily x is a
    // decimal-exact sum cast to double; every step is the identical
    // IEEE op sequence on both engines (oracle: recursive CTE carrying
    // the seasonal register as a DOUBLE list). Forecast = l + b + head
    // of the rotated register (the next day's seasonal slot).
    Q("t34_holt_winters",
      (s, d) => {
        val daily = events(s, d)
          .groupBy(col("event_type"),
            date_trunc("day", col("ts")).as("day"))
          .agg(sumExact(col("value")).as("x"))
        val vocab = graft.core.Relational.withGlobalRank(
            daily.select(col("event_type")).distinct(),
            Seq(col("event_type")), "k", "__tot")
          .select(col("event_type"), col("k"))
        val keyed = daily.join(broadcast(vocab), Seq("event_type"))
        val ev = graft.core.SeqFold.keyedEvents(keyed,
          col("k"), unix_micros(col("day")), lit(0L), col("x"))
        val m = 7
        def step(st: (Double, Double, Vector[Double]), x: Double) = {
          val (l, b, sv) = st
          val sOld = sv.head
          val lN = 0.3 * (x - sOld) + 0.7 * (l + b)
          val bN = 0.1 * (lN - l) + 0.9 * b
          val sN = 0.2 * (x - l - b) + 0.8 * sOld
          (lN, bN, sv.tail :+ sN)
        }
        graft.core.SeqFold.foldVec(ev)(
            e => (e.v, 0.0, Vector.fill(m)(0.0)))(
            (st, e) => step(st, e.v))(
            (_, n, st) =>
              if (n >= 2) Some(Array(st._1 + st._2 + st._3.head)) else None)
          .join(broadcast(vocab), Seq("k"))
          .select(col("event_type"), col("n").as("n_days"),
            round(col("out").getItem(0), 6).as("hw_forecast"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH RECURSIVE d0 AS MATERIALIZED (
             |  SELECT event_type, date_trunc('day', ts) AS day,
             |    ${sumExactSql("value")} AS x
             |  FROM events GROUP BY 1, 2),
             |e AS MATERIALIZED (SELECT
             |    DENSE_RANK() OVER (ORDER BY event_type) AS k, event_type, x,
             |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
             |  FROM d0),
             |mx AS (SELECT event_type, MAX(rn) AS n FROM e GROUP BY 1
             |  HAVING MAX(rn) >= 2),
             |seed AS (SELECT event_type, 1 AS rn, CAST(x AS DOUBLE) AS l,
             |    CAST(0 AS DOUBLE) AS b,
             |    [CAST(0 AS DOUBLE), 0, 0, 0, 0, 0, 0] AS s
             |  FROM e WHERE rn = 1),
             |r AS (
             |  SELECT * FROM seed
             |  UNION ALL
             |  SELECT e.event_type, e.rn,
             |    0.3*(e.x - r.s[1]) + 0.7*(r.l + r.b),
             |    0.1*((0.3*(e.x - r.s[1]) + 0.7*(r.l + r.b)) - r.l) + 0.9*r.b,
             |    r.s[2:] || [0.2*(e.x - r.l - r.b) + 0.8*r.s[1]]
             |  FROM r JOIN e ON e.event_type = r.event_type AND e.rn = r.rn + 1)
             |SELECT m.event_type, m.n AS n_days,
             |  ROUND(r.l + r.b + r.s[1], 6) AS hw_forecast
             |FROM mx m JOIN r ON r.event_type = m.event_type AND r.rn = m.n
             |ORDER BY 1""".stripMargin)),

    // Seasonal STRENGTH per series (Hyndman's STL strength measure as
    // one-way ANOVA R² over the (dow, hour) factor: 1 − SSE_within/SST.
    // t14 profiles the seasonal means, t23 alarms on deviations from
    // them; this one answers whether the seasonal factor EXPLAINS the
    // series at all — the go/no-go input for t34's seasonal register
    // vs t27's plain Holt). Everything is one scan to the ≤168-cell
    // grid per type: per-cell decimal-exact moments; the per-cell SSE
    // terms fold via ROUND(…,9) → DECIMAL quantization (a27/a31's
    // order-free trick — an engine-ordered double sum over cells would
    // not hash-match); global moments re-aggregate the per-cell
    // DECIMALS (exact, order-free). Final ratio through Det.round6Bin
    // (the x31 repr-tie rule for ratio scores). */
    Q("t35_seasonal_strength",
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val dec = DecimalType(27, 6)
        val ev = events(s, d).select(col("event_type"),
          expr("weekday(ts)").cast("int").as("dow"),
          hour(col("ts")).as("hr"), col("value"))
        val cells = ev.groupBy(col("event_type"), col("dow"), col("hr"))
          .agg(count(col("value")).as("n_c"),
            sum(col("value").cast(dec)).as("sxd"),
            sum((col("value") * col("value")).cast(dec)).as("sxxd"))
        val per = cells
          .withColumn("sse_t",
            round(col("sxxd").cast("double")
              - col("sxd").cast("double") * col("sxd").cast("double")
                / col("n_c").cast("double"), 9)
              .cast(DecimalType(27, 9)))
          .groupBy(col("event_type"))
          .agg(sum(col("n_c")).as("n_events"), count(lit(1)).as("n_cells"),
            sum(col("sse_t")).cast("double").as("sse"),
            sum(col("sxd")).cast("double").as("sx"),
            sum(col("sxxd")).cast("double").as("sxx"))
        val sst = col("sxx") - col("sx") * col("sx") / col("n_events").cast("double")
        per.where(sst > 0)
          .select(col("event_type"), col("n_events"), col("n_cells"),
            graft.queries.Det.round6Bin(
              greatest(lit(0.0), lit(1.0) - col("sse") / sst))
              .as("seasonal_strength"))
          .orderBy(col("event_type"))
      },
      Some("""WITH cells AS (
             |  SELECT event_type, CAST(isodow(ts) - 1 AS INT) AS dow,
             |    EXTRACT(hour FROM ts) AS hr,
             |    COUNT(value) AS n_c,
             |    SUM(CAST(value AS DECIMAL(27,6))) AS sxd,
             |    SUM(CAST(value*value AS DECIMAL(27,6))) AS sxxd
             |  FROM events GROUP BY 1, 2, 3),
             |per AS (
             |  SELECT event_type, CAST(SUM(n_c) AS BIGINT) AS n_events,
             |    COUNT(*) AS n_cells,
             |    CAST(SUM(CAST(ROUND(CAST(sxxd AS DOUBLE)
             |      - CAST(sxd AS DOUBLE)*CAST(sxd AS DOUBLE)/CAST(n_c AS DOUBLE), 9)
             |      AS DECIMAL(27,9))) AS DOUBLE) AS sse,
             |    CAST(SUM(sxd) AS DOUBLE) AS sx,
             |    CAST(SUM(sxxd) AS DOUBLE) AS sxx
             |  FROM cells GROUP BY 1)
             |SELECT event_type, n_events, n_cells,
             |  ROUND(GREATEST(0, 1.0 - sse / (sxx - sx*sx/n_events)), 6)
             |    AS seasonal_strength
             |FROM per WHERE sxx - sx*sx/n_events > 0 ORDER BY 1""".stripMargin))
  )
}
