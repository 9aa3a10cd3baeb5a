package graft.queries

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Streaming queries: a bounded replay of the events table through a
  * real readStream → watermark → window → writeStream pipeline
  * (Trigger.AvailableNow, memory sink). The final table equals the batch
  * answer, so it IS DuckDB-oracle-checkable — stream/batch parity is the
  * correctness contract. */
object StreamQueries {
  import Det._

  val all: Seq[Q] = Seq(
    Q("st1_stream_window",
      (s, d) => {
        val sink = s"st1_sink_${System.nanoTime()}"
        EventStream.runWindowedOnce(s, s"$d/events.parquet", sink, window = "1 day")
          .select(
            date_format(col("window_start"), "yyyy-MM-dd").as("day"),
            col("event_type"), col("n"), col("sum_value"))
          .orderBy(col("day"), col("event_type"))
      },
      Some(s"""SELECT STRFTIME(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
              |COUNT(*) AS n, ${sumExactSql("value")} AS sum_value
              |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Stream-static broadcast enrichment through a real readStream replay;
    // the dim is data-derived (event_type → 3-char category) so the final
    // table has a pure-SQL twin.
    Q("st3_stream_enriched",
      (s, d) => {
        val sink = s"st3_sink_${System.nanoTime()}"
        EventStream.runEnrichedOnce(s, s"$d/events.parquet", sink, window = "1 day")
          .select(
            date_format(col("window_start"), "yyyy-MM-dd").as("day"),
            col("category"), col("n"), col("sum_value"))
          .orderBy(col("day"), col("category"))
      },
      Some(s"""SELECT STRFTIME(date_trunc('day', ts), '%Y-%m-%d') AS day,
              |UPPER(SUBSTRING(event_type, 1, 3)) AS category,
              |COUNT(*) AS n, ${sumExactSql("value")} AS sum_value
              |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Stateful streaming sessionization (flatMapGroupsWithState, event-time
    // timeout) replayed over the bounded events file, reduced to the
    // session-size histogram — the stream-side twin of st2. The oracle gap
    // compares MILLISECONDS (the stream state keys sessions off
    // Timestamp.getTime), unlike st2's second-granularity lag — the two
    // histograms differ where a gap sits between 1800.000s and 1800.999s.
    Q("st4_stream_sessions",
      (s, d) => {
        val sink = s"st4_sink_${System.nanoTime()}"
        EventStream.runSessionizeOnce(s, s"$d/events.parquet", sink)
          .groupBy(col("nEvents").cast("long").as("n_events"))
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
             |      OR date_diff('millisecond', prev_ts, ts) > 1800000 THEN 1 ELSE 0 END AS new_session
             |  FROM g),
             |sess AS (
             |  SELECT user_id,
             |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
             |  FROM f),
             |per AS (SELECT user_id, session_id, COUNT(*) AS n_events FROM sess GROUP BY 1, 2)
             |SELECT n_events, COUNT(*) AS n_sessions FROM per
             |GROUP BY 1 ORDER BY 1""".stripMargin)))
}
