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
              |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)))
}
