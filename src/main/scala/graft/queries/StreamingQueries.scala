package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{StreamRun, Streams}

/** Structured-Streaming operators under the driver's DuckDB hash gate
  * (SURVEY §2.10 extension): each query executes a REAL streaming run —
  * `readStream` source, stateful operator, memory sink, AvailableNow
  * trigger — and returns the finite result, which must hash-match the
  * batch-semantics oracle. Streaming correctness here means exactly the
  * replay guarantee a production backfill relies on: the streaming and
  * batch answers agree bit-for-bit.
  */
object StreamingQueries {

  def all: Seq[Q] = Seq(

    // Tumbling 1h event-time counts computed BY A STREAM: watermarked
    // window aggregation in Complete mode (see StreamRun for why Append
    // would withhold the tail windows on a finite source).
    Q("q64_stream_tumbling", Q.sql("""
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start,
          CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS win_end,
          event_type, count(*) AS n
        FROM events
        GROUP BY 1, 2, 3
        ORDER BY win_start, event_type"""))(
      (s, dir) => {
        val win = Streams.tumblingCounts(
          StreamRun.eventsStream(s, dir), "ts", "1 hour",
          watermark = "1 hour", keys = Seq(col("event_type")))
        StreamRun.runToTable("q64_sink", win, OutputMode.Complete())
          .orderBy("win_start", "event_type")
      }),

    // Streaming stateful deduplication (dropDuplicates keeps first
    // arrival per key in state; Append emits each key once). The
    // projection runs BEFORE the dedup so state holds only the key pair.
    Q("q65_stream_dedup", Q.sql("""
        SELECT DISTINCT user_id, event_type
        FROM events
        ORDER BY user_id, event_type"""))(
      (s, dir) => {
        val dd = StreamRun.eventsStream(s, dir)
          .select("user_id", "event_type")
          .dropDuplicates("user_id", "event_type")
        StreamRun.runToTable("q65_sink", dd, OutputMode.Append())
          .orderBy("user_id", "event_type")
      })
  )
}
