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
      }),

    // Streaming session_window (30-min gap merge, per user) in APPEND
    // mode — the only mode session windows support — which emits a
    // session only once the watermark passes it: the source is staged
    // with a far-future sentinel event (StreamRun.eventsStreamFlushed)
    // so the closing watermark flushes every real session, the
    // end-of-stream marker pattern for replaying a finite log. The
    // oracle derives the same sessions with a lag-gap scan — all
    // arithmetic in exact integer MICROseconds (fixture timestamps are
    // µs-precision, checked: epoch_ns % 1000 = 0), session_end = last
    // event + gap, like session_window's window.end.
    Q("q74_stream_sessions", Q.sql("""
        WITH seq AS (
          SELECT user_id, ts,
            CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                 THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
          SELECT user_id, ts,
            sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
          FROM seq)
        SELECT make_timestamp(epoch_us(min(ts))) AS sess_start,
          make_timestamp(epoch_us(max(ts)) + 1800000000) AS sess_end,
          user_id, count(*) AS n_events
        FROM sess
        GROUP BY user_id, session_seq
        ORDER BY user_id, sess_start"""))(
      (s, dir) => {
        val sess = Streams.sessions(
          StreamRun.eventsStreamFlushed(s, dir), "ts", "30 minutes",
          keys = Seq(col("user_id")))
        StreamRun.runToTable("q74_sink", sess, OutputMode.Append())
          .where(col("user_id") =!= -1)
          .orderBy("user_id", "sess_start")
      })
  )
}
