package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-Streaming counterparts of the batch event-time operators
  * (extension beyond the reference, which is batch-only — SURVEY.md §2.10:
  * its closest analogue is batch-incremental year appends). The same
  * transform works on a batch frame and a `readStream` frame, so these
  * helpers take any DataFrame; with a streaming source the aggregations
  * run incrementally with watermark-bounded state.
  *
  * Scale notes: event-time windows shuffle on (window, keys); the
  * watermark bounds state size — without it a streaming groupBy's state
  * grows forever. `session_window` merges per-key gap sessions with state
  * cleanup driven by the same watermark.
  */
object Streams {

  /** Tumbling event-time counts with a watermark for late data. */
  def tumblingCounts(events: DataFrame, tsCol: String, size: String,
                     watermark: String, keys: Seq[Column]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), size) +: keys: _*)
      .agg(count(lit(1)).as("n"))
      .select(
        (col("window.start").as("win_start") +:
          col("window.end").as("win_end") +:
          keys) :+ col("n"): _*)

  /** Sliding event-time counts. */
  def slidingCounts(events: DataFrame, tsCol: String, size: String,
                    slide: String, watermark: String, keys: Seq[Column]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), size, slide) +: keys: _*)
      .agg(count(lit(1)).as("n"))
      .select(
        (col("window.start").as("win_start") +:
          col("window.end").as("win_end") +:
          keys) :+ col("n"): _*)

  /** Gap-based sessionization via the built-in `session_window` — the
    * declarative form of mapGroupsWithState session logic: per key,
    * events closer than `gap` merge into one session.
    */
  def sessions(events: DataFrame, tsCol: String, gap: String,
               keys: Seq[Column]): DataFrame =
    events
      .withWatermark(tsCol, gap)
      .groupBy(session_window(col(tsCol), gap) +: keys: _*)
      .agg(count(lit(1)).as("n_events"))
      .select(
        (col("session_window.start").as("sess_start") +:
          col("session_window.end").as("sess_end") +:
          keys) :+ col("n_events"): _*)
}
