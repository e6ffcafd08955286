package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over the `events` fixture (SURVEY §2.10).
  *
  * The reference models time relationally (year partition columns,
  * batch-incremental appends — `lakehouse_data_igestion.py:148-169`); these
  * operators provide the event-time aggregation surface a pipeline engine
  * needs, using the batch `window()` function so the same code shape lifts
  * to Structured Streaming (`readStream` + `withWatermark`) unchanged —
  * see [[graft.streaming.Streams]] for the streaming form.
  *
  * Scale: tumbling/sliding windows are plain hash aggregations on
  * (window, keys) — one shuffle, partial aggregation map-side.
  * Sessionization is a window-function scan per user partition — one
  * shuffle on `user_id`, no driver state.
  */
object Events {

  /** Tumbling event-time aggregation: one row per (window-start, key). */
  def tumbling(events: DataFrame, size: String, keys: Seq[Column],
               aggs: Seq[Column]): DataFrame =
    events
      .groupBy(window(col("ts"), size) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("ws", col("window.start"))
      .drop("window")

  /** Sliding event-time aggregation (size/slide), e.g. hourly windows every
    * 30 minutes. Spark expands each event into size/slide window copies
    * before aggregating.
    */
  def sliding(events: DataFrame, size: String, slide: String,
              keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    events
      .groupBy(window(col("ts"), size, slide) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("ws", col("window.start"))
      .drop("window")

  /** Temporal train/test split audit: split events at `boundary` (train =
    * strictly before) and report, per event type, the split sizes plus
    * how many users LEAK across the boundary (appear on both sides for
    * that type) — the contamination check run before training on
    * time-split behavioral data. Output: (event_type, n_train, n_test,
    * n_leak_users).
    *
    * Scale: the split counts are one hash aggregation over indicator
    * sums; the leak count aggregates the (type, user) frame — bounded by
    * distinct users × types, not events — produced by the same shuffle
    * key family. No driver state, no second scan of the fact.
    */
  def temporalSplitAudit(events: DataFrame, boundary: Column): DataFrame = {
    val flagged = graft.ops.Frames.cached(events.select(col("event_type"),
      col("user_id"),
      when(col("ts") < boundary, 1L).otherwise(0L).as("is_train")))
    val sizes = flagged.groupBy("event_type")
      .agg(sum(col("is_train")).as("n_train"),
        sum(lit(1L) - col("is_train")).as("n_test"))
    val leaks = flagged.groupBy("event_type", "user_id")
      .agg(sum(col("is_train")).as("tr"),
        sum(lit(1L) - col("is_train")).as("te"))
      .where(col("tr") > 0 && col("te") > 0)
      .groupBy("event_type").agg(count(lit(1)).as("n_leak_users"))
    sizes.join(leaks, Seq("event_type"), "left")
      .select(col("event_type"), col("n_train"), col("n_test"),
        coalesce(col("n_leak_users"), lit(0L)).as("n_leak_users"))
  }

  /** Purged walk-forward cross-validation plan: for each test fold
    * (week `fold` from `originUs`, width `foldUs`), count the events in
    * train (strictly before the fold minus the embargo window), embargo
    * (the `embargoUs` just before the fold — excluded from train so
    * look-ahead features can't leak), and test (inside the fold) — the
    * time-series CV discipline (de Prado's purged k-fold, walk-forward
    * form). Output: (fold, n_train, n_embargo, n_test).
    *
    * Scale: one cross join against the |folds|-row broadcast spine and
    * one indicator aggregation — exact integer microsecond comparisons,
    * engine-portable by construction.
    */
  def purgedWalkForward(events: DataFrame, tsCol: Column, originUs: Long,
                        foldUs: Long, embargoUs: Long,
                        folds: Seq[Int]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val us = col("us")
    val fstart = lit(originUs) + col("fold") * lit(foldUs)
    events.select(unix_micros(tsCol).as("us"))
      .crossJoin(broadcast(folds.toDF("fold")))
      .groupBy("fold")
      .agg(
        sum(when(us < fstart - lit(embargoUs), 1L).otherwise(0L))
          .as("n_train"),
        sum(when(us >= fstart - lit(embargoUs) && us < fstart, 1L)
          .otherwise(0L)).as("n_embargo"),
        sum(when(us >= fstart && us < fstart + lit(foldUs), 1L)
          .otherwise(0L)).as("n_test"))
  }

  /** Gaps-and-islands sessionization: a new session starts when the gap to
    * the previous event of the same user exceeds `gapSeconds`. Session id =
    * running count of session-starts per user (deterministic: ordered by
    * (ts, event_id)).
    */
  def sessionize(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gap = unix_timestamp(col("ts")) -
      unix_timestamp(lag(col("ts"), 1).over(byUser))
    events
      .withColumn("is_new",
        when(lag(col("ts"), 1).over(byUser).isNull || gap > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("is_new")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
