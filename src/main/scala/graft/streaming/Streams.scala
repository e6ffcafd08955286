package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
// Serializable: flatMapGroupsWithState functions are nested defs lifted
// onto this object, so the task closure carries the (stateless) singleton.
object Streams extends Serializable {

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

  /** A closed session emitted by [[sessionsWithState]]. */
  final case class Session(user: String, start: Long, end: Long, nEvents: Long)

  /** Internal running-session state for [[sessionsWithState]] (public:
    * the state encoder's generated code must reach the accessors).
    */
  final case class SessState(start: Long, last: Long, n: Long)

  /** Gap-based sessionization with EXPLICIT state —
    * `flatMapGroupsWithState` — for session logic the declarative
    * `session_window` can't express (custom close conditions, per-session
    * side outputs, state beyond counters). Input: (user, epochSeconds).
    * Emits a [[Session]] when a later event exceeds the gap; the open
    * session stays in state (per key: one [[SessState]] — bounded). In
    * production add `withWatermark` upstream and
    * `GroupStateTimeout.EventTimeTimeout` so idle sessions flush and
    * state is reclaimed; omitted here because the tuple input carries no
    * timestamp column.
    */
  def sessionsWithState(events: Dataset[(String, Long)], gapSeconds: Long): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessState]
    implicit val stringEnc = Encoders.STRING

    def fn(user: String, rows: Iterator[(String, Long)],
           state: GroupState[SessState]): Iterator[Session] = {
      val ts = rows.map(_._2).toArray.sorted
      val out = Seq.newBuilder[Session]
      var cur = state.getOption
      ts.foreach { t =>
        cur match {
          case Some(s) if t - s.last <= gapSeconds =>
            // merge; min/max so a LATE event (t < s.last, possible across
            // micro-batches with no watermark) extends the session rather
            // than regressing `last` and breaking the next gap computation
            cur = Some(SessState(math.min(s.start, t), math.max(s.last, t), s.n + 1))
          case Some(s) =>
            out += Session(user, s.start, s.last, s.n)
            cur = Some(SessState(t, t, 1))
          case None =>
            cur = Some(SessState(t, t, 1))
        }
      }
      cur.foreach(state.update)
      out.result().iterator
    }

    events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(fn _)
  }

  /** A row emitted by [[earliestKWithState]]. */
  final case class Capped(user_id: Long, ts_us: Long, event_id: Long)

  /** Bounded per-key buffer state for [[earliestKWithState]] (public for
    * the state encoder's generated code).
    */
  final case class CapBuf(items: Seq[Capped])

  /** Event-time timeout far past every real event (2090-01-01 UTC) but
    * before the end-of-stream sentinel (2100) that advances the final
    * watermark — so all buffers flush exactly once, at end of replay.
    */
  private val FlushAtMs: Long =
    java.time.Instant.parse("2090-01-01T00:00:00Z").toEpochMilli

  /** Streaming per-key earliest-k with EXPLICIT bounded state: keep each
    * user's `cap` first events by (ts, event_id), emitting nothing until
    * the watermark passes the flush timeout — the custom-state form of a
    * per-source document cap ([[graft.ops.Sampling.capPerGroup]]) running
    * on a live stream. State per key is O(cap) (a sorted buffer), cleaned
    * up by `GroupStateTimeout.EventTimeTimeout` — this is the pattern for
    * any bounded-state streaming top-k/first-k. Requires a watermark
    * upstream; late events are merged correctly until the flush fires.
    * Equivalent to batch `row_number() <= cap` per user — the oracle.
    */
  def earliestKWithState(events: DataFrame, cap: Int,
                         watermark: String = "1 second"): Dataset[Capped] = {
    implicit val cappedEnc = Encoders.product[Capped]
    implicit val bufEnc = Encoders.product[CapBuf]
    implicit val tupleEnc = Encoders.tuple(
      Encoders.scalaLong, Encoders.TIMESTAMP, Encoders.scalaLong)
    implicit val keyEnc = Encoders.scalaLong

    // the watermarked `ts` column must SURVIVE into the grouping input —
    // projecting it away detaches the watermark and EventTimeTimeout is
    // rejected; µs extraction happens inside the state function instead
    val src = events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"),
        col("event_id").cast("long"))
      .as[(Long, java.sql.Timestamp, Long)]

    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

    def fn(user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long)],
           state: GroupState[CapBuf]): Iterator[Capped] = {
      if (state.hasTimedOut) {
        val out = state.get.items.sortBy(c => (c.ts_us, c.event_id))
        state.remove()
        out.iterator
      } else {
        val prev = state.getOption.map(_.items).getOrElse(Seq.empty)
        val merged = (prev ++ rows.map { case (u, t, id) => Capped(u, micros(t), id) })
          .sortBy(c => (c.ts_us, c.event_id)).take(cap)
        state.update(CapBuf(merged))
        // the timeout must stay strictly above the current watermark
        // (Spark rejects a stale timeout); the sentinel finally drives the
        // watermark past FlushAtMs and every buffer flushes
        state.setTimeoutTimestamp(
          math.max(FlushAtMs, state.getCurrentWatermarkMs() + 1))
        Iterator.empty
      }
    }

    src.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn _)
  }

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
