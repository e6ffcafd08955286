package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponentially-weighted moving average over a keyed daily series — the
  * trend-smoothing operator behind drift dashboards and per-source
  * volume monitoring.
  *
  * Formulation: the weighted (pandas `adjust=True`) form with decay 1/2
  * per day, `ewma_t = Σ_{j<=t} 2^-(t-j)·x_j / Σ_{j<=t} 2^-(t-j)`,
  * window-capped at `horizon` days back (weights below 2^-horizon are
  * noise; capping bounds the operator regardless of history length).
  *
  * Scale shape (100 TB): the recurrence is re-expressed as a BANDED
  * self-join — each observation joins only observations of the same key
  * within `horizon` days, so cost is rows × horizon, never rows², and
  * the join co-partitions on the key (one shuffle each side). No window
  * over an unbounded frame, no sequential per-key scan, no driver state.
  *
  * Determinism — exact integer arithmetic, no intermediate rounding:
  * both numerator and denominator are INTEGER sums. Values are scaled to
  * units of 10^-`valScale` (exact for decimal-derived inputs), weights
  * become 2^(horizon-1-dt) (exact integers), and the single division at
  * the end is one fixed IEEE expression. A double-rounding formulation
  * (round each term, decimal-sum) was measurably engine-divergent at
  * half-way boundaries; integer sums cannot diverge. Numerator bound:
  * |x|·10^valScale·2^(horizon-1)·horizon must stay well under 10^38
  * (decimal-routed) — huge headroom for daily aggregates.
  */
object TimeSeries {

  /** `daily`: one row per (key, day) with a value column holding at most
    * `valScale` meaningful decimals (e.g. a decimal-routed daily sum).
    * Returns (key, day, ewma) smoothing over the trailing `horizon` days
    * with decay 1/2 per day.
    */
  def ewma(daily: DataFrame, keyCol: Column, dayCol: Column, valCol: Column,
           horizon: Int = 30, valScale: Int = 4): DataFrame = {
    val unit = math.pow(10, valScale)
    val cur = daily.select(keyCol.as("key"), dayCol.as("day"))
    val past = daily.select(keyCol.as("k_b"), dayCol.as("day_b"),
      valCol.as("x_b"))
    val dt = datediff(col("day"), col("day_b"))
    cur.join(past,
        col("key") === col("k_b") &&
          col("day_b") <= col("day") &&
          datediff(col("day"), col("day_b")) < horizon)
      .select(col("key"), col("day"),
        round(col("x_b") * unit, 0).cast("long").as("m"),
        pow(lit(2.0), lit(horizon - 1) - dt).cast("long").as("wi"))
      .groupBy(col("key"), col("day"))
      .agg(round(
        sum((col("m") * col("wi")).cast("decimal(38,0)")).cast("double") /
          (sum(col("wi")).cast("double") * lit(unit)), 6).as("ewma"))
  }

  /** DuckDB CTE replaying [[ewma]] over a daily CTE named `from` with
    * columns (k, day, x). Emits (key, day, ewma).
    */
  def oracleSql(from: String, horizon: Int = 30, valScale: Int = 4): String = {
    val unit = s"${math.pow(10, valScale).toLong}.0"
    val dt = "date_diff('day', b.day, a.day)"
    val wi = s"CAST(power(2, ${horizon - 1} - $dt) AS BIGINT)"
    s"""SELECT a.k AS key, a.day AS day,
       round(
         CAST(sum(CAST(round(b.x * $unit) AS BIGINT) * $wi) AS DOUBLE) /
         (CAST(sum($wi) AS DOUBLE) * $unit), 6) AS ewma
       FROM $from a JOIN $from b
         ON a.k = b.k AND b.day <= a.day AND $dt < $horizon
       GROUP BY 1, 2"""
  }

  /** Merged-interval coverage per key (the sweep-line union classic —
    * "how much wall-clock was this user actually active", session-tape
    * union, SLA-window math): overlapping or touching intervals merge
    * into islands; output is one row per key with
    * (n_intervals, n_islands, coverage) in the caller's units.
    *
    * Island detection is the gaps-and-islands form: an interval starts a
    * new island iff its start exceeds the running maximum end of every
    * earlier interval (ties/touching merge). Both windows are
    * PARTITIONED BY key — per-key interval counts bound the frames
    * (events per user, sessions per device), never the table; the two
    * follow-up aggregations are ordinary hash aggs.
    *
    * Determinism: interval ordering carries the unique `uniqCol`
    * tie-break; all arithmetic is integer (pass integer start/end, e.g.
    * epoch micros).
    */
  def intervalCoverage(df: DataFrame, keyCol: Column, startCol: Column,
                       endCol: Column, uniqCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("key")).orderBy(col("s"), col("e"), col("u"))
    val prevMax = max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    df.select(keyCol.as("key"), startCol.as("s"), endCol.as("e"),
        uniqCol.as("u"))
      // sentinel-free first-row handling: `s > NULL` is NULL, coalesced
      // to true — a key's first interval always opens an island, for ANY
      // start value (incl. pre-1970 negatives a MinValue sentinel-style
      // comparison could mishandle in an oracle replay)
      .withColumn("new_island",
        coalesce(col("s") > prevMax, lit(true)).cast("long"))
      .withColumn("island",
        sum(col("new_island")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("key"), col("island"))
      .agg(min(col("s")).as("i_start"), max(col("e")).as("i_end"),
        count(lit(1)).as("n_iv"))
      .groupBy("key")
      .agg(sum(col("n_iv")).as("n_intervals"), count(lit(1)).as("n_islands"),
        sum(col("i_end") - col("i_start")).as("coverage"))
  }
}
