package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed percentiles (reference A5 profiling companion —
  * `data_profiling.py` summarizes with approx quantiles; this is the
  * exact form under the oracle gate).
  *
  * Standard (n-1)*q rank interpolation over the sorted group, computed
  * with conditional aggregates instead of `percentile()` so the
  * arithmetic — `lo + (hi - lo) * f` — is written identically in the
  * DuckDB oracle and the result is bit-exact (built-in `percentile` /
  * `quantile_cont` interpolate with engine-specific expression shapes
  * whose last ulp can differ).
  *
  * Scale: one hash shuffle on the group keys, one within-group sort
  * (the unavoidable cost of EXACT percentiles — switch to a sketch when
  * bounded error is acceptable), one partial+final aggregation. No
  * driver-side data, no per-row UDFs.
  */
object Percentiles {

  /** One row per group: `keys..., <name> double` for each (name, q) in
    * `qs` (0 <= q <= 1). Percentile of `valueCol` (must be numeric;
    * compared/emitted as double). NULL values are excluded — the
    * standard percentile semantics, and the one point where engine
    * defaults diverge (Spark ranks NULLS FIRST, DuckDB NULLS LAST), so
    * both sides filter them before ranking.
    */
  def exact(df: DataFrame, keys: Seq[String], valueCol: Column,
            qs: Seq[(String, Double)]): DataFrame = {
    require(qs.nonEmpty, "qs must be non-empty")
    require(qs.forall { case (_, q) => q >= 0 && q <= 1 },
      s"quantiles must be in [0,1], got ${qs.map(_._2)}")
    val keyCols = keys.map(col)
    val sortW = Window.partitionBy(keyCols: _*).orderBy(col("v"))
    val cntW = Window.partitionBy(keyCols: _*)
    // r is the 0-based rank; ties keep arbitrary order, which is safe
    // because tied rows carry the identical value.
    val base = df
      .where(valueCol.isNotNull)
      .select(keyCols :+ valueCol.cast("double").as("v"): _*)
      .withColumn("r", row_number().over(sortW) - 1)
      .withColumn("n", count(lit(1)).over(cntW))
    val aggs = rankAggs(qs)
    val g = base.groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
    interpolate(g, qs)
      .select(keyCols ++ qs.map { case (name, _) => col(name) }: _*)
  }

  /** The (lo, hi, frac) conditional aggregates for each (name, q), over
    * a frame carrying `r` (0-based rank), `n` (group count), `v`
    * (double value) — ONE copy of the expression shape shared by
    * [[exact]], [[exactGlobal]], and [[Profile.summary]], so the engine
    * side cannot drift from the [[oracleCtes]] SQL generator.
    */
  private[ops] def rankAggs(qs: Seq[(String, Double)]): Seq[Column] =
    qs.flatMap { case (name, q) =>
      val pos = (col("n") - 1) * lit(q)
      val lo = floor(pos).cast("long")
      // hi clamps to the last row so q = 1 (and f = 0 groups) stay in range
      val hi = least(lo + 1, col("n") - 1)
      Seq(
        min(when(col("r") === lo, col("v"))).as(s"__lo_$name"),
        min(when(col("r") === hi, col("v"))).as(s"__hi_$name"),
        // f is constant within a group; min() just surfaces it
        min(pos - floor(pos)).as(s"__f_$name"))
    }

  /** `lo + (hi - lo) * f` per quantile over a [[rankAggs]]-aggregated
    * frame; leaves the helper columns in place (callers select).
    */
  private[ops] def interpolate(g: DataFrame, qs: Seq[(String, Double)]): DataFrame =
    qs.foldLeft(g) { case (d, (name, _)) =>
      d.withColumn(name,
        col(s"__lo_$name") +
          (col(s"__hi_$name") - col(s"__lo_$name")) * col(s"__f_$name"))
    }

  /** GLOBAL percentiles of `valueCol` over the whole frame — one output
    * row with a column per (name, q). The same interpolation as
    * [[exact]], but ranks come from the three-phase distributed prefix
    * ([[Prefix.runningTotal]]) instead of a group window, so there is no
    * single-partition window even with no grouping key. `uid` must be a
    * unique numeric/row tiebreaker (ties in `valueCol` carry identical
    * values, so any tie order yields the same percentile).
    */
  def exactGlobal(df: DataFrame, valueCol: Column, uid: Column,
                  qs: Seq[(String, Double)]): DataFrame = {
    require(qs.nonEmpty, "qs must be non-empty")
    require(qs.forall { case (_, q) => q >= 0 && q <= 1 },
      s"quantiles must be in [0,1], got ${qs.map(_._2)}")
    // cached: the count aggregate and the rank pass would otherwise each
    // recompute the caller's full upstream lineage
    val base = Frames.cached(df.where(valueCol.isNotNull)
      .select(valueCol.cast("double").as("v"), uid.as("__uid")))
    val cnt = base.agg(count(lit(1)).as("n"))
    val ranked = Prefix
      .runningTotal(base, Seq(col("v"), col("__uid")), lit(1L), "rk")
      .withColumn("r", col("rk") - 1)
      .crossJoin(broadcast(cnt))
    val aggs = rankAggs(qs)
    interpolate(ranked.agg(aggs.head, aggs.tail: _*), qs)
      .select(qs.map { case (name, _) => col(name) }: _*)
  }

  /** Lower weighted median per group: the smallest value v whose
    * cumulative weight (in (value, tie) order) reaches half the group's
    * total weight — the measure that answers "half the QUANTITY ships
    * below this price", where the unweighted median would answer "half
    * the rows".
    *
    * Scale shape: the cumulative weight rides the three-phase
    * distributed prefix STRATIFIED by the group keys
    * ([[Prefix.runningTotal]] `strataCols`) — no per-group window over
    * data-sized frames; the crossing row is picked by ONE
    * `min(struct(cw, v))` hash aggregation (cw strictly increases along
    * the order for positive weights, so the argmin is unique and
    * order-independent).
    *
    * Weights must be non-negative integers (exact cumulative sums on
    * both engines); `tieCols` must make the order total.
    */
  def weightedMedian(df: DataFrame, keys: Seq[String], valueCol: Column,
                     weightCol: Column, tieCols: Seq[Column]): DataFrame = {
    val keyCols = keys.map(col)
    val base = Frames.cached(df.where(valueCol.isNotNull)
      .select(keyCols ++ Seq(valueCol.cast("double").as("v"),
        weightCol.cast("long").as("w")) ++
        tieCols.zipWithIndex.map { case (c, i) => c.as(s"__t$i") }: _*))
    val totals = base.groupBy(keyCols: _*)
      .agg(sum(col("w")).as("__tw"))
    val cum = Prefix.runningTotal(base,
      Seq(col("v")) ++ tieCols.indices.map(i => col(s"__t$i")),
      col("w"), out = "__cw", strataCols = keys)
    cum.join(totals, keys)
      .where(col("__cw") * 2 >= col("__tw"))
      .groupBy(keyCols: _*)
      .agg(min(struct(col("__cw"), col("v"))).as("__pick"),
        min(col("__tw")).as("total_w"))
      .select(keyCols ++ Seq(col("total_w"),
        col("__pick.v").as("wmedian")): _*)
  }

  /** The identical computation as DuckDB SQL (for oracle generation):
    * same window, same conditional aggregates, same interpolation
    * expression — bit-identical output.
    */
  def oracleSql(table: String, keys: Seq[String], valueExpr: String,
                qs: Seq[(String, Double)]): String =
    s"""WITH ${oracleCtes("pct", table, keys, valueExpr, qs)}
        SELECT * FROM pct"""

  /** CTE-chain form of [[oracleSql]] for composition (e.g. percentile-of-
    * deviations in the MAD oracle): every CTE name carries `prefix`, and
    * the final CTE `prefix(keys..., <name>...)` is the selectable result.
    * Append after an opening WITH, separated by commas.
    */
  def oracleCtes(prefix: String, table: String, keys: Seq[String],
                 valueExpr: String, qs: Seq[(String, Double)]): String = {
    val keyList = keys.mkString(", ")
    val aggExprs = qs.map { case (name, q) =>
      // CAST: a bare 0.9 literal is DECIMAL in DuckDB, making (n-1)*q
      // exact decimal arithmetic while Spark multiplies doubles — the
      // resulting f differs in the last ulp and so does the percentile.
      val pos = s"(n - 1) * CAST($q AS DOUBLE)"
      val lo = s"CAST(floor($pos) AS BIGINT)"
      s"""min(CASE WHEN r = $lo THEN v END) AS __lo_$name,
         min(CASE WHEN r = least($lo + 1, n - 1) THEN v END) AS __hi_$name,
         min($pos - floor($pos)) AS __f_$name"""
    }.mkString(", ")
    val finalExprs = qs.map { case (name, _) =>
      s"__lo_$name + (__hi_$name - __lo_$name) * __f_$name AS $name"
    }.mkString(", ")
    s"""${prefix}_s AS (
          SELECT $keyList, CAST($valueExpr AS DOUBLE) AS v,
            row_number() OVER (PARTITION BY $keyList ORDER BY CAST($valueExpr AS DOUBLE)) - 1 AS r,
            count(*) OVER (PARTITION BY $keyList) AS n
          FROM $table
          WHERE $valueExpr IS NOT NULL),
        ${prefix}_g AS (SELECT $keyList, $aggExprs FROM ${prefix}_s GROUP BY $keyList),
        $prefix AS (SELECT $keyList, $finalExprs FROM ${prefix}_g)"""
  }
}
