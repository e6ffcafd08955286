package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Relational.dsum

/** Grouped statistics operators: deterministic argmax/argmin, mode, and
  * moment-based correlation / simple linear regression.
  *
  * Reference analogy: the reference stops at sum/avg/count per group
  * (`denormalized_tables.py:166-178`); these are the next-step grouped
  * statistics an analytics user reaches for (SQL `ARG_MAX`, `MODE`,
  * `CORR`, `REGR_SLOPE`).
  *
  * Scale + determinism design:
  *  - argmax/argmin ride `max(struct(...))`: struct comparison is
  *    lexicographic, so appending a unique tie-breaker column makes the
  *    winner order-independent — and the whole thing is ONE partial+final
  *    hash aggregation (no window, no second shuffle). The built-in
  *    `max_by` is NOT tie-deterministic; this is.
  *  - mode = one (group, value) count aggregation, then a size-bounded
  *    window over the distinct value counts (one row per distinct value,
  *    not per input row).
  *  - corr/regression come from decimal-exact moment sums (n, Σx, Σy,
  *    Σx², Σy², Σxy in ONE aggregation pass), combined by a fixed IEEE
  *    double expression — order-independent and engine-portable, unlike
  *    the streaming built-in `corr`. Moments are mergeable, so the same
  *    shape serves map-side combine and cross-day rollups.
  */
object Stats {

  /** For each value column: the value of `payload` on the row where
    * `order` is maximal, ties broken by the larger `tieBreak` (must be
    * unique within a group for full determinism). One hash aggregation.
    */
  def argmax(order: Column, tieBreak: Column, payload: Column): Column =
    max(struct(order.as("o"), tieBreak.as("t"), payload.as("p")))
      .getField("p")

  /** Argmin with the same tie semantics (smaller `tieBreak` wins ties). */
  def argmin(order: Column, tieBreak: Column, payload: Column): Column =
    min(struct(order.as("o"), tieBreak.as("t"), payload.as("p")))
      .getField("p")

  /** Most frequent `valueCol` per group: (groupCols..., mode_value,
    * mode_count, n_distinct). Ties break to the lexicographically
    * smallest value (deterministic). Two hash aggregations plus a window
    * over the per-group distinct-value counts.
    */
  def mode(df: DataFrame, groupCols: Seq[Column], valueCol: Column): DataFrame = {
    val counts = df.groupBy((groupCols :+ valueCol.as("_v")): _*)
      .agg(count(lit(1)).as("_n"))
    val names = counts.columns.dropRight(2)
    val w = Window.partitionBy(names.map(col): _*)
      .orderBy(col("_n").desc, col("_v").asc)
    counts
      .withColumn("_rk", row_number().over(w))
      .withColumn("_nd", count(lit(1)).over(Window.partitionBy(names.map(col): _*)))
      .where(col("_rk") === 1)
      .drop("_rk")
      .withColumnRenamed("_v", "mode_value")
      .withColumnRenamed("_n", "mode_count")
      .withColumnRenamed("_nd", "n_distinct")
  }

  /** Decimal-exact second-order moments of (x, y) per group: n, sx, sy,
    * sxx, syy, sxy — the sufficient statistics for correlation and OLS.
    * All six come out of ONE aggregation pass (shuffle carries six
    * scalars per group).
    */
  def moments(df: DataFrame, groupCols: Seq[Column], x: Column, y: Column,
              scale: Int = 8): DataFrame =
    df.groupBy(groupCols: _*).agg(
      count(lit(1)).as("n"),
      dsum(x, scale).as("sx"),
      dsum(y, scale).as("sy"),
      dsum(x * x, scale).as("sxx"),
      dsum(y * y, scale).as("syy"),
      dsum(x * y, scale).as("sxy"))

  /** Pearson correlation and OLS slope/intercept per group from
    * decimal-exact moments, rounded to 6 decimals. The combining
    * arithmetic is the textbook closed form, written in one fixed
    * expression shape — [[oracleSelect]] emits the identical text for
    * DuckDB, so results hash-match bit-for-bit.
    */
  def corrRegr(df: DataFrame, groupCols: Seq[Column], x: Column, y: Column,
               scale: Int = 8): DataFrame = {
    val m = moments(df, groupCols, x, y, scale)
    val n = col("n").cast("double")
    val cov = n * col("sxy") - col("sx") * col("sy")
    val vx = n * col("sxx") - col("sx") * col("sx")
    val vy = n * col("syy") - col("sy") * col("sy")
    m.select(m.columns.dropRight(6).map(col) ++ Seq(
      col("n"),
      round(cov / (sqrt(vx) * sqrt(vy)), 6).as("corr_xy"),
      round(cov / vx, 6).as("slope"),
      round((col("sy") - (cov / vx) * col("sx")) / n, 6).as("intercept")): _*)
  }

  /** Cohen's kappa agreement between two binary labelers (0/1 columns) —
    * the inter-rater check run when two heuristic annotators (or a
    * heuristic and a model) label the same corpus. Output: one row with
    * (n, n_both, n_neither, po, pe, kappa); po = observed agreement,
    * pe = chance agreement, kappa = (po-pe)/(1-pe).
    *
    * Scale: ONE partial+final hash aggregation over integer indicator
    * sums — the contingency table is 4 numbers; everything after is
    * constant-sized driver-free arithmetic. Sums are exact integers, the
    * po/pe/kappa doubles are single fixed-order IEEE expressions —
    * engine-exact and shard-mergeable.
    */
  def cohensKappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    val agg = df.select(a.cast("long").as("a"), b.cast("long").as("b"))
      .agg(count(lit(1)).as("n"), sum(col("a")).as("na"),
        sum(col("b")).as("nb"),
        sum(col("a") * col("b")).as("n_both"),
        sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).as("n_neither"))
    val po = (col("n_both") + col("n_neither")) * lit(1.0) / col("n")
    // na·nb and n² in DECIMAL, not LONG: long products silently wrap past
    // n ≈ 3e9 rows under non-ANSI Spark, while decimal stays exact (and
    // bit-matches DuckDB's HUGEINT products converted to double)
    val pe = (col("na").cast("decimal(38,0)") * col("nb") +
      (col("n") - col("na")).cast("decimal(38,0)") * (col("n") - col("nb")))
      .cast("double") /
      (col("n").cast("decimal(38,0)") * col("n")).cast("double")
    agg.select(col("n"), col("n_both"), col("n_neither"),
      round(po, 6).as("po"), round(pe, 6).as("pe"),
      round((po - pe) / (lit(1.0) - pe), 6).as("kappa"))
  }

  /** Fleiss' kappa agreement across `raters.size` binary labelers — the
    * multi-rater generalization of [[cohensKappa]] (Fleiss, Psych. Bull.
    * 1971): the agreement check before trusting an ensemble of heuristic
    * annotators (or heuristics + model votes) as training labels.
    *
    * Per item, `n1` = votes for category 1 (0..r). With
    * `S = Σ_i (n1² + (r-n1)²)`:
    *   P̄  = (S − N·r) / (N·r·(r−1))      observed agreement
    *   p1 = Σ n1 / (N·r)                 category-1 vote share
    *   Pe = p1² + (1−p1)²                 chance agreement
    *   κ  = (P̄ − Pe) / (1 − Pe)
    *
    * Scale: ONE partial+final hash aggregation of integer sums (S fits a
    * long: ≤ r² per row); everything after is constant-sized fixed-order
    * IEEE arithmetic — engine-exact and shard-mergeable like the moment
    * aggregates above.
    */
  def fleissKappa(df: DataFrame, raters: Seq[Column]): DataFrame = {
    require(raters.size >= 2, "fleissKappa needs at least two raters")
    val r = raters.size
    val votes1 = raters.map(_.cast("long")).reduce(_ + _)
    val agg = df.select(votes1.as("n1"))
      .agg(count(lit(1)).as("n"),
        sum(col("n1") * col("n1")
          + (lit(r.toLong) - col("n1")) * (lit(r.toLong) - col("n1"))).as("s"),
        sum(col("n1")).as("v1"))
    val pbar = (col("s") - col("n") * r).cast("double") /
      (col("n") * r * (r - 1)).cast("double")
    val p1 = col("v1").cast("double") / (col("n") * r).cast("double")
    val pe = p1 * p1 + (lit(1.0) - p1) * (lit(1.0) - p1)
    agg.select(col("n"), lit(r).as("n_raters"),
      round(p1, 6).as("p1"), round(pbar, 6).as("p_bar"),
      round(pe, 6).as("p_e"),
      // degenerate distribution (every vote one category): Pe = 1 and
      // kappa is undefined — return an explicit NULL, not NaN, so the
      // caller gets a typed signal instead of a poisoned double
      round(when(pe === 1.0, lit(null))
        .otherwise((pbar - pe) / (lit(1.0) - pe)), 6).as("kappa"))
  }

  /** DuckDB select-list fragment computing corr/slope/intercept from a
    * moments CTE with columns (n, sx, sy, sxx, syy, sxy) — the exact
    * expression shape of [[corrRegr]].
    */
  def oracleSelect: String = {
    val n = "CAST(n AS DOUBLE)"
    val cov = s"($n * sxy - sx * sy)"
    val vx = s"($n * sxx - sx * sx)"
    val vy = s"($n * syy - sy * sy)"
    s"""n,
       round($cov / (sqrt($vx) * sqrt($vy)), 6) AS corr_xy,
       round($cov / $vx, 6) AS slope,
       round((sy - ($cov / $vx) * sx) / $n, 6) AS intercept"""
  }

  /** Moments CTE body for DuckDB over source `from` grouped by
    * `groupExprs`: decimal-routed sums matching [[moments]] (DuckDB sums
    * of DECIMAL(27,s) stay DECIMAL — wide enough here — and the cast to
    * DOUBLE matches Spark's `dsum`).
    */
  def oracleMomentsCte(from: String, groupExprs: Seq[String], xExpr: String,
                       yExpr: String, scale: Int = 8): String = {
    def d(e: String) =
      s"CAST(sum(CAST($e AS DECIMAL(27,$scale))) AS DOUBLE)"
    s"""SELECT ${groupExprs.mkString(", ")}, count(*) AS n,
       ${d(xExpr)} AS sx, ${d(yExpr)} AS sy,
       ${d(s"($xExpr) * ($xExpr)")} AS sxx,
       ${d(s"($yExpr) * ($yExpr)")} AS syy,
       ${d(s"($xExpr) * ($yExpr)")} AS sxy
       FROM $from GROUP BY ${(1 to groupExprs.size).mkString(", ")}"""
  }
}
