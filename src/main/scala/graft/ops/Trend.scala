package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust trend statistics over grouped time series: the Theil-Sen
  * slope estimator (median of all pairwise slopes — 29.4% breakdown
  * point vs 0% for least squares) and the Mann-Kendall monotonic-trend
  * test (sign-based S statistic with its normal approximation).
  *
  * Scale shape: the pairwise self-join runs over the PRE-AGGREGATED
  * per-group series (calendar-bounded — e.g. ≤31 days/month → ≤465
  * pairs per group), never over raw facts, and is an equi-join on the
  * group key. At 100 TB the fact table is reduced by one hash
  * aggregation first; the quadratic step stays bounded by series
  * length, embarrassingly parallel across groups.
  *
  * Determinism: slopes are IEEE double ratios of decimal-exact values;
  * the median is the lower order statistic (a member of the multiset,
  * no averaging), so both engines pick the identical value. Mann-
  * Kendall S is an integer sum; z is one double expression on exact
  * integers.
  */
object Trend {

  /** Pairwise slopes + sign per group. `df` must be one row per (group,
    * x) with x numeric (e.g. day-of-epoch) and y the decimal-exact
    * measure. Output: group, slope, sgn.
    */
  def pairwise(df: DataFrame, group: Column, x: Column, y: Column): DataFrame = {
    val a = df.select(group.as("g"), x.as("xa"), y.as("ya"))
    val b = df.select(group.as("g"), x.as("xb"), y.as("yb"))
    a.join(b, Seq("g"))
      .where(col("xa") < col("xb"))
      .select(col("g"),
        ((col("yb") - col("ya")) /
          (col("xb") - col("xa")).cast("double")).as("slope"),
        when(col("yb") > col("ya"), 1)
          .when(col("yb") < col("ya"), -1)
          .otherwise(0).as("sgn"))
  }

  /** Theil-Sen slope (lower median of pairwise slopes) + Mann-Kendall
    * S and z per group. Output: g, n_points, theil_sen_slope, mk_s,
    * mk_z — groups with fewer than `minPoints` observations dropped.
    */
  def theilSenMk(df: DataFrame, group: Column, x: Column, y: Column,
      minPoints: Int = 3): DataFrame = {
    val pw = pairwise(df, group, x, y)
    val n = df.groupBy(group.as("g"))
      .agg(count(lit(1)).as("n_points"))
      .where(col("n_points") >= minPoints)
    val w = Window.partitionBy(col("g")).orderBy(col("slope"))
    val med = pw
      .select(col("g"), col("slope"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy(col("g"))).as("cnt"))
      .where(col("rn") === ((col("cnt") + 1) / 2).cast("long"))
      .select(col("g"), col("slope"))
    val mk = pw.groupBy("g").agg(sum(col("sgn")).as("mk_s"))
    val varTerm = (col("n_points") * (col("n_points") - 1) *
      (lit(2) * col("n_points") + 5)).cast("double") / lit(18).cast("double")
    n.join(med, Seq("g")).join(mk, Seq("g"))
      .select(col("g"), col("n_points"),
        round(col("slope"), 6).as("theil_sen_slope"),
        col("mk_s"),
        round(
          when(col("mk_s") > 0,
            (col("mk_s").cast("double") - 1) / sqrt(varTerm))
            .when(col("mk_s") < 0,
              (col("mk_s").cast("double") + 1) / sqrt(varTerm))
            .otherwise(lit(0).cast("double")), 6).as("mk_z"))
  }
}
