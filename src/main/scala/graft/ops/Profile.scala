package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-call `summary()` profiling block (reference
  * `data_ingestion_and_cleaning/data_import.ipynb.py:157-162`): count /
  * mean / stddev / min / 25% / 50% / 75% / max for each profiled
  * column, one output row per column.
  *
  * Unlike `Dataset.summary()` (approximate percentiles, results vary
  * with partitioning), every statistic here is exact and
  * bit-deterministic on any engine:
  *  - moments snap values to DECIMAL(18,2) (the profiled columns are
  *    2-dp money/quantity measures) and square/sum in EXACT decimal, so
  *    mean and stddev come out as identical doubles in any aggregation
  *    order — no Welford-vs-naive engine drift;
  *  - percentiles are the standard (n-1)*q rank interpolation
  *    ([[Percentiles]]), computed by the two-pass histogram pruning
  *    ([[Histograms.exact]], column name as the group) — pass 2 ranks
  *    only candidate bins, and no window is ever unpartitioned.
  *
  * Scale: one explode (|cols|× fan-out), two histogram passes, two
  * aggregations. No driver-side data.
  */
object Profile {

  /** Summary rows for `cols` of `df` (numeric, ≤2 decimal places for
    * the exact-decimal moment routing). Output: one row per column
    * name, `(col_name, n_rows, mean, stddev, min_val, p25, p50, p75,
    * max_val)`, NULL stddev for single-row columns.
    */
  def summary(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "summary needs at least one column")
    // cached: the exploded cell frame feeds both the moments aggregation
    // and the rank pass — without this the |cols|× explode scans the
    // source twice
    val long = Frames.cached(df
      .select(explode(array(cols.map(c =>
          struct(lit(c).as("col_name"), col(c).cast("double").as("x"))): _*))
          .as("cell"))
      .select(col("cell.col_name").as("col_name"), col("cell.x").as("x"))
      .where(col("x").isNotNull))
    val v2 = round(col("x"), 2).cast("decimal(18,2)")
    // cached: mom is referenced by the rank pass (n broadcast) and the
    // final join — a |cols|-row frame, aggregate it once
    val mom = Frames.cached(long.groupBy("col_name").agg(
      count(lit(1)).as("n_rows"),
      sum(v2).cast("double").as("__s1"),
      sum(v2 * v2).cast("double").as("__s2"),
      min(col("x")).as("min_val"),
      max(col("x")).as("max_val")))
    val qs = Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75))
    // quartiles via the two-pass histogram pruning — bit-identical to
    // the rank form (HistogramsSpec), but pass 2 touches only the
    // candidate bins instead of ranking every cell. The moments
    // aggregation already produced each column's min/max/count, so the
    // histogram pass reuses them instead of re-scanning the cell frame.
    val pct = Histograms.exact(long, Seq("col_name"), col("x"), qs,
      precomputedBounds = Some(mom.select(col("col_name"),
        col("min_val").as("__blo"), col("max_val").as("__bhi"),
        col("n_rows").as("__n"))))
    mom.join(pct, "col_name")
      .select(col("col_name"), col("n_rows"),
        (col("__s1") / col("n_rows")).as("mean"),
        when(col("n_rows") > 1,
          sqrt((col("__s2") - col("__s1") * col("__s1") / col("n_rows"))
            / (col("n_rows") - 1))).as("stddev"),
        col("min_val"), col("p25"), col("p50"), col("p75"), col("max_val"))
  }

  /** The identical computation as DuckDB SQL for oracle generation:
    * same decimal moment routing, same [[Percentiles]] interpolation
    * CTEs, same double assembly — bit-identical output. `longSelects`
    * are per-column `(name, valueExpr, table)` sources.
    */
  def oracleSql(longSelects: Seq[(String, String, String)]): String = {
    val longf = longSelects.map { case (name, expr, table) =>
      s"SELECT '$name' AS col_name, CAST($expr AS DOUBLE) AS x FROM $table"
    }.mkString(" UNION ALL ")
    val qs = Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75))
    s"""WITH longf AS ($longf),
        mom AS (
          SELECT col_name, count(*) AS n_rows,
            CAST(sum(CAST(round(x, 2) AS DECIMAL(18,2))) AS DOUBLE) AS s1,
            CAST(sum(CAST(round(x, 2) AS DECIMAL(18,2))
              * CAST(round(x, 2) AS DECIMAL(18,2))) AS DOUBLE) AS s2,
            min(x) AS min_val, max(x) AS max_val
          FROM longf WHERE x IS NOT NULL GROUP BY col_name),
        ${Percentiles.oracleCtes("pct", "longf", Seq("col_name"), "x", qs)}
        SELECT m.col_name AS col_name, n_rows, s1 / n_rows AS mean,
          CASE WHEN n_rows > 1
            THEN sqrt((s2 - s1 * s1 / n_rows) / (n_rows - 1)) END AS stddev,
          min_val, p25, p50, p75, max_val
        FROM mom m JOIN pct ON pct.col_name = m.col_name
        ORDER BY col_name"""
  }
}
