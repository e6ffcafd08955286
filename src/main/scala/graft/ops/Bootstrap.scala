package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, PortableSql}
import graft.ops.Relational.dsum

/** Poisson bootstrap (Chamandy et al., "Estimating Uncertainty for
  * Massive Data Streams") — THE at-scale resampling scheme: classical
  * bootstrap resampling needs n draws with replacement per replicate
  * (a shuffle of the whole dataset per replicate); the Poisson
  * approximation gives every row an independent Poisson(1) weight per
  * replicate, so ALL B replicates compute in ONE pass over the data
  * (row → B weighted copies via a generator, then one aggregation).
  *
  * Determinism: the per-(row, replicate) uniform comes from the md5
  * hash of "rowkey-replicate" scaled by 2^-48 (exact dyadic), mapped to
  * a Poisson(1) count through fixed CDF thresholds embedded as
  * round-trip literals — identical on any engine, any partitioning, any
  * run. Replicate means use decimal-routed numerators over exact
  * integer weight sums.
  */
object Bootstrap {

  /** Poisson(1) CDF thresholds for k = 0..6; u >= last → weight 7
    * (P ≈ 1e-5; the truncation bias is far below bootstrap noise).
    */
  val CdfThresholds: Seq[Double] = {
    val pmf = Iterator.iterate(math.exp(-1.0), 7)(identity).toSeq
      .zipWithIndex.map { case (e, k) =>
        e / (1 to k).product
      }
    pmf.scanLeft(0.0)(_ + _).tail
  }

  private val Scale48 = 281474976710656.0 // 2^48

  /** Deterministic per-(row, replicate) Poisson(1) weight. */
  def weight(rowKey: Column, rep: Column): Column = {
    val u = Hashing.hash48(concat_ws("-", rowKey, rep)) / lit(Scale48)
    CdfThresholds.zipWithIndex.foldRight(lit(CdfThresholds.size): Column) {
      case ((t, k), els) => when(u < t, k).otherwise(els)
    }
  }

  /** B replicate means of `valCol`: (rep, mean_b), one row per
    * replicate. `rowKey` must be unique per row (it seeds the weights).
    */
  def replicateMeans(df: DataFrame, rowKey: Column, valCol: Column,
                     b: Int): DataFrame =
    df.select(rowKey.cast("string").as("rk"), valCol.as("x"))
      .select(col("rk"), col("x"),
        explode(sequence(lit(0), lit(b - 1))).as("rep"))
      .withColumn("w", weight(col("rk"), col("rep")))
      .groupBy("rep")
      .agg(round(dsum(col("w") * col("x"), 6) / sum(col("w")), 6).as("mean_b"))

  /** DuckDB replay over CTE `from(rk VARCHAR, x DOUBLE)`: emits CTE
    * `reps(rep, mean_b)`.
    */
  def oracleSql(from: String, b: Int): String = {
    val u = s"${PortableSql.hexToLong(
      "md5(rk || '-' || CAST(rep AS VARCHAR))", 12)} / ${PortableSql.doubleLit(Scale48)}"
    val cases = CdfThresholds.zipWithIndex.map { case (t, k) =>
      s"WHEN u < ${PortableSql.doubleLit(t)} THEN $k"
    }.mkString(" ")
    s"""expanded AS (
         SELECT rk, x, unnest(generate_series(0, ${b - 1})) AS rep FROM $from),
       weighted AS (
         SELECT rep, x, CASE $cases ELSE ${CdfThresholds.size} END AS w
         FROM (SELECT rk, x, rep, $u AS u FROM expanded)),
       reps AS (
         SELECT rep,
           round(CAST(sum(CAST(w * x AS DECIMAL(27,6))) AS DOUBLE) /
             CAST(sum(w) AS BIGINT), 6) AS mean_b
         FROM weighted GROUP BY 1)"""
  }
}
