package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic HyperLogLog registers (Flajolet et al., AOFA'07) built
  * from the shared 48-bit md5 hash — a cardinality sketch whose REGISTER
  * TABLE is bit-reproducible across engines, so the sketch itself sits
  * under the DuckDB hash gate (unlike `approx_count_distinct`, whose
  * HLL++ registers are engine-private — that variant is spec-checked in
  * ApproxSpec).
  *
  * 100 TB story: the register table is the whole point — `registers()`
  * is a map-side-combinable aggregation producing at most `2^p` tiny
  * rows per grouping, and register tables MERGE by per-bucket max, so
  * per-partition / per-day sketches roll up without rescanning (the
  * standard sketch-mergeability argument). The shuffle carries buckets,
  * never keys.
  *
  * Rho variant: trailing-zeros+1 of the suffix (geometrically
  * distributed, same estimator guarantees as leading-zeros) — chosen
  * because `tz` is computable EXACTLY on both engines as
  * `bit_count((w & -w) - 1)`, pure integer ops; leading-zeros needs
  * `log2`, whose libm rounding differs between JVM and C.
  */
object Hll {

  /** Per-bucket max-rho registers for the values of `key`: one row per
    * OBSERVED bucket (bucket, max_rho); absent buckets are rho=0 to the
    * estimator. `p` index bits → m=2^p buckets; the remaining 48-p hash
    * bits feed rho.
    */
  def registers(df: DataFrame, key: Column, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = (1 << p).toLong
    val maxRho = (48 - p + 1).toLong
    val h = Hashing.hash48(key.cast("string"))
    val bucket = h.bitwiseAND(lit(m - 1))
    val w = shiftright(h, p)
    val rho = when(w === 0, lit(maxRho))
      .otherwise((bit_count(w.bitwiseAND(-w) - 1) + 1).cast("long"))
    df.select(bucket.as("bucket"), rho.as("rho"))
      .groupBy("bucket").agg(max(col("rho")).as("max_rho"))
  }

  /** Grouped registers: one (groupCols..., bucket, max_rho) row per
    * observed bucket per group — at most 2^p rows per group regardless
    * of group size. The per-group count-distinct sketch.
    */
  def registersBy(df: DataFrame, key: Column, groupCols: Seq[String],
                  p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = (1 << p).toLong
    val maxRho = (48 - p + 1).toLong
    val h = Hashing.hash48(key.cast("string"))
    val bucket = h.bitwiseAND(lit(m - 1))
    val w = shiftright(h, p)
    val rho = when(w === 0, lit(maxRho))
      .otherwise((bit_count(w.bitwiseAND(-w) - 1) + 1).cast("long"))
    df.select(groupCols.map(col) :+ bucket.as("bucket") :+ rho.as("rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("max_rho"))
  }

  /** Fully-distributed estimate per group (no driver collect): the raw
    * HLL estimator with linear-counting small-range correction, over the
    * output of [[registersBy]]. Output: (groupCols..., hll_est).
    *
    * Determinism WITHOUT decimal routing: each register's inverse weight
    * 1/2^rho is dyadic and the per-group total stays far under the
    * 53-bit mantissa, so every partial sum is EXACT in IEEE double — the
    * aggregation is order-free by construction, and the oracle's `<<`
    * form computes bit-identical values.
    */
  def estimateBy(registers: DataFrame, groupCols: Seq[String],
                 p: Int): DataFrame = {
    val m = (1 << p).toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val inv = lit(1.0) /
      expr("shiftleft(CAST(1 AS BIGINT), CAST(max_rho AS INT))")
    val s = registers.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_present"), sum(inv).as("s_present"))
    val zeros = lit(m) - col("n_present")
    val raw = lit(alpha * m * m) / (col("s_present") + zeros)
    val est = when(raw <= lit(2.5) * m && zeros > 0,
      lit(m) * log(lit(m) / zeros)).otherwise(raw)
    s.select(groupCols.map(col) :+ est.as("hll_est"): _*)
  }

  /** Sketch-algebra merge: collapse grouped registers to a coarser
    * grouping (or to one global sketch with `toGroups = Nil`) by taking
    * the per-bucket max — the union-of-sets operation on HLL sketches.
    * Exactly the estimate the union's own registers would give (max of
    * maxes = max over the union), WITHOUT rescanning the data: this is
    * how per-day/per-source sketches roll up to month/corpus
    * cardinalities at 100 TB. Cost: one hash aggregation over register
    * rows (≤ 2^p per input group).
    */
  def mergeBy(registers: DataFrame, toGroups: Seq[String]): DataFrame =
    registers.groupBy((toGroups :+ "bucket").map(col): _*)
      .agg(max(col("max_rho")).as("max_rho"))

  /** DuckDB replay of [[estimateBy]] over a register CTE
    * `regsFrom(groupCol, bucket, max_rho)`: emits CTEs
    * `{prefix}_s/{prefix}_e/{prefix}` with `{prefix}(groupCol, est)` —
    * the exact estimator expression shape, so results hash-match
    * bit-for-bit (dyadic register inverses are IEEE-exact in any sum
    * order; see [[estimateBy]]).
    */
  def oracleEstimatorCtes(prefix: String, regsFrom: String, groupCol: String,
                          p: Int): String = {
    val m = (1 << p).toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val alphaM2 = graft.functions.PortableSql.doubleLit(alpha * m * m)
    val mi = 1 << p
    val lim = graft.functions.PortableSql.doubleLit(2.5 * m)
    s"""${prefix}_s AS (
         SELECT $groupCol, count(*) AS n_present,
           sum(CAST(1 AS DOUBLE) / (CAST(1 AS BIGINT) << max_rho)) AS s_present
         FROM $regsFrom GROUP BY 1),
       ${prefix}_e AS (
         SELECT $groupCol,
           (CAST($mi AS DOUBLE) - n_present) AS zeros,
           CAST($alphaM2 AS DOUBLE) / (s_present + (CAST($mi AS DOUBLE) - n_present)) AS raw
         FROM ${prefix}_s),
       $prefix AS (
         SELECT $groupCol,
           CASE WHEN raw <= CAST($lim AS DOUBLE) AND zeros > 0
                THEN CAST($mi AS DOUBLE) * ln(CAST($mi AS DOUBLE) / zeros)
                ELSE raw END AS est
         FROM ${prefix}_e)"""
  }

  /** Driver-side estimate from a collected register table (≤ 2^p rows —
    * model-sized, like IVF's centroids). Raw HLL estimator with the
    * standard linear-counting small-range correction.
    */
  def estimate(registers: DataFrame, p: Int): Double = {
    val m = 1 << p
    val regs = new Array[Int](m)
    registers.select(col("bucket").cast("int"), col("max_rho").cast("int"))
      .collect().foreach(r => regs(r.getInt(0)) = r.getInt(1))
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val sum = regs.map(r => math.pow(2.0, -r)).sum
    val raw = alpha * m * m / sum
    val zeros = regs.count(_ == 0)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }
}
