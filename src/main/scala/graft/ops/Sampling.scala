package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic, reproducible sampling for training-data pipelines.
  *
  * `DataFrame.sample` draws per-partition pseudo-random rows: the result
  * changes with partitioning, task retries, and engine version — useless
  * for a corpus that must be re-derivable. Hash sampling keys the
  * decision on the DATA instead: a row is in the sample iff the md5 of
  * its key lands in the lowest buckets, so any engine, any partitioning,
  * any run selects the identical rows.
  *
  * At 100 TB the sample predicate is one narrow codegen'd filter on the
  * scan (no shuffle, no state); combined with a partitioned layout it
  * prunes before reading. Different `salt` values yield statistically
  * independent samples (train/validation splits that never overlap by
  * construction when buckets are disjoint).
  */
object Sampling {

  val Buckets = 1000

  /** The row's sample bucket in [0, 1000): 48-bit md5 of (key ++ salt)
    * mod 1000. Uniform for any high-entropy key.
    */
  def bucket(keyCol: Column, salt: String = ""): Column =
    Hashing.hash48(concat(keyCol.cast("string"), lit(salt))) % Buckets

  /** Keep rows whose bucket < `permille` — a deterministic ~permille/1000
    * sample.
    */
  def hashSample(df: DataFrame, keyCol: Column, permille: Int,
                 salt: String = ""): DataFrame = {
    require(permille >= 0 && permille <= Buckets,
      s"permille must be in [0, $Buckets], got $permille")
    df.where(bucket(keyCol, salt) < permille)
  }

  /** Stratified deterministic sample: per-stratum keep rates (permille),
    * with a default for strata not in the map. Same hash-bucket predicate
    * as [[hashSample]], so the per-stratum samples are reproducible,
    * partitioning-independent, and nested across rate increases; still a
    * scan-level filter — no shuffle, no per-stratum pass.
    */
  def stratifiedSample(df: DataFrame, keyCol: Column, strataCol: Column,
                       permille: Map[String, Int], defaultPm: Int = 0,
                       salt: String = ""): DataFrame = {
    (permille.values ++ Seq(defaultPm)).foreach(p =>
      require(p >= 0 && p <= Buckets, s"permille must be in [0, $Buckets], got $p"))
    val rate = permille.foldLeft(lit(defaultPm)) { case (acc, (stratum, pm)) =>
      when(strataCol === lit(stratum), lit(pm)).otherwise(acc)
    }
    df.where(bucket(keyCol, salt) < rate)
  }

  /** Deterministic corpus shuffle: adds `shuffle_key` (md5 of key ++
    * salt) and `pos` (the row's 1-based position in shuffle_key order) —
    * a reproducible random training order. Any engine, any partitioning
    * derives the identical permutation; a new salt is a fresh epoch
    * order. Global positions come from [[Prefix.runningTotal]], so no
    * single-partition window is involved.
    */
  def shuffleOrder(df: DataFrame, keyCol: Column, salt: String = ""): DataFrame =
    Prefix.runningTotal(
      df.withColumn("shuffle_key", md5(concat(keyCol.cast("string"), lit(salt)))),
      orderCols = Seq(col("shuffle_key"), keyCol), valueCol = lit(1L), out = "pos")

  /** Deterministic weighted corpus interleave (training-mix schedule):
    * each group (language, source, domain) is shuffled into its own
    * reproducible order, then groups merge by `mix_pos = rank / weight`
    * — a weight-w group contributes w rows per unit of schedule, the
    * standard deterministic upsampling interleave. `mix_rank` is the
    * global training order.
    *
    * Determinism notes: the per-group rank comes from md5 ordering (as
    * [[shuffleOrder]]); weights should be CHOSEN as powers of two
    * (1.0, 0.5, 0.25 …) so `rank / weight` is exact in IEEE double on
    * every engine — arbitrary weights would round. The global rank
    * window orders by (mix_pos, key) — a total order, so ties across
    * groups resolve identically everywhere.
    *
    * Scale: one hash-partitioned window per group for the rank, then the
    * global schedule rank via [[Prefix.runningTotal]]'s two-phase prefix
    * sum — never a single-partition global window; no driver state.
    */
  def mixOrder(df: DataFrame, groupCol: Column, weight: Column,
               keyCol: Column, salt: String = ""): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(md5(concat(keyCol.cast("string"), lit(salt))), keyCol)
    Prefix.runningTotal(
      df.withColumn("mix_pos",
        round(row_number().over(w).cast("double") / weight.cast("double"), 6)),
      orderCols = Seq(col("mix_pos"), keyCol), valueCol = lit(1L),
      out = "mix_rank")
  }

  /** Per-group row cap (the C4-style per-domain cap that stops one
    * domain/source from flooding the training mix): keep at most `cap`
    * rows per group, chosen by deterministic md5 order of the key, with
    * `grp_rn` the row's 1-based rank within its group. One
    * hash-partitioned window — groups rank in parallel, no global
    * ordering, no driver state; at 100 TB the window partitions by the
    * group key exactly like the aggregation it replaces.
    */
  def capPerGroup(df: DataFrame, groupCol: Column, keyCol: Column, cap: Int,
                  salt: String = ""): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(md5(concat(keyCol.cast("string"), lit(salt))), keyCol)
    df.withColumn("grp_rn", row_number().over(w)).where(col("grp_rn") <= cap)
  }

  /** Disjoint train/validation/test split by bucket range: (0, trainPm)
    * → "train", [trainPm, trainPm+valPm) → "val", rest → "test". One
    * pass, no shuffle, rows never move between splits when the ratios
    * for an earlier split grow.
    */
  def split(df: DataFrame, keyCol: Column, trainPm: Int, valPm: Int,
            salt: String = ""): DataFrame = {
    require(trainPm >= 0 && valPm >= 0 && trainPm + valPm <= Buckets,
      s"trainPm + valPm must be <= $Buckets, got $trainPm + $valPm")
    val b = bucket(keyCol, salt)
    df.withColumn("split",
      when(b < trainPm, lit("train"))
        .when(b < trainPm + valPm, lit("val"))
        .otherwise(lit("test")))
  }
}
