package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join/aggregation strategies (100 TB design, SURVEY.md §7
  * step 8 scale notes).
  *
  * Spark 4's AQE rebalances skewed sort-merge joins automatically
  * (`spark.sql.adaptive.skewJoin.enabled`), and that is the first answer.
  * Salting is the explicit fallback when AQE can't help: a hot key whose
  * single hash partition exceeds executor memory, or a broadcast-infeasible
  * dimension with a few dominant keys.
  *
  * [[saltedJoin]] implements the standard scheme: the fact side gets a
  * deterministic pseudo-random salt in [0, n); the (smaller) right side is
  * exploded n× with every salt value; the join key becomes (key, salt), so
  * one hot key spreads over n shuffle partitions. Row-identical to the
  * plain join — verified by SkewSpec.
  */
object Skew {

  /** Deterministic salt in [0, n): hash of the whole row's join key plus a
    * uniquifier column (any high-cardinality column works; event/line ids
    * are ideal). No `rand()` — results must be reproducible.
    */
  def salt(uniquifier: Column, n: Int): Column =
    pmod(xxhash64(uniquifier), lit(n)).cast("int")

  /** Inner equi-join with an n-way salted key. `leftUnique` is any
    * left-side column that varies within a join key (used to spread rows);
    * the right side is replicated n times (keep it the smaller input).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 leftUnique: Column, n: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt", salt(leftUnique, n))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(n - 1)).cast("array<int>")))
    saltedLeft.join(saltedRight, Seq(key, "_salt"), "inner").drop("_salt")
  }

  /** Two-stage aggregation for skewed group keys: partial-aggregate on
    * (key, salt), then final-aggregate on key. Spark's hash aggregation
    * already does map-side partial aggregation; this adds an extra
    * REDUCE-side spreading stage for the pathological case where even the
    * partially-aggregated hot key overwhelms one reducer (e.g. huge
    * per-key state like collect_set).
    */
  def saltedGroupAgg(df: DataFrame, key: String, uniquifier: Column, n: Int,
                     partialAgg: Column => Column, valueCol: String,
                     finalAgg: Column => Column): DataFrame =
    df.withColumn("_salt", salt(uniquifier, n))
      .groupBy(col(key), col("_salt"))
      .agg(partialAgg(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(finalAgg(col("_partial")).as(valueCol))
}
