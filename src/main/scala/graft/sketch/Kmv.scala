package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic KMV / bottom-k (theta) sketch (Bar-Yossef et al.
  * RANDOM'02; Beyer et al. SIGMOD'07 "distinct sampling"): keep the k
  * SMALLEST distinct 48-bit md5 hashes of a key. The k-th smallest hash
  * theta estimates cardinality as (k-1) * 2^48 / theta, and — unlike
  * HLL — the retained hash SAMPLE supports set algebra: the k smallest
  * of a union are computable from two sketches alone, and the fraction
  * of them present in both sides estimates the Jaccard/intersection
  * (the theta-sketch construction, Dasgupta et al. 2016).
  *
  * 100 TB story: `minValuesBy` is a per-group bottom-k — a partial
  * top-k aggregation (per-partition k-heaps, then a k-row merge per
  * group), never a global sort; a sketch is at most k tiny rows per
  * group, so per-day / per-source sketches union and re-bottom-k into
  * rollups without rescanning the corpus, and intersection estimates
  * between any two groups cost a k-row join. Everything is md5-based
  * and bit-reproducible across engines (the DuckDB oracle replays the
  * identical integer derivation via [[graft.functions.PortableSql]]).
  */
object Kmv {

  /** Per-group bottom-k sketch: the k smallest DISTINCT 48-bit hashes of
    * `key` per group. Output: (groupCols..., rk, h) with rk in [1, k].
    * The window is partitioned by group — the distinct pass has already
    * collapsed each group to its unique hashes, so the per-partition
    * state is bounded by the group's distinct count, and the planner's
    * partial top-k (rank limit pushdown) keeps k rows per group per
    * partition in flight.
    */
  def minValuesBy(df: DataFrame, key: Column, groupCols: Seq[String],
                  k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val h = Hashing.hash48(key.cast("string"))
    val uniq = df.select(groupCols.map(col) :+ h.as("h"): _*).distinct()
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("h"))
    uniq.select(col("*"), row_number().over(w).cast("long").as("rk"))
      .where(col("rk") <= k)
  }

  /** Cardinality estimate per group from a [[minValuesBy]] sketch:
    * exact count when the group holds fewer than k distinct hashes
    * (the sketch IS the distinct set), else (k-1) * 2^48 / theta with
    * theta = the k-th smallest hash. Output: (groupCols..., n_kept,
    * theta, kmv_est).
    */
  def estimateBy(sketch: DataFrame, groupCols: Seq[String],
                 k: Int): DataFrame = {
    val agg = sketch.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n_kept"),
        max(col("h")).cast("long").as("theta"))
    agg.select(groupCols.map(col) :+ col("n_kept") :+ col("theta") :+
      when(col("n_kept") < k, col("n_kept").cast("double"))
        .otherwise(lit((k - 1).toDouble) * math.pow(2.0, 48)
          / col("theta").cast("double"))
        .as("kmv_est"): _*)
  }

  /** Theta-sketch set algebra between the sketches of two groups, given
    * as (h, rk) frames `a` and `b` (each one group's bottom-k). The
    * union's bottom-k is recomputed from the at-most-2k merged hashes;
    * matches = union-sample hashes present in BOTH inputs; then
    *   est_union     = (k-1) * 2^48 / theta_u   (or exact when < k)
    *   est_intersect = matches / k' * est_union  (k' = union rows kept).
    * Output: one row (k_used, theta_u, matches, est_union,
    * est_intersect). Both inputs are model-sized (<= k rows) — every
    * join here is a broadcast of at most k hashes.
    */
  def intersectEstimate(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    // enforce the <= k contract as a STATIC bound, deterministically:
    // sort-by-hash + limit is a TakeOrderedAndProject (per-partition
    // top-k, then merge — no global shuffle), a no-op on conforming
    // inputs, and on an OVERSIZED input it keeps the k SMALLEST hashes
    // — the sketch semantics — where a bare limit(k) kept an arbitrary
    // subset that silently corrupted theta_u/matches
    val ak = a.orderBy(col("h")).limit(k)
    val bk = b.orderBy(col("h")).limit(k)
    val u = ak.select(col("h")).unionByName(bk.select(col("h"))).distinct()
    // union frame is <= 2k rows: rank by the house broadcast self-join
    // count (no global window anywhere in the engine)
    val bott = u.join(broadcast(u.select(col("h").as("h2"))),
        col("h2") < col("h"), "left")
      .groupBy("h")
      .agg((sum(when(col("h2").isNotNull, 1).otherwise(0)) + 1)
        .cast("long").as("rk"))
      .where(col("rk") <= k)
    val inBoth = bott
      .join(broadcast(ak.select(col("h")).distinct()), Seq("h"), "semi")
      .join(broadcast(bk.select(col("h")).distinct()), Seq("h"), "semi")
      .agg(count(lit(1)).cast("long").as("matches"))
    val uAgg = bott.agg(count(lit(1)).cast("long").as("k_used"),
      max(col("h")).cast("long").as("theta_u"))
    val est = uAgg.crossJoin(broadcast(inBoth))
      .select(col("k_used"), col("theta_u"), col("matches"),
        when(col("k_used") < k, col("k_used").cast("double"))
          .otherwise(lit((k - 1).toDouble) * math.pow(2.0, 48)
            / col("theta_u").cast("double")).as("est_union"))
    est.select(col("k_used"), col("theta_u"), col("matches"),
      col("est_union"),
      (col("matches").cast("double") / col("k_used") * col("est_union"))
        .as("est_intersect"))
  }
}
