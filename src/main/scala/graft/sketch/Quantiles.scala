package graft.sketch

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch — DDSketch (Masson, Rim & Lee, VLDB'19:
  * "DDSketch: a fast and fully-mergeable quantile sketch with
  * relative-error guarantees").
  *
  * The [[graft.ops.Percentiles]] layer is EXACT but single-job: a 100 TB
  * fleet profiling shards independently (or refreshing incrementally,
  * the q276 pattern) needs partial states it can MERGE. DDSketch is the
  * mergeable form: values land in geometric buckets
  * `i = ceil(log_gamma(v))`, a sketch is just the per-bucket counts, and
  * merging two sketches is summing their counts — associative,
  * commutative, lossless (two sketches of two halves merge to EXACTLY
  * the sketch of the whole, unlike sampling sketches). The bucket walk
  * returns an estimate within relative error `alpha = (gamma-1)/(gamma+1)`
  * of the true quantile VALUE, at any quantile, with
  * `O(log(max/min) / alpha)` buckets regardless of row count.
  *
  * Chosen over KLL/t-digest deliberately: those compact RANDOMLY
  * (KLL coin-flips survivors) or order-dependently (t-digest centroid
  * merges), so their outputs are neither deterministic nor
  * oracle-replayable. DDSketch's state is a pure function of the value
  * MULTISET — the q285 pattern: the DuckDB oracle replays the identical
  * bucket mapping and walk in SQL and the results hash-match.
  *
  * Cross-engine determinism of the mapping: the only transcendental is
  * `ln(v)`; the quotient `ln(v)/ln(gamma)` is rounded to 9 dp (HALF_UP,
  * matching both engines' `round`) before `ceil`, and `ln(gamma)` is
  * embedded as a shared double literal — a last-ulp `ln` difference
  * moves the quotient by ~1e-13, which only matters within 1e-13 of the
  * 5e-10 rounding grid.
  *
  * Two build paths, spec-tested equal:
  *  - [[Quantiles.Agg]] — the typed `Aggregator[Double, Sketch, Sketch]`:
  *    a real partial+final aggregation whose shuffle carries ONE sketch
  *    per (partition, group); `merge` IS the DDSketch merge.
  *  - [[Quantiles.bucketCounts]] — plain groupBy on the bucket
  *    expression: whole-stage-codegen'd, the shape for a one-shot build
  *    over the full table (the counts frame IS the sketch, one row per
  *    non-empty bucket).
  */
object Quantiles {

  /** Sketch state: positive-store counts, negative-store counts (indexed
    * by `bucketOf(-v)`), and the zero count. Merging is per-key count
    * sum. The maps are MODEL-SIZED: `O(log(max/min)/alpha)` entries
    * (~600 for a 1..1e5 range at alpha=1%), never row-scaled.
    */
  final case class Sketch(pos: Map[Int, Long], neg: Map[Int, Long], zero: Long) {

    def count: Long = zero + pos.valuesIterator.sum + neg.valuesIterator.sum

    def merge(o: Sketch): Sketch =
      Sketch(sumMaps(pos, o.pos), sumMaps(neg, o.neg), zero + o.zero)

    /** Quantile estimate at `q` (0 <= q <= 1) under the rank convention
      * `rank = max(1, ceil(q*n))` (the smallest value whose cumulative
      * count reaches the rank — percentile_disc's convention). Walks
      * negative buckets descending (most negative value first), then
      * zero, then positive ascending. NaN on an empty sketch.
      */
    def quantile(q: Double, gamma: Double): Double = {
      require(q >= 0 && q <= 1, s"quantile out of [0,1]: $q")
      val n = count
      if (n == 0) return Double.NaN
      val rank = math.max(1L, math.ceil(q * n).toLong)
      var cum = 0L
      for ((i, c) <- neg.toSeq.sortBy(-_._1)) {
        cum += c
        if (cum >= rank) return -estimate(i, gamma)
      }
      cum += zero
      if (cum >= rank) return 0.0
      for ((i, c) <- pos.toSeq.sortBy(_._1)) {
        cum += c
        if (cum >= rank) return estimate(i, gamma)
      }
      estimate(pos.keys.max, gamma) // unreachable (cum == n >= rank)
    }

    /** Collapse the positive store to at most `maxBins` buckets by
      * folding the LOWEST indices into the lowest kept one (the paper's
      * policy: upper quantiles — the ones monitoring cares about — keep
      * their guarantee; collapsed low quantiles degrade gracefully).
      * Bounds the state for unbounded-range inputs; a no-op below the
      * cap, so merge stays exactly associative until the cap binds.
      */
    def collapsed(maxBins: Int): Sketch =
      if (pos.size <= maxBins) this
      else {
        val sorted = pos.toSeq.sortBy(_._1)
        val (low, keep) = sorted.splitAt(pos.size - maxBins)
        val floorIdx = keep.head._1
        Sketch(keep.toMap.updated(floorIdx,
          keep.head._2 + low.iterator.map(_._2).sum), neg, zero)
      }
  }

  object Sketch {
    val empty: Sketch = Sketch(Map.empty, Map.empty, 0L)
  }

  private def sumMaps(a: Map[Int, Long], b: Map[Int, Long]): Map[Int, Long] =
    b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }

  /** Bucket index of a POSITIVE value: `ceil(round9(ln(v)/ln(gamma)))`,
    * the shared deterministic mapping (see object doc). HALF_UP matches
    * Spark's `round` and DuckDB's `round` (both away-from-zero on
    * halves).
    */
  def bucketOf(v: Double, gamma: Double): Int = {
    require(v > 0, s"bucketOf needs v > 0, got $v")
    // BigDecimal.valueOf (shortest decimal repr), NOT new BigDecimal
    // (exact binary expansion): Spark's Round expression rounds the
    // shortest repr, and the JVM-side mapping must agree bit-for-bit
    // with [[bucketCol]] on every double
    val q = JBigDecimal.valueOf(math.log(v) / math.log(gamma))
      .setScale(9, RoundingMode.HALF_UP).doubleValue()
    math.ceil(q).toInt
  }

  /** The identical mapping as a codegen'd Column (v must be > 0). */
  def bucketCol(v: Column, gamma: Double): Column =
    ceil(round(log(v) / lit(math.log(gamma)), 9)).cast("int")

  /** Representative value of positive bucket `i`: `2*gamma^i/(gamma+1)`,
    * inside `(gamma^(i-1), gamma^i]` with relative error <= alpha to
    * every value in the bucket.
    */
  def estimate(i: Int, gamma: Double): Double =
    2.0 * math.pow(gamma, i) / (gamma + 1.0)

  /** Column form of [[estimate]]. */
  def estimateCol(bucket: Column, gamma: Double): Column =
    lit(2.0) * pow(lit(gamma), bucket) / lit(gamma + 1.0)

  /** The DuckDB select-list fragment computing [[bucketCol]] over
    * `vExpr` (same rounded quotient, same literal `ln(gamma)`).
    */
  def bucketSql(vExpr: String, gamma: Double): String =
    s"CAST(ceil(round(ln($vExpr) / (${java.lang.Double.toString(math.log(gamma))}), 9)) AS INT)"

  /** The DuckDB fragment for [[estimateCol]] over a bucket expr. */
  def estimateSql(bucketExpr: String, gamma: Double): String =
    s"(2 * power(${java.lang.Double.toString(gamma)}, $bucketExpr) / ${java.lang.Double.toString(gamma + 1.0)})"

  /** Typed Aggregator: build (reduce), merge, query ([[Sketch.quantile]]
    * on the OUT value). Use via `functions.udaf(new Quantiles.Agg(gamma),
    * Encoders.scalaDouble)` — runs as a true partial aggregation, so at
    * 100 TB the shuffle carries one `O(bins)` sketch per (map-partition,
    * group), not rows. NULL inputs are skipped by Spark; zero and
    * negative values land in their stores.
    */
  final class Agg(gamma: Double, maxBins: Int = 4096)
      extends Aggregator[Double, Sketch, Sketch] {
    override def zero: Sketch = Sketch.empty
    override def reduce(b: Sketch, v: Double): Sketch = {
      val next =
        if (v == 0.0) b.copy(zero = b.zero + 1)
        else if (v > 0) {
          val i = bucketOf(v, gamma)
          b.copy(pos = b.pos.updated(i, b.pos.getOrElse(i, 0L) + 1))
        } else {
          val i = bucketOf(-v, gamma)
          b.copy(neg = b.neg.updated(i, b.neg.getOrElse(i, 0L) + 1))
        }
      next.collapsed(maxBins)
    }
    override def merge(a: Sketch, b: Sketch): Sketch =
      a.merge(b).collapsed(maxBins)
    override def finish(b: Sketch): Sketch = b
    override def bufferEncoder: Encoder[Sketch] = Encoders.product[Sketch]
    override def outputEncoder: Encoder[Sketch] = Encoders.product[Sketch]
  }

  /** One-shot codegen build path: `(groupCols..., bucket, cnt)` for the
    * positive values of `valueCol` — the counts frame IS the sketch
    * (merge = union + re-sum). One hash aggregation, no per-row JVM
    * state; prefer this for a single full-table build, the Aggregator
    * when sketches must ride an existing shuffle or persist as state.
    */
  def bucketCounts(df: DataFrame, groupCols: Seq[String], valueCol: Column,
                   gamma: Double): DataFrame =
    df.where(valueCol > 0)
      .groupBy((groupCols.map(col) :+ bucketCol(valueCol.cast("double"), gamma).as("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Quantile extraction from a positive-store counts frame, fully
    * in-frame (no driver collect): for each group and each q in `qs`,
    * the estimate of the bucket at `rank = max(1, ceil(q*n))`. Output
    * `(groupCols..., q, n, est)`; `est` rounded to 6 dp. The cumulative
    * walk windows are PARTITIONED by the group keys; per-group state is
    * the model-sized bucket list.
    */
  def quantilesFromCounts(counts: DataFrame, groupCols: Seq[String],
                          qs: Seq[Double], gamma: Double): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1))
    val keyCols = groupCols.map(col)
    val n = counts.groupBy(keyCols: _*).agg(sum(col("cnt")).as("n"))
    val cum = counts.withColumn("cum",
      sum(col("cnt")).over(
        Window.partitionBy(keyCols: _*).orderBy(col("bucket"))))
    val ranks = n
      .withColumn("q", explode(array(qs.map(q => lit(q)): _*)))
      .withColumn("rk",
        greatest(lit(1L), ceil(col("q") * col("n")).cast("long")))
    ranks.join(cum, groupCols)
      .where(col("cum") >= col("rk"))
      .groupBy((keyCols :+ col("q")): _*)
      .agg(max(col("n")).as("n"), min(col("bucket")).as("bi"))
      .select((keyCols :+ col("q") :+ col("n") :+
        round(estimateCol(col("bi"), gamma), 6).as("est")): _*)
  }
}
