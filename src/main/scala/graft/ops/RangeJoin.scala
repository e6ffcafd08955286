package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join — the scale pattern for range predicates that Spark
  * would otherwise plan as a Broadcast Nested Loop join (O(n·m) pair
  * evaluations, single-node hotspots).
  *
  * A point `p` matches an interval `[s, e]`. Quantize the axis into bands
  * of `bandWidth`: an interval overlaps at most
  * `ceil(len/bandWidth) + 1` bands, a point exactly one — so banding both
  * sides turns the range predicate into an EQUI-join on the band id plus
  * an exact residual filter. Shuffle is hash-on-band (parallel, AQE-
  * balanceable); cost scales with true match density, not n·m. Same trick
  * as the interval-join in genomics engines and kdb's window joins.
  *
  * Requires bounded interval length (bands per interval is the explode
  * factor — keep `bandWidth` within ~1-2× the typical interval length).
  */
object RangeJoin {

  /** Join `points` to `intervals` where
    * `intervals.start <= points.point <= intervals.end`.
    *
    * @param bandWidth axis quantum, same unit as the point/start/end
    *                  columns (must be numeric, e.g. epoch seconds)
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      bandWidth: Long): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    val p = points.withColumn("_band",
      floor(col(pointCol) / bandWidth).cast("long"))
    val iv = intervals.withColumn("_band",
      explode(sequence(
        floor(col(startCol) / bandWidth).cast("long"),
        floor(col(endCol) / bandWidth).cast("long"))))
    p.join(iv, Seq("_band"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_band")
  }

  /** Interval×interval overlap join: pairs of `left`/`right` rows sharing
    * every `keys` value whose closed intervals `[lStart,lEnd]` and
    * `[rStart,rEnd]` intersect (`lStart <= rEnd AND rStart <= lEnd`).
    *
    * Same banding idea as [[pointInInterval]], both sides exploded: a
    * pair of overlapping intervals co-occurs in every band their
    * intersection touches, so the raw banded equi-join would emit it
    * up to ceil(overlap/bandWidth)+1 times. Rather than a distinct over
    * that multiset (a second full shuffle of the candidate set), each
    * pair is kept only in the FIRST band of the intersection —
    * `max(floor(lStart/W), floor(rStart/W))` — a scalar filter evaluated
    * inside the join (both starts are in the row). Shuffle remains
    * hash-on-(keys, band); cost scales with match density, never n·m.
    *
    * Column names across `left`/`right` must be disjoint apart from
    * `keys` (alias before calling, as with any self-join).
    */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String,
                      bandWidth: Long): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    def banded(df: DataFrame, s: String, e: String) = df.withColumn("_band",
      explode(sequence(
        floor(col(s) / bandWidth).cast("long"),
        floor(col(e) / bandWidth).cast("long"))))
    banded(left, lStart, lEnd)
      .join(banded(right, rStart, rEnd), keys :+ "_band")
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("_band") === greatest(
          floor(col(lStart) / bandWidth).cast("long"),
          floor(col(rStart) / bandWidth).cast("long")))
      .drop("_band")
  }
}
