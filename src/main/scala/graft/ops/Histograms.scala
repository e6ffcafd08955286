package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped percentiles via two-pass histogram pruning — the
  * scale path for order statistics (generalized from the q237 median):
  *
  *  1. pass 1 histograms each group into `bins` equi-width buckets
  *    (one hash aggregation; the bin frame is groups×bins);
  *  2. the cumulative bin counts locate, for every requested quantile,
  *    the bin(s) holding its lo/hi target ranks;
  *  3. pass 2 ranks ONLY candidate-bin rows (≈ |qs|·2/bins of the
  *    data), with each row's global rank reconstructed as
  *    bin-offset + within-bin position.
  *
  * Output is BIT-IDENTICAL to [[Percentiles.exact]] (the same
  * (n−1)·q rank interpolation over exact order statistics —
  * bin-of(v) is monotone in v, so bin-offset + local rank is a valid
  * global ranking, and tied rows carry equal values), but no full
  * per-group sort ever happens: at 100 TB the naive form sorts the
  * whole group; this touches ~2·|qs| bins of it.
  *
  * Use when groups are FEW and LARGE (the group/bin frames broadcast).
  * For high-cardinality keys use [[Percentiles.exact]] (per-group
  * sort is fine when groups are small); for no keys at all there is
  * [[Percentiles.exactGlobal]].
  */
object Histograms {

  /** @param precomputedBounds per-group `(keys..., __blo, __bhi, __n)`
    *   — min, max, and non-null count of the value — when the caller
    *   already aggregated them (e.g. alongside other moments, as
    *   [[Profile.summary]] does): passing them here skips this
    *   function's own bounds pass over the data.
    */
  def exact(df: DataFrame, keys: Seq[String], valueCol: Column,
            qs: Seq[(String, Double)], bins: Int = 100,
            precomputedBounds: Option[DataFrame] = None): DataFrame = {
    require(qs.nonEmpty, "qs must be non-empty")
    require(qs.forall { case (_, q) => q >= 0 && q <= 1 },
      s"quantiles must be in [0,1], got ${qs.map(_._2)}")
    require(bins >= 2, s"need at least 2 bins, got $bins")
    val keyCols = keys.map(col)
    val base = df.where(valueCol.isNotNull)
      .select(keyCols :+ valueCol.cast("double").as("v"): _*)
    val bounds = precomputedBounds.getOrElse(base.groupBy(keyCols: _*)
      .agg(min(col("v")).as("__blo"), max(col("v")).as("__bhi"),
        count(lit(1)).as("__n")))
    // per-quantile target ranks (0-based) and interpolation fractions —
    // the same (n-1)*q arithmetic as Percentiles.rankAggs
    val rankCols = qs.flatMap { case (name, q) =>
      val pos = (col("__n") - 1) * lit(q)
      val lo = floor(pos).cast("long")
      Seq(lo.as(s"__rlo_$name"),
        least(lo + 1, col("__n") - 1).as(s"__rhi_$name"),
        (pos - floor(pos)).as(s"__f_$name"))
    }
    val ranks = bounds.select(
      keyCols ++ Seq(col("__blo"), col("__bhi")) ++ rankCols: _*)
    // null-safe key join: a using-column join would drop NULL-key groups
    // that Percentiles.exact keeps
    def keyJoin(l: DataFrame, r: DataFrame): DataFrame =
      if (keys.isEmpty) l.crossJoin(r)
      else l.as("l").join(r.as("r"),
          keys.map(k => col(s"l.$k") <=> col(s"r.$k")).reduce(_ && _))
        .select(col("l.*") +:
          r.columns.filterNot(keys.contains).map(c => col(s"r.$c")): _*)
    val binOf = when(col("__bhi") > col("__blo"),
      least(lit(bins - 1),
        floor((col("v") - col("__blo")) / (col("__bhi") - col("__blo")) * bins)
          .cast("int"))).otherwise(0)
    val binned = keyJoin(base, ranks).withColumn("__bin", binOf)
    val cumW = Window.partitionBy(keyCols: _*).orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val targetHit = qs.map { case (name, _) =>
      (col(s"__rlo_$name") >= col("__below") &&
        col(s"__rlo_$name") < col("__below") + col("__cnt")) ||
        (col(s"__rhi_$name") >= col("__below") &&
          col(s"__rhi_$name") < col("__below") + col("__cnt"))
    }.reduce(_ || _)
    // the bin frame is groups×bins — the cum window partitions by group
    val candidates = binned
      .groupBy((keyCols :+ col("__bin")) ++ qs.flatMap { case (name, _) =>
        Seq(col(s"__rlo_$name"), col(s"__rhi_$name"), col(s"__f_$name"))
      }: _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__below", sum(col("__cnt")).over(cumW) - col("__cnt"))
      .where(targetHit)
      .select(keyCols ++ Seq(col("__bin"), col("__below")): _*)
    // pass 2: rank candidate-bin rows only; global rank = offset + local
    val inBinW = Window.partitionBy(keyCols :+ col("__bin"): _*)
      .orderBy(col("v"))
    val picked = binned.as("b")
      .join(broadcast(candidates).as("c"),
        (keys.map(k => col(s"b.$k") <=> col(s"c.$k")) :+
          (col("b.__bin") === col("c.__bin"))).reduce(_ && _))
      .select(col("b.*"), col("c.__below").as("__below"))
      .withColumn("__grank", col("__below") + row_number().over(inBinW) - 1)
    val aggs = qs.flatMap { case (name, _) =>
      Seq(
        min(when(col("__grank") === col(s"__rlo_$name"), col("v")))
          .as(s"__lo_$name"),
        min(when(col("__grank") === col(s"__rhi_$name"), col("v")))
          .as(s"__hi_$name"),
        min(col(s"__f_$name")).as(s"__f_$name"))
    }
    val g = picked.groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
    Percentiles.interpolate(g, qs)
      .select(keyCols ++ qs.map { case (name, _) => col(name) }: _*)
  }
}
