package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): rows not dominated on a
  * (minimize `mnCol`, maximize `mxCol`) objective — the multi-criteria
  * shortlist operator (cheapest-but-biggest, newest-but-highest-quality)
  * relational engines lack natively.
  *
  * a dominates b iff a.mn <= b.mn ∧ a.mx >= b.mx with at least one
  * strict. A row survives iff (1) it carries the max `mx` of its `mn`
  * group, and (2) that group max strictly exceeds the running max over
  * all strictly-smaller `mn` groups.
  *
  * Scale shape (100 TB): one hash aggregation collapses the input to
  * its distinct `mn` values; the sequential running-max window runs over
  * THAT frame (distinct-value-sized, typically orders smaller), and
  * survivors join back by `mn` value. When even the distinct-value frame
  * is huge, pre-split it by range into coarse bins, take per-bin
  * skylines, and re-run on the union (skyline-of-skylines is exact —
  * dominance is transitive and bin-local losers stay losers globally).
  *
  * Determinism: pure comparisons — output is an exact row subset.
  */
object Skyline {

  /** Skyline rows of `df` minimizing `mnCol`, maximizing `mxCol` —
    * returns the input rows (all columns) on the frontier, including
    * duplicate frontier points.
    *
    * `broadcastFrontier`: the frontier is skyline-sized (usually tiny),
    * but an adversarial strictly-improving staircase makes it as large
    * as the distinct `mnCol` set — pass false there and the join-back
    * becomes a shuffle equi-join.
    */
  def pareto(df: DataFrame, mnCol: Column, mxCol: Column,
             broadcastFrontier: Boolean = true): DataFrame = {
    val groups = df.groupBy(mnCol.as("_mn")).agg(max(mxCol).as("_gmax"))
    // Frontier via the distributed INCLUSIVE running max (a bare
    // exclusive-frame window would pull every distinct _mn to one task):
    // a group beats all predecessors iff it equals the inclusive running
    // max AND is the first (min _mn) group attaining that max value.
    val run = graft.ops.Prefix.runningMax(groups, Seq(col("_mn")),
      col("_gmax"), out = "_run")
    val frontier = run.where(col("_gmax") === col("_run"))
      .groupBy(col("_run")).agg(min(col("_mn")).as("_mn"))
      .join(groups, Seq("_mn"))
      .select(col("_mn"), col("_gmax"))
    df.join(if (broadcastFrontier) broadcast(frontier) else frontier,
        mnCol === col("_mn") && mxCol === col("_gmax"))
      .drop("_mn", "_gmax")
  }
}
