package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected edge list — the
  * clustering-structure primitive behind community detection and
  * link-farm/duplicate-ring detection in web-corpus curation.
  *
  * Algorithm: degree-ordered compact-forward (Latapy 2008, the shape
  * MapReduce triangle counting distributes). Every undirected edge is
  * oriented from its lower-(degree, id) endpoint to the higher one;
  * wedges are enumerated by self-joining oriented edges on their source;
  * a wedge (v, w) closes iff the oriented edge v→w exists.
  *
  * Why orientation matters at 100 TB: wedge count under degree
  * orientation is Σ outdeg(u)² with every out-degree capped at O(√|E|) —
  * a star node of degree 10⁶ contributes ZERO wedges from its center
  * (all its edges orient toward it) instead of 10¹². All stages are
  * equi-joins and hash aggregations on node ids: no cartesian product,
  * no driver-side adjacency, and the orientation key doubles as the
  * skew guard.
  *
  * Determinism: outputs are exact integer ids/counts.
  */
object Triangles {

  /** `edges`: undirected edges as (a, b) pairs, either or both
    * directions; self-loops and duplicate pairs are dropped here.
    * Returns one row per triangle: (v1, v2, v3) with v1 < v2 < v3.
    *
    * `broadcastDegrees`: the degree frame is node-sized — broadcast
    * keeps the two orientation joins map-side for dimension-like node
    * sets (same trade-off as [[PageRank.run]]'s rank vector); pass
    * false when the node set outgrows executor memory and the joins
    * fall back to shuffle equi-joins.
    */
  def triangles(edges: DataFrame, broadcastDegrees: Boolean = true): DataFrame = {
    // Cached: consumed by the degree count (twice via the union), the
    // orientation join, the wedge self-join, and the closure join — an
    // uncached plan recomputes the caller's (often expensive) edge
    // derivation once per consumer.
    val und = graft.ops.Frames.cached(edges.toDF("a", "b")
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("lo"),
        greatest(col("a"), col("b")).as("hi"))
      .distinct())
    val deg = und.select(col("lo").as("v")).unionAll(und.select(col("hi")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    // Orient lower-(deg, id) -> higher, carrying the destination's
    // degree (the wedge join needs it to order wedge endpoints by the
    // same key).
    def hinted(df: DataFrame) = if (broadcastDegrees) broadcast(df) else df
    val dl = hinted(deg.select(col("v").as("lo"), col("deg").as("dlo")))
    val dh = hinted(deg.select(col("v").as("hi"), col("deg").as("dhi")))
    val loFirst = col("dlo") < col("dhi") ||
      (col("dlo") === col("dhi") && col("lo") < col("hi"))
    // Cached: the wedge join reads it twice and the closure join once.
    val oriented = graft.ops.Frames.cached(
      und.join(dl, "lo").join(dh, "hi")
        .select(
          when(loFirst, col("lo")).otherwise(col("hi")).as("src"),
          when(loFirst, col("hi")).otherwise(col("lo")).as("dst"),
          when(loFirst, col("dhi")).otherwise(col("dlo")).as("ddst")))
    // Wedges out of a common source, endpoints ordered by the
    // orientation key (deg, id) — so the closing edge, if present, is
    // oriented v->w by construction and one equi-join decides closure.
    val e1 = oriented.select(col("src"), col("dst").as("v"), col("ddst").as("dv"))
    val e2 = oriented.select(col("src"), col("dst").as("w"), col("ddst").as("dw"))
    val wedges = e1.join(e2, "src")
      .where(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
    wedges.join(oriented.select(col("src").as("v"), col("dst").as("w")),
        Seq("v", "w"))
      .select(
        least(col("src"), col("v"), col("w")).as("v1"),
        (col("src") + col("v") + col("w") -
          least(col("src"), col("v"), col("w")) -
          greatest(col("src"), col("v"), col("w"))).as("v2"),
        greatest(col("src"), col("v"), col("w")).as("v3"))
  }

  /** Per-node triangle participation counts: (v, n_triangles) — each
    * triangle credits all three corners. One explode + hash aggregation
    * over the triangle frame.
    */
  def nodeTriangleCounts(tris: DataFrame): DataFrame =
    tris.select(explode(array(col("v1"), col("v2"), col("v3"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_triangles"))
}
