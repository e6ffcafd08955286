package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link prediction on an undirected edge list: Adamic–Adar scoring of
  * non-adjacent pairs (Adamic & Adar, Social Networks 2003) — "which
  * parts will be co-purchased next", the classic common-neighbor
  * recommender:
  *   AA(x, y) = Σ_{z ∈ N(x) ∩ N(y)} 1 / ln(deg z)
  * (rare shared neighbors count more than hub co-membership).
  *
  * Scale shape (100 TB graph):
  *  - candidate pairs come from the WEDGE join (neighbors-of-z ×
  *    neighbors-of-z), the same Σ deg² expansion the triangle counter
  *    uses — never an all-pairs join;
  *  - `maxDeg` caps the expansion: hub centers cost deg² wedges yet
  *    contribute only 1/ln(deg) ≈ 0 per pair, so dropping z with
  *    deg > maxDeg bounds the worst key at maxDeg²/2 while barely
  *    moving scores (the df-cap idiom of `Dedup.jaccardPairs`);
  *  - known edges leave via a LEFT ANTI join on the pair key;
  *  - top-k is a distributed sort-limit, never a global window.
  *
  * Determinism: 1/ln(deg) is rounded at 9 then decimal-summed — engine
  * identical. A wedge center always has deg >= 2, so ln(deg) > 0.
  */
object LinkPrediction {

  /** Top-`k` non-adjacent pairs of `edges`(a, b with a < b) by
    * Adamic–Adar score: (a, b, n_common, aa), ordered by aa desc with
    * (a, b) tie-break.
    */
  def adamicAdar(edges: DataFrame, maxDeg: Int, k: Int): DataFrame = {
    val d = edges.select(col("a").as("z"), col("b").as("x"))
      .unionByName(edges.select(col("b").as("z"), col("a").as("x")))
    val deg = d.groupBy("z").agg(count(lit(1)).as("dg"))
    val dz = d.join(deg, "z").where(col("dg") <= maxDeg)
    val wedges = dz.select(col("z"), col("x").as("xa"), col("dg"))
      .join(dz.select(col("z"), col("x").as("xb")), Seq("z"))
      .where(col("xa") < col("xb"))
      .select(col("xa").as("a"), col("xb").as("b"),
        round(lit(1.0) / log(col("dg").cast("double")), 9).as("term"))
    wedges.groupBy("a", "b")
      .agg(sum(col("term").cast("decimal(27,9)")).cast("double").as("aa_raw"),
        count(lit(1)).as("n_common"))
      .join(edges, Seq("a", "b"), "left_anti")
      .select(col("a"), col("b"), col("n_common"),
        round(col("aa_raw"), 6).as("aa"))
      .orderBy(col("aa").desc, col("a"), col("b"))
      .limit(k)
  }
}
