package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree assortativity (Newman 2002, "Assortative mixing in
  * networks"): the Pearson correlation of endpoint degrees over the
  * edges of an undirected graph. Positive → hubs link to hubs
  * (social-network-like); negative → hubs link to leaves
  * (internet-like).
  *
  * Scale shape: one degree aggregation (hash agg on vertex), two
  * equi-joins of the edge list against the degree table (broadcast
  * when the vertex set is small, shuffle-hash otherwise), one global
  * aggregation of five integer moments. No quadratic step; everything
  * stays integer-exact until a single final double expression.
  */
object Assortativity {

  /** Undirected degrees from a deduplicated a<b edge list. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("a").as("v"))
      .unionAll(edges.select(col("b")))
      .groupBy("v").agg(count(lit(1)).as("d"))

  /** Single-row frame: n_directed_edges, assortativity (rounded to 8).
    * Each undirected edge contributes both orientations so the
    * correlation is symmetric (Sx == Sy by construction).
    */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val deg = degrees(edges)
    val joined = edges
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
    val de = joined.select(col("da").as("x"), col("db").as("y"))
      .unionAll(joined.select(col("db"), col("da")))
    val s = de.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    s.select(col("n").as("n_directed_edges"),
      round(
        (col("n").cast("double") * col("sxy") -
          col("sx").cast("double") * col("sy")) /
          (sqrt(col("n").cast("double") * col("sxx") -
            col("sx").cast("double") * col("sx")) *
            sqrt(col("n").cast("double") * col("syy") -
              col("sy").cast("double") * col("sy"))), 8)
        .as("assortativity"))
  }
}
