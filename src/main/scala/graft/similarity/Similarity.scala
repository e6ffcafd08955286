package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Relational
import graft.functions.PortableSql

/** Similarity search over embedding columns (north-star set).
  *
  * Two paths:
  *  - [[cosine]] / [[knnBruteForce]]: exact brute-force cosine top-k —
  *    the correctness baseline. The pair join is a broadcast of the (small)
  *    query side against the corpus, so the corpus never shuffles.
  *  - [[lshBuckets]] / [[knnLsh]]: random-hyperplane LSH — the scale path.
  *    Deterministic pseudo-random hyperplanes are derived from md5 seeds,
  *    vectors are bucketed by sign-bit signature, and candidate search is
  *    an equi-join on bucket id. At 100 TB this replaces the n×m cross
  *    product with per-bucket joins (recall traded via nBits).
  *
  * Cosine arithmetic is fixed-order double math (left-assoc fold) so
  * results are bit-identical to the DuckDB oracle built from
  * [[PortableSql.cosine]].
  */
object Similarity {

  /** Dot product with a fixed fold order: elements promoted to double
    * before multiply, accumulated left-to-right (matches the oracle's
    * left-assoc `+` chain bit-for-bit).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Cosine similarity (same formula shape as [[PortableSql.cosine]]). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact top-k nearest neighbours by cosine for each query vector.
    * `queries` is expected to be small (broadcast side).
    */
  def knnBruteForce(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_emb"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", round(cosine(col("q_emb"), col("c_emb")), 6))
    Relational.topKPerGroup(scored,
        partitionCols = Seq(col("query_id")),
        order = Seq(col("cos_sim").desc, col("neighbor_id").asc),
        k = k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  /** All pairs (a < b) with cosine >= threshold — embedding-space near-dup
    * detection. Brute-force; for the bucketed variant compose with
    * [[lshBuckets]].
    */
  def nearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(cosine(col("emb_a"), col("emb_b")), 6))
      .where(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * maps md5("p|i") to a value in [-1, 1). Engine-portable.
    */
  private def planeComponent(p: Int, i: Int): Column =
    expr(PortableSql.hexToLong(s"md5('$p|$i')", 8)) / lit(math.pow(16, 8)) * 2 - 1

  /** Sign-bit LSH bucket id from `nBits` random hyperplanes. Vectors whose
    * dot with plane p is >= 0 set bit p. One narrow projection — no
    * shuffle.
    */
  def lshBucket(embCol: Column, dim: Int, nBits: Int): Column =
    (0 until nBits).map { p =>
      val d = (1 to dim).map { i =>
        element_at(embCol, i).cast("double") * planeComponent(p, i)
      }.reduce(_ + _)
      when(d >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucketed approximate near-neighbour candidates: only pairs sharing an
    * LSH bucket are scored. Returns (id_a, id_b, cos_sim) for same-bucket
    * pairs with cosine >= threshold.
    */
  def knnLsh(emb: DataFrame, dim: Int, nBits: Int, threshold: Double): DataFrame = {
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), dim, nBits).as("bucket"))
    val a = bucketed.select(col("bucket"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = bucketed.select(col("bucket"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(cosine(col("emb_a"), col("emb_b")), 6))
      .where(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "bucket", "cos_sim")
  }
}
