package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PortableSql
import graft.similarity.{Ivf, Similarity}

/** North-star similarity-search queries over `embeddings` (64-dim float
  * vectors): brute-force cosine top-k (correctness baseline), cosine
  * near-dup pairs, and the LSH-bucketed scale path (rows-only check — its
  * oracle SQL would be ~0.5 MB of constant-folded hyperplanes; its
  * equivalence to brute force is asserted in ScalaTest instead).
  */
object SimilarityQueries {

  private val Dim = 64

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def cosSql(a: String, b: String) =
    s"round(${PortableSql.cosine(a, b, Dim)}, 6)"

  def all: Seq[Q] = Seq(

    // Brute-force exact cosine top-3 neighbours for query vectors id < 5.
    Q("q38_knn_cosine", Q.sql(s"""
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            ${cosSql("q.embedding", "c.embedding")} AS cos_sim,
            row_number() OVER (
              PARTITION BY q.vec_id
              ORDER BY ${cosSql("q.embedding", "c.embedding")} DESC, c.vec_id) AS rank
          FROM embeddings q, embeddings c
          WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id) t
        WHERE rank <= 3
        ORDER BY query_id, rank"""))(
      (s, dir) => {
        val emb = T(s, dir, "embeddings")
        Similarity.knnBruteForce(emb.where(col("vec_id") < 5), emb, k = 3)
          .orderBy("query_id", "rank")
      }),

    // Embedding-space near-dup pairs: all (a < b) with cosine >= 0.4.
    Q("q39_embedding_neardup", Q.sql(s"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          ${cosSql("a.embedding", "b.embedding")} AS cos_sim
        FROM embeddings a, embeddings b
        WHERE a.vec_id < b.vec_id
          AND ${cosSql("a.embedding", "b.embedding")} >= 0.4
        ORDER BY id_a, id_b"""))(
      (s, dir) =>
        Similarity.nearDupPairs(T(s, dir, "embeddings"), threshold = 0.4)
          .orderBy("id_a", "id_b")),

    // LSH-bucketed near-neighbour candidates (scale path; rows-only check).
    Q("q41_lsh_neardup", None)(
      (s, dir) =>
        Similarity.knnLsh(T(s, dir, "embeddings"), dim = Dim, nBits = 8,
            threshold = 0.3)
          .orderBy("id_a", "id_b")),

    // IVF approximate top-k (second scale path; rows-only check — IvfSpec
    // proves probe-all == brute force and measures partial-probe recall).
    Q("q47_ivf_knn", None)(
      (s, dir) => {
        val emb = T(s, dir, "embeddings")
        val centroids = Ivf.train(emb, k = 8, iters = 2)
        Ivf.knn(emb.where(col("vec_id") < 5), emb, centroids,
            nProbe = 3, k = 3)
          .orderBy("query_id", "rank")
      })
  )
}
