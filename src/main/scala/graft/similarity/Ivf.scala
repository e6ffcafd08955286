package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ArrayMath

/** IVF (inverted-file) approximate nearest neighbour — the second scale
  * path next to [[Similarity.knnLsh]] (hyperplane LSH): partition the
  * corpus into K cells around centroids (spherical k-means on unit
  * vectors ≙ max-inner-product assignment), then search only the
  * `nProbe` most promising cells per query.
  *
  * At 100 TB: assignment is a narrow projection of K compact
  * [[ArrayMath.DotWithConst]] expressions (no shuffle); the per-cell
  * candidate join is an equi-join on `cell`; training collects only the
  * K×dim centroid matrix to the driver per iteration — bounded by model
  * size, never by data size. Cells double as a physical layout key:
  * `partitionBy("cell")` writes an actual inverted file, so a probe
  * reads nProbe/K of the corpus (partition pruning).
  *
  * Determinism: seeds are the K lowest-id vectors; ties in assignment
  * break toward the higher score then higher cell id via lexicographic
  * struct max; no randomness anywhere.
  */
object Ivf {

  /** argmax-by-(score, cell) over the centroid set: greatest() over
    * (dot, cellId) structs — lexicographic, deterministic.
    */
  private def cellOf(emb: Column, centroids: Array[Array[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(ArrayMath.dotConst(emb, c).as("score"), lit(i).as("cell"))
    }
    greatest(scored.toSeq: _*).getField("cell")
  }

  /** Top-`nProbe` cells per vector, as an array column (descending
    * score). `sort_array` on (score, cell) structs, descending, sliced.
    */
  private[similarity] def probeCells(emb: Column, centroids: Array[Array[Double]],
                         nProbe: Int): Column = {
    val scored = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(ArrayMath.dotConst(emb, c).as("score"), lit(i).as("cell"))
    }: _*)
    transform(slice(sort_array(scored, asc = false), 1, nProbe),
      s => s.getField("cell"))
  }

  /** Lloyd iterations with max-inner-product assignment. Empty cells keep
    * their previous centroid. Returns the K×dim centroid matrix.
    */
  def train(emb: DataFrame, k: Int, iters: Int = 2,
            idCol: String = "vec_id", embCol: String = "embedding"): Array[Array[Double]] = {
    var centroids: Array[Array[Double]] = emb.orderBy(col(idCol)).limit(k)
      .select(embCol).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dim = centroids.head.length
    (0 until iters).foreach { _ =>
      val stats = emb
        .select(cellOf(col(embCol), centroids).as("cell"),
          posexplode(col(embCol)).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg(sum(col("v").cast("double")).as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3)))
        .toMap
      centroids = Array.tabulate(k) { c =>
        if (stats.contains((c, 0))) {
          val mean = Array.tabulate(dim) { p => val (s, n) = stats((c, p)); s / n }
          // spherical k-means: L2-normalize so max-inner-product assignment
          // stays equivalent to nearest-by-cosine (unnormalized means bias
          // assignment toward tight, large-norm cells)
          val nrm = math.sqrt(mean.map(x => x * x).sum)
          if (nrm > 0) mean.map(_ / nrm) else mean
        } else centroids(c)
      }
    }
    centroids
  }

  /** Deterministic pseudo-random UNIT centroids (md5-derived, same
    * generator family as [[Similarity.planeComponent]], offset so they
    * never coincide with LSH planes). Lets the IVF *search path* — probe
    * ranking, cell assignment, candidate join, top-k — run against a
    * statically-known centroid matrix that a SQL oracle can embed as
    * literals; [[train]] remains the data-adaptive path (spec-verified:
    * probe-all ≡ brute force).
    */
  def fixedCentroids(k: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(k) { c =>
      val raw = Array.tabulate(dim)(i => Similarity.planeComponent(1000 + c, i + 1))
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / nrm)
    }

  /** Corpus with its cell assignment (the inverted-file key). */
  def assign(emb: DataFrame, centroids: Array[Array[Double]],
             embCol: String = "embedding"): DataFrame =
    emb.withColumn("cell", cellOf(col(embCol), centroids))

  /** Approximate top-`k` cosine neighbours: per query, search only the
    * `nProbe` best cells. Equi-join on `cell`, then exact cosine within
    * candidates (norms hoisted per side).
    *
    * `scoreCol` (default: `embCol`) separates the ASSIGNMENT vectors from
    * the SCORING vectors — the IVF-SQ shape (FAISS IVF+scalar-quantizer):
    * cells are probed on full-precision embeddings while in-cell scoring
    * reads the int8 codes ([[Quantize]]), so the hot candidate scan does
    * quarter-width I/O and the coarse structure keeps full fidelity.
    */
  def knn(queries: DataFrame, corpus: DataFrame,
          centroids: Array[Array[Double]], nProbe: Int, k: Int,
          dim: Int = 64, idCol: String = "vec_id",
          embCol: String = "embedding", scoreCol: String = null): DataFrame = {
    val sCol = Option(scoreCol).getOrElse(embCol)
    val q = queries
      .select(col(idCol).as("query_id"), col(sCol).as("q_emb"),
        Similarity.norm(col(sCol), dim).as("q_norm"),
        explode(probeCells(col(embCol), centroids, nProbe)).as("cell"))
    val c = assign(corpus, centroids, embCol)
      .select(col("cell"), col(idCol).as("neighbor_id"),
        col(sCol).as("c_emb"),
        Similarity.norm(col(sCol), dim).as("c_norm"))
    val scored = q.join(c, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim",
        round(Similarity.dot(col("q_emb"), col("c_emb"), dim) /
          (col("q_norm") * col("c_norm")), 6))
    graft.ops.Relational.topKPerGroup(scored,
        partitionCols = Seq(col("query_id")),
        order = Seq(col("cos_sim").desc, col("neighbor_id").asc), k = k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }
}
