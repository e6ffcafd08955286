package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Relational
import graft.functions.{ArrayMath, PortableSql}

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

  /** Dot product via the native [[ArrayMath.DotProduct]] expression: a
    * tight codegen loop with the same left-to-right IEEE accumulation
    * order as the oracle's left-assoc `+` chain ([[PortableSql.dot]]).
    * (`zip_with`+`aggregate` evaluates interpreted with a per-row
    * intermediate array; a 64-term `element_at` chain makes a ~320-node
    * tree that gets duplicated into pushed-down join conditions — both
    * dominated the O(n²) pair queries.)
    */
  def dot(a: Column, b: Column, dim: Int): Column = ArrayMath.dot(a, b)

  /** L2 norm — compute ONCE per vector (see [[nearDupPairs]]), never per
    * pair.
    */
  def norm(a: Column, dim: Int): Column = sqrt(dot(a, a, dim))

  /** Cosine similarity (same formula shape as [[PortableSql.cosine]]).
    * For pair joins prefer `dot(a,b)/(norm_a*norm_b)` with hoisted norms.
    */
  def cosine(a: Column, b: Column, dim: Int): Column =
    dot(a, b, dim) / (norm(a, dim) * norm(b, dim))

  /** Exact top-k nearest neighbours by cosine for each query vector.
    * `queries` is expected to be small (broadcast side). Corpus norms are
    * computed once in the scan projection, not per (query, corpus) pair —
    * the per-pair work is one dot product.
    */
  /** Spread CPU-heavy per-pair work across all cores: a small parquet
    * input arrives as ONE scan partition (file < maxPartitionBytes), which
    * would run an O(n²) nested-loop join single-threaded. Round-robin
    * repartition of the streamed side costs one tiny shuffle and
    * parallelizes the quadratic stage.
    */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  def knnBruteForce(queries: DataFrame, corpus: DataFrame, k: Int,
                    dim: Int = 64): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      norm(col("embedding"), dim).as("q_norm"))
    val c = spread(corpus).select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_emb"),
      norm(col("embedding"), dim).as("c_norm"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim",
        round(dot(col("q_emb"), col("c_emb"), dim) /
          (col("q_norm") * col("c_norm")), 6))
    Relational.topKPerGroup(scored,
        partitionCols = Seq(col("query_id")),
        order = Seq(col("cos_sim").desc, col("neighbor_id").asc),
        k = k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  /** All pairs (a < b) with cosine >= threshold — embedding-space near-dup
    * detection. Brute-force O(n²) baseline; [[knnLsh]] is the scale path.
    * Norms are hoisted into the per-side scan projection so the O(n²)
    * inner loop does one dot product per pair instead of three.
    */
  def nearDupPairs(emb: DataFrame, threshold: Double, dim: Int = 64): DataFrame = {
    val a = spread(emb).select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
      norm(col("embedding"), dim).as("norm_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
      norm(col("embedding"), dim).as("norm_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos_sim",
        round(dot(col("emb_a"), col("emb_b"), dim) /
          (col("norm_a") * col("norm_b")), 6))
      .where(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * maps md5("p|i") to a value in [-1, 1). Computed driver-side with the
    * identical derivation the SQL form would use (first 8 hex chars of the
    * md5 as a base-16 integer, scaled) — hyperplanes are constants, they
    * have no business being plan nodes.
    */
  def planeComponent(p: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$p|$i".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(8)
    java.lang.Long.parseLong(hex, 16).toDouble / math.pow(16, 8) * 2 - 1
  }

  /** The deterministic hyperplane matrix (nBits × dim) — shared between
    * the Spark bucketing expression and generated oracle SQL.
    */
  def planes(nBits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nBits)(p => Array.tabulate(dim)(i => planeComponent(p, i + 1)))

  /** Sign-bit LSH bucket id from `nBits` random hyperplanes. Vectors whose
    * dot with plane p is >= 0 set bit p. One narrow projection of compact
    * [[ArrayMath.DotWithConst]] expressions — no shuffle, stays in
    * whole-stage codegen.
    */
  def lshBucket(embCol: Column, dim: Int, nBits: Int): Column =
    planes(nBits, dim).zipWithIndex.map { case (plane, p) =>
      when(ArrayMath.dotConst(embCol, plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucketed approximate near-neighbour candidates: only pairs sharing an
    * LSH bucket are scored. Returns (id_a, id_b, cos_sim) for same-bucket
    * pairs with cosine >= threshold.
    */
  /** Cached (vec_id, embedding, bucket, nrm) projection — the shared
    * first stage of [[knnLsh]] and [[semDedup]] (cached because the
    * bucket self-join consumes it twice).
    */
  private def lshBucketed(emb: DataFrame, dim: Int, nBits: Int): DataFrame =
    graft.ops.Frames.cached(
      spread(emb).select(col("vec_id"), col("embedding"),
        lshBucket(col("embedding"), dim, nBits).as("bucket"),
        norm(col("embedding"), dim).as("nrm")))

  /** Within-bucket candidate pairs (id_a < id_b) with the rounded cosine
    * — the bucket equi-join both LSH consumers build on (hoisted norms,
    * one codegen dot per pair).
    */
  private def bucketPairs(bucketed: DataFrame, dim: Int): DataFrame = {
    val a = bucketed.select(col("bucket"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"), col("nrm").as("norm_a"))
    val b = bucketed.select(col("bucket"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"), col("nrm").as("norm_b"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cos_sim",
        round(dot(col("emb_a"), col("emb_b"), dim) /
          (col("norm_a") * col("norm_b")), 6))
  }

  def knnLsh(emb: DataFrame, dim: Int, nBits: Int, threshold: Double): DataFrame =
    bucketPairs(lshBucketed(emb, dim, nBits), dim)
      .where(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "bucket", "cos_sim")

  /** Semantic dedup (the SemDedup shape, Abbas et al. 2023): drop every
    * vector that has a lower-id near-duplicate (cosine >= `threshold`)
    * in its LSH bucket; keep the rest. Output: (vec_id, bucket, kept),
    * one row per vector.
    *
    * Scale shape: identical to [[knnLsh]] — bucket equi-join, hoisted
    * norms, one codegen dot per candidate pair — plus one aggregation of
    * the dropped-id set and a left join back. Greedy keep-lowest-id (a
    * vector is dropped if ANY kept-or-dropped lower id is near it): one
    * pass, deterministic, no iteration — the standard approximation to
    * per-cluster exemplar selection (full transitive clustering is
    * [[graft.dedup.Dedup.components]] over the pair output when needed).
    */
  def semDedup(emb: DataFrame, dim: Int, nBits: Int, threshold: Double): DataFrame = {
    val bucketed = lshBucketed(emb, dim, nBits)
    val drops = bucketPairs(bucketed, dim)
      .where(col("cos_sim") >= threshold)
      .select(col("id_b").as("vec_id")).distinct()
    bucketed.select(col("vec_id"), col("bucket"))
      .join(drops.withColumn("_dropped", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("bucket"),
        coalesce(!col("_dropped"), lit(true)).as("kept"))
  }

  /** Distance-from-centroid outlier scoring: each vector's Euclidean
    * distance to the global mean vector — the embedding-space quality
    * filter that flags out-of-distribution rows before training.
    * Output: (id, centroid_dist), one row per vector.
    *
    * Scale shape: posexplode fans dim×, the centroid is a dim-row
    * aggregate (never driver-side), and scoring re-joins on the dimension
    * index against the BROADCAST centroid — the corpus shuffles once for
    * its own per-id aggregation and never on content.
    *
    * Determinism: per-dimension sums are decimal-routed (mirror of
    * q81's centroid derivation); squared deviations are decimal-summed
    * before one final sqrt, so the result is aggregation-order-free.
    */
  def centroidDistances(emb: DataFrame, idCol: Column, vecCol: Column): DataFrame = {
    import graft.ops.Relational.dsum
    // Referenced twice (centroid fit + scoring join).
    val pts = graft.ops.Frames.cached(spread(emb)
      .select(idCol.as("id"), posexplode(vecCol.cast("array<double>"))))
    val centroid = pts.groupBy("pos")
      .agg((dsum(col("col"), 8) / count(lit(1))).as("c"))
    pts.join(broadcast(centroid), "pos")
      .groupBy("id")
      .agg(sqrt(dsum((col("col") - col("c")) * (col("col") - col("c")), 8))
        .as("raw"))
      .select(col("id"), round(col("raw"), 6).as("centroid_dist"))
  }
}
