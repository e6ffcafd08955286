package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ArrayMath
import graft.ops.Relational

/** Product quantization (PQ) — the third ANN scale path next to
  * hyperplane LSH ([[Similarity.knnLsh]]) and IVF ([[Ivf]]), and the one
  * that compresses hardest: each `dim`-vector is split into `m`
  * subvectors, each encoded as the id of its nearest sub-codebook
  * centroid, so a 64-dim float vector becomes m=8 single-byte codes
  * (32× smaller than float32). Search runs against the CODES via
  * asymmetric distance computation (ADC): the query stays full
  * precision, a per-query (m × ks) lookup table of subspace dot products
  * is built once, and each candidate's score is m table lookups summed —
  * the FAISS `PQx8` shape (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011).
  *
  * At 100 TB: encode is a narrow projection (m argmin expressions, no
  * shuffle); the code table is the only thing the search scans (m bytes
  * per vector); the ADC table is query-side-tiny and broadcast; scoring
  * is an equi-join on (m, code) plus one hash aggregation per
  * (query, candidate). Compose with [[Ivf]] cells for IVF-PQ.
  *
  * Determinism: codebooks are md5-derived constants (embedded as
  * round-trip literals in the oracle); argmin ties break toward the
  * higher code via lexicographic struct max; ADC terms are rounded to 6
  * decimals then decimal-summed, so scores are aggregation-order-free.
  */
object Pq {

  /** Deterministic sub-codebooks: `(m)(code)(d)`, unit-norm per entry. */
  def codebooks(m: Int, ks: Int, dim: Int): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim=$dim must split into m=$m subspaces")
    val dS = dim / m
    Array.tabulate(m) { mm =>
      Array.tabulate(ks) { c =>
        val raw = Array.tabulate(dS)(i =>
          Similarity.planeComponent(2000 + mm * ks + c, i + 1))
        val nrm = math.sqrt(raw.map(x => x * x).sum)
        raw.map(_ / nrm)
      }
    }
  }

  private def subCol(emb: Column, m: Int, dS: Int): Column =
    slice(emb, m * dS + 1, dS)

  /** Nearest sub-centroid by L2 == argmax of (2·dot − ‖c‖²): the ‖x‖²
    * term is constant within a subspace so it drops out of the argmin.
    * Ties break toward the higher code (mirrored by the oracle's
    * ORDER BY score DESC, code DESC). One generated loop per subspace
    * ([[ArrayMath.PqArgMaxCode]]) — the earlier ks-way greatest(struct)
    * tree overflowed janino's 64 KB method limit and fell back to
    * interpreted projection; values are bit-identical.
    */
  private def codeOf(emb: Column, books: Array[Array[Array[Double]]],
                     m: Int): Column = {
    val dS = books(m)(0).length
    ArrayMath.pqArgMax(emb, books(m), m * dS)
  }

  /** PQ-encode the corpus: one (id, m, code) row per subspace — the
    * narrow long form that joins directly against the ADC table (and
    * the layout a columnar code table stores).
    */
  def encode(emb: DataFrame, books: Array[Array[Array[Double]]],
             idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    emb.select(col(idCol).as("id"),
        posexplode(array(books.indices.map(m =>
          codeOf(col(embCol), books, m)): _*)).as(Seq("m", "code")))
      .select(col("id"), col("m").cast("long").as("m"),
        col("code").cast("long").as("code"))

  /** ADC top-k: full-precision `queries` against the PQ `codes` of the
    * corpus (output of [[encode]]). Returns
    * (query_id, neighbor_id, adc_score, rank), rank 1..k per query by
    * descending approximate dot product.
    */
  /** Per-query ADC lookup table (query_id, m, code, d): m*ks rounded
    * subspace dots — query-side-tiny, always broadcast.
    */
  private def lutOf(queries: DataFrame, books: Array[Array[Array[Double]]],
                    idCol: String, embCol: String): DataFrame = {
    val ks = books(0).length
    // (m, code) spine × query side, dot via ONE runtime-indexed loop
    // expression — the ks·m-struct array-literal form overflowed
    // janino's 64 KB method limit; values are bit-identical
    // (ArrayMath.PqSubDot runs DotWithConst's accumulation order).
    val spark = queries.sparkSession
    import spark.implicits._
    val mc = broadcast((for { m <- books.indices; c <- 0 until ks }
      yield (m.toLong, c.toLong)).toDF("m", "code"))
    queries.select(col(idCol).as("query_id"), col(embCol).as("_emb"))
      .crossJoin(mc)
      .select(col("query_id"), col("m"), col("code"),
        round(ArrayMath.pqSubDot(col("_emb"), col("m"), col("code"), books), 6)
          .as("d"))
  }

  def adcSearch(queries: DataFrame, codes: DataFrame,
                books: Array[Array[Array[Double]]], k: Int,
                idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val lut = lutOf(queries, books, idCol, embCol)
    val scored = codes.join(broadcast(lut), Seq("m", "code"))
      .where(col("query_id") =!= col("id"))
      .groupBy("query_id", "id")
      .agg(Relational.dsum(col("d"), 6).as("adc_score"))
    Relational.topKPerGroup(scored, Seq(col("query_id")),
        Seq(col("adc_score").desc, col("id").asc), k)
      .select(col("query_id"), col("id").as("neighbor_id"),
        col("adc_score"), col("rank"))
  }

  /** IVF-PQ (the two hardest-compressing scale paths COMPOSED, FAISS
    * `IVFx,PQy` shape): probe the `nProbe` best IVF cells on the
    * full-precision query, then score ONLY the probed cells' candidates
    * via ADC over their PQ codes — the candidate scan reads m bytes per
    * vector from nProbe/K of the corpus.
    */
  def ivfAdcSearch(queries: DataFrame, corpus: DataFrame,
                   centroids: Array[Array[Double]],
                   books: Array[Array[Array[Double]]],
                   nProbe: Int, k: Int,
                   idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val asg = Ivf.assign(corpus, centroids, embCol)
      .select(col(idCol).as("id"), col("cell"))
    val codes = encode(corpus, books, idCol, embCol)
    val probes = queries.select(col(idCol).as("query_id"),
      explode(Ivf.probeCells(col(embCol), centroids, nProbe)).as("cell"))
    val lut = lutOf(queries, books, idCol, embCol)
    val cand = probes.join(asg, Seq("cell"))
      .where(col("query_id") =!= col("id"))
      .select("query_id", "id")
    val scored = cand.join(codes, Seq("id"))
      .join(broadcast(lut), Seq("query_id", "m", "code"))
      .groupBy("query_id", "id")
      .agg(Relational.dsum(col("d"), 6).as("adc_score"))
    Relational.topKPerGroup(scored, Seq(col("query_id")),
        Seq(col("adc_score").desc, col("id").asc), k)
      .select(col("query_id"), col("id").as("neighbor_id"),
        col("adc_score"), col("rank"))
  }

  // ---- oracle SQL generation (DuckDB) ----------------------------------

  private def sub(arrExpr: String, m: Int, dS: Int): String =
    s"($arrExpr[${m * dS + 1}:${m * dS + dS}])"

  /** CTE `codes(id, m, code)` over `table` — the identical argmax the
    * Spark side computes (parallel unnest zip + row_number with the same
    * DESC/DESC tie-break). Append after an opening WITH.
    */
  def encodeCtes(table: String, idExpr: String,
                 books: Array[Array[Array[Double]]]): String = {
    import graft.functions.PortableSql
    val ks = books(0).length
    val dS = books(0)(0).length
    val ms = books.indices.flatMap(m => Seq.fill(ks)(m))
    val cs = books.indices.flatMap(_ => 0 until ks)
    val scores = for {
      m <- books.indices
      c <- 0 until ks
    } yield {
      val cc = books(m)(c).map(x => x * x).sum
      s"(${PortableSql.dotConst(sub("embedding", m, dS), books(m)(c))} * 2" +
        s" - (${PortableSql.doubleLit(cc)}))"
    }
    s"""pq_sc AS (
          SELECT $idExpr AS id,
            unnest([${ms.mkString(", ")}]) AS m,
            unnest([${cs.mkString(", ")}]) AS code,
            unnest([${scores.mkString(", ")}]) AS score
          FROM $table),
        codes AS (
          SELECT CAST(id AS BIGINT) AS id, CAST(m AS BIGINT) AS m,
            CAST(code AS BIGINT) AS code
          FROM (
            SELECT id, m, code, row_number() OVER (
              PARTITION BY id, m ORDER BY score DESC, code DESC) AS rn
            FROM pq_sc) t
          WHERE rn = 1)"""
  }

  /** CTE `qlut(query_id, m, code, d)`: the per-query ADC table with the
    * same 6-decimal rounding as [[adcSearch]].
    */
  def lutCtes(table: String, idExpr: String, queryPred: String,
              books: Array[Array[Array[Double]]]): String = {
    import graft.functions.PortableSql
    val ks = books(0).length
    val dS = books(0)(0).length
    val ms = books.indices.flatMap(m => Seq.fill(ks)(m))
    val cs = books.indices.flatMap(_ => 0 until ks)
    val ds = for {
      m <- books.indices
      c <- 0 until ks
    } yield s"round(${PortableSql.dotConst(sub("embedding", m, dS), books(m)(c))}, 6)"
    s"""qlut AS (
          SELECT $idExpr AS query_id,
            unnest([${ms.mkString(", ")}]) AS m,
            unnest([${cs.mkString(", ")}]) AS code,
            unnest([${ds.mkString(", ")}]) AS d
          FROM $table WHERE $queryPred)"""
  }
}
