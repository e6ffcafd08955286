package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Relational

/** TF-IDF term weighting over the corpus — keyword extraction /
  * relevance scoring for a training-data pipeline.
  *
  * Scale shape (100 TB):
  *  - term frequencies are one map-side-combined aggregation over the
  *    exploded tokens (the shuffle carries (id, token, count));
  *  - document frequency reuses the tf frame (df = rows per token), so
  *    the corpus is tokenized exactly once;
  *  - the corpus size N is a one-row aggregate broadcast to the join —
  *    never a driver-side constant baked into the plan before the data
  *    is read;
  *  - scores are rounded to 6 decimals BEFORE ranking so ties (equal
  *    tf/df) break on the token, deterministically, in any engine.
  */
object TfIdf {

  import graft.ops.Frames.{cached, spread}

  /** (id, tok, tf) — term frequency per document over whitespace tokens
    * of the normalized text.
    */
  def termFrequencies(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    spread(df)
      .select(idCol.as("id"),
        explode(TextAnalysis.tokens(TextAnalysis.normalizeText(textCol))).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("tf"))

  /** (id, tok, tf, df_docs, tfidf): tfidf = tf · ln(N / df), rounded to 6
    * decimals. N = corpus document count, df = documents containing the
    * token.
    */
  def tfidf(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    // Referenced twice: per-token df aggregation + the score join.
    val tf = cached(termFrequencies(df, idCol, textCol))
    val docFreq = tf.groupBy("tok").agg(count(lit(1)).as("df_docs"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    tf.join(docFreq, "tok")
      .crossJoin(broadcast(n))
      .select(col("id"), col("tok"), col("tf"), col("df_docs"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df_docs")), 6)
          .as("tfidf"))
  }

  /** Top-`k` keywords per document by TF-IDF (rank ties break on the
    * token — deterministic).
    */
  def topKeywords(df: DataFrame, idCol: Column, textCol: Column, k: Int): DataFrame =
    Relational.topKPerGroup(tfidf(df, idCol, textCol),
      partitionCols = Seq(col("id")),
      order = Seq(col("tfidf").desc, col("tok").asc), k = k)

  /** Hashing-trick document vectors + sparse cosine top-`k`: each
    * document becomes a `buckets`-dimensional term-count vector (token →
    * md5-hash bucket, NO dictionary pass — the one vectorizer whose cost
    * doesn't grow with vocabulary), and each query document gets its k
    * nearest others by cosine. All counts and dot products are exact
    * integers — deterministic in any aggregation order on any engine —
    * with doubles appearing only in the final norm division.
    *
    * Scale shape: the vector frame is (id × occupied-buckets)-sized (≤
    * `buckets` rows per doc); similarity is the same inverted-index
    * equi-join as [[sparseCosineTopK]], keyed on the bucket id, and —
    * like that sibling — SHUFFLED by default: `queryPred` may select a
    * corpus *fraction* (e.g. every 97th document), so broadcasting the
    * query side would grow linearly with the data and OOM executors long
    * before 100 TB. Callers whose predicate is provably bounded (a fixed
    * id list, `id < 10`) may opt in with `broadcastQuery = true` to skip
    * the shuffle — the opt-in is the caller asserting boundedness, never
    * the library guessing it.
    */
  def hashedCosineTopK(df: DataFrame, idCol: Column, textCol: Column,
                       buckets: Int, queryPred: Column => Column,
                       k: Int, broadcastQuery: Boolean = false): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // Referenced three times (norms + both join sides).
    val b = cached(spread(df)
      .select(idCol.as("id"),
        explode(TextAnalysis.tokens(TextAnalysis.normalizeText(textCol)))
          .as("tok"))
      .select(col("id"),
        (graft.functions.Hashing.hash48(col("tok")) % buckets).as("bucket"))
      .groupBy("id", "bucket").agg(count(lit(1)).as("cnt")))
    val norms = b.groupBy("id")
      .agg(sqrt(sum(col("cnt") * col("cnt")).cast("double")).as("nrm"))
    val q = b.where(queryPred(col("id")))
    val dots = (if (broadcastQuery) broadcast(q) else q.hint("merge")).as("a")
      .join(b.as("bb"),
        col("a.bucket") === col("bb.bucket") && col("a.id") =!= col("bb.id"))
      .groupBy(col("a.id").as("query_id"), col("bb.id").as("neighbor_id"))
      .agg(sum(col("a.cnt") * col("bb.cnt")).as("dot"))
    val cos = dots
      .join(norms.select(col("id").as("query_id"), col("nrm").as("nrm_q")),
        "query_id")
      .join(norms.select(col("id").as("neighbor_id"), col("nrm").as("nrm_d")),
        "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        round(col("dot") / (col("nrm_q") * col("nrm_d")), 6).as("cos_sim"))
    Relational.topKPerGroup(cos, partitionCols = Seq(col("query_id")),
      order = Seq(col("cos_sim").desc, col("neighbor_id").asc), k = k)
  }

  /** Sparse TF-IDF cosine top-`k`: for each document satisfying
    * `queryPred` (on the id), the k most similar OTHER documents by
    * cosine over tf-idf term weights — the sparse counterpart of the
    * dense-embedding kNN ([[graft.similarity.Similarity.knnBruteForce]]).
    *
    * Scale shape: an inverted-index join — the query side's (id, tok,
    * weight) rows are matched on the token via a SHUFFLED merge join,
    * never a broadcast: the query set is typically a *fraction* of the
    * corpus (not a bounded list), so a broadcast would grow linearly with
    * the data and OOM the executors long before 100 TB. Both sides
    * partition on the token and the cost is posting-list overlap, never
    * n². `maxDf` (mirror of [[graft.dedup.Dedup.jaccardPairs]]) drops
    * terms whose document frequency exceeds the cap BEFORE the join —
    * stop-word-dense tokens have df ≈ N in any real corpus and are the
    * quadratic keys; capping bounds every posting list at `maxDf`.
    * Semantics become "cosine over terms with df <= maxDf" — the caller's
    * oracle must apply the same cap.
    *
    * Determinism: tf-idf weights are pre-rounded (6 dp), dot products and
    * norms are decimal-routed sums, the final cosine is rounded to 6 dp,
    * rank ties break on the neighbour id.
    */
  def sparseCosineTopK(df: DataFrame, idCol: Column, textCol: Column,
                       queryPred: Column => Column, k: Int,
                       maxDf: Option[Int] = None): DataFrame = {
    import Relational.dsum
    val scored = tfidf(df, idCol, textCol)
    val capped = maxDf.fold(scored)(m => scored.where(col("df_docs") <= m))
    // Referenced three times (norms + both join sides).
    val w = cached(capped.select("id", "tok", "tfidf"))
    val norms = w.groupBy("id")
      .agg(sqrt(dsum(col("tfidf") * col("tfidf"), 8)).as("norm"))
    val dots = w.where(queryPred(col("id"))).as("a").hint("merge")
      .join(w.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") =!= col("b.id"))
      .groupBy(col("a.id").as("id_q"), col("b.id").as("id_d"))
      .agg(dsum(col("a.tfidf") * col("b.tfidf"), 8).as("dot"))
    val cos = dots
      .join(norms.select(col("id").as("id_q"), col("norm").as("norm_q")), "id_q")
      .join(norms.select(col("id").as("id_d"), col("norm").as("norm_d")), "id_d")
      .select(col("id_q"), col("id_d"),
        round(col("dot") / (col("norm_q") * col("norm_d")), 6).as("cosine"))
    Relational.topKPerGroup(cos, partitionCols = Seq(col("id_q")),
      order = Seq(col("cosine").desc, col("id_d").asc), k = k)
  }
}
