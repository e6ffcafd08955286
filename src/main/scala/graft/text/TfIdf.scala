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
}
