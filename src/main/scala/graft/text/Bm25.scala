package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableSql
import graft.ops.Frames.{cached, spread}
import graft.ops.Relational.dsum

/** BM25 keyword relevance scoring (Robertson–Spärck Jones) — the lexical
  * retrieval baseline a corpus/serving layer runs next to embedding ANN
  * ([[graft.similarity.Similarity]]).
  *
  * score(d, Q) = Σ_{t∈Q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
  * with idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)  (the Lucene form —
  * always positive).
  *
  * Scale shape (100 TB): document stats (dl) and term stats (df) are two
  * hash aggregations over the exploded token frame; the query-term set
  * is tiny and BROADCAST into the per-document score join, so the corpus
  * shuffles only for its own per-document aggregation — the inverted-
  * index probe never moves the corpus.
  *
  * Determinism: idf (the only transcendental) is rounded to 6 decimals;
  * N and avgdl are exact integer-derived doubles; the tf-normalization
  * chain is fixed-shape IEEE arithmetic; per-term scores are rounded
  * then decimal-summed per document. [[oracleSql]] replays the identical
  * expression text in DuckDB.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Per-document BM25 scores for `terms` over `df`'s text column:
    * (id, n_terms_hit, score), only documents matching at least one term.
    * Tokenization matches [[TextAnalysis.tokens]] ∘ normalize.
    */
  def score(df: DataFrame, idCol: Column, textCol: Column,
            terms: Seq[String]): DataFrame = {
    val toks = cached(spread(df).select(idCol.as("id"),
      explode(TextAnalysis.tokens(TextAnalysis.normalizeText(textCol))).as("tok")))
    val dl = toks.groupBy("id").agg(count(lit(1)).as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("n_toks"))
    val dfreq = toks.where(col("tok").isin(terms: _*))
      .groupBy("tok").agg(count_distinct(col("id")).as("df_t"))
    val tf = toks.where(col("tok").isin(terms: _*))
      .groupBy("id", "tok").agg(count(lit(1)).as("tf"))
    val idf = dfreq.crossJoin(broadcast(corpus))
      .select(col("tok"),
        round(log((col("n_docs").cast("double") - col("df_t") + lit(0.5)) /
          (col("df_t").cast("double") + lit(0.5)) + lit(1.0)), 6).as("idf"),
        (col("n_toks").cast("double") / col("n_docs")).as("avgdl"))
    tf.join(broadcast(idf), "tok")
      .join(dl, "id")
      .select(col("id"),
        round(col("idf") * ((col("tf").cast("double") * lit(K1 + 1)) /
          (col("tf").cast("double") + lit(K1) *
            (lit(1.0) - lit(B) + lit(B) * (col("dl").cast("double") / col("avgdl"))))),
          6).as("term_score"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_terms_hit"),
        round(dsum(col("term_score"), 6), 6).as("score"))
  }

  /** DuckDB replay over a token CTE `toks(id, tok)` — identical
    * expression text to [[score]]. Emits (id, n_terms_hit, score).
    */
  def oracleSql(toksCte: String, terms: Seq[String]): String = {
    val k1p1 = PortableSql.doubleLit(K1 + 1)
    val k1 = PortableSql.doubleLit(K1)
    val b = PortableSql.doubleLit(B)
    val termList = terms.map(t => s"'$t'").mkString(", ")
    s"""dl AS (SELECT id, count(*) AS dl FROM $toksCte GROUP BY 1),
       corpus AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS n_toks FROM dl),
       dfreq AS (SELECT tok, count(DISTINCT id) AS df_t
         FROM $toksCte WHERE tok IN ($termList) GROUP BY 1),
       tf AS (SELECT id, tok, count(*) AS tf
         FROM $toksCte WHERE tok IN ($termList) GROUP BY 1, 2),
       idf AS (SELECT tok,
         round(ln((CAST(n_docs AS DOUBLE) - df_t + 0.5) / (CAST(df_t AS DOUBLE) + 0.5) + 1.0), 6) AS idf,
         CAST(n_toks AS DOUBLE) / n_docs AS avgdl
         FROM dfreq, corpus),
       ts AS (SELECT tf.id,
         round(idf.idf * ((CAST(tf.tf AS DOUBLE) * $k1p1) /
           (CAST(tf.tf AS DOUBLE) + $k1 * (1.0 - $b + $b * (CAST(dl.dl AS DOUBLE) / idf.avgdl)))), 6) AS term_score
         FROM tf JOIN idf USING (tok) JOIN dl USING (id)),
       bm25 AS (SELECT id, count(*) AS n_terms_hit,
         round(CAST(sum(CAST(term_score AS DECIMAL(27,6))) AS DOUBLE), 6) AS score
         FROM ts GROUP BY 1)"""
  }
}
