package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Relational.dsum

/** Unigram language-model quality scoring (the CCNet/Gopher-style filter
  * a training pipeline runs to drop gibberish): fit token log-probabilities
  * on the corpus itself, then score each document by its mean token
  * log-probability. Low scores flag documents whose token distribution is
  * far from the corpus (binary junk, boilerplate, wrong language).
  *
  * Scale shape (100 TB):
  *  - the token-count "model fit" is one map-side-combined aggregation
  *    (shuffle carries (token, count) — vocabulary-bounded);
  *  - the corpus total is a one-row aggregate over the vocab frame;
  *  - scoring joins the exploded tokens to the BROADCAST vocab table, so
  *    the corpus never shuffles on content — per-doc aggregation is the
  *    only wide stage touching document volume.
  *
  * Determinism: per-token log-probs are rounded to 6 decimals, per-doc
  * sums are decimal-routed ([[graft.ops.Relational.dsum]]) so the mean is
  * independent of aggregation order and identical across engines.
  */
object UnigramLm {

  import graft.ops.Frames.{cached, spread}

  /** (tok, logp): ln(count(tok) / total_tokens), rounded to 6 decimals.
    * `toks` is the exploded (id, tok) frame.
    */
  def tokenLogProbs(toks: DataFrame): DataFrame = {
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("n_total"))
    counts.crossJoin(broadcast(total))
      .select(col("tok"),
        round(log(col("cnt").cast("double") / col("n_total")), 6).as("logp"))
  }

  /** Per-document mean token log-probability under the corpus unigram LM:
    * (id, n_tokens, avg_logp). Tokens are whitespace tokens of the
    * normalized text (same derivation as [[TfIdf.termFrequencies]]).
    */
  def score(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    // Referenced twice (model fit + scoring join): cache the exploded
    // tokens; rows are two scalars each.
    val toks = cached(spread(df).select(idCol.as("id"),
      explode(TextAnalysis.tokens(TextAnalysis.normalizeText(textCol))).as("tok")))
    toks.join(broadcast(tokenLogProbs(toks)), "tok")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        (dsum(col("logp"), 6) / count(lit(1))).as("raw"))
      .select(col("id"), col("n_tokens"), round(col("raw"), 6).as("avg_logp"))
  }
}
