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

  /** Held-out cross-entropy: fit an ADD-ONE-smoothed unigram LM on the
    * `isTrain` slice, score every held-out document by its mean negative
    * token log-probability (nats/token) — the proper CCNet-style setup
    * where the reference LM never sees the scored text, with OOV mass
    * handled by Laplace smoothing instead of a join dropout:
    *   p(tok) = (cnt+1) / (T+V+1),  p(OOV) = 1 / (T+V+1)
    * (T = train token count, V = train vocab size; the +1 in the
    * denominator is the single shared OOV pseudo-type).
    *
    * Output: one row per held-out doc — (id, n_tokens, n_oov,
    * cross_entropy). High cross-entropy flags gibberish / off-domain
    * text; `n_oov` separates vocabulary misses from in-vocab surprise.
    *
    * Scale: [[score]]'s shape plus one LEFT join — the model fit is a
    * vocab-bounded aggregation, scoring joins held-out tokens to the
    * broadcast log-prob table, and the (T, V) scalar rides a broadcast
    * cross join. Per-token log-probs are rounded at 6 then decimal-summed
    * (order-free, engine-exact).
    */
  def heldoutCrossEntropy(df: DataFrame, idCol: Column, textCol: Column,
                          isTrain: Column): DataFrame = {
    val toks = cached(spread(df).select(idCol.as("id"),
      isTrain.as("is_train"),
      explode(TextAnalysis.tokens(TextAnalysis.normalizeText(textCol))).as("tok")))
    val counts = toks.where(col("is_train"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val model = counts.agg(sum(col("cnt")).as("t_total"),
      count(lit(1)).as("v_size"))
    val lp = counts.crossJoin(broadcast(model))
      .select(col("tok"),
        round(log((col("cnt") + 1).cast("double")
          / (col("t_total") + col("v_size") + 1)), 6).as("logp"))
    toks.where(!col("is_train"))
      .join(broadcast(lp), Seq("tok"), "left")
      .crossJoin(broadcast(model))
      .select(col("id"),
        col("logp").isNull.cast("long").as("is_oov"),
        coalesce(col("logp"),
          round(log(lit(1.0) / (col("t_total") + col("v_size") + 1)), 6))
          .as("lp"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("is_oov")).as("n_oov"),
        round((-dsum(col("lp"), 6)) / count(lit(1)), 6).as("cross_entropy"))
  }
}
