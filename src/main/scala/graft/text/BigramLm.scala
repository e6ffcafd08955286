package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.ops.Frames.{cached, spread}
import graft.ops.Relational.dsum

/** Bigram language-model quality scoring — the next-order refinement of
  * [[UnigramLm]]: fit add-one-smoothed conditional bigram probabilities
  * P(w2 | w1) = (C(w1 w2) + 1) / (C(w1 ·) + V) on the corpus, then score
  * each document by its mean bigram log-probability. Catches word-salad
  * documents whose unigram distribution looks fine but whose transitions
  * are improbable.
  *
  * Scale shape (100 TB):
  *  - bigram extraction reuses the shingle generator
  *    ([[Dedup.shinglesRaw]] at n=2) — narrow, no shuffle;
  *  - both count fits are map-side-combined aggregations bounded by the
  *    bigram-type count, not the corpus;
  *  - scoring joins occurrences to the bigram-probability table on the
  *    bigram key — co-partitioned with the count fit, one shuffle family;
  *    (the probability table is vocabulary², so it joins, not broadcasts);
  *  - V (vocabulary size) is a one-row aggregate, cross-joined broadcast.
  *
  * Determinism: per-bigram log-probs round to 6 decimals, per-doc sums
  * are decimal-routed — identical in DuckDB replay.
  */
object BigramLm {

  /** (id, n_bigrams, avg_logp) per document with >= 2 tokens. */
  def score(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    // occurrences referenced three times (two count fits + scoring join)
    val big = cached(Dedup.shinglesRaw(df, idCol, textCol, 2))
    val cnt2 = big.groupBy("shingle").agg(count(lit(1)).as("cnt2"))
    val cnt1 = big
      .groupBy(split(col("shingle"), " ").getItem(0).as("w1"))
      .agg(count(lit(1)).as("cnt1"))
    val vocab = spread(df)
      .select(explode(TextAnalysis.tokens(
        TextAnalysis.normalizeText(textCol))).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    val lp = cnt2
      .withColumn("w1", split(col("shingle"), " ").getItem(0))
      .join(cnt1, "w1")
      .crossJoin(broadcast(vocab))
      .select(col("shingle"),
        round(log((col("cnt2") + 1).cast("double") / (col("cnt1") + col("v"))), 6)
          .as("logp"))
    big.join(lp, "shingle")
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        (dsum(col("logp"), 6) / count(lit(1))).as("raw"))
      .select(col("id"), col("n_bigrams"), round(col("raw"), 6).as("avg_logp"))
  }
}
