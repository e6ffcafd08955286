package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocabulary-richness estimation: how many token types a corpus slice
  * would show with unbounded sampling, from the abundance counts of what
  * it does show. Complements the Heaps-law growth fit (q177) with a
  * closed-form per-group estimator — the "is this source's vocabulary
  * saturated or barely sampled" triage before spending tokenizer budget.
  *
  * Estimator: bias-corrected Chao1 (Chao, Scand. J. Stat. 1984):
  *   chao1 = V_obs + f1·(f1−1) / (2·(f2+1))
  * where f1/f2 are the singleton/doubleton type counts. The +1 form is
  * defined for f2 = 0 and agrees with the classic f1²/(2f2) form
  * asymptotically.
  *
  * Scale: two hash aggregations — (group, token) counts (map-side
  * combined, vocabulary-bounded shuffle), then a per-group rollup of 4
  * integer sums. No joins, no windows, no driver state; the abundance
  * sums merge across shards exactly like sketch registers.
  */
object VocabStats {

  /** Per-group `(v_obs, n_tokens, f1, f2, chao1)` over an exploded
    * `(groupCols…, tok)` frame. All inputs to the one final double
    * expression are exact integers — engine-identical output.
    */
  def chao1(toks: DataFrame, groupCols: Seq[String]): DataFrame =
    toks.groupBy((groupCols :+ "tok").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("v_obs"), sum(col("cnt")).as("n_tokens"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("cnt") === 2, 1L).otherwise(0L)).as("f2"))
      .withColumn("chao1", round(col("v_obs")
        + (col("f1") * (col("f1") - 1)).cast("double")
          / (lit(2L) * (col("f2") + 1)), 4))
}
