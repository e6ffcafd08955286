package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableSql
import graft.ops.Frames.cached
import graft.ops.Relational.dsum

/** DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every document by
  * the log-likelihood ratio of its hashed-bigram features under a
  * TARGET distribution vs the RAW corpus distribution. High scores =
  * documents that look like the target domain; feed the weights into
  * [[graft.ops.Sampling]] for the resampling step.
  *
  * Model: bag of hashed n-gram features — bigrams hashed into `buckets`
  * buckets, add-one smoothed:
  * `w(d) = Σ_{f∈d} ln( p̂_T(f) / p̂_R(f) )` with
  * `p̂(f) = (c(f)+1) / (N+B)`, summed with multiplicity.
  *
  * Scale shape (100 TB): both feature-count fits are single map-side-
  * combined aggregations over the exploded bigram frame, bounded by the
  * bucket count B (the whole point of hashing: the model is B rows, not
  * vocabulary²); scoring joins the corpus's bigram frame to the
  * BROADCAST B-row log-ratio table, so the corpus shuffles only for its
  * own per-document aggregation.
  *
  * Determinism: one ln per feature, rounded to 6 decimals (the
  * ratio's operands are exact small-integer products in double); per-doc
  * sums are decimal-routed. [[oracleSql]] replays it in DuckDB.
  */
object Dsir {

  /** Per-document importance log-ratios: (id, n_feats, logratio) for
    * documents with at least one bigram. `isTarget` marks the rows whose
    * feature distribution defines the target domain.
    */
  def score(df: DataFrame, idCol: Column, textCol: Column, isTarget: Column,
            buckets: Int = 2048): DataFrame = {
    // Bigram generator: the [[graft.dedup.Dedup.shinglesRaw]] shape
    // (n=2), inlined to carry the target flag through the explode — a
    // re-join on id would shuffle the whole corpus instead.
    val words = TextAnalysis.tokens(TextAnalysis.normalizeText(textCol))
    val fb = cached(
      graft.ops.Frames.spread(df)
        .select(idCol.as("id"), isTarget.as("_tgt"), words.as("ws"))
        .select(col("id"), col("_tgt"),
          explode(
            when(size(col("ws")) < 2, array())
              .otherwise(transform(
                sequence(lit(1), size(col("ws")) - 1),
                i => concat_ws(" ", slice(col("ws"), i, lit(2)))))).as("shingle"))
        .select(col("id"), col("_tgt"),
          pmod(graft.functions.Hashing.hash48(col("shingle")), lit(buckets.toLong))
            .as("f")))
    val cR = fb.groupBy("f").agg(count(lit(1)).as("cr"))
    val cT = fb.where(col("_tgt")).groupBy("f").agg(count(lit(1)).as("ct"))
    val tot = fb.agg(count(lit(1)).as("nr"),
      sum(when(col("_tgt"), 1L).otherwise(0L)).as("nt"))
    val llr = cR.join(cT, Seq("f"), "left").crossJoin(broadcast(tot))
      .select(col("f"), round(log(
        ((coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double") *
          (col("nr") + lit(buckets.toLong))) /
          ((col("cr") + lit(1L)).cast("double") *
            (col("nt") + lit(buckets.toLong)))), 6).as("llr"))
    fb.join(broadcast(llr), "f")
      .groupBy("id")
      .agg(count(lit(1)).as("n_feats"),
        round(dsum(col("llr"), 6), 6).as("logratio"))
  }

  /** DuckDB replay over a words CTE `w(id, tgt, ws)` (tgt BOOLEAN,
    * ws = token list). Emits CTE `dsir(id, n_feats, logratio)`.
    */
  def oracleSql(buckets: Int = 2048): String = {
    val h = PortableSql.hexToLong("md5(shingle)", 12)
    s"""bg AS (
         SELECT id, tgt, ws[pos] || ' ' || ws[pos+1] AS shingle
         FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 1, 0))) AS pos) t),
       fb AS (SELECT id, tgt, $h % $buckets AS f FROM bg),
       cr AS (SELECT f, count(*) AS cr FROM fb GROUP BY 1),
       ct AS (SELECT f, count(*) AS ct FROM fb WHERE tgt GROUP BY 1),
       tot AS (SELECT CAST(count(*) AS BIGINT) AS nr,
         CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS nt FROM fb),
       llr AS (
         SELECT f, round(ln(
           (CAST(coalesce(ct, 0) + 1 AS DOUBLE) * (nr + $buckets)) /
           (CAST(cr + 1 AS DOUBLE) * (nt + $buckets))), 6) AS llr
         FROM cr LEFT JOIN ct USING (f), tot),
       dsir AS (
         SELECT id, count(*) AS n_feats,
           round(CAST(sum(CAST(llr AS DECIMAL(27,6))) AS DOUBLE), 6) AS logratio
         FROM fb JOIN llr USING (f) GROUP BY 1)"""
  }
}
