package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Bootstrap, Percentiles}
import graft.ops.Relational.dsum
import graft.text.Bm25

/** Round-5 batch 7: evaluation & diagnostics — NDCG ranking quality,
  * Poisson-bootstrap confidence intervals, gaps-and-islands activity
  * analysis, and a join-skew report — each oracle-checked bit-for-bit
  * against DuckDB.
  */
object EvalQueries {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Words CTE shared by the text oracles (the
    * [[graft.text.TextAnalysis]] token derivation). */
  private val wordsCte = """
    WITH w AS (
      SELECT doc_id AS id,
        string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS ws
      FROM documents)"""

  private val Bm25Terms = Seq("table", "spark", "merge")
  private val BootB = 100

  def all: Seq[Q] = Seq(

    // NDCG@k for the BM25 ranking (q133) against a binary relevance
    // label (lang='en') — the serving-quality metric a retrieval layer
    // reports. Ranks come from one global top-window over the scored
    // frame (score-sized, not corpus-sized); per-rank terms round the
    // log2 discount, sums are decimal-routed.
    Q("q150_ndcg", Q.sql(s"""
        $wordsCte,
        toks AS (SELECT id, unnest(ws) AS tok FROM w),
        ${Bm25.oracleSql("toks", Bm25Terms)},
        scored AS (
          SELECT b.id, b.score, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS rel
          FROM bm25 b JOIN documents d ON b.id = d.doc_id),
        ranked AS (
          SELECT rel, row_number() OVER (ORDER BY score DESC, id) AS r
          FROM scored),
        ideal AS (
          SELECT row_number() OVER (ORDER BY rel DESC, r) AS ri, rel
          FROM ranked),
        dcg AS (
          SELECT
            CAST(sum(CAST(CASE WHEN r <= 10 THEN round(rel / log2(r + 1), 6) ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE) AS dcg10,
            CAST(sum(CAST(CASE WHEN r <= 20 THEN round(rel / log2(r + 1), 6) ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE) AS dcg20
          FROM ranked),
        idcg AS (
          SELECT
            CAST(sum(CAST(CASE WHEN ri <= 10 THEN round(rel / log2(ri + 1), 6) ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE) AS idcg10,
            CAST(sum(CAST(CASE WHEN ri <= 20 THEN round(rel / log2(ri + 1), 6) ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE) AS idcg20
          FROM ideal)
        SELECT round(dcg10, 6) AS dcg10, round(dcg20, 6) AS dcg20,
          round(dcg10 / idcg10, 6) AS ndcg10,
          round(dcg20 / idcg20, 6) AS ndcg20
        FROM dcg, idcg"""))(
      (s, dir) => {
        val scored = Bm25.score(T(s, dir, "documents"), col("doc_id"),
            col("text"), Bm25Terms)
          .join(T(s, dir, "documents").select(col("doc_id").as("id"),
            when(col("lang") === "en", 1).otherwise(0).as("rel")), "id")
        // distributed ranks (runningTotal materializes internally, which
        // also keeps the BM25 scoring pass from running once per consumer)
        val ranked = graft.ops.Prefix.runningTotal(
            scored.select(col("rel"), col("score"), col("id")),
            Seq(col("score").desc, col("id")), lit(1L), out = "r")
          .select(col("rel"), col("r"))
        val ideal = graft.ops.Prefix.runningTotal(ranked,
            Seq(col("rel").desc, col("r")), lit(1L), out = "ri")
          .select(col("rel"), col("ri"))
        def term(rank: org.apache.spark.sql.Column, k: Int) =
          when(rank <= k, round(col("rel") / log2(rank + 1), 6)).otherwise(lit(0))
        val dcg = ranked.agg(
          dsum(term(col("r"), 10), 6).as("dcg10"),
          dsum(term(col("r"), 20), 6).as("dcg20"))
        val idcg = ideal.agg(
          dsum(term(col("ri"), 10), 6).as("idcg10"),
          dsum(term(col("ri"), 20), 6).as("idcg20"))
        dcg.crossJoin(idcg)
          .select(round(col("dcg10"), 6).as("dcg10"),
            round(col("dcg20"), 6).as("dcg20"),
            round(col("dcg10") / col("idcg10"), 6).as("ndcg10"),
            round(col("dcg20") / col("idcg20"), 6).as("ndcg20"))
      }),

    // Poisson-bootstrap 95% CI for the mean purchase value: B=100
    // replicates in ONE pass (per-row Poisson(1) weights from md5 —
    // deterministic on any engine/partitioning), exact percentiles over
    // the replicate means. The at-scale uncertainty estimate: no
    // per-replicate resampling pass, no RNG state (see ops.Bootstrap).
    Q("q151_bootstrap_ci", Q.sql(s"""
        WITH src AS (
          SELECT CAST(event_id AS VARCHAR) AS rk, value AS x
          FROM events WHERE event_type = 'purchase'),
        ${Bootstrap.oracleSql("src", BootB)},
        pts AS (SELECT 'all' AS g, mean_b FROM reps),
        ${Percentiles.oracleCtes("ci", "pts", Seq("g"), "mean_b",
          Seq("lo" -> 0.025, "hi" -> 0.975))},
        full_mean AS (
          SELECT round(CAST(sum(CAST(x AS DECIMAL(27,6))) AS DOUBLE) / count(*), 6) AS mean_full
          FROM src)
        SELECT count(*) AS n_reps, mean_full,
          round(ci.lo, 6) AS ci_lo, round(ci.hi, 6) AS ci_hi
        FROM reps, ci, full_mean
        GROUP BY mean_full, ci.lo, ci.hi"""))(
      (s, dir) => {
        val src = T(s, dir, "events")
          .where(col("event_type") === "purchase")
          .select(col("event_id").cast("string").as("rk"),
            col("value").as("x"))
        val reps = graft.ops.Frames.cached(
          Bootstrap.replicateMeans(src, col("rk"), col("x"), BootB))
        // global percentiles over the B-row replicate frame via the
        // prefix-ranked form — a constant 'g' key would fold into an
        // unpartitioned window
        val ci = Percentiles.exactGlobal(reps, col("mean_b"), col("rep"),
          Seq("lo" -> 0.025, "hi" -> 0.975))
        val fullMean = src.agg(
          round(dsum(col("x"), 6) / count(lit(1)), 6).as("mean_full"))
        reps.agg(count(lit(1)).as("n_reps"))
          .crossJoin(broadcast(fullMean))
          .crossJoin(broadcast(ci))
          .select(col("n_reps"), col("mean_full"),
            round(col("lo"), 6).as("ci_lo"), round(col("hi"), 6).as("ci_hi"))
      }),

    // Gaps-and-islands: per-user activity gaps over distinct event days
    // (lag diff within user) — days active, number of inactivity gaps,
    // longest gap. One distinct + one windowed pass, all integers.
    Q("q152_gaps", Q.sql("""
        WITH days AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        gaps AS (
          SELECT user_id, day,
            date_diff('day',
              lag(day) OVER (PARTITION BY user_id ORDER BY day), day) AS d
          FROM days)
        SELECT user_id, count(*) AS n_active_days,
          CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
          CAST(coalesce(max(CASE WHEN d > 1 THEN d - 1 END), 0) AS BIGINT) AS max_gap_days
        FROM gaps GROUP BY 1 ORDER BY 1"""))(
      (s, dir) => {
        val days = T(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        days.select(col("user_id"),
            datediff(col("day"), lag(col("day"), 1).over(w)).as("d"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_active_days"),
            sum(when(col("d") > 1, 1L).otherwise(0L)).as("n_gaps"),
            coalesce(max(when(col("d") > 1, col("d") - 1)), lit(0))
              .cast("long").as("max_gap_days"))
          .orderBy("user_id")
      }),

    // Join-skew diagnostics: hottest join keys with their share of the
    // fact table and the skew factor (hot-key count / mean count) — the
    // report that decides between plain, broadcast, and salted joins
    // (q28). Two hash aggregations; the heavy output is top-10 only.
    Q("q153_skew_report", Q.sql("""
        WITH kc AS (
          SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1),
        stats AS (
          SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS total
          FROM kc),
        top AS (
          SELECT l_partkey, cnt,
            row_number() OVER (ORDER BY cnt DESC, l_partkey) AS rank
          FROM kc)
        SELECT rank, l_partkey, cnt,
          round(CAST(cnt AS DOUBLE) / total, 6) AS share,
          round(CAST(cnt AS DOUBLE) / (CAST(total AS DOUBLE) / n_keys), 6) AS skew_factor
        FROM top, stats
        WHERE rank <= 10 ORDER BY rank"""))(
      (s, dir) => {
        val kc = T(s, dir, "lineitem")
          .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
        val stats = kc.agg(count(lit(1)).as("n_keys"),
          sum(col("cnt")).as("total"))
        // shortlist + rank share ONE stated order (rankTop) — zero
        // unpartitioned windows anywhere
        graft.ops.Prefix.rankTop(kc,
            Seq(col("cnt").desc, col("l_partkey")), k = 10, out = "rank")
          .select(col("l_partkey"), col("cnt"),
            col("rank").cast("int").as("rank"))
          .crossJoin(broadcast(stats))
          .select(col("rank"), col("l_partkey"), col("cnt"),
            round(col("cnt").cast("double") / col("total"), 6).as("share"),
            round(col("cnt").cast("double") /
              (col("total").cast("double") / col("n_keys")), 6).as("skew_factor"))
          .orderBy("rank")
      })
  )
}
