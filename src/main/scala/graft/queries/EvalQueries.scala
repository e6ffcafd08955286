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

    // Rank-biased overlap (Webber et al., TOIS 2010) between the
    // revenue and order-count customer rankings, truncated at depth 50:
    // RBO@D = (1-p)·Σ_{d<=D} p^(d-1)·X_d/d, where X_d = |top-d ∩ top-d|.
    // An item with ranks (ra, rb) enters every prefix overlap from depth
    // max(ra, rb), so X_d is one count over the <=D-row frontier frame —
    // the whole metric costs two distributed-prefix ranks plus a 50-row
    // depth join. p = 1/2 so every weight p^(d-1) is an exact dyadic
    // double on both engines (no transcendental-parity risk); terms are
    // rounded at 12 and decimal-summed.
    Q("q275_rank_biased_overlap", Q.sql("""
        WITH r AS (
          SELECT o_custkey, count(*) AS n_orders,
            CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS rev
          FROM orders GROUP BY 1),
        rk AS (
          SELECT o_custkey,
            row_number() OVER (ORDER BY rev DESC, o_custkey) AS r_rev,
            row_number() OVER (ORDER BY n_orders DESC, o_custkey) AS r_cnt
          FROM r),
        m AS (
          SELECT greatest(r_rev, r_cnt) AS m FROM rk
          WHERE greatest(r_rev, r_cnt) <= 50),
        dep AS (SELECT unnest(generate_series(1, 50)) AS d),
        xd AS (
          SELECT d, count(m.m) AS x
          FROM dep LEFT JOIN m ON m.m <= dep.d
          GROUP BY 1),
        terms AS (
          SELECT d, x,
            round(power(0.5, d - 1) * x / d, 12) AS term
          FROM xd)
        SELECT 50 AS depth, CAST(max(CASE WHEN d = 50 THEN x END) AS BIGINT)
            AS overlap_at_depth,
          round((1 - 0.5) *
            CAST(sum(CAST(term AS DECIMAL(27,12))) AS DOUBLE), 6) AS rbo
        FROM terms"""))(
      (s, dir) => {
        import graft.ops.Prefix.runningTotal
        val r = T(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 4).as("rev"))
        val rk = runningTotal(
          runningTotal(r, Seq(col("rev").desc, col("o_custkey")),
            lit(1L), out = "r_rev"),
          Seq(col("n_orders").desc, col("o_custkey")), lit(1L), out = "r_cnt")
        val m = rk.select(greatest(col("r_rev"), col("r_cnt")).as("m"))
          .where(col("m") <= 50)
        val dep = T(s, dir, "orders").sparkSession.range(1, 51)
          .select(col("id").cast("int").as("d"))
        // non-equi LEFT join: broadcast the <=50-row frontier (the
        // preserved depth side cannot be the broadcast side)
        val xd = dep.join(broadcast(m), col("m") <= col("d"), "left")
          .groupBy("d").agg(count(col("m")).as("x"))
        val terms = xd.select(col("d"), col("x"),
          round(pow(lit(0.5), col("d") - 1) * col("x") / col("d"), 12)
            .as("term"))
        terms.agg(
          max(when(col("d") === 50, col("x"))).as("overlap_at_depth"),
          round((lit(1) - lit(0.5)) *
            sum(col("term").cast("decimal(27,12)")).cast("double"), 6)
            .as("rbo"))
          .select(lit(50).as("depth"), col("overlap_at_depth"), col("rbo"))
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
      }),

    // Randomization tests with Benjamini-Hochberg FDR control — the
    // multiple-testing discipline an experimentation platform needs: per
    // event type t, H0 "mean(value) for type-t events equals the rest",
    // tested by 12 seeded relabelings (proportion-preserving in
    // expectation: event e joins the pseudo-treatment iff u_p < the
    // per-type threshold n_t·2^48/N — five doubles computed once, the
    // identical IEEE expression both engines, compared against the
    // exactly-representable u_p = (h1 + p·h2) mod 2^48, which
    // double-hashes the two 48-bit halves of ONE md5(e|t): the 60×
    // fan-out pays one digest and one long-vs-double compare), with
    // p = (1 + #{|diff_perm| ≥ |diff_obs|}) / 13. The BH step-up is then
    // PURE INTEGER arithmetic: with p = c/13 and threshold rank·(q=1/4)/5
    // = rank/20, the condition p ≤ rank·q/m becomes 20·c ≤ 13·rank —
    // no float in the decision. Ranking the 5 p-values is a 5×5
    // model-frame self-join (no window at all); values carry as exact 4-dp fixed-point LONGS, so every sum is order-independent integer arithmetic.
    Q("q304_permutation_fdr", {
      val perms = (0 until 12).mkString("[", ", ", "]")
      Q.sql(s"""
        WITH e AS (
          SELECT event_id, event_type,
            CAST(floor(value * 10000 + 0.5) AS BIGINT) AS v
          FROM events),
        tot AS (
          SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS s
          FROM e),
        g AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n_t,
            CAST(sum(v) AS BIGINT) AS s_t
          FROM e GROUP BY 1),
        obs AS (
          SELECT event_type, n_t,
            ((CAST(s_t AS DOUBLE) / n_t)
              - (CAST(tot.s - s_t AS DOUBLE) / (tot.n - n_t))) / 10000.0
              AS diff_obs
          FROM g, tot),
        pp AS (SELECT unnest($perms) AS p),
        gt AS (
          SELECT event_type, n_t,
            CAST(n_t AS DOUBLE) * ${1L << 48} / tot.n AS thr
          FROM g, tot),
        hh AS (
          SELECT gt.event_type, gt.thr, e.v,
            ${graft.functions.PortableSql.hexToLong(
              "md5(CAST(e.event_id AS VARCHAR) || '|' || gt.event_type)", 12)} AS h1,
            ${graft.functions.PortableSql.hexToLong(
              "substr(md5(CAST(e.event_id AS VARCHAR) || '|' || gt.event_type), 13, 12)",
              12)} AS h2
          FROM e, gt),
        asg AS (
          SELECT event_type, pp.p, v,
            ((h1 + pp.p * h2) % ${1L << 48} < thr) AS a
          FROM hh, pp),
        pd AS (
          SELECT event_type, p,
            ((CAST(sum(CASE WHEN a THEN v ELSE 0 END) AS DOUBLE)
              / sum(CASE WHEN a THEN 1 ELSE 0 END))
            - (CAST(sum(CASE WHEN a THEN 0 ELSE v END) AS DOUBLE)
              / sum(CASE WHEN a THEN 0 ELSE 1 END))) / 10000.0 AS diff_p
          FROM asg GROUP BY 1, 2),
        cc AS (
          SELECT o.event_type, o.n_t, o.diff_obs,
            CAST(1 + sum(CASE WHEN abs(pd.diff_p) >= abs(o.diff_obs)
              THEN 1 ELSE 0 END) AS BIGINT) AS c
          FROM obs o JOIN pd ON pd.event_type = o.event_type
          GROUP BY 1, 2, 3),
        rk AS (
          SELECT a.event_type, a.n_t, a.diff_obs, a.c,
            CAST(count(*) AS BIGINT) AS rank
          FROM cc a JOIN cc b
            ON b.c < a.c OR (b.c = a.c AND b.event_type <= a.event_type)
          GROUP BY 1, 2, 3, 4),
        khat AS (
          SELECT coalesce(max(rank), CAST(0 AS BIGINT)) AS k
          FROM rk WHERE 20 * c <= 13 * rank)
        SELECT event_type, n_t, round(diff_obs, 6) AS diff_obs, c,
          round(c / 13.0, 6) AS p_value,
          rank, CAST(rank <= khat.k AS INT) AS rejected
        FROM rk, khat
        ORDER BY event_type""")
    })(
      (s, dir) => {
        import graft.functions.Md5Long
        // value in exact 4-dp fixed point: every sum is a plain LONG —
        // order-independent AND fast (a 6M-row DECIMAL(27,8) sum ran
        // ~3x slower); the /10000.0 rescale is one deterministic
        // division at the end of each mean
        val e = T(s, dir, "events")
          .select(col("event_id"), col("event_type"),
            floor(col("value") * 10000 + 0.5).cast("long").as("v"))
        val tot = e.agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
        val g = e.groupBy("event_type")
          .agg(count(lit(1)).as("n_t"), sum(col("v")).as("s_t"))
        val obs = g.crossJoin(broadcast(tot))
          .select(col("event_type"), col("n_t"),
            (((col("s_t").cast("double") / col("n_t"))
              - ((col("s") - col("s_t")).cast("double")
                / (col("n") - col("n_t")))) / 10000.0).as("diff_obs"))
        // ONE md5 per (event, test); the 12 per-permutation hashes are
        // double-hashed (h1 + p·h2 mod 2^48, Kirsch-Mitzenmacher — the
        // minhash/bloom trick). The 5× type fan-out rides a constant-key
        // BroadcastHashJoin and the 12× perm fan-out a generator explode
        // — both stay inside whole-stage codegen, where a crossJoin
        // chain would run the 6M-row pipeline through nested-loop
        // iterators (~4× slower measured).
        val key = concat(col("event_id").cast("string"), lit("|"),
          col("t_type"))
        // the per-type threshold u < n_t·2^48/N is computed ONCE per
        // test as a double (deterministic: same IEEE expression both
        // engines; u < 2^48 is exact as a double) — a per-row
        // DECIMAL(38) product here cost ~5s on the 6M-row fan-out
        val gt = g.crossJoin(broadcast(tot.select(col("n"))))
          .select(col("event_type").as("t_type"),
            (col("n_t").cast("double") * lit((1L << 48).toDouble)
              / col("n")).as("thr"))
        val hh = e.withColumn("j", lit(1))
          .join(broadcast(gt.withColumn("j", lit(1))), "j")
          .select(col("t_type"), col("thr"), col("v"),
            Md5Long.md5PrefixLong(key, 0, 6).as("h1"),
            Md5Long.md5PrefixLong(key, 6, 6).as("h2"))
        val asg = hh
          .withColumn("p", explode(typedlit((0 until 12).toList)))
          .select(col("t_type"), col("p"), col("v"),
            (((col("h1") + col("p") * col("h2")) % lit(1L << 48))
              < col("thr")).as("a"))
        val pd = asg.groupBy(col("t_type").as("event_type"), col("p"))
          .agg(
            (((sum(when(col("a"), col("v")).otherwise(lit(0L)))
              .cast("double")
              / sum(when(col("a"), 1).otherwise(0)))
            - (sum(when(col("a"), lit(0L)).otherwise(col("v")))
              .cast("double")
              / sum(when(col("a"), 0).otherwise(1)))) / 10000.0)
              .as("diff_p"))
        val cc = obs.join(pd, "event_type")
          .groupBy("event_type", "n_t", "diff_obs")
          .agg((lit(1L) + sum(when(abs(col("diff_p")) >= abs(col("diff_obs")),
            1L).otherwise(0L))).as("c"))
        // per-type rank via a broadcast non-equi self-join of the
        // |event_type|-row (model-sized) counts frame — the global
        // row_number this replaces would be an unpartitioned window
        val rk = cc.as("a").join(
            broadcast(cc.select(col("event_type").as("b_type"),
              col("c").as("b_c"))),
            col("b_c") < col("c") ||
              (col("b_c") === col("c") && col("b_type") <= col("event_type")))
          .groupBy("event_type", "n_t", "diff_obs", "c")
          .agg(count(lit(1)).as("rank"))
        val khat = rk.where(lit(20) * col("c") <= lit(13) * col("rank"))
          .agg(coalesce(max(col("rank")), lit(0L)).as("k"))
        rk.crossJoin(broadcast(khat))
          .select(col("event_type"), col("n_t"),
            round(col("diff_obs"), 6).as("diff_obs"), col("c"),
            round(col("c") / lit(13.0), 6).as("p_value"),
            col("rank"), (col("rank") <= col("k")).cast("int").as("rejected"))
          .orderBy("event_type")
      })
  )
}
