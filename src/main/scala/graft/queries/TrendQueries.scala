package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PortableSql
import graft.ops.Percentiles
import graft.ops.Relational.{davg, dsum}
import graft.sketch.Hll

/** Round-5 batch 5: sketch algebra (HLL union rollup), seasonal
  * baselines, cumulative-distinct growth, winsorized statistics, and a
  * Welch z-test — each oracle-checked bit-for-bit against DuckDB.
  */
object TrendQueries {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val HllP = 6

  def all: Seq[Q] = Seq(

    // HLL sketch-algebra rollup: per-event-type user sketches MERGED
    // (per-bucket max) into the overall-corpus sketch — the union
    // operation that rolls per-day/per-source cardinalities up to
    // month/corpus totals WITHOUT rescanning data. The merged estimate
    // is definitionally the union's own sketch; the oracle replays both
    // levels from the same registers.
    Q("q141_hll_union", {
      val m = (1 << HllP).toDouble
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      val alphaM2 = PortableSql.doubleLit(alpha * m * m)
      val mi = 1 << HllP
      val maxRho = 48 - HllP + 1
      Q.sql(s"""
        WITH h AS (
          SELECT event_type,
            ${PortableSql.hexToLong("md5(CAST(user_id AS VARCHAR))", 12)} AS h
          FROM events),
        b AS (
          SELECT event_type, h % $mi AS bucket,
            CAST(floor(h / $mi) AS BIGINT) AS w
          FROM h),
        r AS (
          SELECT event_type, bucket,
            max(CASE WHEN w = 0 THEN $maxRho
                     ELSE CAST(bit_count((w & (-w)) - 1) AS BIGINT) + 1 END) AS max_rho
          FROM b GROUP BY 1, 2),
        ar AS (
          SELECT event_type AS scope, bucket, max_rho FROM r
          UNION ALL
          SELECT 'ALL', bucket, max(max_rho) FROM r GROUP BY 2),
        s AS (
          SELECT scope, count(*) AS n_present,
            sum(CAST(1 AS DOUBLE) / (CAST(1 AS BIGINT) << max_rho)) AS s_present
          FROM ar GROUP BY 1),
        e AS (
          SELECT scope,
            (CAST($mi AS DOUBLE) - n_present) AS zeros,
            CAST($alphaM2 AS DOUBLE) / (s_present + (CAST($mi AS DOUBLE) - n_present)) AS raw
          FROM s),
        x AS (
          SELECT scope,
            CASE WHEN raw <= CAST(${PortableSql.doubleLit(2.5 * m)} AS DOUBLE) AND zeros > 0
                 THEN CAST($mi AS DOUBLE) * ln(CAST($mi AS DOUBLE) / zeros)
                 ELSE raw END AS est
          FROM e),
        ex AS (
          SELECT event_type AS scope, count(DISTINCT user_id) AS exact_n
          FROM events GROUP BY 1
          UNION ALL
          SELECT 'ALL', count(DISTINCT user_id) FROM events)
        SELECT x.scope, ex.exact_n, round(est, 6) AS hll_est
        FROM x JOIN ex USING (scope)
        ORDER BY scope""")
    })(
      (s, dir) => {
        val e = T(s, dir, "events")
        val regs = graft.ops.Frames.cached(
          Hll.registersBy(e, col("user_id"), Seq("event_type"), HllP))
        val allRegs = regs.withColumnRenamed("event_type", "scope")
          .unionByName(Hll.mergeBy(regs, Nil).withColumn("scope", lit("ALL")))
        val est = Hll.estimateBy(allRegs, Seq("scope"), HllP)
        val exact = e.groupBy(col("event_type").as("scope"))
          .agg(countDistinct(col("user_id")).as("exact_n"))
          .unionByName(e.agg(countDistinct(col("user_id")).as("exact_n"))
            .withColumn("scope", lit("ALL")))
        est.join(exact, "scope")
          .select(col("scope"), col("exact_n"),
            round(col("hll_est"), 6).as("hll_est"))
          .orderBy("scope")
      }),

    // Day-of-week seasonal baseline + residual anomalies over daily
    // order revenue: two hash aggregations (daily, then per-dow mean via
    // broadcast re-join); flagged days deviate >20% from their weekday
    // baseline. The dow keys differ between engines (Spark 1=Sunday,
    // DuckDB 0=Sunday) — the oracle adds 1.
    Q("q142_seasonality", Q.sql("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
            CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS revenue
          FROM orders GROUP BY 1),
        base AS (
          SELECT dayofweek(day) + 1 AS dow,
            CAST(sum(CAST(revenue AS DECIMAL(27,4))) AS DOUBLE) / count(*) AS baseline
          FROM daily GROUP BY 1)
        SELECT day, revenue, dow, round(baseline, 6) AS baseline,
          round(revenue - baseline, 6) AS residual,
          abs(revenue - baseline) > baseline * 0.2 AS flagged
        FROM daily JOIN base ON dayofweek(day) + 1 = base.dow
        ORDER BY day"""))(
      (s, dir) => {
        val daily = T(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(dsum(col("o_totalprice"), 4).as("revenue"))
        val base = daily.groupBy(dayofweek(col("day")).as("dow"))
          .agg(davg(col("revenue"), 4).as("baseline"))
        daily.join(broadcast(base), dayofweek(col("day")) === col("dow"))
          .select(col("day"), col("revenue"), col("dow"),
            round(col("baseline"), 6).as("baseline"),
            round(col("revenue") - col("baseline"), 6).as("residual"),
            (abs(col("revenue") - col("baseline")) >
              col("baseline") * 0.2).as("flagged"))
          .orderBy("day")
      }),

    // Cumulative-distinct growth curve: users-to-date per day from each
    // user's FIRST day — two hash aggregations + one tiny running-sum
    // window over day rows (never a count-distinct window over events).
    Q("q143_cumulative_users", Q.sql("""
        WITH fd AS (
          SELECT user_id, min(CAST(ts AS DATE)) AS day
          FROM events GROUP BY 1),
        nd AS (SELECT day, count(*) AS new_users FROM fd GROUP BY 1)
        SELECT day, new_users,
          CAST(sum(new_users) OVER (
            ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        FROM nd ORDER BY day"""))(
      (s, dir) => {
        val nd = T(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(min(to_date(col("ts"))).as("day"))
          .groupBy("day").agg(count(lit(1)).as("new_users"))
        nd.select(col("day"), col("new_users"),
            sum(col("new_users")).over(Window.orderBy(col("day"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .as("cum_users"))
          .orderBy("day")
      }),

    // Winsorized statistics: per-group p05/p95 clamps (exact
    // distributed percentiles, broadcast back) then decimal-exact
    // clipped means — the robust-mean pattern that tames heavy tails
    // without dropping rows.
    Q("q144_winsorize", Q.sql(s"""
        WITH ${Percentiles.oracleCtes("wz", "lineitem", Seq("l_returnflag"),
          "l_extendedprice", Seq("p05" -> 0.05, "p95" -> 0.95))}
        SELECT l.l_returnflag, round(wz.p05, 6) AS p05, round(wz.p95, 6) AS p95,
          count(*) AS n,
          round(CAST(sum(CAST(least(greatest(l.l_extendedprice, wz.p05), wz.p95) AS DECIMAL(27,6))) AS DOUBLE) / count(*), 6) AS mean_clipped
        FROM lineitem l JOIN wz ON l.l_returnflag = wz.l_returnflag
        GROUP BY 1, 2, 3 ORDER BY 1"""))(
      (s, dir) => {
        val li = T(s, dir, "lineitem")
        val qs = Percentiles.exact(li, Seq("l_returnflag"),
          col("l_extendedprice"), Seq("p05" -> 0.05, "p95" -> 0.95))
        li.join(broadcast(qs), "l_returnflag")
          .groupBy(col("l_returnflag"), round(col("p05"), 6).as("p05"),
            round(col("p95"), 6).as("p95"))
          .agg(count(lit(1)).as("n"),
            round(dsum(least(greatest(col("l_extendedprice"), col("p05")),
              col("p95")), 6) / count(lit(1)), 6).as("mean_clipped"))
          .orderBy("l_returnflag")
      }),

    // Welch z-test between two variants (user_id parity) on purchase
    // values: ONE conditional-aggregation pass builds both variants'
    // decimal-exact moments; mean/variance/z come from a fixed IEEE
    // expression — the A/B-test readout at any scale.
    Q("q145_ab_welch", {
      def d(e: String) = s"CAST(sum(CAST($e AS DECIMAL(27,6))) AS DOUBLE)"
      def side(v: Int, e: String) = s"CASE WHEN user_id % 2 = $v THEN $e ELSE 0 END"
      Q.sql(s"""
        WITH m AS (
          SELECT
            CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
            CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
            ${d(side(0, "value"))} AS sx0, ${d(side(1, "value"))} AS sx1,
            ${d(side(0, "value * value"))} AS ss0, ${d(side(1, "value * value"))} AS ss1
          FROM events WHERE event_type = 'purchase'),
        t AS (
          SELECT n0, n1, sx0 / n0 AS m0, sx1 / n1 AS m1,
            (ss0 - sx0 * sx0 / n0) / (n0 - 1) AS v0,
            (ss1 - sx1 * sx1 / n1) / (n1 - 1) AS v1
          FROM m)
        SELECT n0, n1, round(m0, 6) AS mean0, round(m1, 6) AS mean1,
          round((m1 - m0) / sqrt(v1 / n1 + v0 / n0), 6) AS welch_z
        FROM t""")
    })(
      (s, dir) => {
        val v = col("user_id") % 2
        def side(i: Int, e: org.apache.spark.sql.Column) =
          when(v === i, e).otherwise(lit(0))
        val m = T(s, dir, "events").where(col("event_type") === "purchase")
          .agg(
            sum(when(v === 0, 1L).otherwise(0L)).as("n0"),
            sum(when(v === 1, 1L).otherwise(0L)).as("n1"),
            dsum(side(0, col("value")), 6).as("sx0"),
            dsum(side(1, col("value")), 6).as("sx1"),
            dsum(side(0, col("value") * col("value")), 6).as("ss0"),
            dsum(side(1, col("value") * col("value")), 6).as("ss1"))
        val t = m.select(col("n0"), col("n1"),
          (col("sx0") / col("n0")).as("m0"), (col("sx1") / col("n1")).as("m1"),
          ((col("ss0") - col("sx0") * col("sx0") / col("n0")) /
            (col("n0") - lit(1))).as("v0"),
          ((col("ss1") - col("sx1") * col("sx1") / col("n1")) /
            (col("n1") - lit(1))).as("v1"))
        t.select(col("n0"), col("n1"),
          round(col("m0"), 6).as("mean0"), round(col("m1"), 6).as("mean1"),
          round((col("m1") - col("m0")) /
            sqrt(col("v1") / col("n1") + col("v0") / col("n0")), 6)
            .as("welch_z"))
      })
  )
}
