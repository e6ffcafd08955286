package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Hashing, PortableSql}
import graft.ops.{Expectations, RangeJoin}
import graft.ops.Relational.dsum
import graft.similarity.Similarity

/** Round-5 batch 3: data-quality expectations, interval-overlap joins,
  * range-frame windows, corpus entropy, PII redaction, histograms,
  * semantic dedup, and basket co-occurrence — each oracle-checked
  * bit-for-bit against DuckDB.
  */
object QualityQueries {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Tokenized-documents CTE keyed by source (the q111 oracle's input) —
    * the exact derivation of `TextAnalysis.normalizeText` + `tokens`.
    */
  private val sourceWordsCte = """
    WITH w AS (
      SELECT source,
        string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS ws
      FROM documents)"""

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val LongNumRe = "[0-9]{6,}"
  private val SemDim = 64
  private val SemBits = 8
  private val SemThreshold = 0.25
  private val HistWidth = 30000
  private val HistMaxBucket = 19

  def all: Seq[Q] = Seq(

    // Interval×interval overlap join: same-customer order-fulfilment
    // windows ([orderdate, orderdate + (key%14 + 1) days]) that overlap
    // in time. Spark has no native interval join (a theta join plans as
    // BNLJ); ops.RangeJoin.intervalOverlap bands BOTH sides so it runs
    // as an equi-join on (custkey, band) with first-band dedup evaluated
    // inside the join — no distinct stage, no n·m. Oracle: the plain
    // theta self-join.
    Q("q108_interval_overlap", Q.sql("""
        WITH iv AS (
          SELECT o_custkey, o_orderkey AS okey,
            epoch_us(o_orderdate) // 86400000000 AS s,
            epoch_us(o_orderdate) // 86400000000 + o_orderkey % 14 + 1 AS e
          FROM orders)
        SELECT a.o_custkey AS custkey, a.okey AS key_a, b.okey AS key_b,
          least(a.e, b.e) - greatest(a.s, b.s) + 1 AS overlap_days
        FROM iv a JOIN iv b
          ON a.o_custkey = b.o_custkey AND a.okey < b.okey
            AND a.s <= b.e AND b.s <= a.e
        ORDER BY custkey, key_a, key_b"""))(
      (s, dir) => {
        val iv = T(s, dir, "orders").select(
          col("o_custkey"),
          col("o_orderkey"),
          expr("unix_timestamp(o_orderdate) div 86400").as("s"))
          .withColumn("e", col("s") + col("o_orderkey") % 14 + 1)
        val a = iv.select(col("o_custkey"), col("o_orderkey").as("key_a"),
          col("s").as("a_s"), col("e").as("a_e"))
        val b = iv.select(col("o_custkey"), col("o_orderkey").as("key_b"),
          col("s").as("b_s"), col("e").as("b_e"))
        RangeJoin.intervalOverlap(a, b, Seq("o_custkey"),
            "a_s", "a_e", "b_s", "b_e", bandWidth = 16)
          .where(col("key_a") < col("key_b"))
          .select(col("o_custkey").as("custkey"), col("key_a"), col("key_b"),
            (least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s")) + 1)
              .as("overlap_days"))
          .orderBy("custkey", "key_a", "key_b")
      }),

    // Declarative data-quality expectation report (the Deequ shape):
    // four row-local checks compiled into ONE aggregation pass over
    // lineitem, key uniqueness riding one pass over orders, and
    // referential integrity as a broadcast anti join — the full batch
    // validation for the cost of two scans and one map-side probe.
    Q("q109_expectations", Q.sql("""
        WITH t AS (
          SELECT '01_lineitem_orderkey_not_null' AS check_name,
            CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations
          FROM lineitem
          UNION ALL
          SELECT '02_lineitem_discount_range',
            CAST(sum(CASE WHEN l_discount IS NULL OR l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
          FROM lineitem
          UNION ALL
          SELECT '03_lineitem_returnflag_set',
            CAST(sum(CASE WHEN l_returnflag IS NULL OR l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS BIGINT)
          FROM lineitem
          UNION ALL
          SELECT '04_lineitem_quantity_range',
            CAST(sum(CASE WHEN l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
          FROM lineitem
          UNION ALL
          SELECT '05_orders_key_unique',
            CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT '06_lineitem_orders_ri',
            CAST((SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT))
        SELECT check_name, violations, violations = 0 AS passed
        FROM t ORDER BY check_name"""))(
      (s, dir) => {
        import Expectations._
        val li = T(s, dir, "lineitem")
        val o = T(s, dir, "orders")
        val rowChecks = report(li, Seq(
          notNull("01_lineitem_orderkey_not_null", col("l_orderkey")),
          inRange("02_lineitem_discount_range", col("l_discount"), 0, 0.1),
          inSet("03_lineitem_returnflag_set", col("l_returnflag"), Seq("A", "N", "R")),
          inRange("04_lineitem_quantity_range", col("l_quantity"), 1, 50)))
        val uniq = report(o, Seq(unique("05_orders_key_unique", col("o_orderkey"))))
        val ri = refIntegrity("06_lineitem_orders_ri",
          li, col("l_orderkey"), o, col("o_orderkey"))
        rowChecks.union(uniq).union(ri)
          .withColumnRenamed("check", "check_name")
          .orderBy("check_name")
      }),

    // Time-range windowed aggregation (RANGE frame): per event, the
    // count and exact sum of the same user's events in the trailing
    // hour. The value-based frame Spark's rowsBetween cannot express —
    // rangeBetween on epoch seconds, one shuffle on user_id, frames
    // resolved by value so same-timestamp ties are deterministic on
    // both engines.
    Q("q110_range_window", Q.sql("""
        SELECT event_id, user_id, epoch_us(ts) // 1000000 AS ts_s,
          CAST(count(*) OVER w AS BIGINT) AS n_1h,
          CAST(sum(CAST(value AS DECIMAL(27,8))) OVER w AS DOUBLE) AS sum_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
          RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, ts_s, event_id"""))(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"))
          .rangeBetween(-3599, Window.currentRow)
        T(s, dir, "events")
          .withColumn("ts_s", col("ts").cast("long"))
          .select(col("event_id"), col("user_id"), col("ts_s"),
            count(lit(1)).over(w).as("n_1h"),
            sum(col("value").cast("decimal(27,8)")).over(w)
              .cast("double").as("sum_1h"))
          .orderBy("user_id", "ts_s", "event_id")
      }),

    // Per-source token-distribution entropy (corpus diversity metric):
    // H = ln(N) - (Σ c·ln c)/N over token counts c. Two hash
    // aggregations, no joins; per-token ln is rounded to 6 decimals then
    // decimal-summed (the UnigramLm determinism pattern), so the result
    // is aggregation-order-free and engine-exact.
    Q("q111_token_entropy", Q.sql(s"""
        $sourceWordsCte,
        tok AS (SELECT source, unnest(ws) AS tok FROM w),
        c AS (SELECT source, tok, count(*) AS c FROM tok GROUP BY 1, 2),
        agg AS (
          SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
            count(*) AS n_distinct,
            CAST(sum(CAST(c * round(ln(CAST(c AS DOUBLE)), 6) AS DECIMAL(27,6))) AS DOUBLE) AS s
          FROM c GROUP BY 1)
        SELECT source, n_tokens, n_distinct,
          round(ln(CAST(n_tokens AS DOUBLE)) - s / n_tokens, 6) AS entropy
        FROM agg ORDER BY source"""))(
      (s, dir) => {
        import graft.text.TextAnalysis
        val c = T(s, dir, "documents")
          .select(col("source"), explode(TextAnalysis.tokens(
            TextAnalysis.normalizeText(col("text")))).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("c"))
        c.groupBy("source")
          .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_distinct"),
            dsum(col("c") * round(log(col("c").cast("double")), 6), 6).as("s"))
          .select(col("source"), col("n_tokens"), col("n_distinct"),
            round(log(col("n_tokens").cast("double")) - col("s") / col("n_tokens"), 6)
              .as("entropy"))
          .orderBy("source")
      }),

    // PII redaction (anonymization pass): scrub email-shaped and long
    // numeric tokens, report per-document match counts and the hash of
    // the scrubbed text. Pure scalar regex in the scan stage — no
    // shuffle, no UDF; patterns kept to the regex subset Java and RE2
    // match identically (character classes + bounded repetition, no
    // alternation ambiguity).
    Q("q112_pii_redact", Q.sql(s"""
        SELECT doc_id,
          CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_emails,
          CAST(len(regexp_extract_all(text, '$LongNumRe')) AS BIGINT) AS n_longnums,
          ${PortableSql.hexToLong(
            s"md5(regexp_replace(regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'), " +
              s"'$LongNumRe', '<NUM>', 'g'))", 12)} AS clean_hash
        FROM documents ORDER BY doc_id"""))(
      (s, dir) =>
        T(s, dir, "documents")
          .select(col("doc_id"),
            regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_emails"),
            regexp_count(col("text"), lit(LongNumRe)).cast("long").as("n_longnums"),
            Hashing.hash48(
              regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"),
                LongNumRe, "<NUM>")).as("clean_hash"))
          .orderBy("doc_id")),

    // Fixed-width histogram of order totals: bucket = min(floor(v/W), 19)
    // — pure arithmetic binning (no percentile state), one hash
    // aggregation, mergeable across partitions/days. The profiling
    // primitive behind every data-distribution dashboard.
    Q("q113_price_histogram", Q.sql(s"""
        SELECT CAST(least(CAST(floor(o_totalprice / $HistWidth) AS BIGINT), $HistMaxBucket) AS BIGINT) AS bucket,
          count(*) AS n,
          CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS total
        FROM orders
        GROUP BY 1 ORDER BY 1"""))(
      (s, dir) =>
        T(s, dir, "orders")
          .groupBy(least(floor(col("o_totalprice") / HistWidth).cast("long"),
            lit(HistMaxBucket.toLong)).as("bucket"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 4).as("total"))
          .orderBy("bucket")),

    // Semantic dedup (SemDedup): drop every vector with a lower-id
    // near-duplicate (cos >= 0.25) in its hyperplane-LSH bucket; emit
    // (vec_id, bucket, kept) for the whole corpus. The embedding-space
    // twin of q84's text-side cluster dedup — bucket equi-join, hoisted
    // norms, greedy keep-lowest-id; see Similarity.semDedup.
    Q("q114_semdedup", {
      val bucket = Similarity.planes(SemBits, SemDim).zipWithIndex.map {
        case (plane, p) =>
          s"(CASE WHEN ${PortableSql.dotConst("embedding", plane)} >= 0" +
            s" THEN ${1L << p} ELSE 0 END)"
      }.mkString("(", " + ", ")")
      val cos = s"round(${PortableSql.cosine("x.embedding", "y.embedding", SemDim)}, 6)"
      Q.sql(s"""
        WITH b AS (
          SELECT vec_id, embedding, CAST($bucket AS BIGINT) AS bucket
          FROM embeddings),
        drops AS (
          SELECT DISTINCT y.vec_id
          FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
          WHERE $cos >= $SemThreshold)
        SELECT b.vec_id, b.bucket, d.vec_id IS NULL AS kept
        FROM b LEFT JOIN drops d ON d.vec_id = b.vec_id
        ORDER BY b.vec_id""")
    })(
      (s, dir) =>
        Similarity.semDedup(T(s, dir, "embeddings"),
            dim = SemDim, nBits = SemBits, threshold = SemThreshold)
          .orderBy("vec_id")),

    // Basket co-occurrence with lift (market-basket affinity): top-50
    // part pairs ordered together, with per-part support and lift =
    // P(a,b)/(P(a)P(b)). Pair fan-out is per-basket quadratic but
    // bounded by basket size (<= 13 parts here — cap baskets upstream
    // when unbounded); the pair join is an equi-join on the basket key,
    // supports broadcast back onto the pair counts.
    Q("q115_basket_pairs", Q.sql("""
        WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pr AS (
          SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_co
          FROM i a JOIN i b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2),
        f AS (SELECT l_partkey, count(*) AS n_orders FROM i GROUP BY 1),
        t AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM i)
        SELECT part_a, part_b, n_co, fa.n_orders AS n_a, fb.n_orders AS n_b,
          round(n_co * CAST(t.n_baskets AS DOUBLE) / (fa.n_orders * fb.n_orders), 6) AS lift
        FROM pr JOIN f fa ON fa.l_partkey = pr.part_a
          JOIN f fb ON fb.l_partkey = pr.part_b, t
        ORDER BY n_co DESC, part_a, part_b
        LIMIT 50"""))(
      (s, dir) => {
        import graft.ops.Frames.cached
        val i = cached(T(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")).distinct())
        val pr = i.select(col("l_orderkey"), col("l_partkey").as("part_a"))
          .join(i.select(col("l_orderkey"), col("l_partkey").as("part_b")),
            Seq("l_orderkey"))
          .where(col("part_a") < col("part_b"))
          .groupBy("part_a", "part_b").agg(count(lit(1)).as("n_co"))
        val f = i.groupBy("l_partkey").agg(count(lit(1)).as("n_orders"))
        val t = i.agg(countDistinct(col("l_orderkey")).as("n_baskets"))
        pr.join(broadcast(f.select(col("l_partkey").as("part_a"),
            col("n_orders").as("n_a"))), "part_a")
          .join(broadcast(f.select(col("l_partkey").as("part_b"),
            col("n_orders").as("n_b"))), "part_b")
          .crossJoin(broadcast(t))
          .select(col("part_a"), col("part_b"), col("n_co"),
            col("n_a"), col("n_b"),
            round(col("n_co") * col("n_baskets").cast("double") /
              (col("n_a") * col("n_b")), 6).as("lift"))
          .orderBy(col("n_co").desc, col("part_a"), col("part_b"))
          .limit(50)
      })
  )
}
