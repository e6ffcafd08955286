package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PortableSql
import graft.similarity.Quantize
import graft.sketch.Hll

/** Sketch + quantization operators under the oracle gate: a
  * deterministic HyperLogLog register table ([[graft.sketch.Hll]]) and
  * symmetric int8 embedding quantization
  * ([[graft.similarity.Quantize]]).
  */
object SketchQueries {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val HllP = 6

  def all: Seq[Q] = Seq(

    // HLL registers (p=6 → 64 buckets) over lineitem part keys. The
    // oracle replays the identical integer derivation: 48-bit md5 hash,
    // low-p-bit bucket, trailing-zeros+1 rho via bit_count((w & -w) - 1)
    // — no floating point anywhere.
    Q("q66_hll_registers", Q.sql(s"""
        WITH h AS (
          SELECT ${PortableSql.hexToLong("md5(CAST(l_partkey AS VARCHAR))", 12)} AS h
          FROM lineitem),
        b AS (
          SELECT h % ${1 << HllP} AS bucket,
            CAST(floor(h / ${1 << HllP}) AS BIGINT) AS w
          FROM h)
        SELECT bucket,
          max(CASE WHEN w = 0 THEN ${48 - HllP + 1}
                   ELSE CAST(bit_count((w & (-w)) - 1) AS BIGINT) + 1 END) AS max_rho
        FROM b
        GROUP BY 1
        ORDER BY bucket"""))(
      (s, dir) =>
        Hll.registers(T(s, dir, "lineitem"), col("l_partkey"), HllP)
          .orderBy("bucket")),

    // Symmetric int8 quantization of the embeddings table, flat
    // (vec_id, pos, q, scale) layout. Scale is max|v|/127 (exact
    // comparison math); codes are floor(v/scale + 0.5) in double on both
    // engines.
    Q("q67_embed_quantize", Q.sql("""
        WITH e AS (
          SELECT vec_id, pos - 1 AS pos, CAST(embedding[pos] AS DOUBLE) AS v
          FROM embeddings,
            LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos) t),
        m AS (
          SELECT vec_id, max(abs(v)) / 127.0 AS scale FROM e GROUP BY 1)
        SELECT e.vec_id AS vec_id, e.pos AS pos,
          CASE WHEN m.scale = 0 THEN 0
               ELSE CAST(floor(e.v / m.scale + 0.5) AS BIGINT) END AS q,
          m.scale AS scale
        FROM e JOIN m ON e.vec_id = m.vec_id
        ORDER BY e.vec_id, e.pos"""))(
      (s, dir) =>
        Quantize.int8(T(s, dir, "embeddings"), col("vec_id"), col("embedding"))
          .orderBy("vec_id", "pos")),

    // End-to-end quantized search: top-3 cosine neighbours computed ON
    // THE INT8 CODES (scales cancel in cosine). Every dot product is an
    // exact integer (|q| <= 127, 64 dims → < 2^21), so the quantized
    // scores hash-match the oracle bit-for-bit — the storage->search
    // path a 100 TB vector store actually runs, at 4x less scan I/O.
    Q("q68_quantized_knn", Q.sql(s"""
        WITH e AS (
          SELECT vec_id, pos - 1 AS pos, CAST(embedding[pos] AS DOUBLE) AS v
          FROM embeddings,
            LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos) t),
        m AS (
          SELECT vec_id, max(abs(v)) / 127.0 AS scale FROM e GROUP BY 1),
        qf AS (
          SELECT e.vec_id AS vec_id, e.pos AS pos,
            CASE WHEN m.scale = 0 THEN 0
                 ELSE CAST(floor(e.v / m.scale + 0.5) AS BIGINT) END AS q
          FROM e JOIN m ON e.vec_id = m.vec_id),
        v AS (SELECT vec_id, list(q ORDER BY pos) AS qv FROM qf GROUP BY 1)
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            round(${PortableSql.cosine("q.qv", "c.qv", 64)}, 6) AS cos_sim,
            row_number() OVER (
              PARTITION BY q.vec_id
              ORDER BY round(${PortableSql.cosine("q.qv", "c.qv", 64)}, 6) DESC,
                c.vec_id) AS rank
          FROM v q, v c
          WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id) t
        WHERE rank <= 3
        ORDER BY query_id, rank"""))(
      (s, dir) => {
        val packed = graft.ops.Frames.cached(
          Quantize.toArrays(
              Quantize.int8(T(s, dir, "embeddings"), col("vec_id"), col("embedding")))
            .select(col("vec_id"),
              transform(col("qvec"), x => x.cast("float")).as("embedding")))
        graft.similarity.Similarity.knnBruteForce(
            packed.where(col("vec_id") < 5), packed, k = 3)
          .orderBy("query_id", "rank")
      }),

    // Grouped HLL count-distinct ESTIMATES, fully in-frame (no driver
    // collect): per event type, distinct-user estimate vs exact with the
    // relative error. The register inverses 1/2^rho are dyadic, so the
    // per-group sums are IEEE-exact in any aggregation order — the whole
    // estimator (raw + linear-counting correction) is oracle-checkable
    // without decimal routing. At 100 TB the exact side is the expensive
    // one; the estimate reads 64 tiny rows per group.
    Q("q125_hll_estimate", {
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
        s AS (
          SELECT event_type, count(*) AS n_present,
            sum(CAST(1 AS DOUBLE) / (CAST(1 AS BIGINT) << max_rho)) AS s_present
          FROM r GROUP BY 1),
        e AS (
          SELECT event_type,
            (CAST($mi AS DOUBLE) - n_present) AS zeros,
            CAST($alphaM2 AS DOUBLE) / (s_present + (CAST($mi AS DOUBLE) - n_present)) AS raw
          FROM s),
        x AS (
          SELECT event_type,
            CASE WHEN raw <= CAST(${PortableSql.doubleLit(2.5 * m)} AS DOUBLE) AND zeros > 0
                 THEN CAST($mi AS DOUBLE) * ln(CAST($mi AS DOUBLE) / zeros)
                 ELSE raw END AS est
          FROM e),
        ex AS (
          SELECT event_type, count(DISTINCT user_id) AS exact_n
          FROM events GROUP BY 1)
        SELECT x.event_type AS event_type, ex.exact_n, round(est, 6) AS hll_est,
          round(abs(est - exact_n) / exact_n, 6) AS rel_err
        FROM x JOIN ex ON ex.event_type = x.event_type
        ORDER BY event_type""")
    })(
      (s, dir) => {
        val e = T(s, dir, "events")
        val regs = Hll.registersBy(e, col("user_id"), Seq("event_type"), HllP)
        val est = Hll.estimateBy(regs, Seq("event_type"), HllP)
        val exact = e.groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("exact_n"))
        est.join(exact, "event_type")
          .select(col("event_type"), col("exact_n"),
            round(col("hll_est"), 6).as("hll_est"),
            round(abs(col("hll_est") - col("exact_n")) / col("exact_n"), 6)
              .as("rel_err"))
          .orderBy("event_type")
      })
    ,

    // Bloom false-positive calibration: probe the q103 filter (m=1024,
    // k=3) with keys GUARANTEED absent from the build set — every
    // positive is a false positive — and compare the measured rate to
    // the load-based theory (set_bits/m)^k. The oracle replays the
    // whole filter in SQL (distinct bit positions from the build keys,
    // per-probe hit counting), so the bit array itself is
    // engine-portable. This is the sizing check run before trusting a
    // bloom predicate to prune a 100 TB scan.
    Q("q285_bloom_fpr", {
      val h1 = PortableSql.hexToLong("md5(CAST(key AS VARCHAR))", 12)
      val h2 = PortableSql.hexToLong(
        "substr(md5(CAST(key AS VARCHAR)), 13, 12)", 12)
      Q.sql(s"""
        WITH bk AS (
          SELECT DISTINCT o_orderkey AS key FROM orders
          WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 450000),
        ii AS (SELECT unnest([0, 1, 2]) AS i),
        pos AS (
          SELECT DISTINCT (($h1) + i * ($h2)) % 1024 AS p
          FROM bk, ii),
        nb AS (SELECT count(*) AS n_build FROM bk),
        nbits AS (SELECT count(*) AS n_bits_set FROM pos),
        pr AS (SELECT c_custkey + 10000000 AS key FROM customer),
        pp AS (
          SELECT key, (($h1) + i * ($h2)) % 1024 AS p
          FROM pr, ii),
        hits AS (
          SELECT key, count(*) AS nhit FROM pp JOIN pos USING (p)
          GROUP BY 1),
        st AS (
          SELECT count(*) AS n_probes,
            CAST(sum(CASE WHEN nhit = 3 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_fp
          FROM pr LEFT JOIN hits USING (key))
        SELECT n_build, CAST(n_bits_set AS BIGINT) AS n_bits_set,
          n_probes, n_fp,
          round(n_fp * 1.0 / n_probes, 6) AS fp_rate,
          round((n_bits_set * 1.0 / 1024) * (n_bits_set * 1.0 / 1024)
            * (n_bits_set * 1.0 / 1024), 6) AS fp_theory
        FROM st, nb, nbits""")
    })(
      (s, dir) => {
        import graft.sketch.Bloom
        val build = T(s, dir, "orders")
          .where(col("o_orderpriority") === "1-URGENT" &&
            col("o_totalprice") > 450000)
        val f = Bloom.build(build, col("o_orderkey"), m = 1024, k = 3)
        val bitsSet = f.bits.map(java.lang.Long.bitCount).sum.toLong
        val probes = T(s, dir, "customer")
          .select((col("c_custkey") + 10000000L).as("pkey"))
        val st = probes.agg(count(lit(1)).as("n_probes"),
          sum(when(f.mightContain(col("pkey")), 1L).otherwise(0L))
            .as("n_fp"))
        val nb = build.select(col("o_orderkey")).distinct()
          .agg(count(lit(1)).as("n_build"))
        val t = lit(bitsSet).cast("double") / 1024
        st.crossJoin(broadcast(nb))
          .select(col("n_build"), lit(bitsSet).as("n_bits_set"),
            col("n_probes"), col("n_fp"),
            round(col("n_fp").cast("double") / col("n_probes"), 6)
              .as("fp_rate"),
            round(t * t * t, 6).as("fp_theory"))
      })
  )
}
