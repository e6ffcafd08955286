package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{ArrayMath, PortableSql}

/** Round-15 widening (round-14 verdict item 7): a LINEAR-TIME multivariate
  * two-sample drift test over the embedding space — MMD with random
  * Fourier features (Rahimi & Recht NIPS'07; Gretton et al. JMLR'12 for
  * the MMD itself). PSI (q479) and Epps-Singleton (q485) watch univariate
  * distributions; a real training pipeline ALSO monitors its embedding
  * space, where the classic quadratic-kernel MMD (O(n²) pair frames) is
  * exactly what a 100 TB engine must avoid. The RFF approximation drops
  * the pair frame entirely: for the RBF kernel k(x,y)=exp(−‖x−y‖²/2σ²),
  * z_f(x) = √(2/D)·cos(w_fᵀx + b_f) with w ~ N(0, σ⁻²I), b ~ U[0,2π)
  * gives E[z(x)ᵀz(y)] = k(x,y), so
  * MMD²(X,Y) ≈ ‖mean_X z − mean_Y z‖² — one scan, one hash-agg of D
  * feature sums per group, a constant-size ladder. O(n·D·dim) compute,
  * no shuffle beyond the group-by.
  *
  * Engine portability — the q485 pattern throughout: the w/b constants
  * are deterministic (md5-seeded Box-Muller, generated driver-side and
  * embedded as round-trip double literals in BOTH engines' expressions);
  * the per-row feature cos is rounded@9 through [[PortableSql.round]]'s
  * shared floor ladder and summed in exact DECIMAL(38,9) (the only
  * order-dependent reduction); every downstream scalar stage is ONE
  * generated string evaluated verbatim by both engines. The Spark-side
  * dot rides [[ArrayMath.dotConst]]'s codegen loop — bit-identical to
  * the oracle's left-associative [[PortableSql.dotConst]] chain.
  */
object EmbeddingDriftQueries {

  private val Dim = 64

  /** Feature count D. The MMD estimate's RFF error is O(1/√D) — 8 is a
    * probe-grade panel (a production monitor raises D, cost is linear).
    */
  private val D = 8

  /** Fixed RBF bandwidth σ² = dim: the median-heuristic alternative
    * needs a pair sample, and a DRIFT MONITOR wants a constant kernel
    * anyway — a bandwidth that re-fits per window would absorb the very
    * shift it is meant to flag.
    */
  private val Sigma = 8.0

  /** Deterministic uniform in (0,1): first 8 md5 hex chars, bias +0.5 so
    * 0 is unreachable (Box-Muller takes log(u)).
    */
  private def u01(s: String): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(8)
    (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / math.pow(16, 8)
  }

  /** w_f ~ N(0, σ⁻²I) via Box-Muller on the md5 stream. */
  private def w(f: Int): Array[Double] = Array.tabulate(Dim) { i =>
    val u1 = u01(s"rffw|$f|$i|1")
    val u2 = u01(s"rffw|$f|$i|2")
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2) / Sigma
  }

  /** b_f ~ U[0, 2π). */
  private def b(f: Int): Double = 2.0 * math.Pi * u01(s"rffb|$f")

  /** Shared cos-feature ladder over a dot expression: both engines see
    * the identical string except for the dot operand (named codegen
    * column on Spark, inline literal chain in the oracle — bit-identical
    * by ArrayMath's accumulation-order contract).
    */
  private def zExpr(dotExpr: String, f: Int): String =
    PortableSql.round(
      s"cos(($dotExpr) + (${PortableSql.doubleLit(b(f))}))", 9) + s" AS z$f"

  /** Exact decimal feature sums (order-independent), emitted as DOUBLE
    * (exact while |sum|·10⁹ < 2⁵³ — 9e6 rows of |z|≤1 per group, far
    * beyond any fixture; at cluster scale raise the decimal precision).
    */
  private def sAgg(f: Int): String =
    s"CAST(sum(CAST(z$f AS DECIMAL(38,9))) AS DOUBLE) AS s$f"

  private def tAgg(f: Int): String =
    s"CAST(sum(CAST(s$f AS DECIMAL(38,9))) AS DOUBLE) AS t$f"

  /** One-vs-rest final ladder: per label, d_f = mean_in z_f − mean_out
    * z_f, MMD² = (2/D)·Σ d², plus the n-scaled form (n_in·n_out/n)·MMD²
    * whose null distribution is O(1). Guarded on a non-empty complement
    * so a single-label fixture yields NULL on both engines instead of a
    * Spark-NULL/DuckDB-error divergence.
    */
  private val finCols: Seq[String] = {
    def d(f: Int) =
      s"((s$f / CAST(n AS DOUBLE)) - ((t$f - s$f) / CAST(nt - n AS DOUBLE)))"
    val ss = (1 to D).map(f => s"(${d(f)} * ${d(f)})")
      .reduce((a, c) => s"($a + $c)")
    val mmd2 = s"((CAST(2 AS DOUBLE) / CAST($D AS DOUBLE)) * $ss)"
    val scaled = s"(((CAST(n AS DOUBLE) * CAST(nt - n AS DOUBLE))" +
      s" / CAST(nt AS DOUBLE)) * $mmd2)"
    Seq("label", "n AS n_in", "(nt - n) AS n_out",
      PortableSql.round(s"(CASE WHEN nt > n THEN $mmd2 END)", 8)
        + " AS mmd2",
      PortableSql.round(s"(CASE WHEN nt > n THEN $scaled END)", 6)
        + " AS mmd2_n")
  }

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def all: Seq[Q] = Seq(

    // Which label segment's embedding DISTRIBUTION drifted from the rest?
    // One-vs-rest RFF-MMD² per label over embeddings.embedding. Scale
    // shape: one scan computing D dots per row (codegen loop), one
    // hash-agg to (label, n, D sums), a 10-row frame joined to its own
    // 1-row total (broadcast scalar attachment), constant-size ladder —
    // the same shape at 100 TB with the hash-agg going partial/final.
    Q("q487_embedding_drift_mmd", {
      val zCols = (1 to D).map(f =>
        zExpr(PortableSql.dotConst("embedding", w(f)), f))
      Q.sql(s"""
        WITH z AS (
          SELECT label, ${zCols.mkString(", ")}
          FROM embeddings),
        m AS (
          SELECT label, CAST(count(*) AS BIGINT) AS n,
            ${(1 to D).map(sAgg).mkString(", ")}
          FROM z GROUP BY 1),
        tot AS (
          SELECT CAST(sum(n) AS BIGINT) AS nt,
            ${(1 to D).map(tAgg).mkString(", ")}
          FROM m)
        SELECT ${finCols.mkString(", ")}
        FROM m, tot ORDER BY label""")
    })(
      (s, dir) => {
        val dots = T(s, dir, "embeddings").select(
          col("label") +:
            (1 to D).map(f =>
              ArrayMath.dotConst(col("embedding"), w(f)).as(s"d$f")): _*)
        val z = dots.selectExpr(
          "label" +: (1 to D).map(f => zExpr(s"d$f", f)): _*)
        // cached: `tot` re-aggregates the 10-row label frame — without
        // the cache Spark recomputes m's whole subtree under the
        // broadcast, i.e. a SECOND full scan + hash-agg of the data
        val m = graft.ops.Frames.cached(
          z.groupBy(col("label"))
            .agg(expr("CAST(count(*) AS BIGINT) AS n"),
              (1 to D).map(f => expr(sAgg(f))): _*))
        val tot = m.agg(expr("CAST(sum(n) AS BIGINT) AS nt"),
          (1 to D).map(f => expr(tAgg(f))): _*)
        m.crossJoin(broadcast(tot))
          .selectExpr(finCols: _*)
          .orderBy("label")
      }))
}
