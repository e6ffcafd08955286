package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable standard-normal quantile Φ⁻¹ (probit) for arguments
  * in (0.5, 1) — the range rank-derived scores live in (midrank
  * arguments 1/2 + R/(2(N+1)) are strictly inside it) — via Acklam's
  * rational approximation (P.J. Acklam, "An algorithm for computing the
  * inverse normal cumulative distribution function", 2003; the widely
  * republished public-domain coefficients, |relative error| < 1.15e-9).
  *
  * Both the Spark Column and the DuckDB SQL text are generated from the
  * SAME coefficient lists with the SAME Horner bracketing, so the two
  * engines evaluate structurally identical IEEE expression trees —
  * elementary ops, one sqrt and one ln on the tail branch only (the
  * q475 D'Agostino ladder precedent for cross-engine sqrt/ln) — and the
  * results hash-match after a round.
  */
object Probit {

  // Acklam central-region coefficients (|p - 0.5| <= 0.47575)
  private val A = Seq(-3.969683028665376e+01, 2.209460984245205e+02,
    -2.759285104469687e+02, 1.383577518672690e+02,
    -3.066479806614716e+01, 2.506628277459239e+00)
  private val B = Seq(-5.447609879822406e+01, 1.615858368580409e+02,
    -1.556989798598866e+02, 6.680131188771972e+01,
    -1.328068155288572e+01)
  // tail-region coefficients (p > pHigh)
  private val C = Seq(-7.784894002430293e-03, -3.223964580411365e-01,
    -2.400758277161838e+00, -2.549732539343734e+00,
    4.374664141464968e+00, 2.938163982698783e+00)
  private val D = Seq(7.784695709041462e-03, 3.224671290700398e-01,
    2.445134137142996e+00, 3.754408661907416e+00)
  private val PHigh = 0.97575 // 1 - 0.02425

  private def horner(cs: Seq[Double], x: Column): Column =
    cs.tail.foldLeft(lit(cs.head): Column)((acc, c) => acc * x + lit(c))

  private def hornerSql(cs: Seq[Double], x: String): String =
    cs.tail.foldLeft(cs.head.toString)((acc, c) => s"($acc * $x + $c)")

  /** Φ⁻¹(p) as a Column; `p` MUST be in (0.5, 1). */
  def of(p: Column): Column = {
    val qc = p - 0.5
    val r = qc * qc
    val central = horner(A, r) * qc / (horner(B, r) * r + 1.0)
    val qt = sqrt(lit(-2.0) * log(lit(1.0) - p))
    val tail = -horner(C, qt) / (horner(D, qt) * qt + 1.0)
    when(p > PHigh, tail).otherwise(central)
  }

  /** Φ⁻¹(p) for the FULL open interval (0, 1) via the symmetry
    * Φ⁻¹(p) = −Φ⁻¹(1−p): the p ≥ 0.5 machinery of [[of]] mirrored onto
    * the lower half — order-statistic scores (Shapiro-Francia's Blom
    * arguments) live on both sides of 1/2.
    */
  def ofFull(p: Column): Column =
    when(p < 0.5, -of(lit(1.0) - p)).otherwise(of(p))

  /** Full-range Φ⁻¹ over a DuckDB double expression — same tree as
    * [[ofFull]].
    */
  def sqlFull(p: String): String =
    s"(CASE WHEN $p < 0.5 THEN -${sql(s"(1.0 - $p)")} ELSE ${sql(p)} END)"

  /** Φ⁻¹ over a DuckDB double expression — the same tree as [[of]]. */
  def sql(p: String): String = {
    val qc = s"($p - 0.5)"
    val r = s"($qc * $qc)"
    val central = s"(${hornerSql(A, r)} * $qc / (${hornerSql(B, r)} * $r + 1.0))"
    val qt = s"sqrt(-2.0 * ln(1.0 - $p))"
    val tail = s"(-${hornerSql(C, qt)} / (${hornerSql(D, qt)} * $qt + 1.0))"
    s"(CASE WHEN $p > $PHigh THEN $tail ELSE $central END)"
  }
}
