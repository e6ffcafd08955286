package graft.functions

/** Engine-portable SQL expression snippets.
  *
  * Some north-star operators (minhash, simhash, cosine top-k) must produce
  * *bit-identical* results in Spark and in the driver's DuckDB oracle.
  * The only reliable way is to evaluate the exact same arithmetic in the
  * same order on both engines. These builders emit SQL text that parses
  * identically in Spark SQL (`functions.expr`) and DuckDB:
  *
  *  - only shared functions (md5, substr, instr, length, replace, floor,
  *    sqrt, round, concat, coalesce, CASE);
  *  - no backslashes inside string literals (Spark SQL treats `\` as an
  *    escape, DuckDB does not);
  *  - integer division expressed as CAST(floor(a / b) AS INT) (DuckDB `//`
  *    and Spark `div` are not shared);
  *  - left-associative `+` chains so double summation order is fixed.
  *
  * Everything here is scalar arithmetic — it participates in Spark
  * whole-stage codegen after parsing (no UDFs).
  */
object PortableSql {

  /** First `n` hex chars of `hexExpr` (a lowercase hex string column) as a
    * non-negative integer, via base-16 positional expansion. n <= 12 keeps
    * the value well inside a BIGINT.
    */
  def hexToLong(hexExpr: String, n: Int): String = {
    require(n <= 12)
    (0 until n).map { i =>
      val p = math.pow(16, n - 1 - i).toLong
      // CAST to BIGINT: for n >= 8 the digit*place product exceeds INT32 and
      // Spark's ANSI mode (default in Spark 4) would raise ARITHMETIC_OVERFLOW.
      s"(instr('0123456789abcdef', substr($hexExpr, ${i + 1}, 1)) - 1) * CAST($p AS BIGINT)"
    }.mkString("(", " + ", ")")
  }

  /** Number of occurrences of constant `needle` in `textExpr`
    * (replace-length trick — identical semantics on both engines,
    * no regex dialect involved).
    */
  def countOccurrences(textExpr: String, needle: String): String = {
    require(!needle.contains("'") && !needle.contains("\\"))
    s"CAST((length($textExpr) - length(replace($textExpr, '$needle', ''))) / ${needle.length} AS INT)"
  }

  /** Dot product of two fixed-dimension float-array columns as a
    * left-associative chain of double products — identical IEEE result on
    * both engines (1-based list indexing on both).
    */
  def dot(aExpr: String, bExpr: String, dim: Int): String =
    (1 to dim).map { i =>
      s"CAST($aExpr[$i] AS DOUBLE) * CAST($bExpr[$i] AS DOUBLE)"
    }.mkString("(", " + ", ")")

  /** Cosine similarity of two fixed-dim float-array columns. */
  def cosine(aExpr: String, bExpr: String, dim: Int): String =
    s"(${dot(aExpr, bExpr, dim)} / (sqrt(${dot(aExpr, aExpr, dim)}) * sqrt(${dot(bExpr, bExpr, dim)})))"

  /** Shortest round-trip decimal form of a double: both Spark SQL and
    * DuckDB parse it back to the identical bits (correctly-rounded strtod),
    * so constant vectors (LSH hyperplanes, IVF centroids) can be embedded
    * as SQL literals.
    */
  def doubleLit(v: Double): String = {
    require(!v.isNaN && !v.isInfinite, s"non-finite literal: $v")
    java.lang.Double.toString(v)
  }

  /** Dot product of a float-array column against a CONSTANT weight vector,
    * as a left-associative chain — the identical accumulation order of
    * [[graft.functions.ArrayMath.DotWithConst]]'s codegen loop, so the
    * result is bit-identical.
    */
  def dotConst(arrExpr: String, w: Array[Double]): String =
    w.zipWithIndex.map { case (v, i) =>
      s"CAST($arrExpr[${i + 1}] AS DOUBLE) * (${doubleLit(v)})"
    }.mkString("(", " + ", ")")

  /** 2^b as an integer literal. */
  def pow2(b: Int): Long = 1L << b

  /** Bit `b` (0-based, from a non-negative int expr < 2^48): CAST(floor(h /
    * 2^b) AS BIGINT) % 2 — portable integer bit extraction. BIGINT, not
    * INT: DuckDB's `/` on integers yields DOUBLE, and for a 48-bit h the
    * b=0 quotient exceeds INT32 (doubles stay exact below 2^53).
    */
  def bit(hExpr: String, b: Int): String =
    s"(CAST(floor($hExpr / ${pow2(b)}) AS BIGINT) % 2)"

  /** Engine-portable display rounding: floor(x·10^d + 0.5)/10^d as one
    * shared IEEE sequence. The engines' NATIVE round(DOUBLE, d) differ
    * on inputs within ~1 ulp of a .5·10^-d boundary — Spark rounds the
    * double's full binary expansion (BigDecimal HALF_UP) while DuckDB
    * rounds multiply-based — which surfaces as rare 10^-d hash
    * mismatches (q142/q236 at sf0.001). Identical doubles in, identical
    * doubles out, on any input whose |x·10^d| < 2^52. Semantics:
    * half-up toward +∞ (differs from native HALF_UP only for exact
    * negative halves, which the boundary inputs here never are).
    */
  def round(xExpr: String, d: Int): String = {
    val p = s"CAST(1e$d AS DOUBLE)"
    s"(CAST(floor((($xExpr) * $p) + CAST(0.5 AS DOUBLE)) AS DOUBLE) / $p)"
  }
}
