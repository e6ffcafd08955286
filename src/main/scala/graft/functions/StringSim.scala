package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native codegen expression.
  *
  * Spark ships `levenshtein` but no Jaro-Winkler; a record-linkage
  * engine needs the positional metric too (it tolerates transpositions
  * that edit distance double-counts). Semantics match DuckDB's
  * `jaro_winkler_similarity` exactly (verified empirically):
  *   - match window = max(len)/2 - 1 (so "ab" vs "ba" is 0.0);
  *   - Winkler prefix boost (weight 0.1, prefix capped at 4) applies
  *     only when the Jaro score exceeds 0.7;
  *   - either side empty → 0.0.
  * Left-to-right double accumulation keeps results bit-identical to the
  * oracle; queries still round the score before hashing out of ulp
  * caution.
  */
object StringSim {

  /** Static entry point shared by interpreted eval and generated code. */
  def jaroWinkler(aStr: UTF8String, bStr: UTF8String): Double = {
    val s = aStr.toString
    val t = bStr.toString
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    if (s == t) return 1.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val sMatched = new Array[Boolean](n)
    val tMatched = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatched(j) && s.charAt(i) == t.charAt(j)) {
          sMatched(i) = true; tMatched(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars compared in order
    var transpositions = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatched(i)) {
        while (!tMatched(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val sim = (mm / n + mm / m + (mm - transpositions / 2.0) / mm) / 3.0
    if (sim <= 0.7) return sim
    var prefix = 0
    val cap = math.min(4, math.min(n, m))
    while (prefix < cap && s.charAt(prefix) == t.charAt(prefix)) prefix += 1
    sim + prefix * 0.1 * (1.0 - sim)
  }

  /** `graft_jaro_winkler(a, b)` — null-intolerant binary string expression;
    * codegen is a single static call, so it stays inside whole-stage
    * codegen (no UDF serialization, no fallback).
    */
  case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"graft_jaro_winkler needs two strings, got ${l.simpleString} and ${r.simpleString}")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_jaro_winkler"

    override def nullSafeEval(a: Any, b: Any): Any =
      jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.StringSim.jaroWinkler($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Static entry point for unrestricted Damerau-Levenshtein distance —
    * true edit distance with adjacent transpositions, where transposed
    * characters may be edited again afterwards (so "ca"→"abc" is 2, not
    * OSA's 3). Matches DuckDB's `damerau_levenshtein` (verified on probe
    * vectors). Alphabet-indexed DP (Lowrance-Wagner), O(n·m) time.
    */
  def damerauLevenshtein(aStr: UTF8String, bStr: UTF8String): Int = {
    val s = aStr.toString
    val t = bStr.toString
    val n = s.length
    val m = t.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    // d is (n+2) x (m+2) with a sentinel INF border at index 0
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= m) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val k = Option(da.get(t.charAt(j - 1))).map(_.intValue).getOrElse(0)
        val l = db
        val cost = if (s.charAt(i - 1) == t.charAt(j - 1)) { db = j; 0 } else 1
        d(i + 1)(j + 1) = math.min(
          math.min(d(i)(j) + cost,          // substitute / match
            d(i + 1)(j) + 1),               // insert
          math.min(d(i)(j + 1) + 1,         // delete
            d(k)(l) + (i - k - 1) + 1 + (j - l - 1))) // transpose span
        j += 1
      }
      da.put(s.charAt(i - 1), i)
      i += 1
    }
    d(n + 1)(m + 1)
  }

  /** `graft_damerau_levenshtein(a, b)` — codegen is a single static call
    * (same pattern as [[JaroWinkler]]).
    */
  case class DamerauLevenshtein(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"graft_damerau_levenshtein needs two strings, got ${l.simpleString} and ${r.simpleString}")
      }
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_damerau_levenshtein"

    override def nullSafeEval(a: Any, b: Any): Any =
      damerauLevenshtein(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.StringSim.damerauLevenshtein($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def jaroWinklerCol(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      JaroWinkler(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def damerauLevenshteinCol(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DamerauLevenshtein(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
