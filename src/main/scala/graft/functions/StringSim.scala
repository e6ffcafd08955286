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

  def jaroWinklerCol(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      JaroWinkler(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
