package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math (north-star similarity
  * path).
  *
  * Why custom expressions: a 64-dim dot product written as built-ins is
  * either `zip_with`+`aggregate` (evaluated interpreted, with a per-row
  * intermediate array) or a 64-term `element_at` chain (a ~320-node
  * expression tree that bloats the plan and the generated code, and gets
  * duplicated when a filter on the result is pushed into a join
  * condition). Inside an O(n²) pair join that cost dominates the query.
  * A dedicated expression with `doGenCode` compiles to a tight primitive
  * loop and stays inside whole-stage codegen.
  *
  * IEEE determinism: accumulation is a single left-to-right loop — the
  * exact order of the DuckDB oracle's left-associative `+` chain
  * ([[PortableSql.dot]]), so results are bit-identical.
  *
  * Null semantics: null arrays propagate null (standard null-intolerant
  * binary expression). Null *elements* are not expected (embedding
  * fixtures are dense); they read as 0.0.
  */
object ArrayMath {

  private def elementGetter(dt: DataType): String = dt match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(DoubleType, _) => "getDouble"
    case other => throw new IllegalArgumentException(
      s"dot over ${other.simpleString} not supported (need array<float|double>)")
  }

  /** `dot(a, b)`: Σ aᵢ·bᵢ over the common prefix of two numeric arrays. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      (left.dataType, right.dataType) match {
        case (ArrayType(FloatType, _), ArrayType(FloatType, _)) |
             (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case (l, r) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_dot needs two array<float> or two array<double>, got " +
              s"${l.simpleString} and ${r.simpleString}")
      }
    }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    private def getter: String = elementGetter(left.dataType)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      left.dataType match {
        case ArrayType(FloatType, _) =>
          while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
        case _ =>
          while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val g = getter
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += (double) $a.$g($i) * (double) $b.$g($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** `dot(a, w)` against a constant weight vector (e.g. an LSH hyperplane):
    * the weights ride along as a codegen reference object, not as plan
    * nodes — an 8-plane × 64-dim LSH projection stays a plan of 8 compact
    * expressions instead of ~4k nodes.
    */
  case class DotWithConst(child: Expression, weights: Array[Double])
      extends UnaryExpression {

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_dot_const needs array<float|double>, got ${other.simpleString}")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot_const"

    private def getter: String = elementGetter(child.dataType)

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), weights.length)
      var s = 0.0
      var i = 0
      child.dataType match {
        case ArrayType(FloatType, _) =>
          while (i < n) { s += x.getFloat(i).toDouble * weights(i); i += 1 }
        case _ =>
          while (i < n) { s += x.getDouble(i) * weights(i); i += 1 }
      }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val wRef = ctx.addReferenceObj("weights", weights, "double[]")
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val g = getter
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $wRef.length);
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += (double) $a.$g($i) * $wRef[$i];
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column-level API (classic-session bridge between public Columns and
    * catalyst Expressions).
    */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def dotConst(a: Column, w: Array[Double]): Column =
    GraftSqlBridge.column(DotWithConst(GraftSqlBridge.expression(a), w))
}
