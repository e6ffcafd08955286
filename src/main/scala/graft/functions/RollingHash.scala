package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial (Rabin–Karp) rolling-hash document fingerprint:
  * `h = fold(chars)(h * 31 + codepoint) mod 1e9+7`. The streaming-hash
  * counterpart to the md5 fingerprint ([[graft.text.TextAnalysis
  * .fingerprint]]): O(1) state per character, extendable to windowed
  * substring hashing.
  *
  * Engine parity: the DuckDB oracle computes the identical fold with
  * `list_reduce` over `regexp_extract_all(text, '.')` codepoints. Both
  * sides iterate UTF-16 units here vs codepoints there — identical for
  * BMP text (the fixtures are ASCII); documented limitation for
  * supplementary planes.
  *
  * Arithmetic safety: h < 1e9+7, so h*31 + c < 3.2e10 — no Long
  * overflow, no ANSI concerns.
  */
object RollingHash {

  val Mod: Long = 1000000007L

  case class RollingHashExpr(child: Expression) extends UnaryExpression {

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_rolling_hash needs a string column, got ${other.simpleString}")
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_rolling_hash"

    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      var h = 0L
      var i = 0
      while (i < s.length) { h = (h * 31 + s.charAt(i)) % Mod; i += 1 }
      h
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val s = ctx.freshName("s")
        val h = ctx.freshName("h")
        val i = ctx.freshName("i")
        s"""
           |String $s = $v.toString();
           |long $h = 0L;
           |for (int $i = 0; $i < $s.length(); $i++) {
           |  $h = ($h * 31 + $s.charAt($i)) % ${Mod}L;
           |}
           |${ev.value} = $h;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def rollingHash(c: Column): Column =
    GraftSqlBridge.column(RollingHashExpr(GraftSqlBridge.expression(c)))
}
