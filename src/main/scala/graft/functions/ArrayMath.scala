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

  /** PQ sub-codebook argmax in ONE generated loop: the code of the
    * centroid maximizing `2·dot(sub, c) − ‖c‖²` over the subvector at
    * `offset`, ties to the HIGHER code. Replaces a ks-way
    * `greatest(struct(dot·2−cc, code)...)` tree whose unrolled codegen
    * blew janino's 64 KB method limit at m=8×ks=16 (whole-stage fell
    * back to interpreted projection) — the loop form is a few dozen
    * bytecodes and stays compiled.
    *
    * Bit-identity with the struct form: the inner accumulation is the
    * same ascending left-to-right loop as [[DotWithConst]] over
    * `slice(emb, offset+1, dS)`; `score >= best` with ascending codes
    * reproduces lexicographic-struct tie-breaking toward the higher
    * code. (Sole theoretical divergence: SQL struct ordering puts -0.0
    * < 0.0 where Java `>=` ties them — unreachable for dot products of
    * non-degenerate reals.)
    */
  case class PqArgMaxCode(child: Expression, centroids: Array[Array[Double]],
                          offset: Int) extends UnaryExpression {
    private val normSq: Array[Double] = centroids.map(_.map(x => x * x).sum)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_pq_argmax needs array<float|double>, got ${other.simpleString}")
      }
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_pq_argmax"

    private def getter: String = elementGetter(child.dataType)

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val isFloat = child.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
      var best = 0
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < centroids.length) {
        val w = centroids(c)
        val n = math.max(0, math.min(w.length, x.numElements() - offset))
        var s = 0.0
        var i = 0
        while (i < n) {
          s += (if (isFloat) x.getFloat(offset + i).toDouble
                else x.getDouble(offset + i)) * w(i)
          i += 1
        }
        val score = s * 2 - normSq(c)
        if (score >= bestScore) { bestScore = score; best = c }
        c += 1
      }
      best
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val nRef = ctx.addReferenceObj("normSq", normSq, "double[]")
      nullSafeCodeGen(ctx, ev, a => {
        val c = ctx.freshName("c")
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val score = ctx.freshName("score")
        val best = ctx.freshName("best")
        val bestScore = ctx.freshName("bestScore")
        val g = getter
        s"""
           |int $best = 0;
           |double $bestScore = Double.NEGATIVE_INFINITY;
           |for (int $c = 0; $c < $cRef.length; $c++) {
           |  int $n = java.lang.Math.max(0,
           |    java.lang.Math.min($cRef[$c].length, $a.numElements() - $offset));
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $s += (double) $a.$g($offset + $i) * $cRef[$c][$i];
           |  }
           |  double $score = $s * 2 - $nRef[$c];
           |  if ($score >= $bestScore) { $bestScore = $score; $best = $c; }
           |}
           |${ev.value} = $best;
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Subspace dot against a runtime-indexed codebook entry:
    * `dot(emb[mIdx·dS ..], books(mIdx)(codeIdx))` — lets a (m, code)
    * spine frame drive ADC lookup-table construction as ONE compact
    * expression instead of a ks·m-struct array literal (the other
    * janino 64 KB source). Same ascending-loop accumulation as
    * [[DotWithConst]], so values are bit-identical.
    */
  case class PqSubDot(first: Expression, second: Expression, third: Expression,
                      books: Array[Array[Array[Double]]])
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (first.dataType, second.dataType, third.dataType) match {
        case (ArrayType(FloatType, _) | ArrayType(DoubleType, _),
              IntegerType | LongType, IntegerType | LongType) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case (a, b, c) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_pq_subdot needs (array<float|double>, int, int), got " +
              s"${a.simpleString}, ${b.simpleString}, ${c.simpleString}")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_pq_subdot"

    private def getter: String = elementGetter(first.dataType)
    private def dS: Int = books(0)(0).length

    override def nullSafeEval(a: Any, m: Any, c: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val mi = m match { case l: java.lang.Long => l.toInt; case i: java.lang.Integer => i.toInt }
      val ci = c match { case l: java.lang.Long => l.toInt; case i: java.lang.Integer => i.toInt }
      val w = books(mi)(ci)
      val off = mi * dS
      val n = math.max(0, math.min(w.length, x.numElements() - off))
      val isFloat = first.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
      var s = 0.0
      var i = 0
      while (i < n) {
        s += (if (isFloat) x.getFloat(off + i).toDouble
              else x.getDouble(off + i)) * w(i)
        i += 1
      }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bRef = ctx.addReferenceObj("books", books, "double[][][]")
      nullSafeCodeGen(ctx, ev, (a, m, c) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val w = ctx.freshName("w")
        val off = ctx.freshName("off")
        val g = getter
        s"""
           |double[] $w = $bRef[(int) $m][(int) $c];
           |int $off = ((int) $m) * $dS;
           |int $n = java.lang.Math.max(0,
           |  java.lang.Math.min($w.length, $a.numElements() - $off));
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += (double) $a.$g($off + $i) * $w[$i];
           |}
           |${ev.value} = $s;
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  /** `graft_upper_tri(a)`: the dim·(dim+1)/2 upper-triangle products
    * x_i·x_j (i ≤ j, row-major by i) of a numeric array, as one
    * array<double> built in a single generated loop. The covariance
    * one-pass (q232) explodes this instead of nested `transform`
    * lambdas, which evaluate interpreted per element (~5× slower);
    * rounding stays OUTSIDE (standard `round(p, 9)` on the exploded
    * column) so oracle semantics are untouched.
    */
  case class UpperTriProducts(child: Expression) extends UnaryExpression {

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_upper_tri needs array<float|double>, got ${other.simpleString}")
      }
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "graft_upper_tri"

    private def getter: String = elementGetter(child.dataType)

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val isFloat = child.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
      val n = x.numElements()
      val out = new Array[Double](n * (n + 1) / 2)
      var k = 0
      var i = 0
      while (i < n) {
        val xi = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        var j = i
        while (j < n) {
          out(k) = xi * (if (isFloat) x.getFloat(j).toDouble else x.getDouble(j))
          k += 1; j += 1
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val k = ctx.freshName("k")
        val n = ctx.freshName("n")
        val xi = ctx.freshName("xi")
        val out = ctx.freshName("out")
        val g = getter
        s"""
           |int $n = $a.numElements();
           |double[] $out = new double[$n * ($n + 1) / 2];
           |int $k = 0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xi = (double) $a.$g($i);
           |  for (int $j = $i; $j < $n; $j++) {
           |    $out[$k++] = $xi * (double) $a.$g($j);
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

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

  def pqArgMax(a: Column, centroids: Array[Array[Double]], offset: Int): Column =
    GraftSqlBridge.column(PqArgMaxCode(GraftSqlBridge.expression(a), centroids, offset))

  def pqSubDot(a: Column, m: Column, code: Column,
               books: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(PqSubDot(GraftSqlBridge.expression(a),
      GraftSqlBridge.expression(m), GraftSqlBridge.expression(code), books))

  def upperTriProducts(a: Column): Column =
    GraftSqlBridge.column(UpperTriProducts(GraftSqlBridge.expression(a)))
}
