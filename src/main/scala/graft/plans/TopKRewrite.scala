package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, CurrentRow, EqualTo, Expression, LessThan, LessThanOrEqual, Literal, RowFrame, RowNumber, SortOrder, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the canonical window top-k pattern
  *
  * {{{ Filter(rank <= k, Window(row_number() OVER (PARTITION BY g ORDER BY o) AS rank, child)) }}}
  *
  * into the native [[TopKPerGroup]] node, so the declarative form users
  * actually write gets the bounded-heap physical operator instead of
  * Exchange → full Sort → Window → Filter. This is the [[Rule]] tier of
  * the Catalyst extension ladder: [[NativeTopK.topKPerGroup]] is the
  * explicit API; this rule makes the optimization transparent — any
  * `row_number`-filter query in the session (including plain SQL) plans
  * through the heap exec with no code change.
  *
  * Spark 3.5+ partially covers this with `InferWindowGroupLimit`, which
  * inserts map-/reduce-side group-limit passes but still fully sorts the
  * surviving rows in `WindowExec`. This rewrite removes the sort + window
  * machinery outright (rank assignment falls out of the heap drain). When
  * the pattern has already been decorated with a [[WindowGroupLimit]]
  * child (rule-order differences between injected and experimental
  * batches), the limit node is subsumed and stripped.
  *
  * Safety conditions, all required before the rewrite fires:
  *  - the Window computes EXACTLY one expression: `row_number()` with the
  *    standard (UnboundedPreceding, CurrentRow) row frame — rewriting a
  *    multi-expression window would drop the other columns;
  *  - the partition spec is non-empty — the global-rank form belongs to a
  *    distributed sort-limit, not a per-group heap;
  *  - the Filter condition is a sole comparison of the rank attribute
  *    against a positive integer literal (`rank <= k`, `rank < k`,
  *    `rank = 1`, or the mirrored literal-first forms). Conjunctions keep
  *    the window form: other conjuncts may reference the rank column in
  *    ways a k-bounded heap cannot reproduce.
  *
  * The replacement preserves the Window node's output attributes (child
  * output + the rank alias's exprId), so parent operators resolve
  * unchanged; the Filter disappears because every emitted row satisfies
  * `rank <= k` by construction.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w).getOrElse(f)
  }

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] =
    w.windowExpressions match {
      case Seq(alias @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(parts, order,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _))
          if parts.nonEmpty && order.nonEmpty =>
        extractK(cond, alias.toAttribute).map { k =>
          // A WindowGroupLimit inserted by InferWindowGroupLimit is
          // subsumed by the heap exec — strip it so rows aren't
          // rank-pruned twice.
          val child = w.child match {
            case wgl: WindowGroupLimit => wgl.child
            case c => c
          }
          TopKPerGroup(parts, order, k,
            alias.toAttribute.asInstanceOf[AttributeReference], child)
        }
      case _ => None
    }

  /** The filter's k, when the WHOLE condition is one rank-vs-literal
    * comparison with a usable bound.
    */
  private def extractK(cond: Expression, rank: Attribute): Option[Int] = {
    def lit(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _ => None
    }
    val k = cond match {
      case LessThanOrEqual(a, l) if a.semanticEquals(rank) => lit(l)
      case LessThan(a, l) if a.semanticEquals(rank) => lit(l).map(_ - 1)
      case org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(l, a)
          if a.semanticEquals(rank) => lit(l)
      case org.apache.spark.sql.catalyst.expressions.GreaterThan(l, a)
          if a.semanticEquals(rank) => lit(l).map(_ - 1)
      case EqualTo(a, l) if a.semanticEquals(rank) => lit(l).filter(_ == 1)
      case EqualTo(l, a) if a.semanticEquals(rank) => lit(l).filter(_ == 1)
      case _ => None
    }
    k.filter(_ > 0)
  }

  /** Install on a live session (idempotent): the rule joins the
    * experimental batch and the strategy must be present for the node to
    * plan. Cluster submission gets both from
    * `spark.sql.extensions=graft.plans.GraftExtensions`.
    */
  def install(spark: SparkSession): Unit = {
    NativeTopK.install(spark)
    if (!spark.experimental.extraOptimizations.contains(TopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewrite
  }
}
