package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rewrite: the ubiquitous
  *
  *   Project(cols..., Filter(rn <= k, Window(row_number() AS rn, part, ord)))
  *
  * pattern (top-k per group via a ranking window) becomes the bounded-heap
  * [[TopKPerGroupNode]] whenever the rank column itself is discarded by the
  * projection. Spark's own `InferWindowGroupLimit` already prunes rows below
  * the window (visible as WindowGroupLimit, which this rule strips), but it
  * still pays the full per-partition sort + rank + filter; the heap operator
  * removes the sort entirely.
  *
  * Ties at the k-boundary are resolved arbitrarily by both formulations
  * (row_number over a non-total order is itself nondeterministic), so the
  * rewrite preserves semantics exactly when the window order is total and
  * "some k of the tied rows" otherwise — the same contract row_number has.
  *
  * Injected via [[graft.GraftExtensions]] (`injectOptimizerRule`).
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  private def rankLimit(cond: Expression, rankAttr: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k))
        if a.semanticEquals(rankAttr) => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k))
        if a.semanticEquals(rankAttr) => Some(k - 1)
      case EqualTo(a: Attribute, IntegerLiteral(1))
        if a.semanticEquals(rankAttr) => Some(1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(fields, Filter(cond, w: Window))
        if w.windowExpressions.size == 1 && w.partitionSpec.nonEmpty =>
      w.windowExpressions.head match {
        case al @ Alias(WindowExpression(_: RowNumber, _), _)
            if !fields.exists(_.references.contains(al.toAttribute)) =>
          rankLimit(cond, al.toAttribute) match {
            case Some(k) if k > 0 =>
              // strip the partial WindowGroupLimit Spark may have inserted
              val inner = w.child match {
                case wgl: WindowGroupLimit => wgl.child
                case c => c
              }
              Project(fields,
                TopKPerGroupNode(w.partitionSpec, w.orderSpec, k, inner))
            case _ => p
          }
        case _ => p
      }
  }
}
