package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the `row_number() OVER (...) <= k` idiom into
  * the [[TopKPerKey]] operator when the rank column is provably discarded.
  *
  * The window formulation shuffles every row and sorts each key's full row
  * set just to throw away all but k of them; the rewrite plans the same
  * query as bounded-heap partial top-k → one keyed exchange of keys*k rows
  * → bounded-heap final. This is the deeper cousin of Spark's own
  * InferWindowGroupLimit (which bounds the sort but still sorts): here the
  * sort disappears entirely.
  *
  * Fires only on the exact safe shape — Project over Filter over a
  * single-expression Window — with every guard the equivalence needs:
  * row_number only (rank/dense_rank keep >k rows under ties), the default
  * running ROW frame, the filtered attribute is the window's own output,
  * the Project references nothing but the window child's columns (the rank
  * value must be dead), and k is a positive int literal. Row selection
  * among order-ties matches the window form's contract: some valid top-k
  * (both forms are deterministic exactly when the order is total).
  */
object TopKRewrite extends Rule[LogicalPlan] {

  /** cond === `rank <= k`, normalized over <=, <, and flipped >=, >. */
  private object RankLimit {
    def unapply(cond: Expression): Option[(Attribute, Int)] = cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) => Some((a, k))
      case LessThan(a: Attribute, Literal(k: Int, IntegerType)) => Some((a, k - 1))
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) => Some((a, k))
      case GreaterThan(Literal(k: Int, IntegerType), a: Attribute) => Some((a, k - 1))
      // rn = 1 is the DISTINCT ON / latest-per-key idiom (rn = k for k > 1
      // selects the k-th row alone — NOT a top-k, so only 1 matches)
      case EqualTo(a: Attribute, Literal(1, IntegerType)) => Some((a, 1))
      case EqualTo(Literal(1, IntegerType), a: Attribute) => Some((a, 1))
      case _ => None
    }
  }

  private def isRowNumberFrame(spec: WindowSpecDefinition): Boolean =
    spec.frameSpecification match {
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(projList, Filter(RankLimit(rn, k), w: Window))
        if k >= 1 &&
          w.windowExpressions.sizeIs == 1 &&
          (w.windowExpressions.head match {
            case a @ Alias(WindowExpression(RowNumber(), spec), _) =>
              a.exprId == rn.exprId && isRowNumberFrame(spec)
            case _ => false
          }) &&
          w.orderSpec.nonEmpty &&
          projList.forall(_.references.subsetOf(w.child.outputSet)) =>
      Project(projList, TopKPerKey(w.partitionSpec, w.orderSpec, k, w.child))
  }
}
