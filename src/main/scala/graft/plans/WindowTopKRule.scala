package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan,
  Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Catalyst optimizer rule: the ubiquitous window top-k idiom
  *
  * {{{ ... WHERE row_number() OVER (PARTITION BY k ORDER BY o) <= n }}}
  *
  * (and its `< n` / `= 1` "latest row per key" forms) is rewritten onto the
  * custom [[TopKPerKeyNode]] operator. The window formulation shuffles
  * EVERY row and fully sorts each partition before the filter discards all
  * but n per key; the custom operator's partial heaps cut each upstream
  * partition to ≤ n rows per key before the shuffle (see [[TopKPerKeyNode]]).
  *
  * Conservative preconditions — the rewrite fires only when:
  *  - the Filter sits directly on a Window whose ONLY window expression is
  *    `row_number()` over the default row frame;
  *  - the filter condition is exactly `rn <= lit` / `rn < lit` / `rn = 1`
  *    on that row-number output (no conjunctions — other predicates will
  *    already have been pushed below the Window by the optimizer, since
  *    they cannot reference `rn`);
  *  - the bound is a positive foldable integer.
  *
  * The rewritten plan projects the operator's long rank back to the
  * original attribute id and IntegerType, so downstream references to the
  * `rn` column are untouched. Registered by [[GraftExtensions]] — an
  * explicit session opt-in, which also guarantees the planner strategy for
  * the node is present.
  */
object WindowTopKRule extends Rule[LogicalPlan] {

  /** Extract (rnAttr, k) from `rn <= k` / `rn < k` / `rn = 1`. */
  private def bound(cond: Expression): Option[(Attribute, Int)] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if k > 0 => Some((a, k))
    case LessThan(a: Attribute, IntegerLiteral(k)) if k > 1 => Some((a, k - 1))
    case EqualTo(a: Attribute, IntegerLiteral(1)) => Some((a, 1))
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if k > 0 => Some((a, k))
    case GreaterThan(IntegerLiteral(k), a: Attribute) if k > 1 => Some((a, k - 1))
    case EqualTo(IntegerLiteral(1), a: Attribute) => Some((a, 1))
    case _ => None
  }

  private def isRowNumberWindow(e: NamedExpression): Option[Alias] = e match {
    case a @ Alias(WindowExpression(RowNumber(),
        WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame,
          UnboundedPreceding, CurrentRow))), _) => Some(a)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        w @ Window(Seq(winExpr), partitionSpec, orderSpec, child, _))
        if orderSpec.nonEmpty =>
      (bound(cond), isRowNumberWindow(winExpr)) match {
        case (Some((rnAttr, k)), Some(alias)) if rnAttr.exprId == alias.exprId =>
          val rankLong = AttributeReference(alias.name, LongType,
            nullable = false)()
          val node = TopKPerKeyNode(partitionSpec, orderSpec, k, rankLong, child)
          // restore the original attribute id and IntegerType so downstream
          // operators (and the Filter's parent) see the same `rn` column
          val restored = child.output :+ Alias(Cast(rankLong, IntegerType),
            alias.name)(exprId = alias.exprId)
          Project(restored, node)
        case _ => f
      }
  }
}
