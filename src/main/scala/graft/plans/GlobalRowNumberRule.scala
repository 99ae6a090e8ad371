package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project,
  Window => WindowNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Catalyst optimizer rule: a GLOBAL (unpartitioned) `row_number()` window
  *
  * {{{ row_number() OVER (ORDER BY o) }}}
  *
  * is the canonical corpus-serializing shape — Spark moves EVERY row to a
  * single partition and one task numbers the whole input. The engine's own
  * operators never plan it (they use the two-phase distributed prefix of
  * `operators.Prefix`/`Sampling.shuffleOrder`); this rule extends the same
  * protection to naive user queries on a Graft-extended session by
  * rewriting the window into that prefix:
  *
  *   1. 1-row bounds aggregate over the order value (broadcast back);
  *   2. a MONOTONE equi-width slice id from the bounds (a pure projection
  *      — deterministic in the VALUE, so stable across retries, unlike a
  *      partition id);
  *   3. per-slice counts (≤ shuffle.partitions rows) → exclusive running
  *      offsets via a window over that bounded frame;
  *   4. offsets broadcast-joined back; rank = offset + within-slice
  *      row_number — the within-slice window partitions by the slice id,
  *      so every task numbers only its slice.
  *
  * Conservative preconditions — the rewrite fires only when the Window has
  * exactly one expression, `row_number()` over the default frame with an
  * EMPTY partition spec; the single sort order (any direction and nulls
  * placement as of r7 — DESC mirrors the slice id, NULLS LAST moves the
  * null slice to the end) is on a deterministic expression of a numeric,
  * date or timestamp type (types whose natural order the double cast
  * preserves — the slice mapping must be monotone in the sort order or
  * global numbering breaks); and the child does not already carry the
  * rule's working columns. Everything else is left untouched. Ties get an arbitrary-but-valid numbering,
  * exactly like the single-partition original. Registered by
  * [[GraftExtensions]] AFTER [[WindowTopKRule]], so bounded top-k filters
  * take the heap operator and only genuine full numberings land here.
  */
object GlobalRowNumberRule extends Rule[LogicalPlan] {

  private val OneCol = "__gw_one"
  private val RnCol = "__gw_rn"

  private def monotoneUnderDoubleCast(t: DataType): Boolean = t match {
    case _: NumericType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case w @ WindowNode(Seq(alias @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(Nil, _, SpecifiedWindowFrame(RowFrame,
            UnboundedPreceding, CurrentRow))), _)),
        Nil, Seq(so @ SortOrder(ordExpr, _, _, _)), child, _)
        if ordExpr.deterministic && ordExpr.resolved &&
          monotoneUnderDoubleCast(ordExpr.dataType) &&
          !child.output.exists(a => a.name == OneCol || a.name == RnCol) =>
      // ANY direction/nulls combination re-plans: DESC mirrors the slice
      // id (parts−1−slice — still monotone in the sort order), NULLS LAST
      // moves the null slice to the end; both live inside runningAgg
      rewrite(child, ordExpr, alias, so)
  }

  private def rewrite(child: LogicalPlan, ordExpr: Expression,
                      alias: Alias, so: SortOrder): LogicalPlan = {
    val spark = SparkSession.active
    val df = GraftColumnBridge.ofRows(spark, child)
    val ordCol = GraftColumnBridge.column(ordExpr)
    // row_number == the inclusive running SUM of ones in the order-column
    // order — exactly operators.Prefix.runningAgg, which already owns the
    // monotone (optionally mirrored) slice mapping, NULL/NaN placement,
    // the bounded offsets window and the broadcast join; one
    // implementation, one place to fix (this rule previously carried its
    // own copy)
    val out = graft.operators.Prefix.runningAgg(
      df.withColumn(OneCol, lit(1L)), ordCol,
      Seq(OneCol), Seq("sum"), Seq(RnCol),
      descending = so.direction == Descending,
      nullsLast = so.nullOrdering == NullsLast).drop(OneCol)
    // the fresh analyzed subtree still carries ResolvedHint nodes (this
    // rule runs in the end-of-optimization user batch, after the stock
    // hint elimination already ran on the original plan) — fold them into
    // join hints here or the planner rejects the tree
    val analyzed = org.apache.spark.sql.catalyst.optimizer.EliminateResolvedHint(
      GraftColumnBridge.logicalPlan(out))
    val rnAttr = analyzed.output.find(_.name == RnCol).getOrElse(
      return WindowNode(Seq(alias), Nil, Seq(so), child))
    // restore the original attribute id and IntegerType so downstream
    // references to the row-number column are untouched
    Project(child.output :+ Alias(Cast(rnAttr, IntegerType),
      alias.name)(exprId = alias.exprId), analyzed)
  }
}
