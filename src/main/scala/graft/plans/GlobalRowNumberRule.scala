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
  * EMPTY partition spec; the single sort order is Ascending NullsFirst on
  * a deterministic expression of a numeric, date or timestamp type (types
  * whose natural order the double cast preserves — the slice mapping must
  * be monotone in the sort order or global numbering breaks); and the
  * child does not already carry the rule's working columns. Everything
  * else is left untouched. Ties get an arbitrary-but-valid numbering,
  * exactly like the single-partition original. Registered by
  * [[GraftExtensions]] AFTER [[WindowTopKRule]], so bounded top-k filters
  * take the heap operator and only genuine full numberings land here.
  */
object GlobalRowNumberRule extends Rule[LogicalPlan] {

  private val PidCol = "__gw_pid"
  private val OffCol = "__gw_off"
  private val RnCol = "__gw_rn"

  private def monotoneUnderDoubleCast(t: DataType): Boolean = t match {
    case _: NumericType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case w @ WindowNode(Seq(alias @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(Nil, _, SpecifiedWindowFrame(RowFrame,
            UnboundedPreceding, CurrentRow))), _)),
        Nil, Seq(SortOrder(ordExpr, Ascending, NullsFirst, _)), child, _)
        if ordExpr.deterministic && ordExpr.resolved &&
          monotoneUnderDoubleCast(ordExpr.dataType) &&
          !child.output.exists(a => a.name == PidCol || a.name == OffCol) =>
      rewrite(child, ordExpr, alias)
  }

  private def rewrite(child: LogicalPlan, ordExpr: Expression,
                      alias: Alias): LogicalPlan = {
    val spark = SparkSession.active
    val df = GraftColumnBridge.ofRows(spark, child)
    val ordCol = GraftColumnBridge.column(ordExpr)
    val o = ordCol.cast("double")
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val bounds = df.agg(min(o).as("__gw_lo"), max(o).as("__gw_hi"))
    // NULL order values take slice 0 — consistent with NULLS FIRST (they
    // sort before every non-null value, whose smallest slice is also 0)
    val span = col("__gw_hi") - col("__gw_lo")
    val sliced = df.crossJoin(broadcast(bounds))
      .withColumn(PidCol,
        when(o.isNull || span <= 0.0, lit(0)).otherwise(
          least(lit(parts - 1),
            floor((o - col("__gw_lo")) / span * parts).cast("int"))))
      .drop("__gw_lo", "__gw_hi")
    val counts = sliced.groupBy(col(PidCol)).agg(count(lit(1)).as("__gw_n"))
    // bounded empty-partition window: ≤ shuffle.partitions count rows
    val offW = org.apache.spark.sql.expressions.Window.orderBy(col(PidCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = counts.select(col(PidCol),
      coalesce(sum(col("__gw_n")).over(offW), lit(0L)).as(OffCol))
    val inW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(PidCol)).orderBy(ordCol)
    val out = sliced.join(broadcast(offsets), Seq(PidCol))
      .withColumn(RnCol, col(OffCol) + row_number().over(inW))
    // the fresh analyzed subtree still carries ResolvedHint nodes (this
    // rule runs in the end-of-optimization user batch, after the stock
    // hint elimination already ran on the original plan) — fold them into
    // join hints here or the planner rejects the tree
    val analyzed = org.apache.spark.sql.catalyst.optimizer.EliminateResolvedHint(
      GraftColumnBridge.logicalPlan(out))
    val rnAttr = analyzed.output.find(_.name == RnCol).getOrElse(
      return WindowNode(Seq(alias), Nil,
        Seq(SortOrder(ordExpr, Ascending)), child))
    // restore the original attribute id and IntegerType so downstream
    // references to the row-number column are untouched
    Project(child.output :+ Alias(Cast(rnAttr, IntegerType),
      alias.name)(exprId = alias.exprId), analyzed)
  }
}
