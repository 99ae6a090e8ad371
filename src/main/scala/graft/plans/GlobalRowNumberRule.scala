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
  *   1. a bounded deterministic hash-sample of the order domain →
  *      sampled-quantile boundaries (broadcast back, r8 — equi-HEIGHT, so
  *      a skewed or even constant user order value still parallelizes);
  *   2. a MONOTONE slice id from the boundaries plus a full-row tie hash
  *      (a pure projection — deterministic in the row, so stable across
  *      retries, unlike a partition id; ties may split across slices,
  *      which is a valid arbitrary tie order);
  *   3. per-slice counts (≤ shuffle.partitions rows) → exclusive running
  *      offsets via a window over that bounded frame;
  *   4. offsets broadcast-joined back; rank = offset + within-slice
  *      row_number — the within-slice window partitions by the slice id,
  *      so every task numbers only its slice.
  *
  * Conservative preconditions — the rewrite fires only when the Window has
  * exactly one expression: `row_number()`, or (r7) `rank()`,
  * `dense_rank()`, `percent_rank()` or `ntile(k)` — the whole global
  * ranking family (rank/dense_rank rewrite through grouped VALUE counts,
  * bounded by distinct values, so their numbering is exact under ties;
  * percent_rank/ntile add a broadcast 1-row total) — over the default
  * frame with an EMPTY partition spec; the single sort order (any direction and nulls
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

  /** r7: the WHOLE global ranking family re-plans, not just row_number.
    * rank/dense_rank are VALUE-determined, so their rewrites are exact
    * (ties rank equally by construction); percent_rank derives from rank
    * and a broadcast 1-row total; ntile derives from the row_number
    * prefix and the same total via the SQL bucket-size rule. */
  private def supported(fn: Expression): Boolean = fn match {
    case RowNumber() | _: Rank | _: DenseRank | _: PercentRank |
         _: CumeDist => true
    case NTile(Literal(b: Int, IntegerType)) => b > 0
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case w @ WindowNode(Seq(alias @ Alias(WindowExpression(fn,
          WindowSpecDefinition(Nil, _, SpecifiedWindowFrame(_,
            UnboundedPreceding, CurrentRow))), _)),
        Nil, Seq(so @ SortOrder(ordExpr, _, _, _)), child, _)
        if supported(fn) && ordExpr.deterministic && ordExpr.resolved &&
          monotoneUnderDoubleCast(ordExpr.dataType) &&
          !child.output.exists(_.name.startsWith("__gw_")) =>
      // ANY direction/nulls combination re-plans: DESC mirrors the slice
      // id (parts−1−slice — still monotone in the sort order), NULLS LAST
      // moves the null slice to the end; both live inside runningAgg
      fn match {
        case RowNumber()     => rewrite(child, ordExpr, alias, so)
        case _: Rank         => rewriteRank(child, ordExpr, alias, so, dense = false)
        case _: DenseRank    => rewriteRank(child, ordExpr, alias, so, dense = true)
        case _: PercentRank  => rewritePercentRank(child, ordExpr, alias, so)
        case _: CumeDist     => rewriteCumeDist(child, ordExpr, alias, so)
        case NTile(Literal(b: Int, IntegerType)) =>
          rewriteNtile(child, ordExpr, alias, so, b)
        case _ => w
      }
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
      nullsLast = so.nullOrdering == NullsLast,
      // full-row entropy: the summed column is a constant 1, so only the
      // rest of the row can split a heavy order value across slices
      tieCols = graft.operators.Prefix.entropyCols(df)).drop(OneCol)
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

  /** rank()/dense_rank(): VALUE-determined, so the rewrite is exact —
    * group the order value (shuffle bounded by DISTINCT values, never
    * rows), run the distributed prefix over the grouped counts (rank =
    * inclusive running count − own count + 1; dense = running count of
    * distinct values), and join back on null-safe value equality. */
  private def rankJoined(child: LogicalPlan, ordExpr: Expression,
                         so: SortOrder, dense: Boolean)
      : org.apache.spark.sql.DataFrame = {
    val spark = SparkSession.active
    val df = GraftColumnBridge.ofRows(spark, child)
    val keyed = df.withColumn("__gw_k", GraftColumnBridge.column(ordExpr))
    // one groupBy serves both: dense ranks sum a constant 1 per DISTINCT
    // value (never .distinct() here — a fresh Deduplicate node would skip
    // the stock ReplaceDeduplicateWithAggregate batch, which already ran)
    val grouped = keyed.groupBy(col("__gw_k"))
      .agg(count(lit(1)).as("__gw_n0"))
      .withColumn("__gw_c", if (dense) lit(1L) else col("__gw_n0"))
    val withCum = graft.operators.Prefix.runningAgg(
      grouped, col("__gw_k"), Seq("__gw_c"), Seq("sum"), Seq("__gw_s"),
      descending = so.direction == Descending,
      nullsLast = so.nullOrdering == NullsLast)
    val rankVal =
      if (dense) col("__gw_s") else col("__gw_s") - col("__gw_c") + lit(1L)
    val table = withCum.select(col("__gw_k").as("__gw_k2"),
      rankVal.as("__gw_r"), col("__gw_s").as("__gw_cum"))
    keyed.join(table, col("__gw_k") <=> col("__gw_k2"), "inner")
  }

  private def restore(child: LogicalPlan, alias: Alias,
                      df: org.apache.spark.sql.DataFrame, outName: String,
                      castTo: Option[DataType], fallback: => LogicalPlan)
      : LogicalPlan = {
    val analyzed = org.apache.spark.sql.catalyst.optimizer.EliminateResolvedHint(
      GraftColumnBridge.logicalPlan(df))
    analyzed.output.find(_.name == outName) match {
      case None => fallback
      case Some(a) =>
        val e = castTo.map(t => Cast(a, t): Expression).getOrElse(a)
        Project(child.output :+ Alias(e, alias.name)(exprId = alias.exprId),
          analyzed)
    }
  }

  private def rewriteRank(child: LogicalPlan, ordExpr: Expression,
                          alias: Alias, so: SortOrder,
                          dense: Boolean): LogicalPlan =
    restore(child, alias, rankJoined(child, ordExpr, so, dense), "__gw_r",
      Some(IntegerType), WindowNode(Seq(alias), Nil, Seq(so), child))

  /** percent_rank() = (rank − 1) / (n − 1), 0.0 when n == 1; the total is
    * a broadcast 1-row aggregate (the scalar-subquery shape). */
  private def rewritePercentRank(child: LogicalPlan, ordExpr: Expression,
                                 alias: Alias, so: SortOrder): LogicalPlan = {
    val ranked = rankJoined(child, ordExpr, so, dense = false)
    val total = GraftColumnBridge.ofRows(SparkSession.active, child)
      .agg(count(lit(1)).as("__gw_n"))
    val out = ranked.crossJoin(broadcast(total))
      .withColumn("__gw_pr",
        when(col("__gw_n") > 1L,
          (col("__gw_r").cast(DoubleType) - 1.0) /
            (col("__gw_n").cast(DoubleType) - 1.0))
          .otherwise(lit(0.0)))
    restore(child, alias, out, "__gw_pr", None,
      WindowNode(Seq(alias), Nil, Seq(so), child))
  }

  /** cume_dist() = (inclusive running count of rows ≤ current, in order)
    * / n — the rank table's inclusive cum over the same broadcast total. */
  private def rewriteCumeDist(child: LogicalPlan, ordExpr: Expression,
                              alias: Alias, so: SortOrder): LogicalPlan = {
    val ranked = rankJoined(child, ordExpr, so, dense = false)
    val total = GraftColumnBridge.ofRows(SparkSession.active, child)
      .agg(count(lit(1)).as("__gw_n"))
    val out = ranked.crossJoin(broadcast(total))
      .withColumn("__gw_cd",
        col("__gw_cum").cast(DoubleType) / col("__gw_n").cast(DoubleType))
    restore(child, alias, out, "__gw_cd", None,
      WindowNode(Seq(alias), Nil, Seq(so), child))
  }

  /** ntile(b): row-number prefix + broadcast total, bucketed by the SQL
    * rule (first n % b buckets take one extra row) in exact integer
    * arithmetic (`div`, never double division). */
  private def rewriteNtile(child: LogicalPlan, ordExpr: Expression,
                           alias: Alias, so: SortOrder, b: Int): LogicalPlan = {
    val spark = SparkSession.active
    val df = GraftColumnBridge.ofRows(spark, child)
    val rn = graft.operators.Prefix.runningAgg(
      df.withColumn(OneCol, lit(1L)), GraftColumnBridge.column(ordExpr),
      Seq(OneCol), Seq("sum"), Seq(RnCol),
      descending = so.direction == Descending,
      nullsLast = so.nullOrdering == NullsLast,
      tieCols = graft.operators.Prefix.entropyCols(df)).drop(OneCol)
    val total = df.agg(count(lit(1)).as("__gw_n"))
    val out = rn.crossJoin(broadcast(total))
      .withColumn("__gw_nt", expr(
        s"""CASE WHEN __gw_n div $b = 0 THEN $RnCol
           |     WHEN $RnCol <= ((__gw_n div $b) + 1) * (__gw_n % $b)
           |     THEN ($RnCol - 1) div ((__gw_n div $b) + 1) + 1
           |     ELSE (__gw_n % $b) +
           |          ($RnCol - 1 - ((__gw_n div $b) + 1) * (__gw_n % $b))
           |            div (__gw_n div $b) + 1
           |END""".stripMargin))
    restore(child, alias, out, "__gw_nt", Some(IntegerType),
      WindowNode(Seq(alias), Nil, Seq(so), child))
  }
}
