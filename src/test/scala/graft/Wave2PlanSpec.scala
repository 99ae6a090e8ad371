package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec

/** Plan-shape pins for the round-6 wave-2 operators: the scale guarantees
  * their Scaladocs make must be structural facts of the executed plans,
  * not aspirations — a Spark upgrade or refactor that regresses one of
  * these shapes fails here, the TpchPlanSpec convention.
  */
class Wave2PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  private def executedPlanOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.count() // settle AQE
    finalPlan(df.queryExecution.executedPlan).toString
  }

  test("smp_res: bounded-heap top-n, never a global sort exchange") {
    val plan = executedPlanOf("smp_res")
    assert(plan.contains("TakeOrderedAndProject"),
      s"weighted priority sample must plan as TakeOrdered:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"a range exchange means the corpus is being globally sorted:\n$plan")
  }

  test("cln_impute: stats join back, no rows-level window") {
    val df = SparkEntry.queries("cln_impute")(spark, sf)
    df.count()
    val windows = finalPlan(df.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(windows.isEmpty,
      "imputation must use the groupBy+join shape, not a window " +
        "partitioned by the handful of groups")
  }

  test("txt_pmi / prof_card: no cartesian product anywhere") {
    for (name <- Seq("txt_pmi", "prof_card")) {
      val plan = executedPlanOf(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name: unbounded cartesian product in the plan:\n$plan")
    }
  }

  test("smp_budget: the running total is the distributed prefix, not a global window") {
    val df = SparkEntry.queries("smp_budget")(spark, sf)
    df.count()
    val plan = finalPlan(df.queryExecution.executedPlan)
    val windows = plan.collect { case w: WindowExec => w }
    // the only tolerable empty-partition window is the bounded offsets
    // fold over the per-slice partials aggregate (≤ shuffle.partitions
    // rows) — recognizable by the prefix's slice-id grouping beneath it
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      val bounded = w.child.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
            if a.groupingExpressions.exists(_.toString.contains("__pfx_pid")) => a
      }.nonEmpty
      assert(bounded,
        s"smp_budget: data-scaled single-partition window survived:\n$plan")
    }
  }

  test("hilbertExtents: pure projection — no exchange beyond bounds broadcast + aggregate") {
    // the operator itself, without the catalog's display orderBy (which
    // legitimately range-exchanges the ≤256-row aggregate output)
    val df = operators.Layout.hilbertExtents(
      spark.read.parquet(s"$sf/events.parquet").select("user_id", "event_id"),
      "user_id", "event_id", bits = 8, fileShift = 8)
    df.count()
    val plan = finalPlan(df.queryExecution.executedPlan).toString
    assert(!plan.contains("Exchange rangepartitioning"),
      s"hilbert keying must not sort the corpus:\n$plan")
    assert(plan.contains("hilbertindex2d"),
      s"the compiled Hilbert expression must appear in the plan:\n$plan")
  }
}
