package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkSpec}

/** Plan-shape pins for the r9 ANN re-plan (the r8 verdict's one weak
  * finding): `sim_binq` and `sim_rerank` must rank their per-probe
  * candidates on the bounded-heap [[TopKPerKeyNode]] operator — partial
  * heaps cut every upstream partition to ≤ k rows per probe BEFORE the
  * exchange — never on a `row_number` window, whose per-probe partition
  * carries the ENTIRE candidate corpus through one task.
  *
  * Also covers [[GraftExtensions.ensureRules]]: the runtime path that
  * installs the optimizer rules + planner strategy on an EXISTING
  * extensions-less session (the correctness gate's session shape), so the
  * window top-k idiom is re-planned onto the heap operator there too.
  */
class AnnPlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  private def assertHeapTopK(name: String, minTopK: Int): Unit = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.count() // settle AQE so the final physical plan is inspected
    val plan = finalPlan(df.queryExecution.executedPlan)
    val partials = plan.collect { case t: TopKPartialExec => t }
    val windows = plan.collect { case w: WindowExec => w }
    assert(partials.length >= minTopK,
      s"$name: expected >= $minTopK TopKPartialExec (bounded pre-shuffle " +
        s"heaps), found ${partials.length} in:\n$plan")
    assert(windows.isEmpty,
      s"$name: a window survived the TopKPerKey re-plan (a per-probe " +
        s"window partition holds the whole candidate corpus):\n$plan")
  }

  test("sim_binq ranks on TopKPerKey partial heaps, no window") {
    assertHeapTopK("sim_binq", minTopK = 1)
  }

  test("sim_rerank runs BOTH ranking stages on TopKPerKey, no window") {
    assertHeapTopK("sim_rerank", minTopK = 2)
  }

  test("sim_adc ranks the LUT-scored PQ code pairs on TopKPerKey, no window") {
    assertHeapTopK("sim_adc", minTopK = 1)
  }

  test("sim_ivfpq ranks the cell-pruned ADC pairs on TopKPerKey, no window") {
    assertHeapTopK("sim_ivfpq", minTopK = 1)
  }

  test("nnDescent's final re-rank runs on TopKPerKey partial heaps, " +
      "no window (r10; earlier rounds sit behind lineage checkpoints " +
      "with the same shape)") {
    val df = graft.operators.Similarity.nnDescent(
      graft.QueryCatalog.embs(spark, sf), "label", k = 3, rounds = 1,
      seedThreshold = 0.25)
    df.count()
    val plan = finalPlan(df.queryExecution.executedPlan)
    val partials = plan.collect { case t: TopKPartialExec => t }
    val windows = plan.collect { case w: WindowExec => w }
    assert(partials.nonEmpty,
      s"nnDescent: expected TopKPartialExec in the re-rank:\n$plan")
    assert(windows.isEmpty,
      s"nnDescent: a window survived in the re-rank round:\n$plan")
  }

  test("ensureRules re-plans the window top-k idiom on a plain session") {
    // a fresh child session: shares the context and nothing else — no
    // extensions, fresh experimental hooks (the gate session's shape)
    val plain = spark.newSession()
    import plain.implicits._
    val df = (0 until 1000).map(i => (i % 7, i, i * 37 % 101)).toDF("k", "id", "v")
    def topk = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"k").orderBy($"v".asc, $"id".asc)
      df.withColumn("rn", row_number().over(w)).where($"rn" <= 3)
    }
    // before: the idiom plans as a window
    val before = topk
    before.count()
    assert(finalPlan(before.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }.nonEmpty,
      "plain session should plan the idiom as a window before ensureRules")
    val expected = before.collect().map(_.toSeq).toSet

    GraftExtensions.ensureRules(plain)
    val after = topk
    after.count()
    val plan = finalPlan(after.queryExecution.executedPlan)
    assert(plan.collect { case t: TopKPartialExec => t }.nonEmpty,
      s"ensureRules installed but the idiom still plans without the heap " +
        s"operator:\n$plan")
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"window survived after ensureRules:\n$plan")
    assert(after.collect().map(_.toSeq).toSet == expected,
      "re-planned results differ from the window formulation")
    // idempotent: a second call must not duplicate rules
    val n = plain.experimental.extraOptimizations.length
    GraftExtensions.ensureRules(plain)
    assert(plain.experimental.extraOptimizations.length == n)
  }
}
