package graft.plans

import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkSpec}

/** The r13 FAILING gate for the silent-interpreted-fallback class
  * (NOTES_r12 §9: pipe_curate ran interpreted for ~6 rounds while every
  * oracle stayed green — the tripwire only printed). Two halves:
  *
  *  1. ARMED — a deliberately exponential nested when/otherwise chain
  *     (the exact langPred shape) is executed and MUST trip the counter,
  *     proving a real Janino 64 KB overflow still reaches the appender
  *     through Spark's actual logging path. If Spark's failure message,
  *     logger name, or log4j routing ever changes, this half goes red
  *     before the gate half can silently pass on a disarmed counter.
  *  2. GATE — every catalog query executes (sf0.001) with ZERO new
  *     fallbacks. The next 64 KB regression turns the build red instead
  *     of running interpreted for rounds.
  */
class CodegenGateSpec extends SparkSpec {

  test("armed: a Janino-64KB-overflowing expression trips the counter") {
    CodegenFallbackCounter.install()
    val before = CodegenFallbackCounter.count.get()
    val df = spark.range(8).select(col("id").cast("double").as("x"))
    // nested when/otherwise reduction: each level embeds the accumulator
    // TWICE (once in the condition, once in the otherwise), so the
    // expression doubles per level — conditional branches are excluded
    // from codegen subexpression elimination, so the generated
    // processNext() genuinely crosses Janino's hard 64 KB method limit
    val base = (1 to 8).map(i => col("x") * lit(i.toDouble) + lit(i.toDouble))
      .reduce(_ + _)
    val blown = (1 to 12).foldLeft(lit(0.0)) { (acc, i) =>
      when(acc > base * lit(i.toDouble), acc)
        .otherwise(base * lit(i.toDouble))
    }
    df.select(blown.as("y")).agg(sum(col("y"))).collect()
    assert(CodegenFallbackCounter.count.get() > before,
      "the deliberately exponential fixture did not trip the codegen " +
        "counter — the gate is DISARMED (logging path or message changed?)")
  }

  test("gate: the full catalog executes with zero codegen fallbacks") {
    CodegenFallbackCounter.install()
    val sf = "/root/testdata/sf0.001"
    val failures = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val before = CodegenFallbackCounter.count.get()
      // execute the UNPRUNED plan (r14 ADVICE): .count() lets the
      // optimizer column-prune output-only projections, so an overflow
      // confined to a final select would never be code-generated here
      // while Verify's full-column parquet write still runs it
      // interpreted. toRdd materializes every output column exactly as
      // Verify writes them.
      fn(spark, sf).queryExecution.toRdd.count()
      val after = CodegenFallbackCounter.count.get()
      if (after != before) failures += s"$name (+${after - before})"
    }
    assert(failures.isEmpty,
      s"codegen fallbacks — these queries ran stages INTERPRETED: " +
        failures.mkString(", "))
  }
}
