package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** r14 optimization-round measurement harness (guide §1: measure first).
  *
  * For each named catalog query, over `SPARK_GRAFT_PROFILE_PASSES` passes
  * (default 3, min reported), splits the wall into
  *   build  — the catalog fn call (eager sub-jobs of iterative operators
  *            land here),
  *   plan   — analysis + optimization + physical planning + codegen
  *            (forcing `queryExecution.executedPlan`),
  *   exec   — the count() action,
  * and collects per-query cluster-side totals from a listener: jobs,
  * stages, tasks, sum of task wall, shuffle bytes written, scheduler-side
  * task-launch count. The gap between exec wall and (task time / cores)
  * is scheduling + driver overhead — the quantity the r13 verdict's #7
  * stretch asks about.
  *
  * runMain graft.ProfileR14 q1,q2,... — same session posture as Bench.
  */
object ProfileR14 {
  private class Acc extends SparkListener {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val shufW = new AtomicLong
    val shufR = new AtomicLong
    val gcMs = new AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) {
        taskMs.addAndGet(m.executorRunTime)
        gcMs.addAndGet(m.jvmGCTime)
        if (m.shuffleWriteMetrics != null)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        if (m.shuffleReadMetrics != null)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      }
    }
    def reset(): Unit = { jobs.set(0); stages.set(0); tasks.set(0)
      taskMs.set(0); shufW.set(0); shufR.set(0); gcMs.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROFILE_PASSES", "3").toInt
    val spark = SessionTuning.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    // same shared-cache warmup as Bench
    QueryCatalog.wide(spark, sfDir).count()
    QueryCatalog.docs(spark, sfDir).count()
    QueryCatalog.embs(spark, sfDir).count()
    QueryCatalog.sig32(spark, sfDir).count()
    QueryCatalog.pairs01(spark, sfDir).count()
    QueryCatalog.blockPairs025(spark, sfDir).count()
    QueryCatalog.eventsWithTu(spark, sfDir).count()
    println("%-14s %7s %7s %7s %7s | %4s %5s %6s %9s %8s %8s %6s"
      .format("query", "build", "plan", "exec", "total",
        "jobs", "stage", "tasks", "taskSec", "shufW", "shufR", "gcMs"))
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val rows = (1 to passes).map { _ =>
        // settle the listener queue so per-pass metrics don't bleed
        // (the bus is private[spark]; at this scale 300 ms drains it)
        Thread.sleep(300)
        acc.reset()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force planning
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        Thread.sleep(300)
        (t1 - t0, t2 - t1, t3 - t2, acc.jobs.get, acc.stages.get,
          acc.tasks.get, acc.taskMs.get, acc.shufW.get, acc.shufR.get,
          acc.gcMs.get)
      }
      val best = rows.minBy(r => r._1 + r._2 + r._3)
      val (b, p, e, j, st, tk, tms, sw, sr, gc) = best
      println("%-14s %7.3f %7.3f %7.3f %7.3f | %4d %5d %6d %9.2f %8s %8s %6d"
        .format(name, b / 1e9, p / 1e9, e / 1e9, (b + p + e) / 1e9,
          j, st, tk, tms / 1e3, fmtB(sw), fmtB(sr), gc))
    }
    spark.stop()
  }
  private def fmtB(b: Long): String =
    if (b >= 1e9) f"${b / 1e9}%.1fG" else if (b >= 1e6) f"${b / 1e6}%.1fM"
    else if (b >= 1e3) f"${b / 1e3}%.1fK" else s"${b}B"
}
