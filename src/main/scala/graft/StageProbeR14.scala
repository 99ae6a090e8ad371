package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** r14 per-stage drill-down (guide §1/§7.1 without a UI): run one catalog
  * query at the bench posture and print EVERY completed stage — id, task
  * count, summed task wall, GC, shuffle bytes, and the call-site line from
  * the stage name — so a query's task-seconds can be attributed to an
  * operator. Passes: 2 (print the second, warm one).
  *
  *   runMain graft.StageProbeR14 <query> [warmQuery1,warmQuery2,...]
  */
object StageProbeR14 {
  private case class St(name: String, tasks: Int, taskMs: Long, gcMs: Long,
                        shufR: Long, shufW: Long, inB: Long)
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SessionTuning.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    QueryCatalog.wide(spark, sfDir).count()
    QueryCatalog.docs(spark, sfDir).count()
    QueryCatalog.embs(spark, sfDir).count()
    QueryCatalog.sig32(spark, sfDir).count()
    QueryCatalog.pairs01(spark, sfDir).count()
    QueryCatalog.blockPairs025(spark, sfDir).count()
    QueryCatalog.eventsWithTu(spark, sfDir).count()
    val stages = TrieMap[Int, St]()
    val taskAgg = TrieMap[Int, (Int, Long, Long, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          val (c, ms, gc, sr, sw, ib) =
            taskAgg.getOrElse(t.stageId, (0, 0L, 0L, 0L, 0L, 0L))
          taskAgg(t.stageId) = (c + 1, ms + m.executorRunTime,
            gc + m.jvmGCTime,
            sr + (if (m.shuffleReadMetrics != null)
              m.shuffleReadMetrics.totalBytesRead else 0L),
            sw + (if (m.shuffleWriteMetrics != null)
              m.shuffleWriteMetrics.bytesWritten else 0L),
            ib + (if (m.inputMetrics != null) m.inputMetrics.bytesRead else 0L))
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val (c, ms, gc, sr, sw, ib) =
          taskAgg.getOrElse(i.stageId, (0, 0L, 0L, 0L, 0L, 0L))
        stages(i.stageId) = St(i.name + " @ " + i.details.linesIterator
          .filter(_.contains("graft")).take(2).mkString(" | "),
          c, ms, gc, sr, sw, ib)
      }
    })
    val fn = SparkEntry.queries(name)
    // pass 1: warm (build caches, JIT)
    fn(spark, sfDir).count()
    Thread.sleep(500)
    stages.clear(); taskAgg.clear()
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    val t1 = System.nanoTime()
    df.count()
    val t2 = System.nanoTime()
    Thread.sleep(500)
    println(f"[stageprobe] $name build=${(t1 - t0) / 1e9}%.3f s " +
      f"exec=${(t2 - t1) / 1e9}%.3f s  stages=${stages.size}")
    val rows = stages.toSeq.sortBy(-_._2.taskMs)
    println(f"${"stage"}%6s ${"tasks"}%5s ${"taskSec"}%8s ${"gcMs"}%5s " +
      f"${"shufR"}%9s ${"shufW"}%9s ${"input"}%9s  name")
    rows.foreach { case (id, s) =>
      println(f"$id%6d ${s.tasks}%5d ${s.taskMs / 1e3}%8.2f ${s.gcMs}%5d " +
        f"${s.shufR}%9d ${s.shufW}%9d ${s.inB}%9d  ${s.name.take(220)}")
    }
    spark.stop()
  }
}
