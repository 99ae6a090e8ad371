package graft
import org.apache.spark.sql.SparkSession

/** r14 plan-evidence dump: `.explain("formatted")` for named catalog
  * queries at the BENCH posture (master local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus — PlanDump's fixed local[8] posture stays
  * for the older committed evidence). Each query is EXECUTED first so
  * AQE's final plan (coalesced reads, runtime join strategy) is what
  * prints. Output: $PLAN_OUT/<name>_<suffix>.txt, suffix from
  * $PLAN_SUFFIX (default "plan").
  *
  *   PLAN_QUERIES=gr_tri,dd_span PLAN_OUT=plans/r14 PLAN_SUFFIX=before \
  *     sbt "runMain graft.PlanDumpR14"
  */
object PlanDumpR14 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("PLAN_OUT", "plans/r14")
    val suffix = sys.env.getOrElse("PLAN_SUFFIX", "plan")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SessionTuning.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    QueryCatalog.wide(spark, sfDir).count()
    QueryCatalog.docs(spark, sfDir).count()
    QueryCatalog.embs(spark, sfDir).count()
    QueryCatalog.sig32(spark, sfDir).count()
    QueryCatalog.pairs01(spark, sfDir).count()
    QueryCatalog.blockPairs025(spark, sfDir).count()
    QueryCatalog.eventsWithTu(spark, sfDir).count()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    val names = sys.env.getOrElse("PLAN_QUERIES", "gr_tri").split(",")
      .map(_.trim).filter(_.nonEmpty)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.count() // force execution so AQE's FINAL plan prints
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$out/${n}_$suffix.txt"), p.getBytes("UTF-8"))
      System.err.println(s"[plandump] wrote $out/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
