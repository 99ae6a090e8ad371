package graft
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("PLAN_OUT", "/tmp/plans")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    QueryCatalog.wide(spark, sfDir).count()
    QueryCatalog.docs(spark, sfDir).count()
    QueryCatalog.embs(spark, sfDir).count()
    QueryCatalog.sig32(spark, sfDir).count()
    QueryCatalog.pairs01(spark, sfDir).count()
    QueryCatalog.blockPairs025(spark, sfDir).count()
    val names = sys.env.getOrElse("PLAN_QUERIES", "sim_lsh,txt_index,smp_temp,dd_embed").split(",")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.count() // force AQE final plan
      val p = df.queryExecution.executedPlan.toString
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/$n.plan"), p.getBytes)
    }
    spark.stop()
  }
}
