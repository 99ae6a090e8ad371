package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Iteration-scaling probe for Graph.pageRank: runs the SAME graph at a
  * list of iteration counts and prints wall per run — flat marginal cost
  * per added iteration demonstrates the every-4th-round lineage pin keeps
  * plan depth (and so planning time) bounded on long runs.
  * Usage: runMain graft.ProfilePageRank [sfDir] [itersCsv]
  */
object ProfilePageRank {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).getOrElse("3,10,20").split(",").map(_.trim.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = QueryCatalog.knnEdges(spark, sfDir)
      .select(col("id").as("src"), col("nbr").as("dst"))
      .persist()
    val vertices = QueryCatalog.embs(spark, sfDir).select(col("vec_id").as("id"))
    edges.count(); vertices.count() // warm caches out of the measurement
    for (it <- iters) {
      val t0 = System.nanoTime()
      val n = operators.Graph.pageRank(vertices, edges, iters = it).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[pagerank] iters=$it%-3d rows=$n $sec%7.2f s  (${sec / it}%5.3f s/iter)")
    }
    spark.stop()
  }
}
