package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object GccProbe {
  def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")) {
      val (tknn, nEdges) = time(QueryCatalog.knnEdges(spark, dir).count())
      val edges = QueryCatalog.knnEdges(spark, dir)
        .select(col("id").as("src"), col("nbr").as("dst"))
      val (tcc1, n1) = time(operators.Graph.connectedComponents(edges).count())
      val (tcc2, n2) = time(operators.Graph.connectedComponents(edges).count())
      val (tcc3, _) = time(operators.Graph.connectedComponents(edges).count())
      println(s"[gcc] $dir edges=$nEdges knnBuild=$tknn cc1=$tcc1 cc2=$tcc2 cc3=$tcc3 verts=$n1")
    }
    spark.stop()
  }
}
