package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off generator: replicate sf0.1 N× (key-shifted, default 10× into
  * /tmp/graft_sf1) so headline queries can be measured at ~6M+ lineitem
  * rows. Usage: runMain graft.ScaleGen [reps] [dstDir]. Key shifts keep
  * referential integrity: fact and dimension foreign keys shift together
  * per replica; value columns are left untouched so data distributions
  * (and therefore per-row work) are preserved. */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = "/root/testdata/sf0.1"
    val reps = args.headOption.map(_.toInt).getOrElse(10)
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shifts = Map( // per-table key columns to shift by replica * stride
      "lineitem" -> Seq("l_orderkey" -> 10000000L, "l_partkey" -> 1000000L,
        "l_suppkey" -> 100000L),
      "orders" -> Seq("o_orderkey" -> 10000000L, "o_custkey" -> 1000000L),
      "customer" -> Seq("c_custkey" -> 1000000L),
      "part" -> Seq("p_partkey" -> 1000000L),
      "supplier" -> Seq("s_suppkey" -> 100000L),
      "documents" -> Seq("doc_id" -> 10000000L),
      "embeddings" -> Seq("vec_id" -> 10000000L),
      "events" -> Seq("event_id" -> 100000000L, "user_id" -> 1000000L))
    for ((tbl, keys) <- shifts) {
      val base = spark.read.parquet(s"$src/$tbl.parquet")
      val reps10 = (0 until reps).map { r =>
        keys.foldLeft(base) { case (df, (k, stride)) =>
          df.withColumn(k, col(k) + lit(r * stride)) }
      }.reduce(_ union _)
      reps10.write.mode("overwrite").parquet(s"$dst/$tbl.parquet")
      println(s"[scalegen] $tbl: ${reps10.count()} rows")
    }
    for (tbl <- Seq("nation", "region")) { // tiny dims unchanged
      spark.read.parquet(s"$src/$tbl.parquet")
        .write.mode("overwrite").parquet(s"$dst/$tbl.parquet")
    }
    spark.stop()
  }
}
