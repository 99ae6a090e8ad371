package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Granular timing of the MinHash-LSH stages. runMain graft.ProfileLsh [sfDir] */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lsh] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sig = Dedup.minhashSignatures(docs, "text", "doc_id", 3, 32)
    t("signatures count")(println(sig.count()))
    val banded = sig.select(col("id"),
      posexplode(array((0 until 8).map(b =>
        xxhash64((lit(b) +: (0 until 4).map(r =>
          element_at(col("sig"), b * 4 + r + 1))): _*)): _*))
        .as(Seq("band", "band_hash")))
    t("banded count")(println(banded.count()))
    t("bucket histogram")(
      banded.groupBy("band", "band_hash").count()
        .groupBy((col("count") / 50).cast("int").as("bucket50")).count()
        .orderBy(col("bucket50")).show(30))
    val pairsRaw = t("pairs join") {
      val sized = banded.groupBy("band", "band_hash")
        .agg(collect_list(col("id")).as("ids"), count(lit(1)).as("n"))
      val dropped = sized.filter(col("n") > 256).count()
      println(s"$dropped buckets dropped")
      -1
    }
    val full = t("full minhashLsh")(Dedup.minhashLsh(docs, threshold = 0.2).count())
    println(s"pairs out: $full")
    spark.stop()
  }
}
