package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** Stage-level timing for the dedup pipelines: which part of
  * dd_simhash / dd_jaccard / dd_groups actually costs.
  * runMain graft.ProfileParts [sfDir] */
object ProfileParts {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[parts] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[parts] docs=${docs.count()}")

    time("tokenized.count")(Dedup.tokenized(docs, "text", "doc_id").count())
    val sh = time("simhash(portable)") {
      val x = Dedup.simhash(docs, portable = true)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      x.count(); x
    }
    time("simhashPairs(h<=8,b15)")(
      Dedup.simhashPairs(sh, maxHamming = 8, bandBits = 15).count())
    val sig = time("minhashSig(portable,k=32)") {
      val x = Dedup.minhashSignatures(docs, "text", "doc_id", 3, 32, portable = true)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      x.count(); x
    }
    // granular LSH breakdown (mirrors minhashLsh internals)
    locally {
      val k = 32; val bands = 8; val rowsPerBand = k / bands
      def bandHash(band: Int, slots: Seq[org.apache.spark.sql.Column]) =
        conv(substring(md5(concat_ws(",",
          (lit(band.toString) +: slots.map(_.cast("string"))): _*)), 1, 15), 16, 10)
          .cast("long")
      val banded = sig.select(col("id"),
        posexplode(array((0 until bands).map(b =>
          bandHash(b, (0 until rowsPerBand).map(r =>
            element_at(col("sig"), b * rowsPerBand + r + 1)))): _*))
          .as(Seq("band", "band_hash")))
      time("  banded.count")(banded.count())
      val sized = banded
        .withColumn("bucket_n",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("band"), col("band_hash"))))
        .filter(col("bucket_n") <= 256)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("  sized.count")(sized.count())
      val l = sized.select(col("band"), col("band_hash"), col("id").as("id1"))
      val r = sized.select(col("band"), col("band_hash"), col("id").as("id2"))
      val raw = l.join(r, Seq("band", "band_hash")).filter(col("id1") < col("id2"))
      println(s"[parts]   raw pair rows = ${time("  raw join.count")(raw.count())}")
      val cand = raw.select(col("id1"), col("id2")).dropDuplicates("id1", "id2")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[parts]   cand rows = ${time("  cand.count")(cand.count())}")
      val est = cand
        .join(sig.select(col("id").as("id1"), col("sig").as("sig1")), Seq("id1"))
        .join(sig.select(col("id").as("id2"), col("sig").as("sig2")), Seq("id2"))
        .select(col("id1"), col("id2"),
          (size(array_intersect(col("sig1"), col("sig2"))).cast("double")
            / lit(k.toDouble)).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.1)
      time("  est+filter.count")(est.count())
      sized.unpersist(); cand.unpersist()
    }
    val pairs = time("lsh(join+estJac)") {
      val x = Dedup.minhashLsh(docs, threshold = 0.1, portable = true,
        precomputedSig = Some(sig)).select("id1", "id2")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      x.count(); x
    }
    time("ngramJaccard(cand)")(Dedup.ngramJaccard(docs, pairs).count())
    time("duplicateGroups")(Dedup.duplicateGroups(docs, pairs).count())
    spark.stop()
  }
}
