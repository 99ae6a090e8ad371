package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bucketed-table layout: the join/agg on the bucket key must plan with
  * ZERO shuffle exchanges (the pay-the-shuffle-at-ingest contract) and
  * produce exactly the plain-join result. */
class BucketingSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private lazy val fixture: (String, String) = {
    val facts = spark.createDataFrame(
      java.util.List.copyOf(scala.jdk.CollectionConverters.SeqHasAsJava(
        (0 until 1000).map(i => Row(i.toLong % 37, i.toLong, (i % 100).toDouble))).asJava),
      StructType(Seq(StructField("k", LongType), StructField("fid", LongType),
        StructField("v", DoubleType))))
    val dims = spark.createDataFrame(
      java.util.List.copyOf(scala.jdk.CollectionConverters.SeqHasAsJava(
        (0 until 37).map(i => Row(i.toLong, s"dim_$i"))).asJava),
      StructType(Seq(StructField("dk", LongType), StructField("name", StringType))))
    Bucketing.writeBucketed(facts, "bkt_facts", tmp("bkt_facts"), 4, "k")
    Bucketing.writeBucketed(dims, "bkt_dims", tmp("bkt_dims"), 4, "dk")
    ("bkt_facts", "bkt_dims")
  }

  test("bucketed join + agg on the bucket key plans with zero exchanges") {
    val (ft, dt) = fixture
    // disable broadcast so the join must co-locate — the bucket layout,
    // not a broadcast, is what removes the exchanges
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = Bucketing.bucketedEquiJoin(spark, ft, dt, "k", "dk")
        .groupBy(col("k"), col("name"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join/agg must not shuffle:\n$plan")
      assert(q.count() == 37L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed join result equals the plain join") {
    val (ft, dt) = fixture
    val bucketed = Bucketing.bucketedEquiJoin(spark, ft, dt, "k", "dk")
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val plain = spark.table(ft).join(spark.table(dt), col("k") === col("dk"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    assert(bucketed.orderBy("k").collect().toSeq ==
      plain.orderBy("k").collect().toSeq)
  }

  test("each bucket lands in one file") {
    val (ft, _) = fixture
    val files = spark.table(ft).inputFiles
    assert(files.length == 4, s"expected 4 bucket files, got ${files.length}")
  }
}
