package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The custom grouped top-k operator (LogicalPlan + Strategy + SparkPlans):
  * result equivalence with the window row_number formulation, plan shape
  * (partial → one exchange → final, NO sort), and edge cases. */
class TopKPerKeySpec extends SparkSpec {

  import spark.implicits._

  private def fixture = {
    // 3 keys × many rows with deliberate cross-partition spread and ties on
    // the value column (broken by id — total order)
    val rows = for (k <- 0 until 3; i <- 0 until 40)
      yield (k.toLong, (i % 7).toDouble, (k * 100 + i).toLong)
    rows.toDF("key", "value", "id").repartition(4, col("id"))
  }

  test("matches the window row_number formulation exactly") {
    val df = fixture
    val got = TopKPerKey(df, Seq(col("key")),
        Seq(col("value").desc, col("id")), k = 5, rankCol = "rn")
      .select("key", "rn", "value", "id")
      .orderBy("key", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("value").desc, col("id"))
    val want = df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select("key", "rn", "value", "id")
      .orderBy("key", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("plans as partial heaps -> ONE exchange -> final heaps, with no sort") {
    val df = fixture
    val q = TopKPerKey(df, Seq(col("key")), Seq(col("value").desc, col("id")), 5)
    q.collect() // finalize any adaptive plan
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPartial"), plan)
    assert(plan.contains("TopKFinal"), plan)
    assert(!plan.contains("Sort "), s"unexpected sort:\n$plan")
    // input repartition + the topk exchange; the segment between partial
    // and final must contain exactly one
    val between = plan.substring(plan.indexOf("TopKFinal"), plan.indexOf("TopKPartial"))
    assert("Exchange".r.findAllIn(between).length == 1, between)
  }

  test("keys smaller than k keep all rows; empty input yields empty output") {
    val small = Seq((1L, 1.0, 1L), (1L, 2.0, 2L)).toDF("key", "value", "id")
    val out = TopKPerKey(small, Seq(col("key")), Seq(col("value").desc, col("id")), 5)
    assert(out.count() == 2)
    assert(out.select("__rank__").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    val empty = small.filter(col("key") < 0)
    assert(TopKPerKey(empty, Seq(col("key")),
      Seq(col("value").desc, col("id")), 3).count() == 0)
  }

  test("partial degrade (key-cardinality cap) keeps results exact") {
    val df = fixture
    spark.conf.set("graft.topk.maxPartialKeys", "1") // degrade immediately
    try {
      val got = TopKPerKey(df, Seq(col("key")),
          Seq(col("value").desc, col("id")), k = 4, rankCol = "rn")
        .select("key", "rn", "id").orderBy("key", "rn")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("key")).orderBy(col("value").desc, col("id"))
      val want = df.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 4).select("key", "rn", "id").orderBy("key", "rn")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq == want.toSeq)
    } finally spark.conf.unset("graft.topk.maxPartialKeys")
  }

  test("property sweep: random data/k/partitioning always equals row_number") {
    import org.scalacheck.Gen
    val gen = for {
      nRows <- Gen.choose(0, 300)
      nKeys <- Gen.choose(1, 8)
      nVals <- Gen.choose(1, 4) // few distinct values → many ties
      k <- Gen.choose(1, 6)
      parts <- Gen.choose(1, 5)
      rows <- Gen.listOfN(nRows, Gen.zip(Gen.choose(0L, nKeys.toLong - 1),
        Gen.choose(0, nVals - 1).map(_.toDouble)))
    } yield (rows, k, parts)
    val params = org.scalacheck.Gen.Parameters.default
    (1 to 8).foreach { seedI =>
      val (rows, k, parts) = gen(params,
        org.scalacheck.rng.Seed(seedI.toLong)).get
      val df = rows.zipWithIndex
        .map { case ((key, v), i) => (key, v, i.toLong) }
        .toDF("key", "value", "id").repartition(parts)
      val got = TopKPerKey(df, Seq(col("key")),
          Seq(col("value").desc, col("id")), k, rankCol = "rn")
        .select("key", "rn", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("key")).orderBy(col("value").desc, col("id"))
      val want = df.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= k).select("key", "rn", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(got.toSeq == want.toSeq,
        s"seed=$seedI k=$k parts=$parts rows=${rows.size}")
    }
  }

  test("no keys = global top-k (AllTuples distribution)") {
    val df = fixture
    val got = TopKPerKey(df, Nil, Seq(col("value").desc, col("id")), 3)
      .select("value", "id").orderBy(col("id")).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    val want = df.orderBy(col("value").desc, col("id")).limit(3)
      .select("value", "id").orderBy(col("id")).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(got.toSeq == want.toSeq)
  }
}
