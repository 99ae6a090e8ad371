package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Round-6 wave-2 operators: general connected components, weighted
  * priority sampling, collocation mining (lift), group-mean imputation. */
class CurationOpsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(schema: StructType, rows: Seq[Row]) =
    spark.createDataFrame(new java.util.ArrayList[Row](rows.asJava), schema)

  private val edgeSchema = StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType)))

  test("connectedComponents: min-id labels over both components") {
    val e = df(edgeSchema,
      Seq(Row(2L, 1L), Row(2L, 3L), Row(3L, 4L), Row(10L, 11L)))
    val got = Graph.connectedComponents(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: distributed label-prop path agrees with union-find") {
    val e = df(edgeSchema,
      // a 12-node path (diameter stresses the doubling rounds) + a pair
      (1L until 12L).map(i => Row(i, i + 1)) ++ Seq(Row(100L, 99L)))
    val uf = Graph.connectedComponents(e)
    val lp = Graph.connectedComponents(e, driverMaxPairs = 0L)
    assert(uf.collect().toSet == lp.collect().toSet)
    assert(lp.filter(col("id") <= 12).agg(max("group_id")).head.getLong(0) == 1L)
  }

  test("labelPropagation: hand-traced two rounds on two bridged triangles") {
    // triangles {1,2,3} and {4,5,6} bridged by (3,4)
    val e = df(edgeSchema, Seq(Row(1L, 2L), Row(2L, 3L), Row(1L, 3L),
      Row(3L, 4L), Row(4L, 5L), Row(5L, 6L), Row(4L, 6L)))
    val got = Graph.labelPropagation(e, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1 (all labels unique → min neighbor label):
    //   1→2, 2→1, 3→1, 4→3, 5→4, 6→4
    // round 2 (most frequent neighbor label, min tie):
    //   1:{1,1}→1  2:{2,1}→1  3:{2,1,3}→1  4:{1,4,4}→4  5:{3,4}→3  6:{3,4}→3
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 3L, 6L -> 3L))
  }

  test("weightedPriority: deterministic, partition-independent, key = hash/weight") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("w", DoubleType)))
    val d = df(schema, (1L to 200L).map(i => Row(i, (i % 7 + 1).toDouble)))
    val a = Sampling.weightedPriority(d, "id", "w", n = 20).collect()
    val b = Sampling.weightedPriority(d.repartition(13), "id", "w", n = 20)
      .collect()
    assert(a.toSeq == b.toSeq) // same rows in the same (key, id) order
    assert(a.length == 20)
    val keys = a.map(_.getDouble(2))
    assert(keys.zip(keys.tail).forall { case (x, y) => x <= y })
    // the key column IS hash(id)/w, recomputed independently
    val h = d.select(col("id"),
      (Sampling.hashUniform(col("id")) / col("w")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    a.foreach(r => assert(r.getDouble(2) == h(r.getLong(0))))
  }

  test("collocations: lift matches the hand computation") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val d = df(schema, Seq(Row(1L, "x y x y"), Row(2L, "x y z")))
    val got = TextAnalysis.collocations(d, n = 10, minCount = 1).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // unigrams x:3 y:3 z:1 (n=7); bigrams xy:3 yx:1 yz:1 (n=5)
    // lift(x,y) = (3/5) / ((3/7)*(3/7)) = 49*3/(5*9) = 3.266667
    assert(got(("x", "y"))._1 == 3L)
    assert(got(("x", "y"))._2 == 3.266667)
    // lift(y,z) = (1/5) / ((3/7)*(1/7)) = 49/(5*3) = 3.266667
    assert(got(("y", "z"))._2 == 3.266667)
    assert(got.size == 3)
  }

  test("collocations: minCount floors rare pairs before the heap") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val d = df(schema, Seq(Row(1L, "a b a b a b c d")))
    val got = TextAnalysis.collocations(d, n = 10, minCount = 3)
    assert(got.select("w1", "w2").collect().map(r =>
      (r.getString(0), r.getString(1))).toSet == Set(("a", "b")))
  }

  test("bpeMerges: greedy fusion incl. adjacent repeats; (count, pair) pick order") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val d = df(schema, Seq(Row(1L, "a b a b"), Row(2L, "a b c")))
    val got = TextAnalysis.bpeMerges(d, rounds = 3).collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getString(2), r.getLong(3)))
      .toMap
    assert(got(1) == (("a", "b", 3L)))
    // after round 1: "a_b a_b" / "a_b c" — BOTH adjacent repeats fused;
    // round 2 tie (count 1) breaks on pair order: (a_b,a_b) < (a_b,c)
    assert(got(2) == (("a_b", "a_b", 1L)))
    assert(got(3) == (("a_b", "c", 1L)))
  }

  test("recallAtK: intersection over k; duplicates in inputs don't inflate") {
    val schema = StructType(Seq(StructField("vec_id", LongType)))
    val approx = df(schema, Seq(1L, 2L, 3L, 4L, 4L).map(Row(_)))
    val exact = df(schema, Seq(3L, 4L, 5L, 6L).map(Row(_)))
    val r = Similarity.recallAtK(approx, exact, k = 4).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L && r.getDouble(2) == 0.5)
  }

  test("corpusCard: per-source volumes, cross-source dup attribution, fractions") {
    val schema = StructType(Seq(
      StructField("source", StringType), StructField("lang", StringType),
      StructField("text", StringType)))
    val d = df(schema, Seq(
      Row("s0", "en", "a b c"),      // 3 tokens, dup with the s1 copy
      Row("s0", "de", "x y z w v"),  // 5 tokens, unique
      Row("s1", "en", "a b c")))     // the cross-source copy
    val got = Profiling.corpusCard(d, shortTokens = 4).collect()
      .map(r => r.getString(0) -> r).toMap
    val s0 = got("s0")
    assert(s0.getLong(1) == 2 && s0.getLong(2) == 8) // docs, tokens
    assert(s0.getDouble(3) == 4.0)                   // avg tokens
    assert(s0.getLong(4) == 1 && s0.getDouble(5) == 0.5) // dup doc + frac
    assert(s0.getLong(6) == 1)                       // one short doc (<4)
    assert(s0.getDouble(7) == 0.5)                   // en fraction
    val s1 = got("s1")
    assert(s1.getLong(1) == 1 && s1.getLong(4) == 1 && s1.getDouble(7) == 1.0)
  }

  test("tokenBudget: inclusive greedy cut in priority order") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("tok", LongType)))
    val d = df(schema, Seq(Row(1L, 5L), Row(2L, 4L), Row(3L, 3L),
      Row(4L, 10L)))
    val got = Sampling.tokenBudget(d, col("id"), "tok", budget = 12L)
      .orderBy(col("id")).collect()
    // cum: 5, 9, 12, 22 — the first doc past the budget is excluded
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(got.map(_.getAs[Long]("cum_tokens")).toSeq == Seq(5L, 9L, 12L))
  }

  test("imputeGroupMean: fills with the group mean; all-null group stays null") {
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("v", DoubleType)))
    val d = df(schema, Seq(
      Row("a", 1.0), Row("a", 3.0), Row("a", null),
      Row("b", null), Row("b", null)))
    val got = Cleaning.imputeGroupMean(d, "g", "v")
    val aRows = got.filter(col("g") === "a").collect()
    assert(aRows.forall(!_.isNullAt(1)))
    val imputedA = aRows.filter(_.getBoolean(2))
    assert(imputedA.length == 1 && imputedA.head.getDouble(1) == 2.0)
    // a group with no observed values cannot be imputed
    val bRows = got.filter(col("g") === "b").collect()
    assert(bRows.forall(r => r.isNullAt(1) && !r.getBoolean(2)))
    assert(got.count() == 5) // imputation never drops rows
  }
}
