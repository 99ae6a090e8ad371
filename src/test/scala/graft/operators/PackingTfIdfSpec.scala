package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Sequence packing (distributed prefix-sum), 3-way split, and TF-IDF. */
class PackingTfIdfSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def df(rows: Seq[Row]) = spark.createDataFrame(
    new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)

  test("packContiguous equals a sequential prefix sum, any partitioning") {
    val docs = (0L until 200L).map(i =>
      Row(i, Seq.fill((i % 7 + 1).toInt)("tok").mkString(" ")))
    val expected = docs.map(_.getLong(0)).zip(
      docs.map(r => r.getString(1).count(_ == ' ').toLong + 1)
        .scanLeft(0L)(_ + _)) // exclusive prefix
    for (p <- Seq(1, 3, 8)) {
      val out = Packing.packContiguous(df(docs).repartition(p), budget = 10)
        .orderBy(col("id")).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      out.zip(expected).foreach { case ((id, start, pack), (eid, estart)) =>
        assert(id == eid && start == estart, s"id $id: $start vs $estart (p=$p)")
        assert(pack == estart / 10)
      }
    }
  }

  test("packStats: every non-tail pack starts within one doc of the budget") {
    val docs = (0L until 300L).map(i => Row(i, Seq.fill(5)("t").mkString(" ")))
    val stats = Packing.packStats(
        Packing.packContiguous(df(docs), budget = 50))
      .orderBy(col("pack_id")).collect()
    // 300 docs * 5 tokens / 50 budget = 30 exact packs of 10 docs
    assert(stats.length == 30)
    stats.foreach(r => assert(r.getLong(1) == 10 && r.getLong(2) == 50))
  }

  test("split3 is deterministic, disjoint-exhaustive, and ~proportional") {
    val docs = df((0L until 2000L).map(i => Row(i, "x")))
    val a = Sampling.split3(docs, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Sampling.split3(docs.repartition(7), "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b, "assignment must not depend on partitioning")
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train") - 1600) < 100, counts.toString)
    assert(math.abs(counts("val") - 200) < 60, counts.toString)
    // growing the corpus never reassigns an existing row
    val grown = Sampling.split3(df((0L until 4000L).map(i => Row(i, "x"))), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a.forall { case (id, s) => grown(id) == s })
  }

  test("mixture hits target proportions with maximal retention") {
    val srcSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("source", StringType)))
    val rows = (0L until 40L).map(i => Row(i, "a")) ++
      (40L until 80L).map(i => Row(i, "b")) ++
      (80L until 100L).map(i => Row(i, "c")) ++
      (100L until 110L).map(i => Row(i, "d"))
    val corpus = spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), srcSchema)
    // weights a:.5 b:.25 c:.25 → cap = min(40/.5, 40/.25, 20/.25) = 80
    // → keep-fracs a = 1.0, b = 0.5, c = 1.0; d unlisted → dropped
    val kept = Sampling.mixture(corpus, "source", "doc_id",
        Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25)).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val bySrc = kept.groupBy(_._1).view.mapValues(_.size).toMap
    assert(!bySrc.contains("d"), s"zero-weight stratum must drop: $bySrc")
    assert(bySrc("a") == 40 && bySrc("c") == 20,
      s"binding/under-cap strata keep everything: $bySrc")
    assert(bySrc("b") > 10 && bySrc("b") < 30, s"b halves: $bySrc")
    // deterministic under repartitioning
    val again = Sampling.mixture(corpus.repartition(7), "source", "doc_id",
        Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25)).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(kept.toSet == again.toSet)
  }

  test("tf-idf ranks corpus-distinctive terms above ubiquitous ones") {
    val docs = df(Seq(
      Row(0L, "the cat sat on the mat"),
      Row(1L, "the dog sat on the log"),
      Row(2L, "the bird flew over the hill")))
    val top = TfIdf.topTerms(docs, k = 2).collect()
      .map(r => (r.getLong(r.fieldIndex("id")), r.getString(r.fieldIndex("term")),
        r.getLong(r.fieldIndex("rank"))))
    // "the"/"on"/"sat" are corpus-wide; each doc's rank-1 term is unique to it
    val rank1 = top.filter(_._3 == 1L).map(t => t._1 -> t._2).toMap
    assert(Set("cat", "mat").contains(rank1(0L)), rank1.toString)
    assert(Set("dog", "log").contains(rank1(1L)), rank1.toString)
    assert(Set("bird", "flew", "hill", "over").contains(rank1(2L)), rank1.toString)
    // ubiquitous term never ranks: ln(3/3) = 0
    assert(!top.exists(_._2 == "the"), top.mkString(", "))
  }
}
