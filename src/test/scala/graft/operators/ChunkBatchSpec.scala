package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[Packing.lengthBatches]] and [[TextAnalysis.chunkWindows]] — the r6
  * batching/chunking additions. Driver-side reference fold per doc. */
class ChunkBatchSpec extends SparkSpec {

  private def docsOf(texts: Seq[String]) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val rows = texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
  }

  test("lengthBatches buckets by width and cuts id-ordered batches") {
    // token counts: 1, 3, 5, 7, 9, 11 → buckets of width 4: 0,0,1,1,2,2
    val texts = (0 until 6).map(i => Seq.fill(2 * i + 1)("w").mkString(" "))
    val out = Packing.lengthBatches(docsOf(texts), bucketWidth = 4, batchSize = 1)
      .orderBy(col("id")).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L, 5L, 7L, 9L, 11L))
    assert(out.map(_.getLong(2)).toSeq == Seq(0L, 0L, 1L, 1L, 2L, 2L))
    // batchSize 1 → within each bucket, batch index = position
    assert(out.map(_.getLong(3)).toSeq == Seq(0L, 1L, 0L, 1L, 0L, 1L))
  }

  test("lengthBatches: a dominant bucket splits into batchSize groups") {
    val texts = (0 until 100).map(_ => "a b c") // all 3 tokens → one bucket
    val out = Packing.lengthBatches(docsOf(texts), bucketWidth = 64, batchSize = 8)
      .orderBy(col("id")).collect()
    assert(out.map(_.getLong(2)).distinct.toSeq == Seq(0L))
    // 100 docs / 8 per batch → batches 0..12, sizes 8×12 + 4
    val sizes = out.groupBy(_.getLong(3)).view.mapValues(_.length).toMap
    assert(sizes.keys.max == 12L && sizes(12L) == 4 &&
      (0L to 11L).forall(sizes(_) == 8))
  }

  test("chunkWindows produces overlapping windows covering every token") {
    val n = 300
    val words = (0 until n).map(i => s"t$i")
    val out = TextAnalysis.chunkWindows(docsOf(Seq(words.mkString(" "))),
        chunkTokens = 128, overlap = 32)
      .orderBy(col("chunk_idx")).collect()
    // step 96: chunks at 0, 96, 192 → 1 + ceil((300-128)/96) = 1+2 = 3
    assert(out.length == 3)
    assert(out.map(_.getLong(2)).toSeq == Seq(128L, 128L, 300L - 192L))
    // distinct fingerprints (different windows), deterministic across runs
    assert(out.map(_.getLong(3)).distinct.length == 3)
    val again = TextAnalysis.chunkWindows(docsOf(Seq(words.mkString(" "))),
        chunkTokens = 128, overlap = 32)
      .orderBy(col("chunk_idx")).collect()
    assert(out.map(_.getLong(3)).toSeq == again.map(_.getLong(3)).toSeq)
  }

  test("chunkWindows: short and single-token docs yield exactly one chunk") {
    val out = TextAnalysis.chunkWindows(docsOf(Seq("only four words here", "x")),
        chunkTokens = 128, overlap = 32)
      .orderBy(col("id")).collect()
    assert(out.length == 2)
    assert(out(0).getInt(1) == 0 && out(0).getLong(2) == 4L)
    assert(out(1).getInt(1) == 0 && out(1).getLong(2) == 1L)
  }
}
