package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Under-filled KMV regime (ADVICE r5): with fewer distinct shingles than
  * the nominal sketch size k, the estimators must use |sample| — a fixed
  * `element_at(u, k)` / `.../k` returns NULL (or an ANSI error) and
  * underestimates Jaccard. A source with ZERO 3-shingles must vanish from
  * the overlap matrix on both engines, not survive as an empty-sketch row.
  */
class KmvSmallCorpusSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_kmv_small").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("lang", StringType), StructField("text", StringType)))
    val rows = Seq(
      Row(1L, "src0", "en", "a b c d"), // shingles: "a b c", "b c d"
      Row(2L, "src1", "en", "a b c"),   // shingle:  "a b c" (overlaps src0)
      // NULL text → NULL shingle → skipped by the sketch aggregate →
      // a genuinely EMPTY sketch (short non-null docs fall back to the
      // whole-text shingle instead and are never empty)
      Row(3L, "src2", "en", null))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("agg_setsk estimates from |union sample|, not nominal k") {
    val r = SparkEntry.queries("agg_setsk")(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    // union = {h(a b c), h(b c d)} → 2 values, intersection = {h(a b c)}
    assert(!row.isNullAt(row.fieldIndex("est_union")),
      "under-filled union sketch must still yield an estimate")
    assert(row.getDouble(row.fieldIndex("est_jaccard")) == 0.5,
      s"J = |both|/|sample| = 1/2, got $row")
    assert(!row.isNullAt(row.fieldIndex("est_inter")))
  }

  test("agg_setmat drops zero-shingle sources and scales by |union sample|") {
    val rows = SparkEntry.queries("agg_setmat")(spark, dir).collect()
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("src0", "src1")),
      s"src2 has no shingles and must not appear, got ${pairs.mkString(", ")}")
    assert(rows.head.getDouble(rows.head.fieldIndex("est_jaccard")) == 0.5)
  }

  test("agg_kmv under-filled sketch uses its last element as the order statistic") {
    val r = SparkEntry.queries("agg_kmv")(spark, dir).collect().head
    assert(r.getLong(r.fieldIndex("n_kept")) == 2L) // "a b c", "b c d"
    assert(!r.isNullAt(r.fieldIndex("kth_hash")))
    assert(!r.isNullAt(r.fieldIndex("est_distinct")))
  }
}
