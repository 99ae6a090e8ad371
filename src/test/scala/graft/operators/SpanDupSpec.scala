package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec

/** [[Dedup.spanDupStats]] — sliding-window exact-substring duplication.
  * Hand-crafted corpora pin the offset-invariance (a copied sentence at a
  * DIFFERENT offset must collide), the per-token coverage arithmetic
  * (including overlapping runs), and the short-document drop. */
class SpanDupSpec extends SparkSpec {

  private def corpus(docs: (Long, String)*) = {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          docs.map(d => Row(d._1, d._2)).toList).asJava), schema)
  }

  private def stats(df: org.apache.spark.sql.DataFrame, k: Int = 4) =
    Dedup.spanDupStats(df, "text", "doc_id", k).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("a copied span at a DIFFERENT offset is caught (chunk dedup misses it)") {
    // the 6-token span "p q r s t u" sits at offset 0 in doc 1 and
    // offset 3 in doc 2 — boundary-aligned chunking at size 4 would see
    // different chunks; sliding windows must flag it
    val df = corpus(
      1L -> "p q r s t u x1 y1 z1 w1",
      2L -> "a b c p q r s t u z2")
    val got = stats(df, k = 4)
    // doc1: 7 windows (10 tokens, k=4); dup starts: 0,1,2 (the three
    // 4-windows inside the 6-token span) → one run → coverage 3+3=6
    assert(got(1L) == ((7L, 3L, 6L)), got(1L).toString)
    // doc2: 7 windows; dup starts at 3,4,5 → 6 removable
    assert(got(2L) == ((7L, 3L, 6L)), got(2L).toString)
  }

  test("two disjoint dup runs fold separately; unique docs report zero") {
    val df = corpus(
      1L -> "s1 s2 s3 s4 m1 m2 m3 m4 m5 s1 s2 s3 s4",
      2L -> "s1 s2 s3 s4 q1 q2 q3 q4 q5 q6",
      3L -> "u1 u2 u3 u4 u5 u6 u7")
    val got = stats(df, k = 4)
    // doc1: "s1 s2 s3 s4" appears at offsets 0 and 9, both shared with
    // doc2's offset 0 → dup starts {0, 9}: two runs of length 1 →
    // coverage 2 + 3·2 = 8
    assert(got(1L)._2 == 2L && got(1L)._3 == 8L, got(1L).toString)
    assert(got(2L)._2 == 1L && got(2L)._3 == 4L, got(2L).toString)
    assert(got(3L) == ((4L, 0L, 0L)), got(3L).toString)
  }

  test("overlapping dup runs count coverage once (no run-fold double count)") {
    // doc1's dup starts are 0 (a b c d) and 2 (c d e f) — two maximal
    // runs separated by ONE non-dup start, so their coverage intervals
    // [0,3] and [2,5] overlap. The old Σdup + (k−1)·#runs fold said
    // 2 + 3·2 = 8 > n_tokens = 6; true coverage is 6, and it must agree
    // with what removeDupSpans actually removes.
    val df = corpus(
      1L -> "a b c d e f",
      2L -> "a b c d Z c d e f")
    val got = stats(df, k = 4)
    assert(got(1L) == ((3L, 2L, 6L)), got(1L).toString)
    // doc2: dup starts 0 and 5, gap > k−1 → disjoint runs, 4 + 4 = 8
    assert(got(2L) == ((6L, 2L, 8L)), got(2L).toString)
    val removed = clean(df, k = 4)
    assert(removed(1L)._3 == got(1L)._3 && removed(2L)._3 == got(2L)._3,
      "spanDupStats.removable_tokens must equal removeDupSpans.removed_tokens")
  }

  test("within-doc repetition alone is NOT cross-doc duplication") {
    val df = corpus(
      1L -> "r1 r2 r3 r4 r1 r2 r3 r4",
      2L -> "b1 b2 b3 b4 b5 b6 b7 b8")
    val got = stats(df, k = 4)
    assert(got(1L)._2 == 0L, "repeats inside ONE doc must not flag")
  }

  test("documents shorter than k drop out") {
    val df = corpus(1L -> "a b c", 2L -> "a b c d e")
    val got = stats(df, k = 4)
    assert(!got.contains(1L) && got(2L)._1 == 2L)
  }

  private def clean(df: org.apache.spark.sql.DataFrame, k: Int = 4) =
    Dedup.removeDupSpans(df, "text", "doc_id", k).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("removeDupSpans strips exactly the covered tokens, order preserved") {
    val df = corpus(
      1L -> "p q r s t u x1 y1 z1 w1",
      2L -> "a b c p q r s t u z2")
    val got = clean(df, k = 4)
    // doc1: dup starts 0..2 cover positions 0..5 → the copied span goes
    assert(got(1L) == (("x1 y1 z1 w1", 10L, 6L)), got(1L).toString)
    // doc2: starts 3..5 cover 3..8
    assert(got(2L) == (("a b c z2", 10L, 6L)), got(2L).toString)
  }

  test("removeDupSpans: short docs pass through; full dup collapses to empty") {
    val df = corpus(
      1L -> "a b c",
      2L -> "d1 d2 d3 d4",
      3L -> "d1 d2 d3 d4")
    val got = clean(df, k = 4)
    assert(got(1L) == (("a b c", 3L, 0L)))
    assert(got(2L) == (("", 4L, 4L)))
    assert(got(3L) == (("", 4L, 4L)))
  }
}
