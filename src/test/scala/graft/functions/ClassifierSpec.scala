package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec

/** Hashed linear classifier: feature counting, weight-table determinism,
  * hand-computed score parity, and the unigram-only mode. */
class ClassifierSpec extends SparkSpec {

  import spark.implicits._

  private def score(text: String, bigrams: Boolean = true): (Long, Long) = {
    val row = Seq(text).toDF("t")
      .select(Classifier
        .hashed_linear_score(split(col("t"), " "), 4096, "s1", bigrams).as("ls"))
      .select(col("ls.n_feats"), col("ls.milli")).collect().head
    (row.getLong(0), row.getLong(1))
  }

  // the expression's weight derivation, reproduced independently
  private def w(feature: String): Long = {
    val b = GraftHash.md5Long60(UTF8String.fromString("f:" + feature)) % 4096L
    GraftHash.md5Long60(UTF8String.fromString("s1:" + b)) % 2001L - 1000L
  }

  test("n_feats = unigrams + adjacent bigrams; milli = sum of hash weights") {
    val (n, m) = score("the cat sat")
    assert(n == 5L) // 3 unigrams + 2 bigrams
    assert(m == w("the") + w("cat") + w("sat") + w("the cat") + w("cat sat"))
  }

  test("unigram-only mode drops the bigram features") {
    val (n, m) = score("the cat sat", bigrams = false)
    assert(n == 3L)
    assert(m == w("the") + w("cat") + w("sat"))
  }

  test("single token: no bigram, one feature") {
    assert(score("hello") == ((1L, w("hello"))))
  }

  test("weights stay in the fixed-point range [-1000, 1000]") {
    // a spread of buckets via many distinct tokens
    val (n, m) = score((0 until 2000).map(i => s"tok$i").mkString(" "))
    assert(n == 3999L)
    assert(math.abs(m) <= n * 1000L)
  }

  test("deterministic across partitionings and runs") {
    val docs = (0 until 50).map(i => s"alpha beta$i gamma delta")
    val out = Seq(1, 7).map { p =>
      docs.toDF("t").repartition(p)
        .select(Classifier.hashed_linear_score(
          split(col("t"), " "), 4096, "s1").as("ls"))
        .agg(sum(col("ls.milli"))).collect().head.getLong(0)
    }
    assert(out.distinct.size == 1)
  }
}
