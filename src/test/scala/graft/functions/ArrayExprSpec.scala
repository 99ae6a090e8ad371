package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiled array expressions added in r8: the binary-quantization sign
  * pack and its Hamming arithmetic. */
class ArrayExprSpec extends SparkSpec {

  private def embDf(vals: Seq[Seq[Float]]) = {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("emb", ArrayType(FloatType))))
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          vals.zipWithIndex.map { case (v, i) => Row(i.toLong, v) }.toList)
          .asJava), schema)
  }

  test("sign_pack32 packs exactly the positive dimensions of each half") {
    // alternating +/−: bits 0,2,4,… of each half → 0x55555555
    val alt = (0 until 64).map(i => if (i % 2 == 0) 1.0f else -1.0f)
    // only dimension 63 positive → hi bit 31
    val last = (0 until 64).map(i => if (i == 63) 2.5f else -0.5f)
    // zeros are NOT positive (sign test is strictly > 0)
    val zeros = Seq.fill(64)(0.0f)
    val out = embDf(Seq(alt, last, zeros))
      .select(col("id"), ArrayOps.sign_pack32(col("emb"), 0).as("lo"),
        ArrayOps.sign_pack32(col("emb"), 1).as("hi"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(0L) == ((0x55555555L, 0x55555555L)))
    assert(out(1L) == ((0L, 0x80000000L)))
    assert(out(2L) == ((0L, 0L)))
  }

  test("hamming distance via xor + bit_count matches the sign disagreement") {
    val a = (0 until 64).map(i => if (i < 10) 1.0f else -1.0f)
    val b = (0 until 64).map(i => if (i < 7) 1.0f else -1.0f) // 3 sign flips
    val df = embDf(Seq(a, b))
      .select(ArrayOps.sign_pack32(col("emb"), 0).as("lo"),
        ArrayOps.sign_pack32(col("emb"), 1).as("hi"))
    val codes = df.collect()
    val ham = java.lang.Long.bitCount(codes(0).getLong(0) ^ codes(1).getLong(0)) +
      java.lang.Long.bitCount(codes(0).getLong(1) ^ codes(1).getLong(1))
    assert(ham == 3)
  }
}
