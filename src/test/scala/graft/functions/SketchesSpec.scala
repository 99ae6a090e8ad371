package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** KMV min-k sketch: exactness below k, min-k selection above k,
  * duplicate-blindness, and partition-independence (merge correctness). */
class SketchesSpec extends SparkSpec {

  import spark.implicits._

  private def mink(values: Seq[Long], k: Int, parts: Int): Seq[Long] =
    values.toDF("h").repartition(parts)
      .agg(Sketches.kmin_values(col("h"), k).as("m"))
      .collect().head.getSeq[Long](0)

  test("below k: returns ALL distinct values sorted — exact distinct count") {
    val vs = Seq(42L, 7L, 13L, 7L, 42L, 99L)
    assert(mink(vs, 10, 3) == Seq(7L, 13L, 42L, 99L))
  }

  test("above k: exactly the k smallest distinct values, ascending") {
    val vs = (1000L to 1L by -1L) ++ (1L to 500L) // duplicates of the low half
    assert(mink(vs, 8, 5) == (1L to 8L))
  }

  test("partition-independent: same sketch at 1, 3, 17 partitions") {
    val vs = (0 until 5000).map(i => (i * 2654435761L) % 100000L)
    val sketches = Seq(1, 3, 17).map(p => mink(vs, 64, p))
    assert(sketches.distinct.size == 1)
    assert(sketches.head == vs.distinct.sorted.take(64))
  }

  test("estimator sanity: (k-1)/u within 20% of truth on a uniform domain") {
    // 20k distinct hashed values via the portable hash
    val df = (0 until 20000).map(i => s"v$i").toDF("s")
      .select(ArrayOps.md5_long60(col("s")).as("h"))
    val mins = df.agg(Sketches.kmin_values(col("h"), 1024).as("m"))
      .collect().head.getSeq[Long](0)
    val est = 1023.0 * math.pow(2, 60) / mins.last.toDouble
    assert(math.abs(est - 20000.0) / 20000.0 < 0.2, s"est=$est")
  }
}
