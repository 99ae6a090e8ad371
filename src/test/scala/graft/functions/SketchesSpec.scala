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

  // ---- Count-Min sketch ----------------------------------------------------

  private val cmsParams = graft.operators.Dedup.uhParams(4)
  private val P = GraftHash.UhPrime

  /** Point estimate for a raw key from the flattened cell array. */
  private def cmsEstimate(cells: Seq[Long], width: Int, key: String): Long = {
    val h = GraftHash.md5Long60(
      org.apache.spark.unsafe.types.UTF8String.fromString("0:" + key)) % P
    cmsParams.zipWithIndex.map { case ((a, b), j) =>
      cells(j * width + (((a * h + b) % P) % width).toInt)
    }.min
  }

  private def cmsCells(keys: Seq[String], width: Int, parts: Int): Seq[Long] =
    keys.toDF("k").repartition(parts)
      .select((ArrayOps.md5_long60(concat(lit("0:"), col("k"))) % P).as("h"))
      .agg(Sketches.count_min(col("h"), width, cmsParams).as("cms"))
      .collect().head.getSeq[Long](0)

  test("cms: point estimates upper-bound true counts; exact on heavy keys " +
      "in a wide sketch; total mass preserved per row") {
    val keys = (0 until 2000).flatMap { i =>
      val k = s"key${i % 97}"                       // 97 distinct, skewed
      Seq.fill(if (i % 97 < 5) 4 else 1)(k)
    }
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cells = cmsCells(keys, width = 1024, parts = 7)
    // every row of the sketch holds the full stream mass
    (0 until 4).foreach { j =>
      assert(cells.slice(j * 1024, (j + 1) * 1024).sum == keys.size.toLong)
    }
    truth.foreach { case (k, c) =>
      val est = cmsEstimate(cells, 1024, k)
      assert(est >= c, s"$k: est $est < true $c")
      // 97 keys in 4 rows of 1024 cells: collisions in ALL 4 rows for one
      // key are (97/1024)^4 ≈ 8e-5 — this fixture has none
      assert(est == c, s"$k: est $est != true $c in the no-collision regime")
    }
  }

  test("cms: partition-independent (merge = elementwise add)") {
    val keys = (0 until 3000).map(i => s"k${i % 250}")
    val sketches = Seq(1, 3, 17).map(p => cmsCells(keys, 64, p))
    assert(sketches.distinct.size == 1)
  }
}
