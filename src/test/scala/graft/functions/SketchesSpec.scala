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

  test("KMV set operations track exact cross-source overlap (agg_setsk)") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.SparkEntry.queries("agg_setsk")(spark, sf).head()
    val estUnion = r.getAs[Double]("est_union")
    val estJac = r.getAs[Double]("est_jaccard")
    val estInter = r.getAs[Double]("est_inter")
    // exact truth: distinct shingle sets per source, collected (sf0.001
    // has ~1.3k shingles per source — test-only driver work)
    val sets = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"), explode(graft.functions.ArrayOps
        .word_shingles(split(col("text"), " "), 3)).as("sh"))
      .distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSet)
    val a = sets("src0"); val b = sets("src1")
    val trueUnion = (a ++ b).size.toDouble
    val trueJac = (a & b).size.toDouble / trueUnion
    // k=512 over a ~2.5k union: stderr ≈ 1/√512 ≈ 4.4%; 15% is generous
    assert(math.abs(estUnion - trueUnion) / trueUnion < 0.15,
      s"union: est $estUnion vs true $trueUnion")
    assert(math.abs(estJac - trueJac) < 0.1,
      s"jaccard: est $estJac vs true $trueJac")
    assert(math.abs(estInter - trueJac * trueUnion) <
      0.25 * trueUnion, s"inter: est $estInter vs true ${trueJac * trueUnion}")
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

  // ---- KLL quantile sketch -------------------------------------------------

  /** Total weight held by the sketch: Σ_ℓ |level ℓ| · 2^ℓ. Must equal the
    * number of values ever added — compaction conserves weight. */
  private def kllWeight(s: KllQuantiles.Sketch): Long = {
    var total = 0L
    var l = 0
    while (l < s.levels.length) { total += s.levels(l).length.toLong << l; l += 1 }
    total
  }

  test("kll exact regime: <= capacity values -> exact sorted-rank quantiles") {
    val s = new KllQuantiles.Sketch(64)
    val vs = Seq(9.0, 1.0, 5.0, 3.0, 7.0, 2.0, 8.0, 4.0, 6.0, 10.0)
    vs.foreach(s.add)
    val sorted = vs.sorted
    val qs = s.quantiles(Seq(0.1, 0.5, 0.9, 1.0))
    // smallest value whose cumulative weight reaches ceil(p·n)
    assert(qs.toSeq == Seq(0.1, 0.5, 0.9, 1.0).map(p =>
      sorted(math.ceil(p * vs.size).toInt - 1)))
  }

  test("kll compaction conserves total weight, incl. odd-length keep-even " +
      "compactions from merged partial sketches") {
    // partial sketches of coprime odd sizes force odd-length buffers at
    // every merge; before the fix, keep-even parity promoted the unpaired
    // element at doubled weight, inflating the total
    val rng = new scala.util.Random(42)
    val partials = Seq(13, 29, 31, 97, 101, 211, 503).map { n =>
      val s = new KllQuantiles.Sketch(8)
      (0 until n).foreach(_ => s.add(rng.nextDouble()))
      s
    }
    val total = partials.map(kllWeight)
    assert(total == Seq(13L, 29L, 31L, 97L, 101L, 211L, 503L))
    val merged = new KllQuantiles.Sketch(8)
    partials.foreach(merged.mergeFrom)
    assert(kllWeight(merged) == total.sum,
      s"weight ${kllWeight(merged)} != added ${total.sum}")
  }

  test("kll capacity bound holds at every level after merge (cascade " +
      "compacts higher levels, not just until the first under-capacity one)") {
    val rng = new scala.util.Random(7)
    val merged = new KllQuantiles.Sketch(8)
    (0 until 40).foreach { _ =>
      val s = new KllQuantiles.Sketch(8)
      (0 until 100).foreach(_ => s.add(rng.nextDouble()))
      merged.mergeFrom(s)
      merged.levels.zipWithIndex.foreach { case (b, l) =>
        assert(b.length < 8, s"level $l holds ${b.length} >= capacity 8")
      }
    }
    assert(kllWeight(merged) == 4000L)
  }

  test("kll rank error within 2·H/capacity of exact on a merged stream") {
    val rng = new scala.util.Random(1234)
    val data = Array.fill(10000)(rng.nextDouble() * 1000.0)
    val merged = new KllQuantiles.Sketch(64)
    data.grouped(1437).foreach { chunk =>           // uneven partials
      val s = new KllQuantiles.Sketch(64)
      chunk.foreach(s.add)
      merged.mergeFrom(s)
    }
    assert(kllWeight(merged) == data.length.toLong)
    val sorted = data.sorted
    val h = merged.levels.length
    val bound = 2.0 * h / 64.0
    Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99).foreach { p =>
      val est = merged.quantiles(Seq(p)).head
      // true rank of the estimate (fraction of values <= est)
      val rank = sorted.count(_ <= est).toDouble / data.length
      assert(math.abs(rank - p) <= bound,
        s"p=$p est=$est rank=$rank err=${math.abs(rank - p)} > $bound (H=$h)")
    }
  }

  test("kll serde round-trip preserves levels, parity, and quantiles") {
    val rng = new scala.util.Random(99)
    val s = new KllQuantiles.Sketch(16)
    (0 until 777).foreach(_ => s.add(rng.nextDouble()))
    val back = KllQuantiles.Sketch.fromBytes(s.toBytes)
    assert(back.capacity == s.capacity)
    assert(back.levels.map(_.toSeq) == s.levels.map(_.toSeq))
    assert(back.parity.toSeq == s.parity.toSeq)
    val ps = Seq(0.1, 0.5, 0.9)
    assert(back.quantiles(ps).toSeq == s.quantiles(ps).toSeq)
  }

  test("kll partition-count robustness: agg_qsk-style exact regime is " +
      "partition-independent through the Spark aggregate") {
    val vs = (1 to 200).map(_.toDouble)
    val results = Seq(1, 3, 17).map { p =>
      vs.toDF("v").repartition(p)
        .agg(Sketches.kll_quantiles(col("v"), 256, Seq(0.25, 0.5, 0.95)).as("q"))
        .collect().head.getSeq[Double](0)
    }
    assert(results.distinct.size == 1)
    assert(results.head == Seq(50.0, 100.0, 190.0))
  }
}
