package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Property tests for the round-6 wave operators against brute-force
  * driver references over randomized fixtures: Hilbert curve invariants,
  * weighted priority sampling, token-budget selection, connected
  * components, and collocation lifts. */
object CurationPropSpec extends Properties("Curation") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.SparkSpec.spark
  import scala.jdk.CollectionConverters._

  // driver mirror of HilbertIndex2D.compute (full-grid rotation variant)
  private def hilbertRef(bits: Int, bx: Long, by: Long): Long = {
    val n1 = (1L << bits) - 1
    var x = bx; var y = by; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = n1 - x; y = n1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  property("hilbert: bijective + unit-step adjacent for bits in [1,5]") =
    Prop.forAll(Gen.choose(1, 5)) { bits =>
      val n = 1 << bits
      val byD = (for (x <- 0 until n; y <- 0 until n)
        yield hilbertRef(bits, x, y) -> (x, y)).toMap
      val bij = byD.keySet == (0L until n.toLong * n).toSet
      val adj = (0L until n.toLong * n - 1).forall { d =>
        val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
        math.abs(x1 - x2) + math.abs(y1 - y2) == 1
      }
      bij && adj
    }

  private val idWeightSchema = StructType(Seq(
    StructField("id", LongType), StructField("w", DoubleType)))

  property("weightedPriority = driver top-n of hash/weight keys") =
    Prop.forAll(Gen.choose(5, 60), Gen.choose(1, 20)) { (rows, n) =>
      val data = (1L to rows.toLong).map(i => (i, (i % 5 + 1).toDouble))
      val df = spark.createDataFrame(
        data.map { case (i, w) => Row(i, w) }.asJava, idWeightSchema)
      val got = Sampling.weightedPriority(df, "id", "w", n)
        .collect().map(_.getLong(0)).toSeq
      // driver reference: recompute the hash via the engine (1 job), then
      // select and order on the driver
      val keys = df.select(col("id"),
          Sampling.hashUniform(col("id")) / col("w"))
        .collect().map(r => (r.getDouble(1), r.getLong(0)))
      val want = keys.sortBy(identity).take(n).map(_._2).toSeq
      got == want
    }

  private val idTokSchema = StructType(Seq(
    StructField("id", LongType), StructField("tok", LongType)))

  property("tokenBudget = driver greedy prefix") =
    Prop.forAll(Gen.choose(1, 40), Gen.choose(1L, 200L)) { (rows, budget) =>
      val data = (1L to rows.toLong).map(i => (i, i % 13 + 1))
      val df = spark.createDataFrame(
        data.map { case (i, t) => Row(i, t) }.asJava, idTokSchema)
      val got = Sampling.tokenBudget(df, col("id"), "tok", budget)
        .orderBy(col("id")).collect()
        .map(r => (r.getLong(0), r.getAs[Long]("cum_tokens"))).toSeq
      var cum = 0L
      val want = data.flatMap { case (i, t) =>
        cum += t; if (cum <= budget) Some((i, cum)) else None
      }
      // greedy prefix: stop at the first overflow
      val firstOver = data.map(_._2).scanLeft(0L)(_ + _).tail
        .indexWhere(_ > budget)
      val wantCut = if (firstOver < 0) want else want.take(firstOver)
      got == wantCut
    }

  private val edgeSchema = StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType)))

  property("labelPropagation = driver synchronous LPA with min-label ties") =
    Prop.forAll(
      Gen.listOf(Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L))),
      Gen.choose(1, 3)) { (edges0, iters) =>
      val edges = edges0.filter { case (a, b) => a != b }
      edges.nonEmpty ==> {
        val df = spark.createDataFrame(
          edges.map { case (a, b) => Row(a, b) }.asJava, edgeSchema)
        val got = Graph.labelPropagation(df, iters).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        // driver reference: symmetric simple adjacency, synchronous rounds
        val adj = (edges.map(e => (e._1, e._2)) ++ edges.map(e => (e._2, e._1)))
          .distinct.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        var lbl = adj.keys.map(v => v -> v).toMap
        for (_ <- 1 to iters) {
          lbl = adj.map { case (v, nbrs) =>
            val counts = nbrs.map(lbl).groupBy(identity).view.mapValues(_.size)
            v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
          }
        }
        got == lbl
      }
    }

  property("bpeMerges = driver greedy non-overlapping fusion") =
    Prop.forAll(
      Gen.choose(1, 6).flatMap(n => Gen.listOfN(n,
        Gen.choose(1, 10).flatMap(m => Gen.listOfN(m,
          Gen.oneOf("a", "b", "c"))))),
      Gen.choose(1, 3)) { (corpus, rounds) =>
      val docSchema = StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType)))
      val df = spark.createDataFrame(
        corpus.zipWithIndex.map { case (ws, i) =>
          Row(i.toLong, ws.mkString(" ")) }.asJava, docSchema)
      val got = TextAnalysis.bpeMerges(df, rounds).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toList
      // driver reference on token lists
      var docs = corpus
      var want = List.empty[(Int, String, String, Long)]
      var r = 1
      var done = false
      while (r <= rounds && !done) {
        val pairs = docs.flatMap(ws => ws.zip(ws.drop(1)))
        if (pairs.isEmpty) done = true
        else {
          val counts = pairs.groupBy(identity).view.mapValues(_.size.toLong)
          val ((w1, w2), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
          want ::= ((r, w1, w2, c))
          // greedy left-to-right non-overlapping fusion
          docs = docs.map { ws =>
            val out = scala.collection.mutable.ListBuffer.empty[String]
            var i = 0
            while (i < ws.length) {
              if (i + 1 < ws.length && ws(i) == w1 && ws(i + 1) == w2) {
                out += s"${w1}_$w2"; i += 2
              } else { out += ws(i); i += 1 }
            }
            out.toList
          }
          r += 1
        }
      }
      got == want.reverse
    }

  property("connectedComponents = driver union-find, any driverMaxPairs") =
    Prop.forAll(
      Gen.listOf(Gen.zip(Gen.choose(0L, 12L), Gen.choose(0L, 12L))),
      Gen.oneOf(0L, 1000000L)) { (edges, cutoff) =>
      edges.nonEmpty ==> {
        val df = spark.createDataFrame(
          edges.map { case (a, b) => Row(a, b) }.asJava, edgeSchema)
        val got = Graph.connectedComponents(df, driverMaxPairs = cutoff)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // driver reference: union-find by min label
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        val verts = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
        val want = verts.map(v => v -> find(v)).toMap
        got == want
      }
    }
}
