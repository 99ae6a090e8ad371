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
