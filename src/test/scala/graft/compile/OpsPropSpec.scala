package graft.compile

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property tests for the numpy/python-semantics Ops layer in EXACTLY the
  * zones the DuckDB oracle queries avoid by design (SURVEY determinism
  * rules): division by zero, negative-operand `%` and `//`, and NaN-laden
  * comparisons. Reference semantics are implemented in plain Scala below
  * (python's float rules), and each property materializes a batch of
  * random operand pairs into ONE DataFrame so a whole ScalaCheck case is
  * one Spark job. */
object OpsPropSpec extends Properties("Ops") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10) // 10 cases × 200 operand pairs each

  private lazy val spark = graft.SparkSpec.spark

  private val genOperand: Gen[Double] = Gen.frequency(
    6 -> Gen.choose(-1e3, 1e3),
    2 -> Gen.oneOf(0.0, -0.0, 1.0, -1.0, 2.5, -2.5),
    1 -> Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity),
    1 -> Gen.oneOf(1e-300, -1e-300, 1e300, -1e300))

  private val genPairs: Gen[List[(Double, Double)]] =
    Gen.listOfN(200, Gen.zip(genOperand, genOperand))

  // ---- python/numpy float reference semantics (driver-side truth) --------

  private def pyDiv(a: Double, b: Double): Double =
    if (b == 0.0 && !a.isNaN && !b.isNaN) {
      if (a.isNaN || a == 0.0) Double.NaN
      else if (a > 0.0) Double.PositiveInfinity
      else Double.NegativeInfinity
    } else a / b

  private def pyMod(a: Double, b: Double): Double =
    if (b == 0.0 || a.isNaN || b.isNaN) Double.NaN
    else ((a % b) + b) % b

  private def pyFloorDiv(a: Double, b: Double): Double = {
    val d = pyDiv(a, b)
    if (d.isNaN || d.isInfinite) d else math.floor(d)
  }

  private def runBatch(pairs: List[(Double, Double)],
                       op: (org.apache.spark.sql.Column,
                            org.apache.spark.sql.Column) => org.apache.spark.sql.Column)
      : Array[Double] = {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      pairs.zipWithIndex.map { case ((a, b), i) => Row(i.toLong, a, b) }.asJava,
      StructType(Seq(StructField("i", LongType),
        StructField("a", DoubleType), StructField("b", DoubleType))))
    df.select(col("i"), op(col("a"), col("b")).as("v"))
      .collect().sortBy(_.getLong(0))
      .map(r => if (r.isNullAt(1)) Double.NaN else r.getDouble(1))
  }

  private def sameCell(x: Double, y: Double): Boolean =
    (x.isNaN && y.isNaN) || x == y

  private def check(pairs: List[(Double, Double)],
                    op: (org.apache.spark.sql.Column,
                         org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
                    ref: (Double, Double) => Double): Prop = {
    val got = runBatch(pairs, op)
    val bad = pairs.zipWithIndex.collect {
      case ((a, b), i) if !sameCell(got(i), ref(a, b)) =>
        s"($a, $b) -> ${got(i)} want ${ref(a, b)}"
    }
    Prop(bad.isEmpty) :| bad.take(3).mkString("; ")
  }

  property("div: IEEE x/0 -> ±Inf, 0/0 -> NaN (zone the oracle avoids)") =
    Prop.forAll(genPairs)(pairs => check(pairs, Ops.div, pyDiv))

  property("mod: python sign-of-divisor semantics incl. negatives") =
    Prop.forAll(genPairs) { pairs =>
      // keep Inf out: python fmod of infinities raises; the engine contract
      // is the finite domain (reference tests never touch Inf % x)
      val finite = pairs.map { case (a, b) =>
        (if (a.isInfinite) 1.0 else a, if (b.isInfinite) 1.0 else b)
      }
      check(finite, Ops.mod, pyMod)
    }

  property("floorDiv: floor of IEEE division incl. negatives and zeros") =
    Prop.forAll(genPairs)(pairs => check(pairs, Ops.floorDiv, pyFloorDiv))

  property("comparisons: NaN compares false, except != which is true") =
    Prop.forAll(genPairs) { pairs =>
      def b2d(x: Boolean): Double = if (x) 1.0 else 0.0
      val cases: Seq[((org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
          org.apache.spark.sql.Column, (Double, Double) => Double)] = Seq(
        (Ops.gt, (a, b) => b2d(!a.isNaN && !b.isNaN && a > b)),
        (Ops.leq, (a, b) => b2d(!a.isNaN && !b.isNaN && a <= b)),
        (Ops.eq, (a, b) => b2d(!a.isNaN && !b.isNaN && a == b)),
        (Ops.neq, (a, b) => b2d(a.isNaN || b.isNaN || a != b)))
      cases.map { case (op, ref) =>
        check(pairs, (l, r) => op(l, r).cast("double"), ref)
      }.reduce(_ && _)
    }
}
