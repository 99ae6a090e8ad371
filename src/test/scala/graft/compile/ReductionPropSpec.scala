package graft.compile

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.api.FormulaEvaluator
import graft.model.{Matrix, NamedData, Vec}

/** Property tests for the r7 surface: the whole-frame reduction family and
  * matmul, against driver-side pandas/numpy reference semantics on random
  * NaN-laden matrices. Each case is a handful of 1-row Spark aggregates
  * over a 15×3 frame. */
object ReductionPropSpec extends Properties("Reductions") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = graft.SparkSpec.spark

  private val genCell: Gen[Double] = Gen.frequency(
    8 -> Gen.choose(-100.0, 100.0),
    1 -> Gen.const(Double.NaN),
    2 -> Gen.oneOf(0.0, 1.0, -1.0, 2.0))

  private val genRows: Gen[List[List[Double]]] =
    Gen.listOfN(15, Gen.listOfN(3, genCell))

  private def matrixOf(rows: List[List[Double]]): Matrix = {
    val labels = Seq("c0", "c1", "c2")
    val schema = StructType(StructField("__row_id__", LongType) +:
      labels.map(l => StructField(l, DoubleType)))
    val data = rows.zipWithIndex.map { case (r, i) => Row.fromSeq(i.toLong +: r) }
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava), schema)
    Matrix.of(df, "__row_id__", labels)
  }

  private def close(a: Double, b: Double, tol: Double = 1e-6): Boolean =
    (a.isNaN && b.isNaN) || a == b ||
      math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  // driver references (pandas skipna semantics)
  private def refReduce(kind: String, col: Seq[Double]): Double = {
    val ok = col.filter(!_.isNaN)
    kind match {
      case "sum"   => ok.sum
      case "prod"  => ok.product
      case "count" => ok.length.toDouble
      case _ if ok.isEmpty => Double.NaN
      case "mean" => ok.sum / ok.length
      case "min"  => ok.min
      case "max"  => ok.max
      case "var" =>
        if (ok.length < 2) Double.NaN
        else { val m = ok.sum / ok.length
          ok.map(x => (x - m) * (x - m)).sum / (ok.length - 1) }
      case "std" => math.sqrt(refReduce("var", col))
      case "median" => refQuantile(0.5, col)
    }
  }
  private def refQuantile(q: Double, col: Seq[Double]): Double = {
    val ok = col.filter(!_.isNaN).sorted
    if (ok.isEmpty) Double.NaN
    else {
      val pos = q * (ok.length - 1)
      val lo = pos.toInt; val hi = math.min(ok.length - 1, lo + 1)
      ok(lo) + (pos - lo) * (ok(hi) - ok(lo))
    }
  }

  private def rowVals(ev: FormulaEvaluator, f: String): Map[String, Double] =
    (ev.evaluateRaw(f): @unchecked) match {
      case RowResult(df, labels) =>
        val r = df.collect().head
        labels.map(l => l -> (r.get(r.fieldIndex(l)) match {
          case null => Double.NaN
          case d: Double => d
          case x => x.toString.toDouble
        })).toMap
    }

  property("reduction family matches the driver reference under NaN") =
    Prop.forAll(genRows) { rows =>
      val ev = new FormulaEvaluator(
        Map[String, NamedData]("m" -> matrixOf(rows)), fillInvalid = false)
      val cols = (0 until 3).map(c => rows.map(_(c)))
      Seq("sum", "mean", "min", "max", "count", "std", "var", "median",
        "prod").forall { k =>
        val got = rowVals(ev, s"m.$k()")
        (0 until 3).forall { c =>
          val want = refReduce(k, cols(c))
          val ok = close(got(s"c$c"), want,
            // prod multiplies up to 15 magnitudes; compare in relative
            // terms with a looser tolerance for the float-ordering kinds
            if (k == "prod" || k == "std" || k == "var") 1e-5 else 1e-9)
          if (!ok) println(s"$k c$c: got ${got(s"c$c")} want $want")
          ok
        }
      }
    }

  property("quantile(q) matches the driver interpolation") =
    Prop.forAll(genRows, Gen.choose(0.0, 1.0)) { (rows, q0) =>
      val q = math.rint(q0 * 100) / 100.0 // printable in a formula literal
      val ev = new FormulaEvaluator(
        Map[String, NamedData]("m" -> matrixOf(rows)), fillInvalid = false)
      val got = rowVals(ev, s"m.quantile($q)")
      val cols = (0 until 3).map(c => rows.map(_(c)))
      (0 until 3).forall(c => close(got(s"c$c"), refQuantile(q, cols(c)), 1e-9))
    }

  property("matmul(vector) is the per-row dot product") =
    Prop.forAll(genRows, Gen.listOfN(3, Gen.choose(-10.0, 10.0))) { (rows, v) =>
      val ev = new FormulaEvaluator(
        Map[String, NamedData]("m" -> matrixOf(rows),
          "v" -> Vec(v.toIndexedSeq, IndexedSeq("c0", "c1", "c2"))),
        fillInvalid = false)
      (ev.evaluateRaw("m.matmul(v)"): @unchecked) match {
        case MatrixResult(df, rowId, labels, _) =>
          val got = df.collect().map(r =>
            r.getLong(r.fieldIndex(rowId)) ->
              (r.get(r.fieldIndex(labels.head)) match {
                case null => Double.NaN; case d: Double => d
              })).toMap
          rows.zipWithIndex.forall { case (r, i) =>
            val want = r.zip(v).map { case (a, b) => a * b }.sum
            close(got(i.toLong), want, 1e-9)
          }
      }
    }
}
