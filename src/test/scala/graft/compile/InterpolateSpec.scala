package graft.compile

import graft.SparkSpec
import graft.api.FormulaEvaluator
import graft.model.{Matrix, Vec}

/** r11 `.interpolate()`: pandas method='linear' — holes blend their
  * nearest valid neighbors by POSITION (rows equally spaced); leading
  * runs stay NaN, trailing runs carry forward (limit_direction default).
  * All pinned lists are pandas 2.2 on the same inputs. */
class InterpolateSpec extends SparkSpec {

  private def series(vs: Double*): Matrix =
    mat3(vs.map(v => Seq(v)), labels = Seq("c0"))

  private def run(vs: Double*): Seq[Double] = {
    val ev = new FormulaEvaluator(reg("s" -> series(vs: _*)),
      fillInvalid = false)
    val MatrixResult(df, rowId, labels, _) =
      ev.evaluateFormula("s.interpolate()"): @unchecked
    val byId = cells(df, rowId, labels)
    byId.keys.toSeq.sorted.map(i => byId(i)("c0"))
  }

  private def chk(got: Seq[Double], exp: Seq[Double]): Unit =
    got.zip(exp).zipWithIndex.foreach { case ((a, e), i) =>
      if (e.isNaN) assert(a.isNaN, s"row $i: expected NaN, got $a")
      else assert(math.abs(a - e) < 1e-12, s"row $i: expected $e, got $a") }

  private val nan = Double.NaN

  test("interior holes blend by position; multi-hole runs space evenly") {
    // pandas Series([1, NaN, 3, NaN]).interpolate() -> [1, 2, 3, 3]
    chk(run(1, nan, 3, nan), Seq(1, 2, 3, 3))
    // pandas Series([1, NaN, NaN, 4]).interpolate() -> [1, 2, 3, 4]
    chk(run(1, nan, nan, 4), Seq(1, 2, 3, 4))
    // uneven values: [10, NaN, NaN, 1] -> [10, 7, 4, 1]
    chk(run(10, nan, nan, 1), Seq(10, 7, 4, 1))
  }

  test("leading holes stay NaN; trailing holes carry forward; all-NaN " +
      "stays NaN") {
    chk(run(nan, nan, 2, nan, 6, nan), Seq(nan, nan, 2, 4, 6, 6))
    chk(run(5), Seq(5))
    // an all-NaN column interpolates to all-NaN, which the validator's
    // V5 all-invalid contract turns into the documented clean error
    intercept[graft.validate.AllInvalidResultException](run(nan, nan, nan))
  }

  test("vector twin mirrors") {
    val v = Vec(IndexedSeq(1.0, nan, 3.0, nan),
      (0 until 4).map(i => s"l$i"))
    val ev = new FormulaEvaluator(reg("v" -> v))
    val VecResult(out) = ev.evaluateFormula("v.interpolate()"): @unchecked
    chk(out.values, Seq(1, 2, 3, 3))
  }
}
