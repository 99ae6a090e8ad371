package graft.compile

import graft.SparkSpec
import graft.api.FormulaEvaluator
import graft.model.{Matrix, Vec}

/** r11 clip kwargs/one-sided bounds and replace list forms — the pandas
  * signatures the string/list literals unlock. */
class ClipReplaceSpec extends SparkSpec {

  private def series(vs: Double*): Matrix =
    mat3(vs.map(v => Seq(v)), labels = Seq("c0"))

  private def colOf(f: String, m: Matrix): Seq[Double] = {
    val ev = new FormulaEvaluator(reg("s" -> m), fillInvalid = false)
    val MatrixResult(df, rowId, labels, _) =
      ev.evaluateFormula(f): @unchecked
    val byId = cells(df, rowId, labels)
    byId.keys.toSeq.sorted.map(i => byId(i)("c0"))
  }

  private val s5 = series(-2.0, 0.5, Double.NaN, 3.0, 9.0)

  test("clip: one-sided positional, keyword, both, none; NaN passes") {
    def check(f: String, exp: Seq[Double]): Unit =
      colOf(f, s5).zip(exp).foreach { case (a, e) =>
        if (e.isNaN) assert(a.isNaN) else assert(a == e, s"$f: $a vs $e") }
    val nan = Double.NaN
    check("s.clip(0)", Seq(0, 0.5, nan, 3, 9))
    check("s.clip(lower=0)", Seq(0, 0.5, nan, 3, 9))
    check("s.clip(upper=1)", Seq(-2, 0.5, nan, 1, 1))
    check("s.clip(0, 1)", Seq(0, 0.5, nan, 1, 1))
    check("s.clip(lower=0, upper=1)", Seq(0, 0.5, nan, 1, 1))
    check("s.clip(0, upper=1)", Seq(0, 0.5, nan, 1, 1))
    check("s.clip()", Seq(-2, 0.5, nan, 3, 9))
    // double-given bound: pandas' multiple-values TypeError
    val ev = new FormulaEvaluator(reg("s" -> s5))
    val e = intercept[FormulaTypeException](
      ev.evaluateFormula("s.clip(0, lower=1)"))
    assert(e.getMessage.contains("multiple values"))
  }

  test("clip vector path mirrors") {
    val v = Vec(IndexedSeq(-2.0, 0.5, 3.0), IndexedSeq("a", "b", "c"))
    val ev = new FormulaEvaluator(reg("v" -> v))
    val VecResult(out) = ev.evaluateFormula("v.clip(upper=1)"): @unchecked
    assert(out.values == Seq(-2.0, 0.5, 1.0))
  }

  test("replace: list->list is simultaneous (original values only), " +
      "list->scalar, length mismatch rejects") {
    // pandas s.replace([1, 2], [2, 3]): original 1s -> 2 (NOT then -> 3)
    val m = series(1.0, 2.0, 3.0)
    assert(colOf("s.replace([1, 2], [2, 3])", m) == Seq(2.0, 3.0, 3.0))
    assert(colOf("s.replace([1, 3], 0)", m) == Seq(0.0, 2.0, 0.0))
    // scalar form unchanged
    assert(colOf("s.replace(2, 9)", m) == Seq(1.0, 9.0, 3.0))
    val ev = new FormulaEvaluator(reg("s" -> m))
    val e = intercept[FormulaTypeException](
      ev.evaluateFormula("s.replace([1, 2], [3])"))
    assert(e.getMessage.contains("match in length"))
    // vector twin
    val v = Vec(IndexedSeq(1.0, 2.0, 3.0), IndexedSeq("a", "b", "c"))
    val ev2 = new FormulaEvaluator(reg("v" -> v))
    val VecResult(out) =
      ev2.evaluateFormula("v.replace([1, 2], [2, 3])"): @unchecked
    assert(out.values == Seq(2.0, 3.0, 3.0))
  }
}
