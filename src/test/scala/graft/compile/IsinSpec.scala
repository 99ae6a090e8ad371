package graft.compile

import graft.SparkSpec
import graft.api.FormulaEvaluator
import graft.model.{Matrix, Vec}

/** r11 list literals + `.isin([...])`: the pandas membership test as a
  * compiled In() per cell (boolean frame, NaN/hole cells False — the
  * comparison encoding), the vector 1/0 twin, and the list-literal
  * parse/misuse rules. */
class IsinSpec extends SparkSpec {

  private def series(vs: Double*): Matrix =
    mat3(vs.map(v => Seq(v)), labels = Seq("c0"))

  test("matrix isin: pandas membership with NaN -> False") {
    val m = series(1.0, 2.0, Double.NaN, 5.0, 25.0, 7.0)
    val ev = new FormulaEvaluator(reg("s" -> m), fillInvalid = false)
    val MatrixResult(df, rowId, labels, isBool) =
      ev.evaluateFormula("s.isin([1, 5, 25])"): @unchecked
    assert(isBool)
    val got = df.orderBy(rowId).collect().map(_.getBoolean(1)).toSeq
    // pandas Series([1,2,NaN,5,25,7]).isin([1,5,25]):
    // [True, False, False, True, True, False]
    assert(got == Seq(true, false, false, true, true, false))
    // empty list: everything False (pandas)
    val MatrixResult(df2, _, _, _) =
      ev.evaluateFormula("s.isin([])"): @unchecked
    assert(df2.orderBy(rowId).collect().forall(!_.getBoolean(1)))
    // expressions inside the list fold to scalars
    val MatrixResult(df3, _, _, _) =
      ev.evaluateFormula("s.isin([0.5 * 2, 30 - 5])"): @unchecked
    assert(df3.orderBy(rowId).collect().map(_.getBoolean(1)).toSeq ==
      Seq(true, false, false, false, true, false))
  }

  test("vector isin mirrors with the 1/0 encoding") {
    val v = Vec(IndexedSeq(1.0, 2.0, Double.NaN, 5.0),
      (0 until 4).map(i => s"l$i"))
    val ev = new FormulaEvaluator(reg("v" -> v))
    val VecResult(out) =
      ev.evaluateFormula("v.isin([1, 5])"): @unchecked
    assert(out.values == Seq(1.0, 0.0, 0.0, 1.0))
  }

  test("list-literal misuse is a clean error") {
    val ev = new FormulaEvaluator(reg("s" -> series(1.0, 2.0)))
    // a list is not an arithmetic operand / formula result
    intercept[FormulaTypeException](ev.evaluateFormula("[1, 2]"))
    intercept[FormulaTypeException](ev.evaluateFormula("s + [1, 2]"))
    // non-scalar elements reject
    val e = intercept[FormulaTypeException](
      ev.evaluateFormula("s.isin([s])"))
    assert(e.getMessage.contains("scalar"))
    // isin without a list rejects
    intercept[FormulaTypeException](ev.evaluateFormula("s.isin(1)"))
    // unterminated list is a syntax error
    intercept[graft.ast.FormulaSyntaxException](
      ev.evaluateFormula("s.isin([1, 2)"))
  }
}
