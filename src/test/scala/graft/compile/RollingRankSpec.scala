package graft.compile

import graft.SparkSpec
import graft.api.FormulaEvaluator
import graft.model.Matrix

/** r11 `.rolling(n).rank(...)`: the current cell's rank among the
  * window's valid cells on the fused ring emit — pandas rolling.rank
  * (method average/min/max, ascending, pct). Pinned lists are pandas
  * 2.2 on the same inputs; the distributed fused path and the
  * sequential driver twin are both exercised. */
class RollingRankSpec extends SparkSpec {

  private def series(vs: Double*): Matrix =
    mat3(vs.map(v => Seq(v)), labels = Seq("c0"))

  private def colOf(f: String, m: Matrix): Seq[Double] = {
    val ev = new FormulaEvaluator(reg("s" -> m), fillInvalid = false)
    val MatrixResult(df, rowId, labels, _) =
      ev.evaluateFormula(f): @unchecked
    val byId = cells(df, rowId, labels)
    byId.keys.toSeq.sorted.map(i => byId(i)("c0"))
  }

  private def chk(got: Seq[Double], exp: Seq[Double]): Unit =
    got.zip(exp).zipWithIndex.foreach { case ((a, e), i) =>
      if (e.isNaN) assert(a.isNaN, s"row $i: expected NaN, got $a")
      else assert(a == e, s"row $i: expected $e, got $a") }

  private val nan = Double.NaN

  test("rolling rank: default average with NaN holes and min_periods") {
    // pandas Series([3,1,NaN,3,2]).rolling(3, min_periods=2).rank():
    // [NaN, 1, NaN, 2, 1]
    chk(colOf("s.rolling(3, min_periods=2).rank()", series(3, 1, nan, 3, 2)),
      Seq(nan, 1, nan, 2, 1))
  }

  test("rolling rank: methods, ascending=0, pct on tie windows") {
    val t = series(2, 2, 2)
    chk(colOf("s.rolling(3, min_periods=1).rank()", t), Seq(1, 1.5, 2))
    chk(colOf("s.rolling(3, min_periods=1).rank(method='min')", t),
      Seq(1, 1, 1))
    chk(colOf("s.rolling(3, min_periods=1).rank(method='max')", t),
      Seq(1, 2, 3))
    chk(colOf("s.rolling(3, min_periods=1).rank(pct=1)", t),
      Seq(1, 0.75, 2.0 / 3))
    // pandas Series([1,2,3]).rolling(2).rank(ascending=False): [NaN,1,1]
    chk(colOf("s.rolling(2).rank(ascending=0)", series(1, 2, 3)),
      Seq(nan, 1, 1))
    // n=1 window: every valid cell ranks 1
    chk(colOf("s.rolling(1).rank()", series(5, nan, 7)), Seq(1, nan, 1))
  }

  test("center composes; dense/first reject with the pandas pointer") {
    // center shifts the trailing result by (n−1)/2 (the shared centered
    // contract, pandas-pinned on the mean family): result at i = rank
    // of the value at i+1 within [i−1, i+1]; full windows only →
    // [NaN, 2, 3, NaN] on [1,3,2,4]
    chk(colOf("s.rolling(3, center=1).rank()",
      series(1, 3, 2, 4)), Seq(nan, 2, 3, nan))
    val ev = new FormulaEvaluator(reg("s" -> series(1, 2)))
    val e = intercept[FormulaTypeException](
      ev.evaluateFormula("s.rolling(2).rank(method='dense')"))
    assert(e.getMessage.contains("'average', 'min', 'max'"))
  }
}
