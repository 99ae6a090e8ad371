package graft.compile

import graft.SparkSpec
import graft.api.FormulaEvaluator
import graft.model.{Matrix, Vec}

/** r11 session 4: describe(percentiles=[...]) and the axis=1 row-wise
  * cumulatives. Expected values are pandas 2.2. */
class DescribeCumAxisSpec extends SparkSpec {

  private def m2: Matrix =
    mat3(Seq(Seq(1.0, 2.0), Seq(4.0, 2.0), Seq(Double.NaN, 8.0)),
      labels = Seq("c0", "c1"))

  test("describe(percentiles=[...]): median always included, sorted, " +
      "deduped; pandas row labels") {
    val ev = new FormulaEvaluator(reg("s" -> m2), fillInvalid = false)
    val MatrixResult(df, rowId, labels, _) =
      ev.evaluateFormula("s.describe(percentiles=[0.9, 0.1])"): @unchecked
    val rows = df.collect().map(r =>
      r.getString(r.fieldIndex(rowId)) ->
        labels.map(l => r.getDouble(r.fieldIndex(l)))).toMap
    assert(rows.keySet ==
      Set("count", "mean", "std", "min", "10%", "50%", "90%", "max"))
    // c1 = [2, 2, 8]: 10% -> 2.0, 50% -> 2.0, 90% -> 6.8
    assert(rows("10%")(1) == 2.0)
    assert(rows("50%")(1) == 2.0)
    assert(math.abs(rows("90%")(1) - 6.8) < 1e-9)
    // fractional label
    val MatrixResult(df2, rid2, _, _) =
      ev.evaluateFormula("s.describe(percentiles=[0.125])"): @unchecked
    val ids = df2.collect().map(r => r.getString(r.fieldIndex(rid2))).toSet
    assert(ids.contains("12.5%") && ids.contains("50%"))
    // out-of-range percentile rejects
    val e = intercept[FormulaTypeException](
      ev.evaluateFormula("s.describe(percentiles=[1.5])"))
    assert(e.getMessage.contains("[0, 1]"))
  }

  test("vector describe(percentiles=[...])") {
    val v = Vec(IndexedSeq(1.0, 2.0, 3.0, 4.0),
      (0 until 4).map(i => s"l$i"))
    val ev = new FormulaEvaluator(reg("v" -> v))
    val VecResult(out) =
      ev.evaluateFormula("v.describe(percentiles=[0.1, 0.9])"): @unchecked
    assert(out.labels ==
      Seq("count", "mean", "std", "min", "10%", "50%", "90%", "max"))
    val byL = out.labels.zip(out.values).toMap
    assert(math.abs(byL("10%") - 1.3) < 1e-12)
    assert(byL("50%") == 2.5)
    assert(math.abs(byL("90%") - 3.7) < 1e-12)
  }

  test("cumsum/cummax/cummin/cumprod axis=1: row-wise fold, NaN cell " +
      "stays NaN without poisoning") {
    val ev = new FormulaEvaluator(reg("s" -> m2), fillInvalid = false)
    def rows(f: String): Seq[Seq[Double]] = {
      val MatrixResult(df, rowId, labels, _) =
        ev.evaluateFormula(f): @unchecked
      val byId = cells(df, rowId, labels)
      byId.keys.toSeq.sorted.map(i => labels.map(l => byId(i)(l)))
    }
    def chk(got: Seq[Seq[Double]], exp: Seq[Seq[Double]]): Unit =
      got.flatten.zip(exp.flatten).foreach { case (a, e) =>
        if (e.isNaN) assert(a.isNaN) else assert(a == e, s"$a vs $e") }
    val nan = Double.NaN
    chk(rows("s.cumsum(axis=1)"), Seq(Seq(1, 3), Seq(4, 6), Seq(nan, 8)))
    chk(rows("s.cummax(axis=1)"), Seq(Seq(1, 2), Seq(4, 4), Seq(nan, 8)))
    chk(rows("s.cummin(axis=1)"), Seq(Seq(1, 1), Seq(4, 2), Seq(nan, 8)))
    chk(rows("s.cumprod(axis=1)"), Seq(Seq(1, 2), Seq(4, 8), Seq(nan, 8)))
  }
}
