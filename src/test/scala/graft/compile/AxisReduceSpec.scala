package graft.compile

import graft.SparkSpec
import graft.api.FormulaEvaluator
import graft.model.{Matrix, Vec}

/** r11 axis=1 (row-wise) reductions: pure per-row projections producing
  * the one-column Series frame (label "0"). Expected values are pandas
  * 2.2 on the same frame: rows (1,2), (4,2), (NaN,8). */
class AxisReduceSpec extends SparkSpec {

  private def m2: Matrix =
    mat3(Seq(Seq(1.0, 2.0), Seq(4.0, 2.0), Seq(Double.NaN, 8.0)),
      labels = Seq("c0", "c1"))

  private def colVals(f: String): Seq[Double] = {
    val ev = new FormulaEvaluator(reg("s" -> m2), fillInvalid = false)
    ev.evaluateFormula(f) match {
      case MatrixResult(df, rowId, labels, _) =>
        assert(labels == Seq("0"))
        val byId = cells(df, rowId, labels)
        byId.keys.toSeq.sorted.map(i => byId(i)("0"))
      case other => fail(s"expected matrix result, got $other")
    }
  }

  private def assertSeq(actual: Seq[Double], expected: Seq[Double]): Unit =
    actual.zip(expected).zipWithIndex.foreach { case ((a, e), i) =>
      if (e.isNaN) assert(a.isNaN, s"row $i: expected NaN, got $a")
      else assert(math.abs(a - e) < 1e-12, s"row $i: expected $e, got $a")
    }

  test("row-wise sum/mean/count/min/max/prod with skipna") {
    assertSeq(colVals("s.sum(axis=1)"), Seq(3.0, 6.0, 8.0))
    assertSeq(colVals("s.sum(1)"), Seq(3.0, 6.0, 8.0)) // positional axis
    assertSeq(colVals("s.mean(axis=1)"), Seq(1.5, 3.0, 8.0))
    assertSeq(colVals("s.count(axis=1)"), Seq(2.0, 2.0, 1.0))
    assertSeq(colVals("s.min(axis=1)"), Seq(1.0, 2.0, 8.0))
    assertSeq(colVals("s.max(axis=1)"), Seq(2.0, 4.0, 8.0))
    assertSeq(colVals("s.prod(axis=1)"), Seq(2.0, 8.0, 8.0))
  }

  test("row-wise std/var/sem/median/nunique; single-valid rows -> NaN " +
      "for the ddof-1 family") {
    assertSeq(colVals("s.std(axis=1)"),
      Seq(math.sqrt(0.5), math.sqrt(2.0), Double.NaN))
    assertSeq(colVals("s.var(axis=1)"), Seq(0.5, 2.0, Double.NaN))
    assertSeq(colVals("s.sem(axis=1)"),
      Seq(math.sqrt(0.5 / 2), math.sqrt(2.0 / 2), Double.NaN))
    assertSeq(colVals("s.median(axis=1)"), Seq(1.5, 3.0, 8.0))
    assertSeq(colVals("s.nunique(axis=1)"), Seq(2.0, 2.0, 1.0))
  }

  test("row-wise any/all are boolean frames with skipna truthiness") {
    val ev = new FormulaEvaluator(reg("s" -> mat3(
      Seq(Seq(0.0, 0.0), Seq(1.0, 0.0), Seq(Double.NaN, Double.NaN)),
      labels = Seq("c0", "c1"))), fillInvalid = false)
    val MatrixResult(df, rowId, labels, isBool) =
      ev.evaluateFormula("s.any(axis=1)"): @unchecked
    assert(isBool && labels == Seq("0"))
    val got = df.orderBy(rowId).collect().map(_.getBoolean(1)).toSeq
    // pandas: [False, True, False] (all-NaN row -> vacuous False)
    assert(got == Seq(false, true, false))
    val MatrixResult(df2, _, _, _) =
      ev.evaluateFormula("s.all(axis=1)"): @unchecked
    // pandas: [False, False, True] (all-NaN row -> vacuous True)
    assert(df2.orderBy(rowId).collect().map(_.getBoolean(1)).toSeq ==
      Seq(false, false, true))
  }

  test("rank(axis=1): every method as a row-wise projection (pandas " +
      "2.2 pinned on rows (1,2),(4,2),(NaN,8) and a tie row)") {
    // tie row matrix: (2, 2, 5) over three columns
    val mt = mat3(Seq(Seq(2.0, 2.0, 5.0)), labels = Seq("c0", "c1", "c2"))
    val ev = new FormulaEvaluator(reg("s" -> m2, "t" -> mt),
      fillInvalid = false)
    def row(f: String, reg: String = "s"): Seq[Seq[Double]] = {
      val MatrixResult(df, rowId, labels, _) =
        ev.evaluateFormula(f): @unchecked
      val byId = cells(df, rowId, labels)
      byId.keys.toSeq.sorted.map(i => labels.map(l => byId(i)(l)))
    }
    def chk(got: Seq[Seq[Double]], exp: Seq[Seq[Double]]): Unit =
      got.flatten.zip(exp.flatten).foreach { case (a, e) =>
        if (e.isNaN) assert(a.isNaN) else assert(a == e, s"$a vs $e") }
    val nan = Double.NaN
    chk(row("s.rank(axis=1)"), Seq(Seq(1, 2), Seq(2, 1), Seq(nan, 1)))
    chk(row("s.rank(axis=1, ascending=0)"),
      Seq(Seq(2, 1), Seq(1, 2), Seq(nan, 1)))
    // tie row (2,2,5): average (1.5,1.5,3), min (1,1,3), max (2,2,3),
    // first (1,2,3), dense (1,1,2), pct avg (0.5,0.5,1)
    chk(row("t.rank(axis=1)"), Seq(Seq(1.5, 1.5, 3)))
    chk(row("t.rank(axis=1, method='min')"), Seq(Seq(1, 1, 3)))
    chk(row("t.rank(axis=1, method='max')"), Seq(Seq(2, 2, 3)))
    chk(row("t.rank(axis=1, method='first')"), Seq(Seq(1, 2, 3)))
    chk(row("t.rank(axis=1, method='dense')"), Seq(Seq(1, 1, 2)))
    chk(row("t.rank(axis=1, pct=1)"), Seq(Seq(0.5, 0.5, 1)))
    chk(row("t.rank(axis=1, method='dense', pct=1)"),
      Seq(Seq(0.5, 0.5, 1)))
  }

  test("axis=1 composes as a frame; axis errors are clean") {
    // the Series result is an ordinary one-column frame: arithmetic works
    assertSeq(colVals("s.sum(axis=1) * 2"), Seq(6.0, 12.0, 16.0))
    val ev = new FormulaEvaluator(reg("s" -> m2,
      "v" -> Vec(IndexedSeq(1.0, 2.0), IndexedSeq("a", "b"))))
    intercept[FormulaTypeException](ev.evaluateFormula("v.sum(axis=1)"))
    intercept[FormulaTypeException](ev.evaluateFormula("s.sum(axis=2)"))
    // axis=0 stays the columnwise reduction
    val RowResult(df, _) = ev.evaluateFormula("s.sum(axis=0)"): @unchecked
    assert(df.collect().head.getDouble(0) == 5.0)
  }
}
