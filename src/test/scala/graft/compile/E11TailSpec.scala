package graft.compile

import graft.SparkSpec
import graft.api.FormulaEvaluator
import graft.model.{NamedData, Vec}

/** r9 session-2 E11 long tail: pct_change, ffill/bfill, isna/notna,
  * where/mask, replace, duplicated, head/tail, mode, and the method-form
  * comparisons — pandas semantics on both the distributed (matrix) and
  * driver (vector) paths, plus the mode-restriction errors.
  *
  * Fixture columns (FIXTURES.md §A):
  *   fixA: c0=(1,4,1)  c1=(7,4,7)   c2=(6,8,2)
  *   fixI: c0=(7,9,7)  c1=(NaN,5,8) c2=(1,9,NaN)
  */
class E11TailSpec extends SparkSpec {

  private def matCells(f: String, extra: (String, NamedData)*)
      : Map[Long, Map[String, Double]] = {
    val ev = new FormulaEvaluator(
      reg(Seq("a" -> fixA, "b" -> fixB, "i" -> fixI) ++ extra: _*))
    ev.evaluateFormula(f) match {
      case MatrixResult(df, rowId, labels, _) => cells(df, rowId, labels)
      case other => fail(s"expected matrix result, got $other")
    }
  }

  private def vecOf(f: String, v: Vec): Seq[Double] = {
    val ev = new FormulaEvaluator(reg("v" -> v))
    ev.evaluateFormula(f) match {
      case VecResult(out) => out.values
      case other => fail(s"expected vector result, got $other")
    }
  }

  // ---- pct_change ---------------------------------------------------------

  test("pct_change: v/shift(1) - 1, fill_method=None, NaN edges and holes") {
    val m = matCells("i.pct_change()")
    assertCell(m(0)("c0"), Double.NaN) // leading edge
    assertCell(m(1)("c0"), 9.0 / 7.0 - 1.0)
    assertCell(m(2)("c0"), 7.0 / 9.0 - 1.0)
    assertCell(m(1)("c1"), Double.NaN) // donor is a hole -> NaN (no pad)
    assertCell(m(2)("c1"), 8.0 / 5.0 - 1.0)
    assertCell(m(1)("c2"), 8.0)        // 9/1 - 1
    assertCell(m(2)("c2"), Double.NaN) // current cell is a hole
  }

  test("pct_change(n) and the vector path; zero period rejected") {
    val m = matCells("a.pct_change(2)")
    assertCell(m(0)("c0"), Double.NaN)
    assertCell(m(1)("c0"), Double.NaN)
    assertCell(m(2)("c0"), 1.0 / 1.0 - 1.0)
    val v = vecOf("v.pct_change()", Vec(IndexedSeq(2.0, 3.0, 6.0),
      IndexedSeq("x", "y", "z")))
    assert(v(0).isNaN); assertCell(v(1), 0.5); assertCell(v(2), 1.0)
    val ev = new FormulaEvaluator(reg("a" -> fixA))
    assertThrows[FormulaTypeException](ev.evaluateFormula("a.pct_change(0)"))
  }

  // ---- ffill / bfill ------------------------------------------------------

  test("ffill carries the nearest earlier valid value; leading run stays NaN") {
    val m = matCells("i.ffill()")
    assertCell(m(0)("c1"), Double.NaN) // nothing before the hole
    assertCell(m(1)("c1"), 5.0)
    assertCell(m(2)("c1"), 8.0)
    assertCell(m(2)("c2"), 9.0)        // filled from row 1
    assertCell(m(0)("c0"), 7.0)        // valid cells untouched
  }

  test("bfill carries the nearest later valid value; trailing run stays NaN") {
    val m = matCells("i.bfill()")
    assertCell(m(0)("c1"), 5.0)        // filled from row 1
    assertCell(m(2)("c2"), Double.NaN) // nothing after the hole
    assertCell(m(0)("c2"), 1.0)
  }

  test("ffill/bfill vector path") {
    val v = Vec(IndexedSeq(Double.NaN, 2.0, Double.NaN, 5.0, Double.NaN),
      IndexedSeq("a", "b", "c", "d", "e"))
    val f = vecOf("v.ffill()", v)
    assert(f(0).isNaN); assert(f == f) // structure sanity
    assert(f.drop(1) == Seq(2.0, 2.0, 5.0, 5.0))
    val b = vecOf("v.bfill()", v)
    assert(b.take(4) == Seq(2.0, 2.0, 5.0, 5.0) && b(4).isNaN)
  }

  // ---- isna / notna -------------------------------------------------------

  test("isna/notna mark holes; boolean frames have no holes") {
    val m = matCells("i.isna()")
    assert(m(0)("c1") == 1.0 && m(1)("c1") == 0.0 && m(2)("c2") == 1.0)
    val n = matCells("i.notna()")
    assert(n(0)("c1") == 0.0 && n(1)("c1") == 1.0 && n(2)("c2") == 0.0)
    val bool = matCells("(i > 3).isna()") // comparison output: never NA
    assert(bool.values.flatMap(_.values).forall(_ == 0.0))
  }

  // ---- where / mask -------------------------------------------------------

  test("where keeps cond-true cells, mask replaces them") {
    val w = matCells("a.where(a > 3, 0)")
    assert(w(0)("c0") == 0.0 && w(1)("c0") == 4.0 && w(2)("c0") == 0.0)
    assert(w(0)("c1") == 7.0 && w(0)("c2") == 6.0)
    val mk = matCells("a.mask(a > 3, 0)")
    assert(mk(0)("c0") == 1.0 && mk(1)("c0") == 0.0)
    assert(mk(0)("c1") == 0.0 && mk(2)("c2") == 2.0)
  }

  test("where: default other is the invalid cell; NaN cond counts as False") {
    val w = matCells("a.where(a > 3)")
    assertCell(w(0)("c0"), Double.NaN)
    assertCell(w(1)("c0"), 4.0)
    // fixI c1 row0 is NaN: NaN > 3 is False in pandas -> replaced
    val iw = matCells("i.where(i > 3, 0)")
    assert(iw(0)("c1") == 0.0 && iw(1)("c1") == 5.0 && iw(2)("c1") == 8.0)
  }

  test("where with a matrix other; non-boolean cond rejected") {
    val w = matCells("a.where(a > 3, b)")
    // c0: cond (F,T,F), b.c0 = (1,3,4) -> (1,4,4)
    assert(w(0)("c0") == 1.0 && w(1)("c0") == 4.0 && w(2)("c0") == 4.0)
    val ev = new FormulaEvaluator(reg("a" -> fixA, "b" -> fixB))
    assertThrows[FormulaTypeException](ev.evaluateFormula("a.where(b, 0)"))
  }

  // ---- replace ------------------------------------------------------------

  test("replace: exact scalar equality, holes untouched") {
    val r = matCells("a.replace(7, 70)")
    assert(r(0)("c1") == 70.0 && r(1)("c1") == 4.0 && r(2)("c1") == 70.0)
    val ri = matCells("i.replace(9, 90)")
    assert(ri(1)("c0") == 90.0 && ri(0)("c0") == 7.0)
    assertCell(ri(0)("c1"), Double.NaN)
  }

  // ---- duplicated ---------------------------------------------------------

  test("duplicated: first occurrence wins; NaN tuples compare equal") {
    val dup = mat3(Seq(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0),
      Seq(4.0, 2.0, 3.0)))
    val d = matCells("x.duplicated()", "x" -> dup)
    assert(d(0)("dup") == 0.0 && d(1)("dup") == 1.0 && d(2)("dup") == 0.0)
    val nan = mat3(Seq(Seq(Double.NaN, 2.0, 3.0), Seq(Double.NaN, 2.0, 3.0),
      Seq(Double.NaN, 9.0, 3.0)))
    val dn = matCells("x.duplicated()", "x" -> nan)
    assert(dn(0)("dup") == 0.0 && dn(1)("dup") == 1.0 && dn(2)("dup") == 0.0)
  }

  // ---- head / tail --------------------------------------------------------

  test("head/tail: row-id-order subsets; negative n rejected") {
    val h = matCells("a.head(2)")
    assert(h.keySet == Set(0L, 1L) && h(1)("c2") == 8.0)
    val t = matCells("a.tail(2)")
    assert(t.keySet == Set(1L, 2L) && t(2)("c2") == 2.0)
    assert(matCells("a.head(0)").isEmpty)
    val ev = new FormulaEvaluator(reg("a" -> fixA))
    assertThrows[FormulaTypeException](ev.evaluateFormula("a.head(-1)"))
  }

  test("head/tail vector path") {
    val v = Vec(IndexedSeq(1.0, 2.0, 3.0), IndexedSeq("x", "y", "z"))
    assert(vecOf("v.head(2)", v) == Seq(1.0, 2.0))
    assert(vecOf("v.tail(2)", v) == Seq(2.0, 3.0))
  }

  // ---- mode ---------------------------------------------------------------

  test("mode: most-frequent values ascending with 0-based rank ids") {
    val one = mat3(Seq(Seq(2.0), Seq(2.0), Seq(1.0)), labels = Seq("v"))
    val m = matCells("x.mode()", "x" -> one)
    assert(m.keySet == Set(0L) && m(0)("v") == 2.0)
    // all-tie: every value is a mode, sorted ascending
    val tie = mat3(Seq(Seq(3.0), Seq(1.0), Seq(2.0)), labels = Seq("v"))
    val mt = matCells("x.mode()", "x" -> tie)
    assert(mt(0)("v") == 1.0 && mt(1)("v") == 2.0 && mt(2)("v") == 3.0)
    // multi-column frames are rejected with a usable pointer
    val ev = new FormulaEvaluator(reg("a" -> fixA))
    assertThrows[FormulaTypeException](ev.evaluateFormula("a.mode()"))
  }

  // ---- method-form comparisons -------------------------------------------

  test("method-form comparisons match the operator spellings") {
    val le = matCells("a.le(b)")
    val op = matCells("a <= b")
    assert(le == op)
    val gt = matCells("a.gt(4)")
    assert(gt(0)("c1") == 1.0 && gt(1)("c0") == 0.0)
    val ne = matCells("a.ne(b)")
    assert(ne == matCells("a != b"))
  }

  // ---- rolling / expanding ------------------------------------------------

  test("rolling(n).mean/.sum: default min_periods — a hole anywhere in " +
      "the window yields NaN") {
    // fixI columns: c0=(7,9,7) c1=(NaN,5,8) c2=(1,9,NaN)
    val rm = matCells("i.rolling(2).mean()")
    assertCell(rm(0)("c0"), Double.NaN) // window not yet full
    assertCell(rm(1)("c0"), 8.0)
    assertCell(rm(2)("c0"), 8.0)
    assertCell(rm(1)("c1"), Double.NaN) // NaN inside the window
    assertCell(rm(2)("c1"), 6.5)
    assertCell(rm(2)("c2"), Double.NaN)
    val rs = matCells("a.rolling(2).sum()")
    assertCell(rs(0)("c0"), Double.NaN)
    assertCell(rs(1)("c0"), 5.0)
    assertCell(rs(2)("c0"), 5.0)
  }

  test("expanding().mean/.sum: skipna with min_periods=1") {
    val em = matCells("i.expanding().mean()")
    assertCell(em(0)("c1"), Double.NaN) // nothing seen yet
    assertCell(em(1)("c1"), 5.0)
    assertCell(em(2)("c1"), 6.5)
    assertCell(em(2)("c2"), 5.0) // (1+9)/2, hole skipped
    val es = matCells("i.expanding().sum()")
    assertCell(es(2)("c1"), 13.0)
    assertCell(es(2)("c2"), 10.0)
  }

  test("rolling/expanding vector paths and error surface") {
    val v = Vec(IndexedSeq(1.0, Double.NaN, 3.0, 5.0),
      IndexedSeq("a", "b", "c", "d"))
    val rm = vecOf("v.rolling(2).mean()", v)
    assert(rm(0).isNaN && rm(1).isNaN && rm(2).isNaN && rm(3) == 4.0)
    val es = vecOf("v.expanding().sum()", v)
    assert(es == Seq(1.0, 1.0, 4.0, 9.0))
    val ev = new FormulaEvaluator(reg("a" -> fixA))
    // unaggregated window marker escaping to the top level
    val e1 = intercept[FormulaTypeException](ev.evaluateFormula("a.rolling(2)"))
    assert(e1.getMessage.contains("must be aggregated"))
    // r12: the expanding median JOINED the family (running rank
    // selection over running value counts — RollingFamilySpec holds the
    // semantics); the catch-all error now covers a still-unsupported
    // expanding member instead
    assert(ev.evaluateFormula("a.expanding().median()")
      .isInstanceOf[MatrixResult])
    val e2 = intercept[FormulaTypeException](
      ev.evaluateFormula("a.expanding().skew()"))
    assert(e2.getMessage.contains("median"))
    assertThrows[FormulaTypeException](ev.evaluateFormula("a.rolling(0).mean()"))
    val adp = new FormulaEvaluator(reg("a" -> fixA), adpEnabled = true)
    assertThrows[AdpUnsupportedException](
      adp.evaluateFormula("a.rolling(2).mean()"))
  }

  // ---- ADP restrictions ---------------------------------------------------

  test("ADP mode rejects the float-semantics members cleanly") {
    val ev = new FormulaEvaluator(reg("a" -> fixA), adpEnabled = true)
    assertThrows[AdpUnsupportedException](ev.evaluateFormula("a.duplicated()"))
    assertThrows[AdpUnsupportedException](ev.evaluateFormula("a.head(2)"))
    assertThrows[AdpUnsupportedException](ev.evaluateFormula("a.mode()"))
  }
}
