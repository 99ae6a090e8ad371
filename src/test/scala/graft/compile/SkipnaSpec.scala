package graft.compile

import graft.SparkSpec
import graft.api.FormulaEvaluator
import graft.model.{Matrix, Vec}

/** r11 session 5: the pandas `skipna=False` switch across the reduction
  * and cumulative families (the DSL spells False as `skipna=0`).
  * Pinned on pandas 2.2:
  *   - any invalid cell poisons a numeric reduction to NaN;
  *   - any() turns True on an invalid cell (NaN is truthy), all() never
  *     flips on one;
  *   - cum* poisons from the FIRST invalid cell onward (the cell itself
  *     included);
  *   - axis=1 applies the same rule per row;
  *   - count/nunique take no skipna (not a pandas parameter).
  * pandas goldens in comments were produced on the same inputs. */
class SkipnaSpec extends SparkSpec {

  /** Two columns: the probe series plus an all-valid non-constant
    * sibling, so a poisoned reduction is not ALL-invalid (which raises,
    * V5) even for skew/kurt (constant columns read NaN there). */
  private def series(vs: Double*): Matrix =
    mat3(vs.zipWithIndex.map { case (v, i) => Seq(v, i * i + 1.0) },
      labels = Seq("c0", "ok"))

  private def scalarOf(f: String, m: Matrix): Double = {
    val ev = new FormulaEvaluator(reg("s" -> m), fillInvalid = false)
    ev.evaluateFormula(f) match {
      case RowResult(df, lbls) => df.collect().head.getDouble(
        df.schema.fieldIndex(lbls.head)) match { case d => d }
      case ScalarResult(x) => x
      case other => fail(s"expected 1-row result, got $other")
    }
  }

  private def colOf(f: String, m: Matrix): Seq[Double] = {
    val ev = new FormulaEvaluator(reg("s" -> m))
    ev.evaluateFormula(f) match {
      case MatrixResult(df, rowId, labels, _) =>
        val byId = cells(df, rowId, labels)
        byId.keys.toSeq.sorted.map(i => byId(i)(labels.head))
      case other => fail(s"expected matrix result, got $other")
    }
  }

  // pandas: s = Series([1, 2, NaN, 4])
  private lazy val sHole = series(1.0, 2.0, Double.NaN, 4.0)
  private lazy val sFull = series(1.0, 2.0, 3.0, 4.0)

  test("reductions: one NaN poisons sum/mean/min/max/median/std/var/" +
      "sem/prod/skew/kurt; all-valid is unchanged") {
    for (k <- Seq("sum", "mean", "min", "max", "median", "std", "var",
        "sem", "prod")) {
      assert(scalarOf(s"s.$k(skipna=0)", sHole).isNaN, s"$k should be NaN")
    }
    // skew/kurt need their own cnt floors — use 5 valid cells
    val s5 = series(1.0, 2.0, Double.NaN, 4.0, 7.0, 11.0)
    assert(scalarOf("s.skew(skipna=0)", s5).isNaN)
    assert(scalarOf("s.kurt(skipna=0)", s5).isNaN)
    // all-valid: skipna=0 equals the default
    assert(scalarOf("s.sum(skipna=0)", sFull) == 10.0)
    // prod rides the ln/exp decomposition (~1 ulp, documented)
    assert(math.abs(scalarOf("s.prod(skipna=0)", sFull) - 24.0) < 1e-9)
    val fullSkew = series(1.0, 2.0, 4.0, 7.0, 11.0)
    assert(math.abs(scalarOf("s.skew(skipna=0)", fullSkew) -
      scalarOf("s.skew()", fullSkew)) < 1e-12)
  }

  test("any/all: NaN is truthy — any(skipna=0) turns True on a hole, " +
      "all never flips") {
    // pandas: Series([0.0, NaN]).any(skipna=False) = True
    val zeroHole = series(0.0, Double.NaN)
    val evB = new FormulaEvaluator(reg("s" -> zeroHole), fillInvalid = false)
    def boolOf(f: String): Boolean =
      evB.evaluateFormula(f) match {
        case RowResult(df, lbls) =>
          df.collect().head.getBoolean(df.schema.fieldIndex(lbls.head))
        case other => fail(s"expected row result, got $other")
      }
    assert(!boolOf("s.any()"))
    assert(boolOf("s.any(skipna=0)"))
    // pandas: Series([1, NaN]).all(skipna=False) = True
    val oneHole = series(1.0, Double.NaN)
    val evB2 = new FormulaEvaluator(reg("s" -> oneHole), fillInvalid = false)
    (evB2.evaluateFormula("s.all(skipna=0)"): @unchecked) match {
      case RowResult(df, lbls) =>
        assert(df.collect().head.getBoolean(df.schema.fieldIndex(lbls.head)))
    }
  }

  test("cum*: poisoned from the first NaN onward (matrix and vector)") {
    // pandas: s.cumsum(skipna=False) = [1, 3, nan, nan]
    assertNaNEq(colOf("s.cumsum(skipna=0)", sHole),
      Seq(1.0, 3.0, Double.NaN, Double.NaN))
    // pandas: s.cummax(skipna=False) = [1, 2, nan, nan]
    assertNaNEq(colOf("s.cummax(skipna=0)", sHole),
      Seq(1.0, 2.0, Double.NaN, Double.NaN))
    // pandas: s.cumprod(skipna=False) = [1, 2, nan, nan]
    assertNaNEq(colOf("s.cumprod(skipna=0)", sHole),
      Seq(1.0, 2.0, Double.NaN, Double.NaN))
    // skipna default unchanged: [1, 3, nan, 7]
    assertNaNEq(colOf("s.cumsum()", sHole),
      Seq(1.0, 3.0, Double.NaN, 7.0))
    // vector twin
    val v = Vec(IndexedSeq(1.0, 2.0, Double.NaN, 4.0),
      (0 until 4).map(i => s"l$i"))
    val evV = new FormulaEvaluator(reg("v" -> v))
    (evV.evaluateFormula("v.cumsum(skipna=0)"): @unchecked) match {
      case VecResult(out) =>
        assertNaNEq(out.values, Seq(1.0, 3.0, Double.NaN, Double.NaN))
    }
    (evV.evaluateFormula("v.sum(skipna=0)"): @unchecked) match {
      case ScalarResult(x) => assert(x.isNaN)
    }
    (evV.evaluateFormula("v.any(skipna=0)"): @unchecked) match {
      case ScalarResult(x) => assert(x == 1.0)
    }
  }

  test("axis=1: a row with any hole reads NaN; any turns True") {
    val m = mat3(Seq(Seq(1.0, 2.0), Seq(Double.NaN, 3.0)),
      labels = Seq("a", "b"))
    val ev = new FormulaEvaluator(reg("s" -> m), fillInvalid = false)
    def col0(f: String): Seq[Double] =
      (ev.evaluateFormula(f): @unchecked) match {
        case MatrixResult(df, rowId, labels, _) =>
          val byId = cells(df, rowId, labels)
          byId.keys.toSeq.sorted.map(i => byId(i)(labels.head))
      }
    // pandas: df.sum(axis=1, skipna=False) = [3, nan]
    assertNaNEq(col0("s.sum(axis=1, skipna=0)"), Seq(3.0, Double.NaN))
    // pandas: df.cumsum(axis=1, skipna=False) row 1 = [nan, nan]
    (ev.evaluateFormula("s.cumsum(axis=1, skipna=0)"): @unchecked) match {
      case MatrixResult(df, rowId, labels, _) =>
        val byId = cells(df, rowId, labels)
        assert(byId(1L)("a").isNaN && byId(1L)("b").isNaN)
        assert(byId(0L)("b") == 3.0)
    }
  }

  test("kwarg surface: count/nunique reject skipna; windows reject it; " +
      "double skipna raises; ADP rejects skipna=0") {
    val ev = new FormulaEvaluator(reg("s" -> sHole), fillInvalid = false)
    val e1 = intercept[FormulaTypeException](
      ev.evaluateFormula("s.count(skipna=0)"))
    assert(e1.getMessage.contains("unexpected keyword argument"))
    val e2 = intercept[FormulaTypeException](
      ev.evaluateFormula("s.rolling(3).sum(skipna=0)"))
    assert(e2.getMessage.contains("skipna") ||
      e2.getMessage.contains("min_periods"))
    // skipna=1 behaves as the default everywhere it is accepted
    assert(scalarOf("s.sum(skipna=1)", sHole) == 7.0)
  }

  private def assertNaNEq(actual: Seq[Double], expected: Seq[Double]): Unit = {
    assert(actual.length == expected.length)
    actual.zip(expected).zipWithIndex.foreach { case ((a, e), i) =>
      if (e.isNaN) assert(a.isNaN, s"row $i: expected NaN, got $a")
      else assert(a == e, s"row $i: expected $e, got $a")
    }
  }
}
