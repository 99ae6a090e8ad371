package graft.compile

import graft.SparkSpec
import graft.api.FormulaEvaluator
import graft.model.{Matrix, Vec}

/** r11 `interpolation=` on the quantile surface: pandas' five
  * order-statistic modes on `.rolling(n).quantile(q, ...)` (the sorted
  * ring emit) and the driver vector `.quantile(q, ...)`. All pinned
  * lists were produced by pandas 2.2.2 on the same inputs. The nearest
  * tie rule is IEEE rint (half to even): measured h=0.5 → index 0,
  * h=1.5 → index 2. */
class QuantileInterpSpec extends SparkSpec {

  private def series(vs: Double*): Matrix =
    mat3(vs.map(v => Seq(v)), labels = Seq("c0"))

  private def colOf(f: String, m: Matrix): Seq[Double] = {
    val ev = new FormulaEvaluator(reg("s" -> m))
    ev.evaluateFormula(f) match {
      case MatrixResult(df, rowId, labels, _) =>
        val byId = cells(df, rowId, labels)
        byId.keys.toSeq.sorted.map(i => byId(i)("c0"))
      case other => fail(s"expected matrix result, got $other")
    }
  }

  private def assertSeq(actual: Seq[Double], expected: Seq[Double],
                        tol: Double = 1e-9): Unit = {
    assert(actual.length == expected.length,
      s"length ${actual.length} vs ${expected.length}")
    actual.zip(expected).zipWithIndex.foreach { case ((a, e), i) =>
      if (e.isNaN) assert(a.isNaN, s"row $i: expected NaN, got $a")
      else assert(math.abs(a - e) <= tol, s"row $i: expected $e, got $a")
    }
  }

  // pandas: s = Series([1, 2, NaN, 4, 5, 6])
  private lazy val s6 = series(1.0, 2.0, Double.NaN, 4.0, 5.0, 6.0)
  private val nan = Double.NaN

  test("rolling quantile: the five interpolations match pandas 2.2") {
    def f(it: String) =
      s"s.rolling(5, min_periods=2).quantile(0.6, interpolation='$it')"
    assertSeq(colOf(f("linear"), s6), Seq(nan, 1.6, 1.6, 2.4, 3.6, 4.8))
    assertSeq(colOf(f("lower"), s6), Seq(nan, 1, 1, 2, 2, 4))
    assertSeq(colOf(f("higher"), s6), Seq(nan, 2, 2, 4, 4, 5))
    assertSeq(colOf(f("nearest"), s6), Seq(nan, 2, 2, 2, 4, 5))
    assertSeq(colOf(f("midpoint"), s6), Seq(nan, 1.5, 1.5, 3, 3, 4.5))
  }

  test("nearest rounds a .5 fraction to the even index (pandas-measured)") {
    // pandas Series([1,2,3,4]).rolling(2).quantile(0.5, 'nearest'):
    // h = 0.5 in every full window → the LOWER (even) index
    val s4 = series(1.0, 2.0, 3.0, 4.0)
    assertSeq(colOf("s.rolling(2).quantile(0.5, interpolation='nearest')", s4),
      Seq(nan, 1, 2, 3))
    // pandas Series([1,2,3,4,5]).rolling(4).quantile(0.5, 'nearest'):
    // h = 1.5 → index 2 (even again — half to even, not half up)
    val s5 = series(1.0, 2.0, 3.0, 4.0, 5.0)
    assertSeq(colOf("s.rolling(4).quantile(0.5, interpolation='nearest')", s5),
      Seq(nan, nan, nan, 3, 4))
  }

  test("center=1 composes with interpolation") {
    // pandas s.rolling(3, center=True).quantile(0.6, 'higher'):
    // [nan, nan, nan, nan, 6, nan]
    assertSeq(
      colOf("s.rolling(3, center=1).quantile(0.6, interpolation='higher')", s6),
      Seq(nan, nan, nan, nan, 6, nan))
  }

  test("vector .quantile(q, interpolation=) computes all five modes") {
    // pandas Series([3,1,NaN,2,5,4]).quantile(0.3, it)
    val v = Vec(IndexedSeq(3.0, 1.0, Double.NaN, 2.0, 5.0, 4.0),
      (0 until 6).map(i => s"l$i"))
    val ev = new FormulaEvaluator(reg("v" -> v))
    def run(it: String): Double =
      ev.evaluateFormula(s"v.quantile(0.3, interpolation='$it')") match {
        case ScalarResult(x) => x
        case other           => fail(s"expected scalar, got $other")
      }
    assert(math.abs(run("linear") - 2.2) < 1e-12)
    assert(run("lower") == 2.0)
    assert(run("higher") == 3.0)
    assert(run("nearest") == 2.0)
    assert(run("midpoint") == 2.5)
  }

  test("distributed reduction .quantile(q, interpolation=) computes all " +
      "five modes via the rank-selection plan (r11 session 4)") {
    // pandas Series([1,2,NaN,4,5,6]).quantile(0.6, it): valid sorted
    // [1,2,4,5,6], h = 0.6·4 = 2.4 → lo=4, hi=5, frac=0.4
    val ev = new FormulaEvaluator(reg("s" -> s6))
    def run(it: String): Double =
      ev.evaluateFormula(s"s.quantile(0.6, interpolation='$it')") match {
        case RowResult(df, labels) =>
          val r = df.collect().head; r.getDouble(r.fieldIndex(labels.head))
        case other => fail(s"expected row result, got $other")
      }
    assert(math.abs(run("linear") - 4.4) < 1e-12)
    assert(run("lower") == 4.0)
    assert(run("higher") == 5.0)
    assert(run("nearest") == 4.0) // rint(2.4) = 2 → the lower statistic
    assert(run("midpoint") == 4.5)
    // frac == 0 lands on the element itself in every mode (h = 2.0)
    assert(run("higher") == 5.0 && {
      val at = ev.evaluateFormula("s.quantile(0.5, interpolation='higher')")
      val RowResult(df, labels) = at: @unchecked
      val r = df.collect().head
      r.getDouble(r.fieldIndex(labels.head)) == 4.0
    })
    // duplicate-heavy column: counts collapse to one (value, count) row
    // per distinct value; pandas Series([1,1,1,2,2]).quantile(0.6,
    // 'nearest'): h = 2.4 → rint 2 → 1
    val dup = series(1.0, 1.0, 1.0, 2.0, 2.0)
    val ev2 = new FormulaEvaluator(reg("s" -> dup))
    val RowResult(df2, l2) =
      ev2.evaluateFormula("s.quantile(0.6, interpolation='nearest')"): @unchecked
    val r2 = df2.collect().head
    assert(r2.getDouble(r2.fieldIndex(l2.head)) == 1.0)
  }

  test("list form .quantile([...]) builds the q-indexed stat frame " +
      "(linear: one percentile-array pass; modes: per-q rank selection)") {
    // pandas s6.quantile([0.25, 0.75]): valid sorted [1,2,4,5,6] →
    // linear h=1.0→2, h=3.0→5; 'lower' at [0.3, 0.9]: h=1.2→2, h=3.6→5
    val ev = new FormulaEvaluator(reg("s" -> s6))
    def frame(f: String): Map[Double, Double] =
      ev.evaluateFormula(f) match {
        case MatrixResult(df, rowId, labels, _) =>
          df.collect().map(r => r.getDouble(r.fieldIndex(rowId)) ->
            r.getDouble(r.fieldIndex(labels.head))).toMap
        case other => fail(s"expected matrix result, got $other")
      }
    val lin = frame("s.quantile([0.25, 0.75])")
    assert(lin == Map(0.25 -> 2.0, 0.75 -> 5.0))
    val low = frame("s.quantile([0.3, 0.9], interpolation='lower')")
    assert(low == Map(0.3 -> 2.0, 0.9 -> 5.0))
    // vector list form → a Series indexed by q
    val v = Vec(IndexedSeq(1.0, 2.0, 4.0, 5.0, 6.0),
      (0 until 5).map(i => s"l$i"))
    val ev2 = new FormulaEvaluator(reg("v" -> v))
    val VecResult(out) =
      ev2.evaluateFormula("v.quantile([0.25, 0.75])"): @unchecked
    assert(out.labels == Seq("0.25", "0.75"))
    assert(out.values == Seq(2.0, 5.0))
    // empty list rejects
    intercept[FormulaTypeException](ev.evaluateFormula("s.quantile([])"))
  }

  test("above the distinct budget the order-statistic reduction hands " +
      "off to the KLL sketch (the groupedPercentile fallback)") {
    // values 1..40; q = 0.999 discriminates the two selection rules:
    // exact 'lower' = sorted[⌊0.999·39⌋] = sorted[38] = 39, the sketch's
    // rank selection = smallest value at cumulative weight ≥
    // ceil(0.999·40) = 40 → 40 (n ≤ capacity, so the sketch itself is
    // exact — only the DEFINITION differs, as documented on
    // groupedPercentileApprox)
    val m = series((1 to 40).map(_.toDouble): _*)
    val ev = new FormulaEvaluator(reg("s" -> m), fillInvalid = false)
    def lower(): Double = {
      val RowResult(df, labels) = ev.evaluateFormula(
        "s.quantile(0.999, interpolation='lower')"): @unchecked
      val r = df.collect().head
      r.getDouble(r.fieldIndex(labels.head))
    }
    spark.conf.set("graft.percentile.approxAboveDistinct", "10")
    try assert(lower() == 40.0)
    finally spark.conf.unset("graft.percentile.approxAboveDistinct")
    assert(lower() == 39.0)
    // a budget ABOVE the distinct count stays on the exact path
    spark.conf.set("graft.percentile.approxAboveDistinct", "1000")
    try assert(lower() == 39.0)
    finally spark.conf.unset("graft.percentile.approxAboveDistinct")
  }

  test("clean errors: unknown interpolation, bad kwarg shape") {
    val ev = new FormulaEvaluator(reg("s" -> s6))
    val e1 = intercept[FormulaTypeException](ev.evaluateFormula(
      "s.rolling(3).quantile(0.5, interpolation='cubic')"))
    assert(e1.getMessage.contains("Interpolation 'cubic'"))
    // explicit linear is accepted on the reduction (no throw, same shape)
    assert(ev.evaluateFormula("s.quantile(0.5, interpolation='linear')")
      .getClass == ev.evaluateFormula("s.quantile(0.5)").getClass)
    // interpolation must be a string
    intercept[FormulaTypeException](ev.evaluateFormula(
      "s.rolling(3).quantile(0.5, interpolation=1)"))
  }
}
