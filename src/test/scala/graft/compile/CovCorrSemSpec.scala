package graft.compile

import graft.SparkSpec
import graft.api.FormulaEvaluator
import graft.model.{Matrix, Vec}

/** r11 session 5: the pairwise moving covariance/correlation family
  * (`.rolling(n).cov/.corr(other)`, `.expanding().cov/.corr(other)`) and
  * the window standard error (`.rolling/.expanding().sem()`).
  *
  * Pandas 2.2 semantics, pinned empirically before implementation:
  *   - both inputs are masked to each window's PAIRWISE-complete cells
  *     (both valid); all moments — corr's denominator variances
  *     included — run over the pairs;
  *   - the gate is the valid-PAIR count >= min_periods (a window with
  *     3 valid x, 3 valid y but 2 pairs emits NaN at min_periods=3);
  *   - cov of a 1-pair window is NaN (ddof=1); corr of a zero-variance
  *     window is NaN (0/0); cov of one is 0.0;
  *   - sem = std(ddof=1)/sqrt(count − ddof) — the WINDOW denominator
  *     (count − 1), NOT the Series reduction's sqrt(count).
  * The exact golden lists in comments were produced by pandas 2.2. */
class CovCorrSemSpec extends SparkSpec {

  private def series(vs: Seq[Double]): Matrix =
    mat3(vs.map(v => Seq(v)), labels = Seq("c0"))

  /** Evaluate a two-variable formula over single-column matrices. */
  private def colOf2(f: String, xs: Seq[Double], ys: Seq[Double]): Seq[Double] = {
    val ev = new FormulaEvaluator(reg("s" -> series(xs), "t" -> series(ys)))
    ev.evaluateFormula(f) match {
      case MatrixResult(df, rowId, labels, _) =>
        val byId = cells(df, rowId, labels)
        byId.keys.toSeq.sorted.map(i => byId(i)("c0"))
      case other => fail(s"expected matrix result, got $other")
    }
  }

  /** The same formula down the driver-vector (Series) twin. */
  private def vecOf2(f: String, xs: Seq[Double], ys: Seq[Double]): Seq[Double] = {
    val ev = new FormulaEvaluator(reg(
      "s" -> Vec(xs.toIndexedSeq, xs.indices.map(i => s"i$i")),
      "t" -> Vec(ys.toIndexedSeq, ys.indices.map(i => s"i$i"))))
    ev.evaluateFormula(f) match {
      case VecResult(v) => v.values
      case other => fail(s"expected vector result, got $other")
    }
  }

  private def assertSeq(actual: Seq[Double], expected: Seq[Double],
                        tol: Double = 1e-9, what: String = ""): Unit = {
    assert(actual.length == expected.length,
      s"$what length ${actual.length} vs ${expected.length}")
    actual.zip(expected).zipWithIndex.foreach { case ((a, e), i) =>
      if (e.isNaN) assert(a.isNaN, s"$what row $i: expected NaN, got $a")
      else assert(math.abs(a - e) <= tol, s"$what row $i: expected $e, got $a")
    }
  }

  // pandas: x = Series([1,2,NaN,4,5,6,NaN,8]); y = Series([2,NaN,3,1,5,NaN,7,9])
  // pairs valid at positions {0,3,4,7} only
  private val x8 = Seq(1.0, 2.0, Double.NaN, 4.0, 5.0, 6.0, Double.NaN, 8.0)
  private val y8 = Seq(2.0, Double.NaN, 3.0, 1.0, 5.0, Double.NaN, 7.0, 9.0)
  private val NaN = Double.NaN

  test("rolling cov: pair gate at default min_periods — no 3-pair window") {
    // pandas: all NaN (no window of 3 holds 3 valid pairs) — an
    // all-invalid result IS the engine's V5 contract (clean raise)
    val ev = new FormulaEvaluator(reg("s" -> series(x8), "t" -> series(y8)))
    intercept[graft.validate.AllInvalidResultException](
      ev.evaluateFormula("s.rolling(3).cov(t)"))
  }

  test("rolling cov: min_periods gates on valid PAIRS, not marginals") {
    // pandas: [nan, nan, nan, nan, 2.0, 2.0, nan, nan]
    assertSeq(colOf2("s.rolling(3, min_periods=2).cov(t)", x8, y8),
      Seq(NaN, NaN, NaN, NaN, 2.0, 2.0, NaN, NaN))
  }

  test("rolling corr: pair-masked denominator variances") {
    // pandas: [nan, nan, nan, -1.0, 1.0, 1.0, 1.0, 1.0]
    assertSeq(colOf2("s.rolling(4, min_periods=2).corr(t)", x8, y8),
      Seq(NaN, NaN, NaN, -1.0, 1.0, 1.0, 1.0, 1.0))
  }

  test("rolling cov/corr over an all-valid pair: the textbook moments") {
    val x = Seq(3.0, 1, 4, 1, 5, 9, 2, 6)
    val y = Seq(2.0, 7, 1, 8, 2, 8, 1, 8)
    // pandas: [nan, nan, -4.8333.., -6.5, -7.3333.., 0.0, 12.6666.., 12.8333..]
    assertSeq(colOf2("s.rolling(3).cov(t)", x, y),
      Seq(NaN, NaN, -29.0 / 6, -6.5, -22.0 / 3, 0.0, 38.0 / 3, 77.0 / 6))
    // pandas: [nan, nan, -0.984324138288, -0.991240707162, -0.930500855763,
    //          0.0, 0.952683200071, 0.904194430179]
    assertSeq(colOf2("s.rolling(3).corr(t)", x, y),
      Seq(NaN, NaN, -0.984324138288, -0.991240707162, -0.930500855763,
        0.0, 0.952683200071, 0.904194430179), tol = 1e-11)
    // center=1: the same values attached (n−1)/2 back, NaN past the tail
    assertSeq(colOf2("s.rolling(3, center=1).cov(t)", x, y),
      Seq(NaN, -29.0 / 6, -6.5, -22.0 / 3, 0.0, 38.0 / 3, 77.0 / 6, NaN))
  }

  test("rolling corr of a zero-variance window is NaN, cov is 0") {
    val x = Seq(2.0, 2, 2, 1, 5)
    val y = Seq(2.0, 7, 1, 8, 2)
    // pandas corr: [nan, nan, nan, -0.60999428133, -0.592136908213]
    assertSeq(colOf2("s.rolling(3).corr(t)", x, y),
      Seq(NaN, NaN, NaN, -0.60999428133, -0.592136908213), tol = 1e-11)
    // pandas cov: [nan, nan, 0.0, -1.3333.., -4.6666..]
    assertSeq(colOf2("s.rolling(3).cov(t)", x, y),
      Seq(NaN, NaN, 0.0, -4.0 / 3, -14.0 / 3))
  }

  test("expanding cov/corr: unbounded pairwise prefix") {
    // pandas: ecov = [nan, nan, nan, -1.5, 2.1666.., 2.1666.., 2.1666.., 8.8333..]
    assertSeq(colOf2("s.expanding().cov(t)", x8, y8),
      Seq(NaN, NaN, NaN, -1.5, 13.0 / 6, 13.0 / 6, 13.0 / 6, 53.0 / 6))
    // pandas: expanding(3).corr = [nan, nan, nan, nan, 0.5, 0.5, 0.5,
    //                              0.851412488637]
    assertSeq(colOf2("s.expanding(3).corr(t)", x8, y8),
      Seq(NaN, NaN, NaN, NaN, 0.5, 0.5, 0.5, 0.851412488637), tol = 1e-11)
  }

  test("rolling/expanding sem: std/sqrt(count − 1), valid-count gated") {
    // pandas rolling(4, min_periods=2).sem() on x8:
    // [nan, .7071.., .7071.., 1.0801.., 1.0801.., .7071.., .7071.., 1.0801..]
    val r = 1.0 / math.sqrt(2.0)
    val h = 1.080123449735
    assertSeq(colOf2("s.rolling(4, min_periods=2).sem()", x8, y8),
      Seq(NaN, r, r, h, h, r, r, h), tol = 1e-11)
    // pandas expanding().sem() on x8
    assertSeq(colOf2("s.expanding().sem()", x8, y8),
      Seq(NaN, r, r, h, 1.054092553389, 1.036822067666, 1.036822067666,
        1.154700538379), tol = 1e-11)
    // center: attached (n−1)/2 back — pandas rolling(3, center=True).sem()
    assertSeq(colOf2("s.rolling(3, center=1).sem()", x8, y8),
      Seq(NaN, NaN, NaN, NaN, r, NaN, NaN, NaN), tol = 1e-11)
  }

  /** Literal pairwise reference: two-pass over each window's pairs. */
  private def refWin(xs: Seq[Double], ys: Seq[Double], n: Int, minp: Int,
                     corr: Boolean, expanding: Boolean): Seq[Double] =
    xs.indices.map { i =>
      val lo = if (expanding) 0 else math.max(0, i + 1 - n)
      val pairs = (lo to i).filter(b => !xs(b).isNaN && !ys(b).isNaN)
      val cp = pairs.length
      if (cp < minp || cp < 2) Double.NaN
      else {
        val px = pairs.map(xs); val py = pairs.map(ys)
        val mx = px.sum / cp; val my = py.sum / cp
        val qxy = pairs.indices.map(k => (px(k) - mx) * (py(k) - my)).sum
        if (!corr) qxy / (cp - 1)
        else {
          val qx = px.map(v => (v - mx) * (v - mx)).sum
          val qy = py.map(v => (v - my) * (v - my)).sum
          qxy / math.sqrt(qx * qy)
        }
      }
    }

  test("fuzz: matrix and vector paths match the literal pairwise " +
      "reference across window/min_periods/hole-rate draws") {
    val rnd = new scala.util.Random(4111)
    for (trial <- 0 until 24) {
      val len = 6 + rnd.nextInt(14)
      def draw() = Seq.fill(len)(
        if (rnd.nextDouble() < 0.25) Double.NaN
        else math.rint(rnd.nextDouble() * 40) / 2.0)
      val xs = draw(); val ys = draw()
      val expanding = trial % 3 == 2
      val n = 2 + rnd.nextInt(4)
      val minp = 1 + rnd.nextInt(n)
      val corr = trial % 2 == 1
      val meth = if (corr) "corr" else "cov"
      val (f, refMinp) =
        if (expanding) (s"s.expanding($minp).$meth(t)", minp)
        else (s"s.rolling($n, min_periods=$minp).$meth(t)", minp)
      val expected = refWin(xs, ys, n, refMinp, corr, expanding)
      if (expected.forall(_.isNaN)) {
        // the V5 all-invalid contract: a clean raise, on both paths
        val ev = new FormulaEvaluator(reg(
          "s" -> series(xs), "t" -> series(ys)))
        intercept[graft.validate.AllInvalidResultException](
          ev.evaluateFormula(f))
      } else {
        assertSeq(colOf2(f, xs, ys), expected, tol = 1e-9,
          what = s"matrix $f trial $trial")
        assertSeq(vecOf2(f, xs, ys), expected, tol = 1e-9,
          what = s"vector $f trial $trial")
      }
    }
  }

  test("ewm cov/corr: pairwise decayed moments via polarization, carry " +
      "at non-pair positions, adjust=0 variant") {
    // pandas: x = [1,2,NaN,4,5,100], y = [2,1,4,3,NaN,7], com=1
    val x = Seq(1.0, 2.0, Double.NaN, 4.0, 5.0, 100.0)
    val y = Seq(2.0, 1.0, 4.0, 3.0, Double.NaN, 7.0)
    // pandas ewm(com=1).cov(y): [nan, -0.5, -0.5, 1.653846153846154,
    //   1.653846153846154, 200.8756613756614]
    assertSeq(colOf2("s.ewm(1).cov(t)", x, y),
      Seq(NaN, -0.5, -0.5, 1.653846153846154, 1.653846153846154,
        200.8756613756614), tol = 1e-9)
    // pandas ewm(com=1).corr(y): [nan, -1, -1, 0.851026430327255,
    //   0.851026430327255, 0.9820077673630595]
    assertSeq(colOf2("s.ewm(1).corr(t)", x, y),
      Seq(NaN, -1.0, -1.0, 0.851026430327255, 0.851026430327255,
        0.9820077673630595), tol = 1e-9)
    // adjust=False: [nan, -0.5, -0.5, 1.5, 1.5, 194.16666666666666] /
    //   [nan, -1, -1, 0.809312376595744, 0.809312376595744,
    //    0.981483080438592]
    assertSeq(colOf2("s.ewm(1, adjust=0).cov(t)", x, y),
      Seq(NaN, -0.5, -0.5, 1.5, 1.5, 194.16666666666666), tol = 1e-9)
    assertSeq(colOf2("s.ewm(1, adjust=0).corr(t)", x, y),
      Seq(NaN, -1.0, -1.0, 0.809312376595744, 0.809312376595744,
        0.981483080438592), tol = 1e-9)
    // span spelling: pandas ewm(span=5).cov(y) =
    //   [nan, -0.5, -0.5, 1.452830188679245, 1.452830188679245,
    //    186.31235230934473]
    assertSeq(colOf2("s.ewm(span=5).cov(t)", x, y),
      Seq(NaN, -0.5, -0.5, 1.452830188679245, 1.452830188679245,
        186.31235230934473), tol = 1e-9)
    // min_periods gates on the PAIR count: pandas ewm(com=1,
    // min_periods=3).cov(y) = [nan, nan, nan, 1.6538.., 1.6538..,
    // 200.8756..]
    assertSeq(colOf2("s.ewm(1, min_periods=3).cov(t)", x, y),
      Seq(NaN, NaN, NaN, 1.653846153846154, 1.653846153846154,
        200.8756613756614), tol = 1e-9)
    // vector twin mirrors the matrix path
    assertSeq(vecOf2("s.ewm(1).cov(t)", x, y),
      Seq(NaN, -0.5, -0.5, 1.653846153846154, 1.653846153846154,
        200.8756613756614), tol = 1e-9)
    assertSeq(vecOf2("s.ewm(1, adjust=0).corr(t)", x, y),
      Seq(NaN, -1.0, -1.0, 0.809312376595744, 0.809312376595744,
        0.981483080438592), tol = 1e-9)
  }

  test("ewm sum: the unnormalized decayed sum (μ·W1) — DECAYS at " +
      "holes instead of carrying; adjust=0 raises (pandas parity)") {
    val x = Seq(1.0, 2.0, Double.NaN, 4.0, 5.0, 100.0)
    val y = Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    // pandas x.ewm(com=1).sum() = [1, 2.5, 1.25, 4.625, 7.3125,
    //   103.65625] — note 1.25 at the hole (the 2.5 mass decayed)
    assertSeq(colOf2("s.ewm(1).sum()", x, y),
      Seq(1.0, 2.5, 1.25, 4.625, 7.3125, 103.65625), tol = 1e-9)
    // pandas span=5: [1, 2.6667, 1.7778, 5.1852, 8.4568, 105.6379]
    assertSeq(colOf2("s.ewm(span=5).sum()", x, y),
      Seq(1.0, 2.666666666666667, 1.7777777777777781, 5.185185185185185,
        8.456790123456791, 105.63786008230453), tol = 1e-9)
    // min_periods gates on the valid count
    assertSeq(colOf2("s.ewm(1, min_periods=3).sum()", x, y),
      Seq(NaN, NaN, NaN, 4.625, 7.3125, 103.65625), tol = 1e-9)
    // leading holes NaN; a trailing hole decays: [nan, nan, 3, 1.5]
    assertSeq(colOf2("s.ewm(1).sum()",
      Seq(Double.NaN, Double.NaN, 3.0, Double.NaN), Seq(0.0, 0, 0, 0)),
      Seq(NaN, NaN, 3.0, 1.5), tol = 1e-12)
    // vector twin
    assertSeq(vecOf2("s.ewm(1).sum()", x, y),
      Seq(1.0, 2.5, 1.25, 4.625, 7.3125, 103.65625), tol = 1e-9)
    // pandas raises NotImplementedError for sum with adjust=False
    val ev = new FormulaEvaluator(reg("s" -> series(x), "t" -> series(y)))
    val e = intercept[FormulaTypeException](
      ev.evaluateFormula("s.ewm(1, adjust=0).sum()"))
    assert(e.getMessage.contains("not implemented with adjust=False"))
  }

  test("flex arithmetic fill_value: the missing side fills when " +
      "exactly one side is invalid; both missing stays NaN") {
    // pandas: a=[1,NaN,3,NaN], b=[10,20,NaN,NaN]
    //   a.add(b, fill_value=0)  = [11, 20, 3, nan]
    //   a.sub(b, fill_value=2)  = [-9, -18, 1, nan]
    //   a.div(b, fill_value=1)  = [0.1, 0.05, 3, nan]
    val a = Seq(1.0, Double.NaN, 3.0, Double.NaN)
    val b = Seq(10.0, 20.0, Double.NaN, Double.NaN)
    assertSeq(colOf2("s.add(t, fill_value=0)", a, b),
      Seq(11.0, 20.0, 3.0, NaN))
    assertSeq(colOf2("s.sub(t, fill_value=2)", a, b),
      Seq(-9.0, -18.0, 1.0, NaN))
    assertSeq(colOf2("s.div(t, fill_value=1)", a, b),
      Seq(0.1, 0.05, 3.0, NaN))
    // vector twin (positional A3)
    assertSeq(vecOf2("s.mul(t, fill_value=1)", a, b),
      Seq(10.0, 20.0, 3.0, NaN))
  }

  test("label alignment: sorted union, one-sided labels are all-NaN") {
    val a = mat3(Seq(Seq(1.0, 2), Seq(3.0, 4), Seq(5.0, 7)),
      labels = Seq("a", "b"))
    val b = mat3(Seq(Seq(2.0, 1), Seq(1.0, 5), Seq(4.0, 2)),
      labels = Seq("b", "c"))
    val ev = new FormulaEvaluator(reg("s" -> a, "t" -> b))
    val MatrixResult(df, rowId, labels, _) =
      ev.evaluateFormula("s.rolling(2).cov(t)"): @unchecked
    assert(labels == Seq("a", "b", "c"))
    val byId = cells(df, rowId, labels)
    (0L to 2L).foreach { i =>
      assert(byId(i)("a").isNaN && byId(i)("c").isNaN)
    }
    // shared label b: x = [2,4,7], y = [2,1,4] → cov2 = [nan, -1.0, 4.5]
    assert(byId(0L)("b").isNaN)
    assert(math.abs(byId(1L)("b") - -1.0) < 1e-12)
    assert(math.abs(byId(2L)("b") - 4.5) < 1e-12)
  }

  test("combine_first: keep the caller's valid cells, patch the rest " +
      "from other; sorted union labels") {
    // pandas: a(x=[1,NaN,3], y=[NaN,5,NaN]).combine_first(
    //   b(y=[10,20,30], z=[7,8,9])) → x=[1,NaN,3], y=[10,5,30], z=[7,8,9]
    val a = mat3(Seq(Seq(1.0, Double.NaN), Seq(Double.NaN, 5.0),
      Seq(3.0, Double.NaN)), labels = Seq("x", "y"))
    val b = mat3(Seq(Seq(10.0, 7.0), Seq(20.0, 8.0), Seq(30.0, 9.0)),
      labels = Seq("y", "z"))
    val ev = new FormulaEvaluator(reg("s" -> a, "t" -> b))
    val MatrixResult(df, rowId, labels, _) =
      ev.evaluateFormula("s.combine_first(t)"): @unchecked
    assert(labels == Seq("x", "y", "z"))
    val byId = cells(df, rowId, labels)
    assert(byId(0L)("x") == 1.0 && byId(1L)("x").isNaN &&
      byId(2L)("x") == 3.0)
    assert(byId(0L)("y") == 10.0 && byId(1L)("y") == 5.0 &&
      byId(2L)("y") == 30.0)
    assert(byId(0L)("z") == 7.0 && byId(1L)("z") == 8.0 &&
      byId(2L)("z") == 9.0)
  }

  test("corrwith: column-wise pairwise Pearson on matching labels, " +
      "NaN for one-sided union labels") {
    // pandas: c(x=[1,2,3,4], y=[2,1,4,3]).corrwith(d(x=[2,4,6,9],
    //   z=[1,1,1,1])) → x: 0.9943767126843689, y: NaN, z: NaN
    val c = mat3(Seq(Seq(1.0, 2.0), Seq(2.0, 1.0), Seq(3.0, 4.0),
      Seq(4.0, 3.0)), labels = Seq("x", "y"))
    val d = mat3(Seq(Seq(2.0, 1.0), Seq(4.0, 1.0), Seq(6.0, 1.0),
      Seq(9.0, 1.0)), labels = Seq("x", "z"))
    val ev = new FormulaEvaluator(reg("s" -> c, "t" -> d))
    (ev.evaluateFormula("s.corrwith(t)"): @unchecked) match {
      case RowResult(df, lbls) =>
        assert(lbls == Seq("x", "y", "z"))
        val r = df.collect().head
        assert(math.abs(r.getDouble(r.fieldIndex("x")) -
          0.9943767126843689) < 1e-8)
        assert(r.getDouble(r.fieldIndex("y")).isNaN)
        assert(r.getDouble(r.fieldIndex("z")).isNaN)
    }
    // pandas ordering (r12, the r11 ADVICE): shared labels first in the
    // CALLER's column order, then the non-shared remainder sorted —
    // caller [b,a] × other [a,b,d] → ['b','a','d'] (pandas 2.2)
    val cb = mat3(Seq(Seq(1.0, 2.0), Seq(2.0, 1.0), Seq(3.0, 4.0),
      Seq(4.0, 3.0)), labels = Seq("b", "a"))
    val db = mat3(Seq(Seq(2.0, 1.0, 5.0), Seq(4.0, 1.0, 6.0),
      Seq(6.0, 1.0, 7.0), Seq(9.0, 1.0, 8.0)), labels = Seq("a", "b", "d"))
    val evb = new FormulaEvaluator(reg("s" -> cb, "t" -> db))
    (evb.evaluateFormula("s.corrwith(t)"): @unchecked) match {
      case RowResult(_, lbls) => assert(lbls == Seq("b", "a", "d"))
    }
    // NaN pairs drop pairwise: pandas [1,2,NaN,4,7] vs [2,4,6,NaN,8]
    // → 0.9843241382880897 (the (1,2),(2,4),(7,8) pairs)
    val e2 = new FormulaEvaluator(reg(
      "s" -> series(Seq(1.0, 2.0, Double.NaN, 4.0, 7.0)),
      "t" -> series(Seq(2.0, 4.0, 6.0, Double.NaN, 8.0))))
    (e2.evaluateFormula("s.corrwith(t)"): @unchecked) match {
      case RowResult(df, lbls) =>
        val r = df.collect().head
        assert(math.abs(r.getDouble(r.fieldIndex(lbls.head)) -
          0.9843241382880897) < 1e-8)
    }
  }

  test("clean errors: Series other on a matrix window; ADP mode") {
    val ev = new FormulaEvaluator(reg("s" -> series(Seq(1.0, 2, 3)),
      "v" -> Vec(IndexedSeq(1.0), IndexedSeq("c0"))))
    val e1 = intercept[FormulaTypeException](
      ev.evaluateFormula("s.rolling(2).cov(v)"))
    assert(e1.getMessage.contains("COLUMN-positionally"))
    val e2 = intercept[FormulaTypeException](
      ev.evaluateFormula("s.expanding().corr(v)"))
    assert(e2.getMessage.contains("COLUMN-positionally"))
  }

  test("dot: the pandas spelling dispatches to matmul") {
    val m = series(Seq(1.0, 2, 3))
    val ev = new FormulaEvaluator(reg("s" -> m,
      "v" -> Vec(IndexedSeq(2.0), IndexedSeq("c0"))))
    val MatrixResult(df, rowId, labels, _) =
      ev.evaluateFormula("s.dot(v)"): @unchecked
    val byId = cells(df, rowId, labels)
    assert(byId(2L)(labels.head) == 6.0)
  }

  test("fuzz matrix (r12, the r11 verdict ask #7): (rolling/expanding/" +
      "ewm) x (cov/corr/sem) x (min_periods, center, all four ewm decay " +
      "spellings, adjust) — distributed matrix path AND vector twin vs " +
      "independent literal references on hole-bearing series crossing " +
      "slice boundaries") {
    val rnd = new scala.util.Random(20260817L)
    // literal positional-window pairwise reference: two-pass moments over
    // the window's pairwise-complete cells (pandas 2.2 contract)
    def seqPair(xs: IndexedSeq[Double], ys: IndexedSeq[Double],
                wantCorr: Boolean, loOf: Int => Int,
                minGate: Int): Seq[Double] =
      xs.indices.map { i =>
        val ps = (math.max(0, loOf(i)) to i)
          .filter(j => !xs(j).isNaN && !ys(j).isNaN)
        val cnt = ps.length
        if (cnt < minGate || cnt < 2) Double.NaN
        else {
          val mx = ps.map(xs).sum / cnt; val my = ps.map(ys).sum / cnt
          var qxy = 0.0; var qx = 0.0; var qy = 0.0
          ps.foreach { j =>
            val dx = xs(j) - mx; val dy = ys(j) - my
            qxy += dx * dy; qx += dx * dx; qy += dy * dy
          }
          if (wantCorr) qxy / math.sqrt(qx * qy) else qxy / (cnt - 1)
        }
      }
    // literal window sem: std(ddof=1)/sqrt(cnt − 1) over the window's
    // valid cells
    def seqSem(xs: IndexedSeq[Double], loOf: Int => Int,
               minGate: Int): Seq[Double] =
      xs.indices.map { i =>
        val w = (math.max(0, loOf(i)) to i).map(xs).filter(!_.isNaN)
        val cnt = w.length
        if (cnt < minGate || cnt < 2) Double.NaN
        else {
          val mu = w.sum / cnt
          val v2 = w.map(x => (x - mu) * (x - mu)).sum / (cnt - 1)
          math.sqrt(v2 / (cnt - 1))
        }
      }
    // literal O(n²) ewm pairwise reference — adjust=True weights
    // (1−α)^(i−p). adjust=False is the pandas RECURSION unrolled: after
    // each observation the mass renormalizes old_wt = 1, so observation
    // k enters at weight α·T_{k−1} where T_{k−1} is the unnormalized
    // total AT the previous observation (after a gap T ≠ 1, so the
    // weights are NOT α·(1−α)^(i−p) — the naive closed form is ~1e-3
    // wrong on gapped series, measured). Simulated per row: decay every
    // held weight by (1−α), on a valid pair append w = α·T_last (1 for
    // the first), refresh T_last = Σ current weights. bias=False
    // correction W1²/(W1²−W2) — shared by cov and both denominator
    // vars, so it cancels in corr.
    def seqEwmPair(xs: IndexedSeq[Double], ys: IndexedSeq[Double],
                   alpha: Double, adjust: Boolean, wantCorr: Boolean,
                   minp: Int): Seq[Double] = {
      val f = 1.0 - alpha
      // adjust=False masses, simulated once over the whole series:
      // recWts(i) = the weight of each pair-valid obs <= i, AT row i
      val recWts: IndexedSeq[IndexedSeq[Double]] = {
        val held = scala.collection.mutable.ArrayBuffer.empty[Double]
        var tLast = Double.NaN
        xs.indices.map { i =>
          held.indices.foreach(k => held(k) *= f)
          if (!xs(i).isNaN && !ys(i).isNaN) {
            held += (if (held.isEmpty) 1.0 else alpha * tLast)
            tLast = held.sum
          }
          held.toIndexedSeq
        }
      }
      xs.indices.map { i =>
        val ps = (0 to i).filter(j => !xs(j).isNaN && !ys(j).isNaN)
        val cnt = ps.length
        if (cnt < 2 || cnt < minp) Double.NaN
        else {
          val w: Seq[Double] =
            if (adjust) ps.map(p => math.pow(f, (i - p).toDouble))
            else recWts(i)
          val w1 = w.sum; val w2 = w.map(x => x * x).sum
          val den = w1 * w1 - w2
          if (den <= 0.0 || w1 == 0.0) Double.NaN
          else {
            val mx = ps.zip(w).map { case (j, wk) => wk * xs(j) }.sum / w1
            val my = ps.zip(w).map { case (j, wk) => wk * ys(j) }.sum / w1
            def mom(f: Int => Double) =
              ps.zip(w).map { case (j, wk) => wk * f(j) }.sum / w1
            val cxy = mom(j => (xs(j) - mx) * (ys(j) - my))
            if (wantCorr) {
              val vx = mom(j => (xs(j) - mx) * (xs(j) - mx))
              val vy = mom(j => (ys(j) - my) * (ys(j) - my))
              cxy / math.sqrt(vx * vy)
            } else cxy * w1 * w1 / den
          }
        }
      }
    }
    def assertRel(actual: Seq[Double], expected: Seq[Double],
                  what: String): Unit = {
      assert(actual.length == expected.length, s"$what length")
      actual.zip(expected).zipWithIndex.foreach { case ((a, e), i) =>
        if (e.isNaN) assert(a.isNaN, s"$what row $i: expected NaN, got $a")
        else assert(math.abs(a - e) <= 1e-8 * math.max(1.0, math.abs(e)),
          s"$what row $i: expected $e, got $a")
      }
    }
    for (caseNo <- 1 to 8) {
      // long enough that hole RUNS cross the 32-partition slicing; a
      // clustered hole generator makes multi-cell runs common
      val len = 40 + rnd.nextInt(50)
      def gen(): IndexedSeq[Double] = {
        var holeRun = 0
        IndexedSeq.fill(len) {
          if (holeRun > 0) { holeRun -= 1; Double.NaN }
          else if (rnd.nextDouble() < 0.12) {
            holeRun = rnd.nextInt(6); Double.NaN
          } else (rnd.nextInt(17) - 8).toDouble
        }
      }
      val xs = gen(); val ys = gen()
      val m = if (caseNo % 2 == 0) "cov" else "corr"
      val wantCorr = m == "corr"

      // rolling: random n, min_periods >= 2 (the 1-pair ddof edge is
      // pinned separately above); center rides the DEFAULT min_periods
      // (= n) — partial centered windows reject cleanly by contract
      val n = 2 + rnd.nextInt(5)
      val minp = 2 + rnd.nextInt(math.max(1, n - 1))
      val center = caseNo % 4 == 1
      val rollF =
        if (center) s"s.rolling($n, center=1).$m(t)"
        else s"s.rolling($n, min_periods=$minp).$m(t)"
      val effMinp = if (center) n else minp
      val lead = if (center) (n - 1) / 2 else 0
      val trail = seqPair(xs, ys, wantCorr, i => i - n + 1, effMinp)
      val rollRef = xs.indices.map(i =>
        if (i + lead < len) trail(i + lead) else Double.NaN)
      if (rollRef.exists(!_.isNaN)) {
        assertRel(colOf2(rollF, xs, ys), rollRef, s"matrix $rollF")
        assertRel(vecOf2(rollF, xs, ys), rollRef, s"vector $rollF")
      }

      // expanding
      val eminp = 2 + rnd.nextInt(4)
      val expF = s"s.expanding(min_periods=$eminp).$m(t)"
      val expRef = seqPair(xs, ys, wantCorr, _ => 0, math.max(eminp, 2))
      if (expRef.exists(!_.isNaN)) {
        assertRel(colOf2(expF, xs, ys), expRef, s"matrix $expF")
        assertRel(vecOf2(expF, xs, ys), expRef, s"vector $expF")
      }

      // sem on rolling and expanding (x-side only)
      val semF = s"s.rolling($n, min_periods=$minp).sem()"
      val semRef = seqSem(xs, i => i - n + 1, minp)
      if (semRef.exists(!_.isNaN))
        assertRel(colOf2(semF, xs, ys), semRef, s"matrix $semF")
      val esemRef = seqSem(xs, _ => 0, 2)
      if (esemRef.exists(!_.isNaN))
        assertRel(colOf2("s.expanding().sem()", xs, ys), esemRef,
          "matrix expanding sem")

      // ewm: all four decay spellings, adjust=True and =False
      val (spelling, alpha) = rnd.nextInt(4) match {
        case 0 => val com = 0.5 + rnd.nextInt(4) * 2
                  (s"$com", 1.0 / (1.0 + com))
        case 1 => val span = 2 + rnd.nextInt(12)
                  (s"span=$span", 2.0 / (span + 1.0))
        case 2 => val hl = 1 + rnd.nextInt(6)
                  (s"halflife=$hl",
                    1.0 - math.exp(math.log(0.5) / hl))
        case _ => val a = 0.1 + 0.8 * rnd.nextDouble()
                  (s"alpha=$a", a)
      }
      val adjust = caseNo % 2 == 0
      val adjSuffix = if (adjust) "" else ", adjust=0"
      val ewmF = s"s.ewm($spelling$adjSuffix).$m(t)"
      val ewmRef = seqEwmPair(xs, ys, alpha, adjust, wantCorr, 2)
      if (ewmRef.exists(!_.isNaN)) {
        // the engine CARRIES across holes where the golden re-derives;
        // compare only at the golden's finite cells (the r10 discipline)
        val got = colOf2(ewmF, xs, ys)
        val gotV = vecOf2(ewmF, xs, ys)
        ewmRef.zipWithIndex.foreach { case (e, i) =>
          if (!e.isNaN) {
            assert(math.abs(got(i) - e) <=
              1e-8 * math.max(1.0, math.abs(e)),
              s"matrix $ewmF row $i: expected $e, got ${got(i)}")
            assert(math.abs(gotV(i) - e) <=
              1e-8 * math.max(1.0, math.abs(e)),
              s"vector $ewmF row $i: expected $e, got ${gotV(i)}")
          }
        }
      }
    }
  }

  test("quantum margin: e11_ecov's nudged 6-dp rounding clears every " +
       "boundary by >> the cross-engine delta (r12, the r11 red row)") {
    // the sf0.01 gate data itself: integer qty × cent prices make
    // covariances whose exact rational value terminates ON the 6-dp
    // half-quantum (e.g. 274.0048235 at row 5, within one double ULP of
    // the boundary), so UNNUDGED rounding is a cross-engine coin flip.
    // Assert (a) the artifact is real — the closest RAW cell sits ON a
    // boundary (measured 0.0 quanta) — and (b) after the ε = 1e-9 nudge
    // every cell clears its boundary by ≥ 50 ULP of its own magnitude
    // (measured min 136 ULP over all 58,972 cells), so a few-ULP
    // cross-engine delta can never flip a rounding. The floor is
    // per-cell ULP-relative, not absolute: with ~59k ~uniform fracs the
    // global min distance is naturally ~1/n quanta — an absolute floor
    // above that would reject correct data.
    val sf01 = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$sf01/lineitem.parquet").exists())
    val df = graft.QueryCatalog.formulaQuery(
      "qty.expanding().cov(price)")(spark, sf01)
    val valueCols = df.schema.fieldNames.filterNot(_ == df.schema.fieldNames.head)
    val cells = df.collect().flatMap { r =>
      valueCols.map(c => r.getDouble(r.fieldIndex(c)))
    }.filterNot(_.isNaN)
    assert(cells.length > 10000)
    def boundaryDist(x: Double): Double = {
      val s = x * 1e6
      math.abs(s - math.floor(s) - 0.5)
    }
    val rawMin = cells.map(boundaryDist).min
    assert(rawMin < 1e-5,
      s"artifact gone? closest raw cell is $rawMin quanta from a boundary" +
        " — the nudge may no longer be needed, re-audit before removing")
    val tight = cells.filter { v =>
      boundaryDist(v + 1e-9) < 50 * math.ulp(math.abs(v)) * 1e6
    }
    assert(tight.isEmpty,
      s"${tight.length} nudged cells sit within 50 ULP of a 6-dp " +
        s"boundary (e.g. ${tight.take(3).mkString(", ")}) — the " +
        "cross-engine hash is not deterministic there")
  }

  test("exact-tie class (r13 margin audit, pinned r14): e11_ewadj/" +
       "e11_ewsum determinism rests on integer qty keeping the α=1/2 ewm " +
       "cells dyadic — this spec goes red the day the fixture breaks " +
       "that, instead of a red driver round") {
    // The r13 quantum-margin audit found these two queries carry cells
    // terminating EXACTLY on their half-quantum rounding boundary:
    // ewm(com=1) is α=1/2, so over integer-valued qty every statistic is
    // a dyadic rational a/2^k — exactly representable and exactly
    // computed in BOTH engines at these magnitudes, so both round the
    // identical double half-up the same way. Deterministic and green for
    // 13 rounds, but only because of an UNSTATED data invariant: a
    // fixture change to non-integer qty would move these cells a few ULP
    // OFF the boundary (the coin-flip class) with nothing failing until
    // the driver's cross-engine hash flips. Pin both halves.
    val sf01 = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$sf01/lineitem.parquet").exists())
    // (a) the fixture invariant itself: l_quantity is integer-valued, so
    // the qty matrix (per-order sums of it) is too
    val li = spark.read.parquet(s"$sf01/lineitem.parquet")
    val F = org.apache.spark.sql.functions
    val nonInt = li.filter(
      F.col("l_quantity") =!= F.round(F.col("l_quantity"), 0)).count()
    assert(nonInt == 0L,
      s"$nonInt lineitem rows carry NON-INTEGER l_quantity — the dyadic " +
        "exact-tie argument for e11_ewadj/e11_ewsum no longer holds; " +
        "ε-nudge both queries (the e11_ecov discipline) before the next " +
        "driver round")
    // (b) the two queries' cells stay OUT of the coin-flip zone.
    //  - e11_ewadj (un-nudged, 5 dp): every cell either sits EXACTLY on
    //    its half-quantum boundary (the dyadic exact-tie class) or
    //    clears it by ≥ 50 ULP of its own magnitude.
    //  - e11_ewsum (ε-nudged 1e-9, 6 dp, r14): writing this very pin
    //    found ONE cell (15.6796875 + 2e-15 accumulation error) sitting
    //    2e-9 quanta OFF the boundary — the coin-flip class, masked in
    //    the r13 audit because the per-query MIN margin was the exact
    //    ties' 0.0. The query now carries the e11_ecov nudge; assert
    //    every NUDGED cell clears its boundary by ≥ 50 ULP.
    def cellsOf(f: String): Array[Double] = {
      val df = graft.QueryCatalog.formulaQuery(f)(spark, sf01)
      val cols = df.schema.fieldNames.drop(1)
      df.collect().flatMap { r =>
        cols.map(c => r.getDouble(r.fieldIndex(c)))
      }.filterNot(_.isNaN)
    }
    def dist(x: Double, scale: Double): Double = {
      val s = x * scale
      math.abs(s - math.floor(s) - 0.5)
    }
    locally {
      val cells = cellsOf("qty.ewm(1, adjust=0).mean()")
      assert(cells.length > 10000)
      val danger = cells.filter { v =>
        val d0 = dist(v, 1e5)
        d0 > 0.0 && d0 < 50 * math.ulp(math.abs(v)) * 1e5
      }
      assert(danger.isEmpty,
        s"e11_ewadj: ${danger.length} cells sit NEAR (not exactly on) a " +
          s"5-dp half-quantum boundary (e.g. ${danger.take(3).mkString(", ")})" +
          " — the exact-tie determinism is broken; apply the ε-nudge")
      assert(cells.exists(v => dist(v, 1e5) == 0.0),
        "e11_ewadj: the exact-tie class vanished (no cell exactly on a " +
          "boundary) — the data changed; re-audit whether this pin still " +
          "applies")
    }
    locally {
      val cells = cellsOf("qty.ewm(1).sum()")
      assert(cells.length > 10000)
      // artifact real: un-nudged cells sit on/near boundaries
      assert(cells.exists(v => dist(v, 1e6) < 1e-5),
        "e11_ewsum: no raw cell near a 6-dp boundary — the nudge may no " +
          "longer be needed, re-audit before removing")
      val tight = cells.filter { v =>
        dist(v + 1e-9, 1e6) < 50 * math.ulp(math.abs(v)) * 1e6
      }
      assert(tight.isEmpty,
        s"e11_ewsum: ${tight.length} NUDGED cells within 50 ULP of a " +
          s"6-dp boundary (e.g. ${tight.take(3).mkString(", ")}) — the " +
          "cross-engine hash is not deterministic there")
    }
  }
}
