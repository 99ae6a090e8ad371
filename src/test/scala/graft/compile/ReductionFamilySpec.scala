package graft.compile

import graft.SparkSpec
import graft.api.FormulaEvaluator
import graft.model.Vec

/** The full pd.eval-dispatchable reduction family (E11 long tail):
  * min/max/count/std/var/median/prod beside the original sum/mean, with
  * pandas skipna and empty-input semantics, on both the distributed
  * (matrix → 1-row tree-reduce) and driver (vector) paths. */
class ReductionFamilySpec extends SparkSpec {

  private def rowVals(f: String): Map[String, Double] = {
    val ev = new FormulaEvaluator(reg("a" -> fixA, "i" -> fixI),
      fillInvalid = false)
    ev.evaluateFormula(f) match {
      case RowResult(df, labels) =>
        val r = df.collect().head
        labels.map(l => l -> (r.get(r.fieldIndex(l)) match {
          case null => Double.NaN
          case d: Double => d
          case x => x.toString.toDouble
        })).toMap
      case other => fail(s"expected row result, got $other")
    }
  }

  // fixA columns: c0=(1,4,1) c1=(7,4,7) c2=(6,8,2)
  test("matrix .min/.max/.count") {
    val mn = rowVals("a.min()")
    assert(mn("c0") == 1.0 && mn("c1") == 4.0 && mn("c2") == 2.0)
    val mx = rowVals("a.max()")
    assert(mx("c0") == 4.0 && mx("c1") == 7.0 && mx("c2") == 8.0)
    val ct = rowVals("a.count()")
    assert(ct("c0") == 3.0 && ct("c1") == 3.0 && ct("c2") == 3.0)
  }

  test("matrix .std/.var are ddof=1") {
    val v = rowVals("a.var()")
    assertCell(v("c0"), 3.0) // var([1,4,1]) = 9/3... ddof=1: ((0-1)^2... ) recompute below
    // mean c0 = 2; devs (−1,2,−1) → ss = 6 → /2 = 3
    assertCell(v("c1"), 3.0) // mean 6; devs (1,−2,1) → 6/2 = 3
    val s = rowVals("a.std()")
    assertCell(s("c2"), math.sqrt(((6 - 16.0 / 3) * (6 - 16.0 / 3) +
      (8 - 16.0 / 3) * (8 - 16.0 / 3) + (2 - 16.0 / 3) * (2 - 16.0 / 3)) / 2))
  }

  test("matrix .median interpolates and skips NaN") {
    val m = rowVals("a.median()")
    assert(m("c0") == 1.0 && m("c1") == 7.0 && m("c2") == 6.0)
    // fixI: c1 = (NaN, 5, 8) → median of (5,8) = 6.5
    val mi = rowVals("i.median()")
    assert(mi("c1") == 6.5)
  }

  test("matrix .prod: sign/zero/skip semantics") {
    val p = rowVals("(a - 4).prod()") // c0: (−3,0,−3)→0; c1: (3,0,3)→0; c2: (2,4,−2)→−16
    assert(p("c0") == 0.0 && p("c1") == 0.0)
    assertCell(p("c2"), -16.0, tol = 1e-9)
    // NaN skipped: fixI c1 = (NaN,5,8) → 40
    val pi = rowVals("i.prod()")
    assertCell(pi("c1"), 40.0, tol = 1e-9)
  }

  test("matrix .quantile(q) interpolates like pandas") {
    // fixA c0 = (1,4,1) sorted (1,1,4): q=0.75 → pos 1.5 → 2.5
    val q = rowVals("a.quantile(0.75)")
    assertCell(q("c0"), 2.5)
    assertCell(q("c1"), 7.0) // (4,7,7): pos 1.5 → 7
    val ev = new FormulaEvaluator(reg("a" -> fixA))
    assertThrows[FormulaTypeException](ev.evaluateFormula("a.quantile(1.5)"))
  }

  test("matrix .nunique drops NaN like pandas; .any/.all use skipna truthiness") {
    // fixA columns: c0=(1,4,1) c1=(7,4,7) c2=(6,8,2)
    val nu = rowVals("a.nunique()")
    assert(nu("c0") == 2.0 && nu("c1") == 2.0 && nu("c2") == 3.0)
    // fixI c1 = (NaN, 5, 8): NaN excluded → 2 distinct
    assert(rowVals("i.nunique()")("c1") == 2.0)
    // any/all: truthiness v != 0, skipna; (a - 4) has zeros in c0/c1
    def boolVals(f: String): Map[String, Boolean] = {
      val ev = new FormulaEvaluator(reg("a" -> fixA, "i" -> fixI),
        fillInvalid = false)
      ev.evaluateFormula(f) match {
        case RowResult(df, labels) =>
          val r = df.collect().head
          labels.map(l => l -> r.getBoolean(r.fieldIndex(l))).toMap
        case other => fail(s"expected row result, got $other")
      }
    }
    val any = boolVals("(a - 4).any()") // c0 (−3,0,−3), c1 (3,0,3), c2 (2,4,−2)
    assert(any("c0") && any("c1") && any("c2"))
    val all = boolVals("(a - 4).all()")
    assert(!all("c0") && !all("c1") && all("c2"))
    // NaN skipped: fixI c1 = (NaN,5,8) → all True despite the hole
    assert(boolVals("i.all()")("c1"))
    // boolean reduction columns survive fill mode (no isnan on bools)
    val evFill = new FormulaEvaluator(reg("a" -> fixA), fillInvalid = true)
    val RowResult(df, _) = evFill.evaluateFormula("a.any()"): @unchecked
    assert(df.collect().head.getBoolean(0))
  }

  test("matrix .idxmax/.idxmin: first-occurrence row id under ties, NaN skipped") {
    def strVals(f: String): Map[String, String] = {
      val ev = new FormulaEvaluator(reg("a" -> fixA, "i" -> fixI),
        fillInvalid = false)
      ev.evaluateFormula(f) match {
        case RowResult(df, labels) =>
          val r = df.collect().head
          labels.map(l => l -> r.getString(r.fieldIndex(l))).toMap
        case other => fail(s"expected row result, got $other")
      }
    }
    // fixA rows 0..2: c0=(1,4,1) c1=(7,4,7) c2=(6,8,2)
    val mx = strVals("a.idxmax()")
    assert(mx("c0") == "1")            // unique max at row 1
    assert(mx("c1") == "0")            // tie 7@rows{0,2} → FIRST (row 0)
    assert(mx("c2") == "1")
    val mn = strVals("a.idxmin()")
    assert(mn("c0") == "0")            // tie 1@rows{0,2} → first
    assert(mn("c1") == "1" && mn("c2") == "2")
    // NaN skipped: fixI c1 = (NaN, 5, 8) → idxmax row 2, idxmin row 1
    val mi = strVals("i.idxmax()"); val mi2 = strVals("i.idxmin()")
    assert(mi("c1") == "2" && mi2("c1") == "1")
    // fill mode must not retype the string columns
    val evFill = new FormulaEvaluator(reg("a" -> fixA), fillInvalid = true)
    val RowResult(df2, _) = evFill.evaluateFormula("a.idxmax()"): @unchecked
    assert(df2.collect().head.getString(0) == "1")
  }

  test("matrix .sem/.skew/.kurt match pandas' bias-corrected formulas") {
    // c0 = (1,4,1): std = √3 → sem = √3/√3 = 1; skew = √(6)/1 · m3/m2^1.5
    // with m2 = 2, m3 = 2 → √6/√8·2 = √3
    val sem = rowVals("a.sem()")
    assertCell(sem("c0"), 1.0)
    val sk = rowVals("a.skew()")
    assertCell(sk("c0"), math.sqrt(3.0), tol = 1e-9)
    // kurtosis needs n ≥ 4 → every column NaN on a 3-row frame, which the
    // validator's all-invalid contract (V5) turns into the decorated error
    intercept[graft.validate.AllInvalidResultException] {
      rowVals("a.kurt()")
    }
    // vector path: pandas kurtosis([10,20,30,40]) = −1.2 exactly
    val ev = new FormulaEvaluator(reg("a" -> fixA,
      "v4" -> Vec(IndexedSeq(10.0, 20.0, 30.0, 40.0),
        IndexedSeq("a", "b", "c", "d"))), fillInvalid = false)
    val ScalarResult(kv) = ev.evaluateFormula("v4.kurt()"): @unchecked
    assertCell(kv, -1.2, tol = 1e-12)
    val ScalarResult(sv) = ev.evaluateFormula("v4.skew()"): @unchecked
    assertCell(sv, 0.0, tol = 1e-12) // symmetric
  }

  test(".skew/.kurt stay accurate when |mean| >> spread (r9 centering)") {
    // 1e9 + (10,20,30,40): the raw Σv..Σv⁴ formulation cancels
    // catastrophically (Σv² ≈ 4e18 needs 19 digits to recover m2 ≈ 125 —
    // doubles carry ~15.9), while pandas' centered moments are exact:
    // skew = 0 (symmetric), kurt = −1.2
    val ev = new FormulaEvaluator(reg("a" -> fixA,
      "big" -> mat3(Seq(Seq(1.0e9 + 10), Seq(1.0e9 + 20), Seq(1.0e9 + 30)),
        Seq("c0")).asInstanceOf[graft.model.NamedData],
      "b4" -> Vec(IndexedSeq(1.0e9 + 10, 1.0e9 + 20, 1.0e9 + 30, 1.0e9 + 40),
        IndexedSeq("a", "b", "c", "d"))), fillInvalid = false)
    val RowResult(df, labels) = ev.evaluateFormula("big.skew()"): @unchecked
    val sk = df.collect().head.getDouble(df.schema.fieldIndex(labels.head))
    assertCell(sk, 0.0, tol = 1e-6)
    val ScalarResult(kv) = ev.evaluateFormula("b4.kurt()"): @unchecked
    assertCell(kv, -1.2, tol = 1e-9)
  }

  test(".idxmax/.idxmin treat -0.0 and +0.0 as equal-value ties (r9)") {
    // pandas: -0.0 == 0.0, ties broken by FIRST occurrence. The ±struct
    // key trick must normalize zeros, or negation turns +0.0 into -0.0
    // and Double.compare prefers the wrong row.
    val m = mat3(Seq(Seq(-0.0), Seq(0.0), Seq(-1.0)), Seq("c0"))
    val ev = new FormulaEvaluator(reg("z" -> m.asInstanceOf[graft.model.NamedData]),
      fillInvalid = false)
    val RowResult(dmax, _) = ev.evaluateFormula("z.idxmax()"): @unchecked
    assert(dmax.collect().head.getString(0) == "0",
      "idxmax: first of the equal-zero rows, not the +0.0 one")
    val m2 = mat3(Seq(Seq(0.0), Seq(-0.0), Seq(5.0)), Seq("c0"))
    val ev2 = new FormulaEvaluator(reg("z" -> m2.asInstanceOf[graft.model.NamedData]),
      fillInvalid = false)
    val RowResult(dmin, _) = ev2.evaluateFormula("z.idxmin()"): @unchecked
    assert(dmin.collect().head.getString(0) == "0",
      "idxmin: first of the equal-zero rows, not the -0.0 one")
  }

  test(".nlargest/.nsmallest/.value_counts: pandas Series semantics (r9)") {
    // single-column matrix: (5, 2, 5, NaN, 1) under row ids 0..4
    val m = mat3(Seq(Seq(5.0), Seq(2.0), Seq(5.0), Seq(Double.NaN), Seq(1.0)),
      Seq("c0"))
    val ev = new FormulaEvaluator(reg("s" -> m), fillInvalid = false)
    // nlargest(2): both 5.0 rows, FIRST occurrence order (ids 0, 2)
    val MatrixResult(nl, rid, lbls, _) =
      ev.evaluateFormula("s.nlargest(2)"): @unchecked
    assert(lbls == Seq("c0"))
    val nlRows = nl.orderBy(org.apache.spark.sql.functions.col(rid))
      .collect().map(r => (r.get(0).toString, r.getDouble(1))).toSeq
    assert(nlRows == Seq(("0", 5.0), ("2", 5.0)), s"got $nlRows")
    // nsmallest default n=5 drops the NaN: 4 rows
    val MatrixResult(ns, _, _, _) =
      ev.evaluateFormula("s.nsmallest()"): @unchecked
    assert(ns.count() == 4)
    // value_counts: count desc, value asc tie-break; NaN dropped
    val MatrixResult(vc, vrid, vl, _) =
      ev.evaluateFormula("s.value_counts()"): @unchecked
    assert(vl == Seq("c0", "count"))
    val vcRows = vc.collect().map(r =>
      (r.getString(r.fieldIndex(vrid)), r.getDouble(r.fieldIndex("c0")),
        r.getDouble(r.fieldIndex("count")))).sortBy(_._1).toSeq
    assert(vcRows == Seq(("1", 5.0, 2.0), ("2", 1.0, 1.0), ("3", 2.0, 1.0)),
      s"got $vcRows")
    // vector path: Series.nlargest keeps labels, stable ties
    val ev2 = new FormulaEvaluator(reg("v" -> Vec(
      IndexedSeq(3.0, 9.0, 3.0, 1.0), IndexedSeq("a", "b", "c", "d"))),
      fillInvalid = false)
    val VecResult(tv) = ev2.evaluateFormula("v.nlargest(3)"): @unchecked
    assert(tv.labels == Seq("b", "a", "c") && tv.values == Seq(9.0, 3.0, 3.0))
    val VecResult(cv) = ev2.evaluateFormula("v.value_counts()"): @unchecked
    assert(cv.values == Seq(2.0, 1.0, 1.0) &&
      cv.labels == Seq("3.0", "1.0", "9.0"))
    // multi-column matrix rejected with the pandas columns= explanation
    val ev3 = new FormulaEvaluator(reg("a" -> fixA), fillInvalid = false)
    val e = intercept[FormulaTypeException](ev3.evaluateFormula("a.nlargest(2)"))
    assert(e.getMessage.contains("columns="))
    // terminal: composing past the frame is a clear error
    val e2 = intercept[FormulaTypeException](
      ev.evaluateFormula("s.nlargest(2).sum()"))
    assert(e2.getMessage.contains("terminal"))
  }

  test(".corr()/.dropna(): pairwise-complete Pearson; any-hole filter (r9)") {
    val nan = Double.NaN
    // rows (x, y): holes in DIFFERENT rows, so pairwise-complete differs
    // from listwise-complete (pandas corr is pairwise)
    val m = mat3(Seq(Seq(1.0, 2.0), Seq(2.0, nan), Seq(3.0, 6.0),
      Seq(4.0, 8.0), Seq(nan, 10.0), Seq(5.0, 11.0)), Seq("x", "y"))
    val ev = new FormulaEvaluator(reg("s" -> m), fillInvalid = false)
    val MatrixResult(df, rid, lbls, _) = ev.evaluateFormula("s.corr()"): @unchecked
    assert(lbls == Seq("x", "y"))
    val got = df.collect().map(r => r.getString(r.fieldIndex(rid)) ->
      (r.getDouble(r.fieldIndex("x")), r.getDouble(r.fieldIndex("y")))).toMap
    // pairwise (x,y) over rows 0,2,3,5: n=4 sx=13 sy=27 sxx=51 syy=225
    // sxy=107 → r = 77 / (sqrt(35)·sqrt(171)); pandas: 0.995333772
    val expected = BigDecimal(
      (4.0 * 107 - 13.0 * 27) /
        (math.sqrt(4.0 * 51 - 13.0 * 13) * math.sqrt(4.0 * 225 - 27.0 * 27)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("x")._2 == expected && got("y")._1 == expected, s"got $got")
    assert(got("x")._1 == 1.0 && got("y")._2 == 1.0) // diagonals exact
    // .cov(): same pairwise moments, ddof-1 closing form
    val MatrixResult(cdf, crid, _, _) = ev.evaluateFormula("s.cov()"): @unchecked
    val cgot = cdf.collect().map(r => r.getString(r.fieldIndex(crid)) ->
      (r.getDouble(r.fieldIndex("x")), r.getDouble(r.fieldIndex("y")))).toMap
    // cov(x,y) = (107 − 13·27/4) / 3 = 6.416666667 (pandas, pairwise)
    assert(cgot("x")._2 == 6.416666667 && cgot("y")._1 == 6.416666667,
      s"got $cgot")
    // diagonal = ddof-1 variance over that column's present rows:
    // x over rows 0,1,2,3,5 → var([1,2,3,4,5]) = 2.5
    assert(cgot("x")._1 == 2.5, s"got $cgot")
    // single column / Series / terminal composition all reject clearly
    val one = mat3(Seq(Seq(1.0), Seq(2.0)), Seq("x"))
    val e1 = intercept[FormulaTypeException](
      new FormulaEvaluator(reg("o" -> one), fillInvalid = false)
        .evaluateFormula("o.corr()"))
    assert(e1.getMessage.contains("two columns"))
    val e2 = intercept[FormulaTypeException](
      ev.evaluateFormula("s.corr().sum()"))
    assert(e2.getMessage.contains("terminal"))

    // dropna: rows 1 (y hole) and 4 (x hole) drop; values + ids survive
    val MatrixResult(dn, drid, dl, _) = ev.evaluateFormula("s.dropna()"): @unchecked
    assert(dl == Seq("x", "y"))
    val rows = dn.collect().map(r => (r.get(r.fieldIndex(drid)).toString,
      r.getDouble(r.fieldIndex("x")), r.getDouble(r.fieldIndex("y"))))
      .sortBy(_._1).toSeq
    assert(rows == Seq(("0", 1.0, 2.0), ("2", 3.0, 6.0), ("3", 4.0, 8.0),
      ("5", 5.0, 11.0)), s"got $rows")
    // vector path keeps labels; terminal past the frame
    val ev2 = new FormulaEvaluator(reg("v" -> Vec(
      IndexedSeq(3.0, Double.NaN, 1.0), IndexedSeq("a", "b", "c"))),
      fillInvalid = false)
    val VecResult(dv) = ev2.evaluateFormula("v.dropna()"): @unchecked
    assert(dv.values == Seq(3.0, 1.0) && dv.labels == Seq("a", "c"))
    val e3 = intercept[FormulaTypeException](
      ev.evaluateFormula("s.dropna().sum()"))
    assert(e3.getMessage.contains("terminal"))
  }

  test(".describe(): pandas' 8-stat summary frame; terminal; vector path") {
    val ev = new FormulaEvaluator(reg("a" -> fixA,
      "v4" -> Vec(IndexedSeq(10.0, 20.0, 30.0, 40.0),
        IndexedSeq("a", "b", "c", "d"))), fillInvalid = false)
    val MatrixResult(df, rowId, labels, _) =
      ev.evaluateFormula("a.describe()"): @unchecked
    assert(labels == Seq("c0", "c1", "c2"))
    val byStat = df.collect().map(r => r.getString(0) ->
      labels.indices.map(i => r.getDouble(i + 1))).toMap
    // fixA c0 = (1,4,1): count 3, mean 2, std √3, min 1, q25 1, q50 1,
    // q75 2.5, max 4
    assert(byStat("count")(0) == 3.0 && byStat("mean")(0) == 2.0)
    assertCell(byStat("std")(0), math.sqrt(3.0))
    assert(byStat("min")(0) == 1.0 && byStat("max")(0) == 4.0)
    assert(byStat("25%")(0) == 1.0 && byStat("50%")(0) == 1.0)
    assert(byStat("75%")(0) == 2.5)
    // terminal: composing past describe is a clear error
    val e = intercept[FormulaTypeException](ev.evaluateFormula("a.describe() + 1"))
    assert(e.getMessage.contains("terminal") ||
      e.getMessage.contains("cannot combine"), e.getMessage)
    // Series path: a driver vector of the 8 stats
    val VecResult(v) = ev.evaluateFormula("v4.describe()"): @unchecked
    assert(v.labels == IndexedSeq("count", "mean", "std", "min", "25%",
      "50%", "75%", "max"))
    assert(v.values(0) == 4.0 && v.values(1) == 25.0)
    assert(v.values(4) == 17.5 && v.values(6) == 32.5) // quartiles
  }

  test("method-form arithmetic equals the operator form, incl. reflected") {
    val ev = new FormulaEvaluator(reg("a" -> fixA, "b" -> fixB),
      fillInvalid = false)
    def cellsOf(f: String): Map[Long, Map[String, Double]] = {
      val MatrixResult(df, rowId, labels, _) = ev.evaluateFormula(f): @unchecked
      cells(df, rowId, labels)
    }
    assert(cellsOf("a.add(b).mul(2)") == cellsOf("(a + b) * 2"))
    assert(cellsOf("a.div(b)") == cellsOf("a / b"))
    assert(cellsOf("a.rsub(10)") == cellsOf("10 - a"))
    assert(cellsOf("a.rdiv(b)") == cellsOf("b / a"))
    assert(cellsOf("a.floordiv(2)") == cellsOf("a // 2"))
  }

  test("vector reduction family on the driver") {
    val ev = new FormulaEvaluator(reg(
      "v" -> Vec(IndexedSeq(3.0, 1.0, 4.0, 1.0), IndexedSeq("a", "b", "c", "d"))))
    def scalar(f: String): Double =
      (ev.evaluateFormula(f): @unchecked) match { case ScalarResult(x) => x }
    assert(scalar("v.min()") == 1.0 && scalar("v.max()") == 4.0)
    assert(scalar("v.count()") == 4.0)
    assert(scalar("v.median()") == 2.0) // (1,1,3,4) → (1+3)/2
    assert(scalar("v.quantile(0.25)") == 1.0) // pos 0.75 → 1 + 0.75·(1−1)
    assert(scalar("v.prod()") == 12.0)
    assertCell(scalar("v.var()"), 2.25) // mean 2.25; ss 6.75 → /3
  }

  test("new reductions are rejected in decimal modes where unsupported") {
    val ev = new FormulaEvaluator(reg("a" -> fixA), adpEnabled = true)
    assertThrows[AdpUnsupportedException](ev.evaluateFormula("a.std()"))
    assertThrows[AdpUnsupportedException](ev.evaluateFormula("a.prod()"))
  }
}
