package graft.api

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.compile._
import graft.model._

/** Unbounded-exponent ADP mode goldens — ports of the reference's mpf
  * extreme-magnitude tests that the bounded DecimalType(38,s) geometry
  * cannot represent (reference: tests/test_FormulaEvaluator_pt2.py:383-409
  * high-precision addition, :578-645 std-vs-adp precision comparison).
  * Cells are canonical decimal strings; arithmetic is java.math.BigDecimal
  * via the compiled graft.functions.BigDecMath expression family.
  */
class UnboundedAdpSpec extends SparkSpec {

  /** 2×2 matrix of one repeated decimal-string literal (the shape the
    * reference builds with pd.DataFrame of mpf values). */
  private def strMat2(v: String): Matrix = {
    val labels = Seq("c0", "c1")
    val schema = StructType(StructField("__row_id__", LongType) +:
      labels.map(l => StructField(l, StringType)))
    val data = Seq(Row(0L, v, v), Row(1L, v, v))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava), schema)
    Matrix.of(df, "__row_id__", labels)
  }

  private def ubpEval(registry: Map[String, NamedData]): FormulaEvaluator =
    new FormulaEvaluator(registry, adpEnabled = true, decimalPrecision = 50,
      fillInvalid = false, unboundedExponent = true)

  /** Collect a string-cell matrix to (rowId → label → BigDecimal). */
  private def bdCells(r: EvalResult): Map[Long, Map[String, java.math.BigDecimal]] = {
    val MatrixResult(df, rowId, labels, _) = r: @unchecked
    df.collect().map { row =>
      row.getLong(row.fieldIndex(rowId)) -> labels.map { l =>
        val v = row.get(row.fieldIndex(l))
        l -> (if (v == null) null else new java.math.BigDecimal(v.toString))
      }.toMap
    }.toMap
  }

  private def assertAll(r: EvalResult, expected: String): Unit =
    bdCells(r).foreach { case (_, cols) => cols.foreach { case (_, v) =>
      assert(v != null && v.compareTo(new java.math.BigDecimal(expected)) == 0,
        s"expected $expected, got $v")
    }}

  test("high-precision addition: 1e-30 + 1e-30 = exactly 2e-30 (pt2:383-409)") {
    val ev = ubpEval(reg("small_hp" -> strMat2("1e-30")))
    assertAll(ev.evaluateFormula("small_hp + small_hp"), "2E-30")
  }

  test("extreme multiplication: 1e-30 * 1e30 = exactly 1 (pt2:412-440)") {
    val ev = ubpEval(reg(
      "small" -> strMat2("1e-30"), "large" -> strMat2("1e30")))
    assertAll(ev.evaluateFormula("small * large"), "1")
  }

  test("precision chain: 1e-16 * 1e16 * 1e-16 = exactly 1e-16, rel err < 1e-40 (pt2:578-645)") {
    val ev = ubpEval(reg(
      "small_test" -> strMat2("1e-16"), "large_test" -> strMat2("1e16")))
    // BigDecimal multiplication is exact, so the relative error is 0 —
    // strictly inside the reference's mpf contract (< 1e-40)
    assertAll(ev.evaluateFormula("small_test * large_test * small_test"), "1E-16")
  }

  test("round-trip: extreme magnitudes survive ingest unchanged (canonical form)") {
    val ev = ubpEval(reg(
      "tiny" -> strMat2("1e-30"), "huge" -> strMat2("1.00000000000000000001e30")))
    assertAll(ev.evaluateFormula("tiny * 1"), "1E-30")
    // 21 significant digits — beyond float64 (≈15.95) AND beyond
    // DecimalType(38,s)'s representable window at e30 with any fraction
    assertAll(ev.evaluateFormula("huge + 0"), "1.00000000000000000001E+30")
  }

  test("mixed-magnitude addition keeps every digit: 1e30 + 1e-30") {
    val ev = ubpEval(reg(
      "tiny" -> strMat2("1e-30"), "huge" -> strMat2("1e30")))
    val got = bdCells(ev.evaluateFormula("huge + tiny"))(0L)("c0")
    // 61 significant digits — exact (mpf at default precision would round;
    // BigDecimal addition is lossless)
    assert(got.compareTo(new java.math.BigDecimal(
      "1000000000000000000000000000000.000000000000000000000000000001")) == 0)
  }

  test("division honors decimalPrecision; division by zero is the invalid marker") {
    val ev = ubpEval(reg(
      "one" -> strMat2("1"), "three" -> strMat2("3"), "zero" -> strMat2("0")))
    val third = bdCells(ev.evaluateRaw("one / three"))(1L)("c1")
    assert(third.precision == 50, s"expected 50 sig digits, got ${third.precision}")
    assert(third.toString.startsWith("0.3333333333"))
    // /0 → NULL cells → all-invalid error from the validation subsystem
    intercept[graft.validate.AllInvalidResultException] {
      ev.evaluateFormula("one / zero")
    }
  }

  test("numeric comparisons and clip work on string cells (not lexicographic)") {
    val ev = ubpEval(reg(
      "small" -> strMat2("2e-30"), "large" -> strMat2("1e30")))
    // lexicographically "2e-30" > "1e30"; numerically it is smaller
    val MatrixResult(df, rowId, labels, isBool) =
      ev.evaluateFormula("small < large"): @unchecked
    assert(isBool)
    assert(cells(df, rowId, labels).forall(_._2.forall(_._2 == 1.0)))
    assertAll(ev.evaluateFormula("large.clip(0, 1)"), "1")
  }

  test("reductions: exact sum and mean over extreme magnitudes") {
    val ev = ubpEval(reg("m" -> strMat2("1e-30")))
    val RowResult(df, labels) = ev.evaluateFormula("m.sum()"): @unchecked
    val row = df.collect().head
    labels.foreach { l =>
      val v = new java.math.BigDecimal(row.get(row.fieldIndex(l)).toString)
      assert(v.compareTo(new java.math.BigDecimal("2E-30")) == 0,
        s"sum: expected 2E-30, got $v")
    }
    val RowResult(df2, labels2) = ev.evaluateFormula("m.mean()"): @unchecked
    val row2 = df2.collect().head
    labels2.foreach { l =>
      val v = new java.math.BigDecimal(row2.get(row2.fieldIndex(l)).toString)
      assert(v.compareTo(new java.math.BigDecimal("1E-30")) == 0,
        s"mean: expected 1E-30, got $v")
    }
  }

  test("numeric ingest: double columns arrive as their shortest-decimal value") {
    // fixA holds plain doubles; UBP ingest casts via the double→string
    // shortest representation, so small integers are exact
    val ev = ubpEval(reg("a" -> fixA))
    val got = bdCells(ev.evaluateFormula("a + a"))
    assert(got(0L)("c0").compareTo(java.math.BigDecimal.valueOf(2)) == 0)
    assert(got(2L)("c1").compareTo(java.math.BigDecimal.valueOf(14)) == 0)
  }

  test("ADP guards apply: ** and math functions rejected, non-numeric strings raise") {
    val ev = ubpEval(reg("a" -> strMat2("2")))
    intercept[AdpUnsupportedException] { ev.evaluateFormula("a ** 2") }
    intercept[AdpUnsupportedException] { ev.evaluateFormula("log(a)") }
    val bad = ubpEval(reg("junk" -> strMat2("not-a-number")))
    val thrown = intercept[Throwable] { ev2Force(bad) }
    assert(exists(thrown, classOf[NumberFormatException]),
      s"expected NumberFormatException in cause chain, got $thrown")
  }

  private def ev2Force(ev: FormulaEvaluator): Unit = {
    val MatrixResult(df, _, _, _) = ev.evaluateRaw("junk + junk"): @unchecked
    df.collect()
  }

  private def exists(t: Throwable, c: Class[_ <: Throwable]): Boolean = {
    var cur: Throwable = t
    while (cur != null) {
      if (c.isInstance(cur)) return true
      cur = cur.getCause
    }
    false
  }
}
