package graft.api

import java.math.{BigDecimal => JBigDecimal, MathContext}

import graft.SparkSpec
import graft.compile.MatrixResult
import graft.model._

/** Port of the reference's std-vs-ADP precision contract
  * (tests/test_FormulaEvaluator_pt2.py:578-645): a `small * large * small`
  * chain whose exact value is `small`, evaluated in both modes; the ADP
  * (decimal) path must carry a strictly smaller relative error than the
  * double path, and that error must be below 1e-40.
  *
  * The reference runs the scenario at 1e-16/1e16 on mpmath's mpf —
  * arbitrary-precision BINARY float with an unbounded exponent. Our ADP
  * cells are DecimalType(24,12) (SURVEY §7.4.5): base-10, fixed scale, so
  * the contract holds only inside the representable regime. This suite
  * asserts the contract where Decimal covers it (1e-5/1e5 — double is
  * inexact there, decimal is exact) and pins the measured boundaries where
  * Decimal exits the regime the reference's mpf keeps:
  *   - magnitudes below 5e-13 ingest to 0 (scale 12 rounds them away);
  *   - intermediate products keep ≥ 6 fractional digits (Spark's
  *     minimum-scale-6 rule), so factors below 1e-6 lose exactness
  *     mid-formula even when the inputs ingest fine;
  *   - integral magnitudes ≥ 1e12 overflow the 12 integer digits of
  *     (24,12) at ingest.
  */
class PrecisionContractSpec extends SparkSpec {

  /** Exact decimal value of a double (its full binary expansion). */
  private def exactOf(d: Double) = new JBigDecimal(d)

  private def relErr(actual: JBigDecimal, expected: JBigDecimal): JBigDecimal =
    actual.subtract(expected).abs()
      .divide(expected.abs(), new MathContext(60))

  private def firstCell(ev: FormulaEvaluator, formula: String): Any =
    ev.evaluateFormula(formula) match {
      case MatrixResult(df, rowId, labels, _) =>
        val r = df.orderBy(rowId).head()
        r.get(r.fieldIndex(labels.head))
      case other => fail(s"expected matrix result, got $other")
    }

  test("ADP beats double on small*large*small, error < 1e-40 (pt2:578-645)") {
    val small = 1e-5
    val large = 1e5
    val smallM = mat3(Seq.fill(2)(Seq.fill(3)(small)) :+ Seq.fill(3)(small))
    val largeM = mat3(Seq.fill(2)(Seq.fill(3)(large)) :+ Seq.fill(3)(large))
    val expected = new JBigDecimal("1e-5") // exact: 1e-5 * 1e5 * 1e-5

    val evStd = new FormulaEvaluator(
      reg("small_test" -> smallM, "large_test" -> largeM))
    val stdVal = firstCell(evStd, "small_test * large_test * small_test")
      .asInstanceOf[Double]
    val stdErr = relErr(exactOf(stdVal), expected)

    val evAdp = new FormulaEvaluator(
      reg("small_test" -> smallM, "large_test" -> largeM), adpEnabled = true)
    val adpVal = firstCell(evAdp, "small_test * large_test * small_test")
      .asInstanceOf[JBigDecimal]
    val adpErr = relErr(adpVal, expected)

    // double cannot represent 1e-5, so its error is the representation
    // error (~8e-17); the decimal chain is exact end-to-end here
    assert(stdErr.compareTo(JBigDecimal.ZERO) > 0,
      s"double path should be inexact at 1e-5, got err $stdErr")
    assert(adpErr.compareTo(stdErr) < 0,
      s"ADP must beat double: adp=$adpErr std=$stdErr")
    assert(adpErr.compareTo(new JBigDecimal("1e-40")) < 0,
      s"ADP error must be < 1e-40, got $adpErr")
  }

  test("boundary: magnitudes below the scale-12 ulp ingest to zero in ADP") {
    // the reference's own 1e-16 scenario sits OUTSIDE Decimal(24,12)'s
    // regime: ingest rounds it to 0E-12 and the contract inverts
    val tiny = mat3(Seq.fill(3)(Seq.fill(3)(1e-16)))
    val ev = new FormulaEvaluator(reg("tiny" -> tiny), adpEnabled = true)
    val got = firstCell(ev, "tiny * 1").asInstanceOf[JBigDecimal]
    assert(got.compareTo(JBigDecimal.ZERO) == 0,
      s"1e-16 must round away at scale 12, got $got")
    // 1e-12 is the smallest exactly-held magnitude (one ulp of scale 12)
    val edge = mat3(Seq.fill(3)(Seq.fill(3)(1e-12)))
    val ev2 = new FormulaEvaluator(reg("edge" -> edge), adpEnabled = true)
    val got2 = firstCell(ev2, "edge * 1").asInstanceOf[JBigDecimal]
    assert(got2.compareTo(new JBigDecimal("1e-12")) == 0,
      s"1e-12 must survive ingest exactly, got $got2")
  }

  test("boundary: products keep >= 6 fractional digits (min-scale rule)") {
    // (38,13) * (24,12) adjusts to scale 6 under Spark's decimal rules, so
    // a 1e-6 final value is still exact but 1e-7 would not be — document
    // the exactness edge INSIDE a formula, not just at ingest
    val small = mat3(Seq.fill(3)(Seq.fill(3)(1e-6)))
    val large = mat3(Seq.fill(3)(Seq.fill(3)(1e6)))
    val ev = new FormulaEvaluator(
      reg("small_test" -> small, "large_test" -> large), adpEnabled = true)
    val got = firstCell(ev, "small_test * large_test * small_test")
      .asInstanceOf[JBigDecimal]
    assert(got.compareTo(new JBigDecimal("1e-6")) == 0,
      s"1e-6 sits exactly on the min-scale-6 edge, got $got")
  }

  test("boundary: integral magnitudes >= 1e12 fail ADP ingest loudly") {
    // (24,12) holds 12 integer digits; ANSI mode turns the overflow into a
    // clean SparkArithmeticException at ingest instead of a silent NULL —
    // the engine REFUSES the regime rather than corrupting it
    val big = mat3(Seq.fill(3)(Seq.fill(3)(1e12)))
    val ev = new FormulaEvaluator(reg("big" -> big), adpEnabled = true)
    val e = intercept[Exception](ev.evaluateFormula("big * 1"))
    assert(e.getMessage.contains("Decimal(24, 12)"), e.getMessage.take(200))
    // one ulp under the edge survives exactly
    val edge = mat3(Seq.fill(3)(Seq.fill(3)(999999999999.0)))
    val ev2 = new FormulaEvaluator(reg("edge" -> edge), adpEnabled = true)
    val got = firstCell(ev2, "edge * 1").asInstanceOf[JBigDecimal]
    assert(got.compareTo(new JBigDecimal("999999999999")) == 0)
  }
}
