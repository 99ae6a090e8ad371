package graft.api

import graft.SparkSpec
import graft.compile._
import graft.model._

/** Batch-driver semantics (reference tests/test_CoefficientCalculator.py)
  * plus decimal (ADP) mode behavior. */
class CoefficientCalculatorSpec extends SparkSpec {

  private def formulaTable(rows: (String, String)*): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("result_name", StringType), StructField("formula", StringType),
      StructField("description", StringType)))
    val data = rows.map { case (n, f) => R(n, f, "") }
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava), schema)
  }

  test("batch loop: computes all, skips empty and missing-variable formulas (F3/F4/X3)") {
    val fm = formulaTable(
      "sum_ab" -> "a + b", "diff_ab" -> "a - b", "a_times_c" -> "a * c",
      "a_divided_by_b" -> "a / b", "empty_formula" -> "",
      "missing_var" -> "a + nosuchvar")
    val calc = new CoefficientCalculator(
      reg("a" -> fixA, "b" -> fixB, "c" -> fixC), fm, adpEnabled = false)
    val out = calc.computeCoefficients()
    assert(out.keySet == Set("sum_ab", "diff_ab", "a_times_c", "a_divided_by_b"))
    val MatrixResult(df, rowId, labels, _) = out("sum_ab"): @unchecked
    val got = cells(df, rowId, labels)
    assert(got(0L)("c0") == 2.0 && got(1L)("c2") == 11.0)
  }

  test("custom column names (examples/README.md:322-341)") {
    import org.apache.spark.sql.functions._
    val fm = formulaTable("r1" -> "a * 2")
      .withColumnRenamed("formula", "calculation")
    val calc = new CoefficientCalculator(reg("a" -> fixA), fm,
      formulaNameCol = "calculation", adpEnabled = false)
    assert(calc.computeCoefficients().keySet == Set("r1"))
  }

  test("missing mandatory columns raise (F6)") {
    val fm = formulaTable("x" -> "a")
    assertThrows[IllegalArgumentException](
      new CoefficientCalculator(reg("a" -> fixA), fm, resultNameCol = "wrong_col"))
  }

  test("ADP mode: decimal arithmetic is exact; ** rejected cleanly (E3/Q4)") {
    val fm = formulaTable("m" -> "a * b + c", "p" -> "a ** b")
    val calc = new CoefficientCalculator(
      reg("a" -> fixA, "b" -> fixB, "c" -> fixC), fm, adpEnabled = true)
    assertThrows[AdpUnsupportedException](calc.computeCoefficients())
    val calc2 = new CoefficientCalculator(
      reg("a" -> fixA, "b" -> fixB, "c" -> fixC),
      formulaTable("m" -> "a * b + c"), adpEnabled = true)
    val out = calc2.computeCoefficients()
    val MatrixResult(df, rowId, labels, _) = out("m"): @unchecked
    assert(df.schema(labels.head).dataType.isInstanceOf[
      org.apache.spark.sql.types.DecimalType])
    val got = cells(df, rowId, labels)
    assert(got(0L)("c0") == 3.0 && got(1L)("c2") == 26.0)
  }

  test("ADP division by zero yields invalid cells → clean all-invalid error (Q5 divergence)") {
    val calc = new CoefficientCalculator(
      reg("a" -> fixA, "e" -> fixE), formulaTable("d" -> "a / e"), adpEnabled = true)
    assertThrows[graft.validate.AllInvalidResultException](calc.computeCoefficients())
  }

  test("ADP fill_invalid fills nulls with decimal zero") {
    val calc = new CoefficientCalculator(
      reg("a" -> fixA, "g" -> fixG), formulaTable("d" -> "a / g"),
      adpEnabled = true, fillInvalid = true)
    val out = calc.computeCoefficients()
    val MatrixResult(df, rowId, labels, _) = out("d"): @unchecked
    val got = cells(df, rowId, labels)
    assert(got(0L)("c1") == 0.0)               // filled x/0
    assertCell(got(0L)("c0"), 1.0 / 6, 1e-9)   // 1/6 in decimal
  }

  test("ADP beats double precision on decimal-fraction arithmetic (pt2 spirit)") {
    // 0.1 + 0.2 != 0.3 in binary64; exact in decimal cells. The reference's
    // equivalent claim is mpmath's better-than-double relative error
    // (tests/test_FormulaEvaluator_pt2.py:578-645); mpf's arbitrary binary
    // exponent itself is out of reach for fixed-scale decimal —
    // documented divergence, SURVEY §7.4(5).
    val m1 = mat3(Seq.fill(3)(Seq(0.1, 0.1, 0.1)))
    val m2 = mat3(Seq.fill(3)(Seq(0.2, 0.2, 0.2)))
    val evAdp = new FormulaEvaluator(reg("x" -> m1, "y" -> m2), adpEnabled = true)
    val MatrixResult(df, rowId, labels, _) = evAdp.evaluateFormula("x + y"): @unchecked
    val cell = df.collect()(0).getDecimal(1)
    assert(cell.compareTo(new java.math.BigDecimal("0.3")) == 0) // exact
    val evStd = new FormulaEvaluator(reg("x" -> m1, "y" -> m2))
    val MatrixResult(dfS, _, _, _) = evStd.evaluateFormula("x + y"): @unchecked
    assert(dfS.collect()(0).getDouble(1) != 0.3) // binary64 artifact
  }

  test("writeResults persists every result shape to parquet (S4 sink)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val fm = formulaTable("m" -> "a * 2", "v" -> "a.sum()", "s" -> "1 + 2")
    val calc = new CoefficientCalculator(reg("a" -> fixA), fm, adpEnabled = false)
    val out = calc.computeCoefficients()
    calc.writeResults(out, dir)
    val m = spark.read.parquet(s"$dir/m")
    assert(m.count() == 3 && m.columns.toSeq == Seq("__row_id__", "c0", "c1", "c2"))
    assert(spark.read.parquet(s"$dir/v").count() == 1)
    assert(spark.read.parquet(s"$dir/s").head().getDouble(0) == 3.0)
  }

  test("results are not fed back into the registry (no chaining, S4)") {
    val fm = formulaTable("first" -> "a * 2", "second" -> "first + 1")
    val calc = new CoefficientCalculator(reg("a" -> fixA), fm, adpEnabled = false)
    val out = calc.computeCoefficients()
    assert(out.keySet == Set("first")) // 'second' skipped: 'first' unknown
  }

  test("parallel batch evaluation matches sequential results (X3 pool)") {
    val fm = formulaTable(
      "sum_ab" -> "a + b", "diff_ab" -> "a - b", "prod" -> "a * c",
      "skipme" -> "", "missing" -> "a + nope", "scaled" -> "a * 2.5")
    def run(par: Int) = {
      val out = new CoefficientCalculator(
        reg("a" -> fixA, "b" -> fixB, "c" -> fixC), fm,
        adpEnabled = false, parallelism = par).computeCoefficients()
      out.map { case (n, MatrixResult(df, rowId, labels, _)) =>
        n -> cells(df, rowId, labels) }
    }
    val (seq1, par4) = (run(1), run(4))
    assert(seq1.keys.toSeq == par4.keys.toSeq) // table order preserved
    assert(seq1 == par4)
    // errors propagate from the pool like the sequential loop
    val bad = new CoefficientCalculator(reg("a" -> fixA, "e" -> fixE),
      formulaTable("d" -> "a / e"), adpEnabled = false, parallelism = 4)
    assertThrows[graft.validate.AllInvalidResultException](bad.computeCoefficients())
  }

  test("chainResults extension: later formulas see earlier results (S4 ext)") {
    val fm = formulaTable(
      "first" -> "a * 2", "second" -> "first + 1",  // matrix chain
      "tot" -> "first.sum()", "scaled" -> "a * tot") // reduction → vec chain
    val calc = new CoefficientCalculator(reg("a" -> fixA), fm,
      adpEnabled = false, chainResults = true)
    val out = calc.computeCoefficients()
    assert(out.keySet == Set("first", "second", "tot", "scaled"))
    val MatrixResult(df, rowId, labels, _) = out("second"): @unchecked
    val got = cells(df, rowId, labels)
    assert(got(0L)("c0") == 3.0) // a(0,0)=1 → 1*2+1
    // chained name shadows an input of the same name
    val fm2 = formulaTable("a" -> "a + 1", "b2" -> "a * 10")
    val out2 = new CoefficientCalculator(reg("a" -> fixA), fm2,
      adpEnabled = false, chainResults = true).computeCoefficients()
    val MatrixResult(df2, rid2, lb2, _) = out2("b2"): @unchecked
    assert(cells(df2, rid2, lb2)(0L)("c0") == 20.0) // (1+1)*10
  }
}
