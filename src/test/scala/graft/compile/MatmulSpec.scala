package graft.compile

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.api.FormulaEvaluator
import graft.ast.FormulaSyntaxException
import graft.model.{Matrix, Vec}

/** `.matmul(b)` (E12): pandas DataFrame.dot semantics — matrix⊗vector as a
  * positional linear combination of columns, matrix⊗matrix as a literal-
  * coefficient column-space transform against a driver-collected registry
  * matrix. Reference surface: pd.eval method dispatch
  * (coeff_maker.py:766); `@` itself stays rejected like pd.eval (SURVEY §8
  * Q8). Expected values are hand-computed dot products over the frozen
  * FIXTURES.md §A matrices.
  */
class MatmulSpec extends SparkSpec {

  /** 3×2 coefficient matrix keyed by the fixtures' COLUMN labels c0..c2. */
  private lazy val coefM: Matrix = {
    val schema = StructType(Seq(StructField("__row_id__", StringType),
      StructField("d1", DoubleType), StructField("d2", DoubleType)))
    val df = spark.createDataFrame(java.util.List.of(
      Row("c0", 1.0, 2.0), Row("c1", 3.0, 4.0), Row("c2", 5.0, 6.0)), schema)
    Matrix.of(df, "__row_id__", Seq("d1", "d2"))
  }

  private def evalCells(f: String, extra: (String, graft.model.NamedData)*) = {
    val ev = new FormulaEvaluator(
      reg(Seq("a" -> fixA, "b" -> fixB, "i" -> fixI, "m" -> coefM,
        "v" -> Vec(IndexedSeq(1.0, 2.0, 3.0), IndexedSeq("c0", "c1", "c2")),
        "u" -> Vec(IndexedSeq(4.0, 5.0, 6.0), IndexedSeq("c0", "c1", "c2")))
        ++ extra: _*),
      fillInvalid = false)
    ev.evaluateFormula(f)
  }

  test("matrix.matmul(vector): positional linear combination of columns") {
    val MatrixResult(df, rowId, labels, _) = evalCells("a.matmul(v)"): @unchecked
    assert(labels == Seq("0"))
    val got = cells(df, rowId, labels)
    // fixA rows: (1,7,6) (4,4,8) (1,7,2) · (1,2,3)
    assertCell(got(0L)("0"), 1 + 14 + 18)
    assertCell(got(1L)("0"), 4 + 8 + 24)
    assertCell(got(2L)("0"), 1 + 14 + 6)
  }

  test("matrix.matmul(matrix): column-space transform, right labels out") {
    val MatrixResult(df, rowId, labels, _) = evalCells("a.matmul(m)"): @unchecked
    assert(labels == Seq("d1", "d2"))
    val got = cells(df, rowId, labels)
    assertCell(got(0L)("d1"), 1 + 21 + 30); assertCell(got(0L)("d2"), 2 + 28 + 36)
    assertCell(got(1L)("d1"), 4 + 12 + 40); assertCell(got(1L)("d2"), 8 + 16 + 48)
    assertCell(got(2L)("d1"), 1 + 21 + 10); assertCell(got(2L)("d2"), 2 + 28 + 12)
  }

  test("matmul composes with element-wise operators") {
    val MatrixResult(df, rowId, labels, _) =
      evalCells("(a + b).matmul(v) / 2"): @unchecked
    val got = cells(df, rowId, labels)
    // (a+b) rows: (2,10,10) (7,8,11) (5,10,3) · (1,2,3) / 2
    assertCell(got(0L)("0"), (2 + 20 + 30) / 2.0)
    assertCell(got(1L)("0"), (7 + 16 + 33) / 2.0)
    assertCell(got(2L)("0"), (5 + 20 + 9) / 2.0)
  }

  test("NaN cells poison their dot product only (numpy propagation)") {
    val MatrixResult(df, rowId, labels, _) = evalCells("i.matmul(v)"): @unchecked
    val got = cells(df, rowId, labels)
    assert(got(0L)("0").isNaN) // (7, NaN, 1)
    assertCell(got(1L)("0"), 9 + 10 + 27) // (9,5,9) clean
    assert(got(2L)("0").isNaN) // (7, 8, NaN)
  }

  test("vector.matmul(vector): driver dot product") {
    val ScalarResult(x) = evalCells("v.matmul(u)"): @unchecked
    assert(x == 4.0 + 10.0 + 18.0)
  }

  test("vector.matmul(registry matrix): labels align to its row ids") {
    val VecResult(vec) = evalCells("v.matmul(m)"): @unchecked
    assert(vec.labels == IndexedSeq("d1", "d2"))
    assert(vec.values == IndexedSeq(1 + 6 + 15.0, 2 + 8 + 18.0))
  }

  test("reduction.matmul(registry matrix): pandas Series-from-reduction .dot") {
    // a.sum() = (c0: 6, c1: 18, c2: 16); · m rows (1,2)(3,4)(5,6)
    val RowResult(df, labels) = evalCells("a.sum().matmul(m)"): @unchecked
    assert(labels == Seq("d1", "d2"))
    val row = df.collect().head
    assert(row.getDouble(0) == 6 + 54 + 80.0)
    assert(row.getDouble(1) == 12 + 72 + 96.0)
  }

  test("matrix.matmul(reduction): df.dot(Series) with label alignment") {
    val MatrixResult(df, rowId, labels, _) = evalCells("a.matmul(a.sum())"): @unchecked
    assert(labels == Seq("0"))
    val got = cells(df, rowId, labels)
    assertCell(got(0L)("0"), 6 + 126 + 96)
    assertCell(got(1L)("0"), 24 + 72 + 128)
    assertCell(got(2L)("0"), 6 + 126 + 32)
  }

  test("scalar left operand gets a targeted error, not a bogus alignment one") {
    val e = intercept[FormulaTypeException](evalCells("(v.matmul(u)).matmul(m)"))
    assert(e.getMessage.contains("scalar has no"), e.getMessage)
  }

  test("misaligned shapes raise pandas' alignment error") {
    // wrong vector length
    val e1 = intercept[FormulaTypeException](evalCells("a.matmul(w2)",
      "w2" -> Vec(IndexedSeq(1.0, 2.0), IndexedSeq("c0", "c1"))))
    assert(e1.getMessage.contains("not aligned"))
    // right operand keyed by the row-id domain, not the column labels
    val e2 = intercept[FormulaTypeException](evalCells("a.matmul(b)"))
    assert(e2.getMessage.contains("not aligned"))
  }

  test("vector.matmul(distributed matrix expression) is rejected clearly") {
    val e = intercept[FormulaTypeException](evalCells("v.matmul(a + b)"))
    assert(e.getMessage.contains("row-aligned"))
  }

  test("matmul is rejected in ADP mode") {
    val ev = new FormulaEvaluator(reg("a" -> fixA,
      "v" -> Vec(IndexedSeq(1.0, 2.0, 3.0), IndexedSeq("c0", "c1", "c2"))),
      adpEnabled = true)
    assertThrows[AdpUnsupportedException](ev.evaluateFormula("a.matmul(v)"))
  }

  test("the `@` operator stays rejected at the tokenizer (pd.eval parity)") {
    assertThrows[FormulaSyntaxException](
      graft.ast.FormulaParser.parse("a @ b"))
  }

  test("matmul compiles to a pure projection: no join, no shuffle") {
    val MatrixResult(df, _, _, _) = evalCells("a.matmul(m)"): @unchecked
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"unexpected join in:\n$plan")
  }
}
