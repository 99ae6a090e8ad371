package graft.model

import graft.SparkSpec
import graft.api.FormulaEvaluator
import graft.compile.{FormulaTypeException, MatrixResult}

/** [[Ingest.transposedMatrix]] — the sanctioned ingest-time route for the
  * reference's matrix `.T` (SURVEY §8 Q8; the compiler rejects in-formula
  * matrix transpose because a distributed row↔column flip breaks the
  * row-id data model). */
class TransposeSpec extends SparkSpec {

  test("transposedMatrix flips rows and columns, round-trips") {
    val t = Ingest.transposedMatrix(fixA) // 3×3, row ids 0..2, labels c0..c2
    assert(t.labels == Seq("0", "1", "2"))
    val got = t.base.collect().map(r =>
      r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // fixA rows: (1,7,6) (4,4,8) (1,7,2) → columns of the transpose
    assert(got("c0") == Seq(1.0, 4.0, 1.0))
    assert(got("c1") == Seq(7.0, 4.0, 7.0))
    assert(got("c2") == Seq(6.0, 8.0, 2.0))
    // double transpose = original cells
    val tt = Ingest.transposedMatrix(t)
    val back = tt.base.collect().map(r =>
      r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(back("0") == Seq(1.0, 7.0, 6.0))
    assert(back("1") == Seq(4.0, 4.0, 8.0))
    assert(back("2") == Seq(1.0, 7.0, 2.0))
  }

  test("NaN cells survive the transpose") {
    val t = Ingest.transposedMatrix(fixI) // row 0: (7, NaN, 1)
    val byId = t.base.collect().map(r => r.getString(0) -> r).toMap
    assert(byId("c1").getDouble(1).isNaN) // fixI[0][c1]
    assert(byId("c0").getDouble(1) == 7.0)
  }

  test("the transposed matrix is a first-class formula operand") {
    val ev = new FormulaEvaluator(reg("at" -> Ingest.transposedMatrix(fixA)))
    val MatrixResult(df, rowId, labels, _) =
      ev.evaluateFormula("at * 2"): @unchecked
    val got = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("c0") == 2.0 && got("c2") == 12.0)
    assert(labels == Seq("0", "1", "2"))
  }

  test("numeric row ids keep NUMERIC order past 10 rows (not 0,1,10,11,…,2)") {
    val src = spark.range(12).selectExpr("id AS __row_id__",
      "CAST(id * 10 AS DOUBLE) AS v")
    val t = Ingest.transposedMatrix(Matrix.of(src, "__row_id__", Seq("v")))
    assert(t.labels == (0 until 12).map(_.toString),
      s"column order must follow the source row-id order, got ${t.labels}")
    val row = t.base.collect().head
    assert((0 until 12).forall(i => row.getDouble(i + 1) == i * 10.0))
  }

  test("a data-scaled frame is refused, not collected") {
    val big = spark.range(20001).selectExpr("id AS __row_id__",
      "CAST(id AS DOUBLE) AS v")
    val e = intercept[IllegalArgumentException](
      Ingest.transposedMatrix(Matrix.of(big, "__row_id__", Seq("v"))))
    assert(e.getMessage.contains("schema columns"))
  }

  test("the in-formula .T rejection points at the ingest helper") {
    val ev = new FormulaEvaluator(reg("a" -> fixA))
    val e = intercept[FormulaTypeException](ev.evaluateFormula("a.T"))
    assert(e.getMessage.contains("transposedMatrix"))
  }
}
