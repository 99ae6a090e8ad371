package graft.compile

import graft.SparkSpec
import graft.api.FormulaEvaluator
import graft.model.{Matrix, Vec}

/** r11 `.agg('fn')` / `.agg(['fn1', 'fn2'])`: pandas' named-aggregation
  * dispatch on the string/list literals. A single name delegates to the
  * method itself; a list builds the stat frame (one row per function
  * name, the describe shape) from the same per-method reduce plans. */
class AggDispatchSpec extends SparkSpec {

  // columns c0=(1,4,NaN), c1=(2,2,8)
  private def m2: Matrix =
    mat3(Seq(Seq(1.0, 2.0), Seq(4.0, 2.0), Seq(Double.NaN, 8.0)),
      labels = Seq("c0", "c1"))

  test("agg('fn') delegates to the method (1-row Series reduction)") {
    val ev = new FormulaEvaluator(reg("s" -> m2), fillInvalid = false)
    val RowResult(df, labels) = ev.evaluateFormula("s.agg('sum')"): @unchecked
    val r = df.collect().head
    assert(r.getDouble(r.fieldIndex("c0")) == 5.0)
    assert(r.getDouble(r.fieldIndex("c1")) == 12.0)
    // exactly what .sum() itself produces
    val RowResult(df2, _) = ev.evaluateFormula("s.sum()"): @unchecked
    assert(df2.collect().head == r)
  }

  test("agg([...]) builds the stat frame: one row per function") {
    val ev = new FormulaEvaluator(reg("s" -> m2), fillInvalid = false)
    val MatrixResult(df, rowId, labels, _) =
      ev.evaluateFormula("s.agg(['sum', 'mean', 'count'])"): @unchecked
    assert(labels == Seq("c0", "c1"))
    val byName = df.collect().map(r =>
      r.getString(r.fieldIndex(rowId)) ->
        labels.map(l => r.getDouble(r.fieldIndex(l)))).toMap
    assert(byName.keySet == Set("sum", "mean", "count"))
    assert(byName("sum") == Seq(5.0, 12.0))
    assert(byName("mean") == Seq(2.5, 4.0))
    assert(byName("count") == Seq(2.0, 3.0))
  }

  test("vector agg: single name → scalar, list → named Series") {
    val v = Vec(IndexedSeq(1.0, Double.NaN, 3.0),
      IndexedSeq("l0", "l1", "l2"))
    val ev = new FormulaEvaluator(reg("v" -> v))
    val ScalarResult(s) = ev.evaluateFormula("v.agg('max')"): @unchecked
    assert(s == 3.0)
    val VecResult(out) =
      ev.evaluateFormula("v.agg(['min', 'median'])"): @unchecked
    assert(out.labels == Seq("min", "median"))
    assert(out.values == Seq(1.0, 2.0))
  }

  test("clean errors: unknown name, non-reduction, mixed list, " +
      "object-dtype functions excluded from the list form") {
    val ev = new FormulaEvaluator(reg("s" -> m2), fillInvalid = false)
    val e1 = intercept[FormulaTypeException](
      ev.evaluateFormula("s.agg('rolling')"))
    assert(e1.getMessage.contains("supports"))
    intercept[FormulaTypeException](ev.evaluateFormula("s.agg(['sum', 5])"))
    intercept[FormulaTypeException](ev.evaluateFormula("s.agg([])"))
    intercept[FormulaTypeException](ev.evaluateFormula("s.agg(5)"))
    // idxmax yields string cells; any/all boolean — the double stat
    // frame excludes them (single-name form still dispatches them)
    intercept[FormulaTypeException](
      ev.evaluateFormula("s.agg(['sum', 'idxmax'])"))
    assert(ev.evaluateFormula("s.agg('idxmax')") != null)
  }
}
