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

  test("agg('fn') delegates on the window markers (rolling/ewm)") {
    val ev = new FormulaEvaluator(reg("s" -> m2), fillInvalid = false)
    val MatrixResult(df1, rid, labels, _) =
      ev.evaluateFormula("s.rolling(2).agg('mean')"): @unchecked
    val MatrixResult(df2, _, _, _) =
      ev.evaluateFormula("s.rolling(2).mean()"): @unchecked
    assert(df1.orderBy(rid).collect().toSeq ==
      df2.orderBy(rid).collect().toSeq)
    // the list form stays frame/Series-only
    val e = intercept[FormulaTypeException](
      ev.evaluateFormula("s.rolling(2).agg(['mean', 'sum'])"))
    assert(e.getMessage.contains("one function at a time"))
  }

  test("value_counts(normalize=, ascending=): shares and flipped order") {
    // column [1, 1, 2]: normalize -> [2/3 for 1, 1/3 for 2];
    // ascending puts the rarer value first
    val m = mat3(Seq(Seq(1.0), Seq(1.0), Seq(2.0)), labels = Seq("c0"))
    val ev = new FormulaEvaluator(reg("s" -> m), fillInvalid = false)
    val MatrixResult(df, rid, labels, _) =
      ev.evaluateFormula("s.value_counts(normalize=1, ascending=1)"): @unchecked
    assert(labels == Seq("c0", "proportion"))
    val rows = df.orderBy(rid).collect()
      .map(r => (r.getDouble(1), r.getDouble(2))).toSeq
    assert(rows == Seq((2.0, 1.0 / 3), (1.0, 2.0 / 3)))
    // vector twin
    val v = graft.model.Vec(IndexedSeq(1.0, 1.0, 2.0),
      IndexedSeq("a", "b", "c"))
    val ev2 = new FormulaEvaluator(reg("v" -> v))
    val VecResult(out) =
      ev2.evaluateFormula("v.value_counts(normalize=1)"): @unchecked
    assert(out.labels == Seq("1.0", "2.0"))
    assert(out.values == Seq(2.0 / 3, 1.0 / 3))
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
