package graft.model

import graft.SparkSpec
import graft.api.FormulaEvaluator
import graft.compile.MatrixResult

/** CSV / JSON-lines ingest (S-layer source formats): the same strict
  * construction-time cast as parquet, plus the unbounded-ADP exactness
  * property — CSV text cells parse straight to BigDecimal with no double
  * round-trip. */
class SourceFormatsSpec extends SparkSpec {

  private def tmp(name: String, lines: Seq[String]): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_src").resolve(name)
    java.nio.file.Files.createDirectory(d)
    java.nio.file.Files.write(d.resolve("part-0000." + name.split('.').last),
      scala.jdk.CollectionConverters.SeqHasAsJava(lines).asJava)
    d.toString
  }

  test("csvMatrix ingests with inferred numerics and evaluates") {
    val p = tmp("m.csv", Seq("rid,c0,c1", "0,1.5,2.0", "1,3.0,4.5"))
    val m = Ingest.csvMatrix(spark, p, "rid", Seq("c0", "c1"))
    val ev = new FormulaEvaluator(Map("a" -> m))
    val MatrixResult(df, rowId, labels, _) =
      ev.evaluateFormula("a * 2"): @unchecked
    val got = cells(df, rowId, labels)
    assertCell(got(0L)("c0"), 3.0); assertCell(got(1L)("c1"), 9.0)
  }

  test("orcMatrix round-trips typed columns through ORC and evaluates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc")
      .resolve("m.orc").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("rid",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("c0",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("c1",
        org.apache.spark.sql.types.DoubleType)))
    spark.createDataFrame(java.util.Arrays.asList(
        org.apache.spark.sql.Row(0L, 1.5, 2.0),
        org.apache.spark.sql.Row(1L, 3.0, 4.5)), schema)
      .write.mode("overwrite").orc(dir)
    val m = Ingest.orcMatrix(spark, dir, "rid", Seq("c0", "c1"))
    val ev = new FormulaEvaluator(Map("a" -> m))
    val MatrixResult(df, rowId, labels, _) =
      ev.evaluateFormula("a * 2"): @unchecked
    val got = cells(df, rowId, labels)
    assertCell(got(0L)("c0"), 3.0); assertCell(got(1L)("c1"), 9.0)
  }

  test("jsonMatrix ingests JSON lines and evaluates") {
    val p = tmp("m.json", Seq(
      """{"rid": 0, "c0": 2.0, "c1": 8.0}""",
      """{"rid": 1, "c0": 4.0, "c1": 16.0}"""))
    val m = Ingest.jsonMatrix(spark, p, "rid", Seq("c0", "c1"))
    val ev = new FormulaEvaluator(Map("a" -> m))
    val MatrixResult(df, rowId, labels, _) =
      ev.evaluateFormula("a / 2"): @unchecked
    val got = cells(df, rowId, labels)
    assertCell(got(0L)("c0"), 1.0); assertCell(got(1L)("c1"), 8.0)
  }

  test("csvMatrix text column fails the strict cast outside unbounded mode") {
    val p = tmp("bad.csv", Seq("rid,c0", "0,hello", "1,world"))
    val e = intercept[IllegalArgumentException] {
      Ingest.csvMatrix(spark, p, "rid", Seq("c0"))
    }
    assert(e.getMessage.contains("could not convert column 'c0'"))
  }

  test("unbounded ADP ingests CSV decimal literals exactly (no double trip)") {
    // 1e-30 and a 25-digit mantissa: both beyond double's 17 significant
    // digits — the text→BigDecimal path must preserve them bit-exactly
    val p = tmp("u.csv", Seq("rid,c0",
      "0,1e-30", "1,1.234567890123456789012345e10"))
    val mode = NumericMode(adpEnabled = true, decimalPrecision = 40,
      unbounded = true)
    val m = Ingest.csvMatrix(spark, p, "rid", Seq("c0"), mode)
    val ev = new FormulaEvaluator(Map("a" -> m),
      adpEnabled = true, decimalPrecision = 40, unboundedExponent = true)
    val MatrixResult(df, rowId, labels, _) =
      ev.evaluateFormula("a * 1"): @unchecked
    val vals = df.orderBy(rowId).select(labels.head).collect()
      .map(_.getString(0))
    assert(new java.math.BigDecimal(vals(0))
      .compareTo(new java.math.BigDecimal("1e-30")) == 0, vals(0))
    assert(new java.math.BigDecimal(vals(1))
      .compareTo(new java.math.BigDecimal("1.234567890123456789012345e10")) == 0,
      vals(1))
  }
}
