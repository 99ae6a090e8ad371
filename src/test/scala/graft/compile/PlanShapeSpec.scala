package graft.compile

import graft.SparkSpec
import graft.api.FormulaEvaluator
import graft.model._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Scale-posture assertions: the plans the compiler promises (SURVEY §4.3),
  * checked against the actual optimized/physical plans, plus ScalaCheck
  * properties for the alignment algebra (SURVEY §5 plan item 2). */
class PlanShapeSpec extends SparkSpec {

  /** Deterministic property driver (plain ScalaCheck Gen; the scalatest
    * bridge artifact isn't in the offline dependency cache). */
  private def forAllN[A](g: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(g.apply(Gen.Parameters.default, Seed(42L + i)).get)
    }

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("same-backing matrices compile join-free (zip-projection fast path)") {
    val ev = new FormulaEvaluator(reg("a" -> fixA, "b" -> fixB2SameBase))
    val MatrixResult(df, _, _, _) =
      ev.evaluateFormula("(a + b) / (a * b + 1)"): @unchecked
    val plan = physical(df)
    assert(!plan.contains("Join"), s"expected no join, got:\n$plan")
  }

  // second matrix sharing fixA's backing DataFrame
  private lazy val fixB2SameBase = Matrix(fixA.base, "__row_id__",
    Seq(("c0", "c0"), ("c1", "c1"), ("c2", "c2")))

  test("different backings produce exactly one full-outer join") {
    val other = mat3(Seq(Seq(1.0, 2, 3), Seq(4, 5, 6), Seq(7, 8, 9)))
    val ev = new FormulaEvaluator(reg("a" -> fixA, "o" -> other))
    val MatrixResult(df, _, _, _) = ev.evaluateFormula("a + o"): @unchecked
    val plan = physical(df)
    assert(plan.contains("FullOuter"), s"expected full-outer join:\n$plan")
    assert("Join".r.findAllIn(plan).length >= 1)
    // three-way: still joins, never cartesian
    val third = mat3(Seq(Seq(1.0, 1, 1), Seq(1, 1, 1), Seq(1, 1, 1)))
    val ev3 = new FormulaEvaluator(
      reg("a" -> fixA, "o" -> other, "t" -> third))
    val MatrixResult(df3, _, _, _) = ev3.evaluateFormula("a + o + t"): @unchecked
    assert(!physical(df3).contains("Cartesian"))
  }

  test("vector broadcast adds no join and no extra exchange") {
    val v = Vec(Seq(1.0, 2.0, 3.0))
    val ev = new FormulaEvaluator(reg("a" -> fixA, "v" -> v))
    val MatrixResult(df, _, _, _) = ev.evaluateFormula("a * v + v"): @unchecked
    val plan = physical(df)
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"vector ops must stay in the projection:\n$plan")
  }

  test("whole-frame reduction uses a broadcast cross join (scalar-subquery shape)") {
    val ev = new FormulaEvaluator(reg("a" -> fixA))
    val MatrixResult(df, _, _, _) = ev.evaluateFormula("a / a.sum()"): @unchecked
    val plan = physical(df)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"),
      s"expected broadcast 1-row join:\n$plan")
  }

  test("bucketed backings align with ZERO exchange (co-located SMJ, 100TB path)") {
    import graft.model.Ingest
    spark.sql("DROP TABLE IF EXISTS bkt_x")
    spark.sql("DROP TABLE IF EXISTS bkt_y")
    // a previous JVM's managed-table dirs survive the (in-memory) catalog
    Seq("bkt_x", "bkt_y").foreach { t =>
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists()) {
        d.listFiles().foreach(_.delete()); d.delete()
      }
    }
    Ingest.writeBucketed(fixA, "bkt_x", 4)
    Ingest.writeBucketed(mat3(Seq(Seq(1.0, 2, 3), Seq(4, 5, 6), Seq(7, 8, 9))),
      "bkt_y", 4)
    val x = Ingest.bucketedMatrix(spark, "bkt_x", "__row_id__", Seq("c0", "c1", "c2"))
    val y = Ingest.bucketedMatrix(spark, "bkt_y", "__row_id__", Seq("c0", "c1", "c2"))
    val ev = new FormulaEvaluator(reg("x" -> x, "y" -> y))
    val MatrixResult(df, _, _, _) = ev.evaluateFormula("x + y"): @unchecked
    val plan = physical(df)
    assert(plan.contains("SortMergeJoin") || plan.contains("Join"))
    assert(!plan.contains("Exchange"),
      s"bucketed alignment join must not shuffle:\n$plan")
    // and it still computes the right cells
    val got = cells(df, "__row_id__", Seq("c0", "c1", "c2"))
    assert(got(0L)("c0") == 2.0 && got(2L)("c2") == 11.0)
  }

  test("wide matrices (200 columns) compile and execute") {
    import org.apache.spark.sql.types._
    val n = 200
    val schema = StructType(StructField("__row_id__", LongType) +:
      (0 until n).map(i => StructField(s"c$i", DoubleType)))
    val rows = (0 until 5).map(r =>
      org.apache.spark.sql.Row.fromSeq(r.toLong +: (0 until n).map(i => (r * n + i).toDouble)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    val m = Matrix.of(df, "__row_id__", (0 until n).map(i => s"c$i"))
    val ev = new FormulaEvaluator(reg("m" -> m), fillInvalid = true)
    val MatrixResult(out, rowId, labels, _) =
      ev.evaluateFormula("(m * 2 + 1) / (m + 1)"): @unchecked
    assert(labels.length == n)
    val got = cells(out, rowId, labels)
    assert(got(0L)("c0") == 1.0)              // (0*2+1)/(0+1)
    assert(got(0L)("c1") == 1.5)              // 3/2
    assert(got(4L)(s"c${n - 1}") == (2.0 * 999 + 1) / 1000)
  }

  // ---- ScalaCheck properties over the alignment algebra -------------------

  private val cellGen = Gen.oneOf(
    Gen.choose(-100.0, 100.0), Gen.const(0.0), Gen.const(Double.NaN))
  private val rowsGen = Gen.listOfN(3, Gen.listOfN(3, cellGen))

  private def evalCells(r: Map[String, NamedData], f: String) = {
    val ev = new FormulaEvaluator(r, fillInvalid = true)
    val MatrixResult(df, rowId, labels, _) = ev.evaluateFormula(f): @unchecked
    cells(df, rowId, labels)
  }

  test("property: a + b == b + a under alignment and fill") {
    forAllN(Gen.zip(rowsGen, rowsGen), 5) { case (ra, rb) =>
      val r = reg("a" -> mat3(ra.map(_.toSeq)), "b" -> mat3(rb.map(_.toSeq)))
      assert(evalCells(r, "a + b") == evalCells(r, "b + a"))
    }
  }

  test("property: fill is idempotent (mask ∘ fill = ∅)") {
    forAllN(rowsGen, 5) { ra =>
      val m = mat3(ra.map(_.toSeq))
      val ev = new FormulaEvaluator(reg("a" -> m), fillInvalid = true)
      val MatrixResult(df, _, labels, _) = ev.evaluateFormula("a * 1"): @unchecked
      val st = ev.validator.stats(df, labels)
      assert(st.invalidCount == 0)
    }
  }

  test("property: scalar identities hold cell-wise") {
    forAllN(rowsGen, 5) { ra =>
      val r = reg("a" -> mat3(ra.map(_.toSeq)))
      assert(evalCells(r, "a * 1 + 0") == evalCells(r, "a"))
    }
  }

  test("star join plans broadcast for every dimension side (x5_star)") {
    val df = graft.SparkEntry.queries("x5_star")(spark, "/root/testdata/sf0.001")
    val plan = physical(df)
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"dim joins must not sort-merge at this scale:\n$plan")
    // part-side filter reaches the scan (pushdown)
    assert(plan.contains("PushedFilters: [IsNotNull(p_size), LessThanOrEqual(p_size,20)]") ||
      plan.contains("LessThanOrEqual(p_size,20)"), s"p_size filter not pushed:\n$plan")
  }
}
