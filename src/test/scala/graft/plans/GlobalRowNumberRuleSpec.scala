package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The global-row_number rewrite: a naive `row_number() OVER (ORDER BY o)`
  * on a Graft-extended session must produce the identical numbering while
  * no executed window numbers more than one slice — the corpus-serializing
  * single-partition window is structurally gone. Own session (extensions
  * bind at build time), shared SparkContext, cleared afterwards. */
class GlobalRowNumberRuleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-grn-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  private def globalRowNumberWindows(df: org.apache.spark.sql.DataFrame): Seq[WindowExec] = {
    df.count()
    val p = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    p.collect {
      case w: WindowExec if w.partitionSpec.isEmpty &&
        w.windowExpression.exists(_.toString.contains("row_number")) => w
    }
  }

  test("global row_number: identical numbering, no single-partition numbering window") {
    val df = spark.range(1000).select(
      (col("id") * 37 % 1000).as("k"), col("id").as("payload"))
    val rn = df.withColumn("rn", row_number().over(Window.orderBy(col("k"))))
    val got = rn.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getInt(2)))
    // k is a permutation of 0..999 (37 coprime to 1000): rn must be k+1
    assert(got.forall { case (k, r) => r == k + 1 })
    assert(globalRowNumberWindows(rn).isEmpty,
      "the global row_number window must be re-planned onto the prefix")
  }

  test("ties get a valid bijective numbering") {
    val df = spark.range(500).select((col("id") % 7).as("k"))
    val rn = df.withColumn("rn", row_number().over(Window.orderBy(col("k"))))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(rn.map(_._2).sorted.toSeq == (1 to 500))
    // numbering must respect the k-order across ties
    val byRn = rn.sortBy(_._2).map(_._1)
    assert(byRn.zip(byRn.tail).forall { case (a, b) => a <= b })
  }

  test("guards: partitioned and string-keyed windows are untouched") {
    val df = spark.range(100).select((col("id") % 5).as("g"), col("id").as("v"))
    val part = df.withColumn("rn",
      row_number().over(Window.partitionBy("g").orderBy("v")))
    assert(part.filter(col("rn") === 1).count() == 5)
    // a string order key must not be re-planned (cast is not monotone)
    val str = df.select(concat(lit("s"), col("v")).as("s"))
      .withColumn("rn", row_number().over(Window.orderBy("s")))
    assert(str.count() == 100)
  }

  test("DESC global row_number re-plans with identical numbering (r7)") {
    // "rank by score" — the most common user shape. k a permutation of
    // 0..999, DESC ⇒ rn must be 1000 − k.
    val df = spark.range(1000).select(
      (col("id") * 37 % 1000).as("k"), col("id").as("payload"))
    val rn = df.withColumn("rn", row_number().over(Window.orderBy(col("k").desc)))
    val got = rn.collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(got.forall { case (k, r) => r == 1000 - k })
    assert(globalRowNumberWindows(rn).isEmpty,
      "the DESC global row_number window must be re-planned onto the prefix")
  }

  test("NULLS placement: asc_nulls_last / desc_nulls_first number identically") {
    // every 10th key NULL: the numbering must agree with the window
    // semantics exactly — nulls after all values (asc_nulls_last) and
    // before all values (desc_nulls_first)
    val df = spark.range(300).select(
      when(col("id") % 10 === 0, lit(null)).otherwise(col("id") * 37 % 300)
        .as("k"), col("id").as("payload"))
    val nVals = 300 - 30
    val ascLast = df.withColumn("rn",
      row_number().over(Window.orderBy(col("k").asc_nulls_last)))
    val a = ascLast.collect().map(r => (Option(r.get(0)), r.getInt(2)))
    // non-null rows: rn == rank of k among the non-null keys (all distinct)
    val sortedKeys = a.flatMap(_._1.map(_.asInstanceOf[Long])).sorted
    val rankOf = sortedKeys.zipWithIndex.toMap
    assert(a.forall {
      case (Some(k), r) => r == rankOf(k.asInstanceOf[Long]) + 1
      case (None, r) => r > nVals // all null rows number after every value
    })
    assert(globalRowNumberWindows(ascLast).isEmpty)
    val descFirst = df.withColumn("rn",
      row_number().over(Window.orderBy(col("k").desc_nulls_first)))
    val d = descFirst.collect().map(r => (Option(r.get(0)), r.getInt(2)))
    assert(d.forall {
      case (Some(k), r) =>
        r == 30 + (nVals - rankOf(k.asInstanceOf[Long]))
      case (None, r) => r <= 30 // nulls first
    })
    assert(globalRowNumberWindows(descFirst).isEmpty)
  }

  private def globalRankWindows(df: org.apache.spark.sql.DataFrame,
                                fn: String): Seq[WindowExec] = {
    df.count()
    val p = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    p.collect {
      case w: WindowExec if w.partitionSpec.isEmpty &&
        w.windowExpression.exists(_.toString.contains(fn)) => w
    }
  }

  test("global rank(): exact tie-equal ranks via grouped value counts (r7)") {
    // k = id % 7 over 500 rows: counts (72,72,72,71,71,71,71) →
    // rank(k) = #smaller + 1 = (1, 73, 145, 217, 288, 359, 430)
    val df = spark.range(500).select((col("id") % 7).as("k"))
    val expect = Map(0L -> 1, 1L -> 73, 2L -> 145, 3L -> 217,
      4L -> 288, 5L -> 359, 6L -> 430)
    val r = df.withColumn("r", rank().over(Window.orderBy(col("k"))))
    assert(r.collect().forall(row => row.getInt(1) == expect(row.getLong(0))))
    assert(globalRankWindows(r, "rank").isEmpty,
      "the global rank window must be re-planned onto the grouped prefix")
    // DESC: rank(k) = #larger + 1
    val expectD = Map(6L -> 1, 5L -> 72, 4L -> 143, 3L -> 214,
      2L -> 285, 1L -> 357, 0L -> 429)
    val rd = df.withColumn("r", rank().over(Window.orderBy(col("k").desc)))
    assert(rd.collect().forall(row => row.getInt(1) == expectD(row.getLong(0))))
    assert(globalRankWindows(rd, "rank").isEmpty)
  }

  test("global dense_rank(): distinct-value position (r7)") {
    val df = spark.range(500).select((col("id") % 7).as("k"))
    val d = df.withColumn("d", dense_rank().over(Window.orderBy(col("k"))))
    assert(d.collect().forall(row => row.getInt(1) == row.getLong(0) + 1))
    assert(globalRankWindows(d, "dense_rank").isEmpty)
  }

  test("global percent_rank(): (rank-1)/(n-1), single-row edge 0.0 (r7)") {
    val df = spark.range(500).select((col("id") % 7).as("k"))
    val expect = Map(0L -> 1, 1L -> 73, 2L -> 145, 3L -> 217,
      4L -> 288, 5L -> 359, 6L -> 430)
    val p = df.withColumn("p", percent_rank().over(Window.orderBy(col("k"))))
    assert(p.collect().forall(row =>
      math.abs(row.getDouble(1) - (expect(row.getLong(0)) - 1) / 499.0) < 1e-12))
    assert(globalRankWindows(p, "percent_rank").isEmpty)
    val one = spark.range(1).select(col("id").as("k"))
      .withColumn("p", percent_rank().over(Window.orderBy(col("k"))))
    assert(one.collect().head.getDouble(1) == 0.0)
  }

  test("global cume_dist(): inclusive cumulative share (r7)") {
    // k = id % 7 over 500 rows: inclusive cums (72,144,216,287,358,429,500)
    val df = spark.range(500).select((col("id") % 7).as("k"))
    val cums = Map(0L -> 72, 1L -> 144, 2L -> 216, 3L -> 287,
      4L -> 358, 5L -> 429, 6L -> 500)
    val c = df.withColumn("c", cume_dist().over(Window.orderBy(col("k"))))
    assert(c.collect().forall(row =>
      math.abs(row.getDouble(1) - cums(row.getLong(0)) / 500.0) < 1e-12))
    assert(globalRankWindows(c, "cume_dist").isEmpty)
  }

  test("global ntile(): SQL bucket-size rule in exact integer math (r7)") {
    // 500 rows, 3 buckets → sizes 167, 167, 166
    val df = spark.range(500).select((col("id") * 37 % 500).as("k"))
    val t = df.withColumn("t", ntile(3).over(Window.orderBy(col("k"))))
    val got = t.collect().map(r => (r.getLong(0), r.getInt(1)))
    val sizes = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes == Map(1 -> 167, 2 -> 167, 3 -> 166), sizes.toString)
    // k is a permutation: bucket must be monotone in k
    val byK = got.sortBy(_._1).map(_._2)
    assert(byK.zip(byK.tail).forall { case (a, b) => a <= b })
    assert(globalRankWindows(t, "ntile").isEmpty)
    // more buckets than rows: row i → bucket i
    val tiny = spark.range(3).select(col("id").as("k"))
      .withColumn("t", ntile(5).over(Window.orderBy(col("k"))))
    assert(tiny.collect().map(r => (r.getLong(0), r.getInt(1))).toMap ==
      Map(0L -> 1, 1L -> 2, 2L -> 3))
  }

  test("NaN order values number like the window original (sort greatest)") {
    val df = spark.range(100).select(
      when(col("id") % 9 === 0, lit(Double.NaN))
        .otherwise(col("id").cast("double")).as("k"))
    val rn = df.withColumn("rn", row_number().over(Window.orderBy(col("k"))))
    val got = rn.collect().map(r => (r.getDouble(0), r.getInt(1)))
    val nNan = got.count(_._1.isNaN)
    // NaN sorts greatest in Spark: all NaN rows take the top numbers
    assert(got.filter(_._1.isNaN).forall(_._2 > 100 - nNan))
    assert(got.filter(!_._1.isNaN).map(_._2).max <= 100 - nNan + 0)
    assert(globalRowNumberWindows(rn).isEmpty)
  }
}
