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

  test("guards: partitioned and descending windows are untouched") {
    val df = spark.range(100).select((col("id") % 5).as("g"), col("id").as("v"))
    val part = df.withColumn("rn",
      row_number().over(Window.partitionBy("g").orderBy("v")))
    assert(part.filter(col("rn") === 1).count() == 5)
    val desc = df.withColumn("rn",
      row_number().over(Window.orderBy(col("v").desc)))
    // still correct through the untouched path
    assert(desc.filter(col("rn") === 1).select("v").head().getLong(0) == 99L)
    // and a string order key must not be re-planned (cast is not monotone)
    val str = df.select(concat(lit("s"), col("v")).as("s"))
      .withColumn("rn", row_number().over(Window.orderBy("s")))
    assert(str.count() == 100)
  }
}
