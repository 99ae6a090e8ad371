package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration of the compiled expressions. Extensions bind at
  * session build time, so this suite builds its OWN SparkSession (sharing
  * the JVM's SparkContext with the other suites); it must not stop it —
  * that would kill the shared context — and it clears the active/default
  * session afterwards so later suites build theirs cleanly. */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  test("dot_product and dot_product_exact are callable from SQL") {
    val row = spark.sql(
      """SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
        |       dot_product_exact(array(0.1D, 0.2D), array(0.3D, 0.4D)) AS e""".stripMargin)
      .head()
    assert(row.getDouble(0) == 32.0)
    // decimal-exact: 0.03 + 0.08 summed as shortest-repr decimals
    assert(math.abs(row.getDouble(1) - 0.11) < 1e-15)
  }

  test("rolling_hash_portable from SQL equals the Column-API expression") {
    import spark.implicits._
    val viaSql = spark.sql(
      "SELECT rolling_hash_portable(array('a', 'b', 'c')) AS h").head().getLong(0)
    val viaCol = Seq(Seq("a", "b", "c")).toDF("arr")
      .select(graft.functions.ArrayOps.rolling_hash_portable($"arr").as("h"))
      .head().getLong(0)
    assert(viaSql == viaCol)
  }

  test("unknown arity fails with a clear message") {
    val e = intercept[Exception](spark.sql("SELECT dot_product(array(1.0D))").head())
    assert(e.getMessage.contains("dot_product expects 2"))
  }
}
