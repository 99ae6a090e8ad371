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

  test("md5_long60 equals the conv(substring(md5))::long chain, compiled and interpreted") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a spread of inputs: ascii, empty, unicode, long strings, seeds
    val data = Seq("", "a", "0:hello world", "7:æøå ünïcode ñ",
      "x" * 1000, "1:" + ("token " * 50)).toDF("s")
    val both = data.select(
      graft.functions.ArrayOps.md5_long60(col("s")).as("fast"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("ref"))
    assert(both.collect().forall(r => r.getLong(0) == r.getLong(1)))
    // whole-stage codegen path actually compiles (no fallback): force a
    // projection over enough rows that codegen is exercised, via SQL too
    val viaSql = spark.sql("SELECT md5_long60('0:abc') AS h").head().getLong(0)
    val viaCol = Seq("0:abc").toDF("s")
      .select(graft.functions.ArrayOps.md5_long60($"s")).head().getLong(0)
    assert(viaSql == viaCol)
    // null propagates
    assert(spark.sql("SELECT md5_long60(CAST(NULL AS STRING)) IS NULL").head().getBoolean(0))
  }

  test("sign_pack32 is callable from SQL and matches the Column API") {
    // 64 floats alternating +/− → both halves 0x55555555
    val row = spark.sql(
      """SELECT sign_pack32(transform(sequence(0, 63),
        |         i -> CASE WHEN i % 2 = 0 THEN 1.0D ELSE -1.0D END), 0) AS lo,
        |       sign_pack32(transform(sequence(0, 63),
        |         i -> CASE WHEN i % 2 = 0 THEN 1.0D ELSE -1.0D END), 1) AS hi
        |""".stripMargin).head()
    assert(row.getLong(0) == 0x55555555L && row.getLong(1) == 0x55555555L)
  }

  test("unknown arity fails with a clear message") {
    val e = intercept[Exception](spark.sql("SELECT dot_product(array(1.0D))").head())
    assert(e.getMessage.contains("dot_product expects 2"))
  }

  test("optimizer rule rewrites the HOF dot product to the compiled expression") {
    import spark.implicits._
    // parquet-backed source: a literal LocalRelation would be constant-
    // folded into the result before the plan can be inspected
    val dir = java.nio.file.Files.createTempDirectory("graft-vecs").toString
    Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)))
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("vecs")
    val q = spark.sql(
      """SELECT aggregate(zip_with(a, b, (x, y) -> x * y),
        |                 CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS d
        |FROM vecs""".stripMargin)
    val optimized = q.queryExecution.optimizedPlan
    val rewritten = optimized.expressions.exists(_.exists {
      case _: graft.functions.DotProduct => true
      case _ => false
    })
    assert(rewritten, s"no DotProduct in optimized plan:\n$optimized")
    assert(q.head().getDouble(0) == 32.0)
    // operand order inside the lambdas must not matter
    val q2 = spark.sql(
      """SELECT aggregate(zip_with(a, b, (x, y) -> y * x),
        |                 0.0D, (acc, v) -> v + acc) AS d
        |FROM vecs""".stripMargin)
    assert(q2.queryExecution.optimizedPlan.expressions.exists(_.exists {
      case _: graft.functions.DotProduct => true
      case _ => false
    }))
    assert(q2.head().getDouble(0) == 32.0)
    // a non-product zip lambda must NOT be rewritten
    val q3 = spark.sql(
      """SELECT aggregate(zip_with(a, b, (x, y) -> x + y),
        |                 0.0D, (acc, v) -> acc + v) AS d
        |FROM vecs""".stripMargin)
    assert(!q3.queryExecution.optimizedPlan.expressions.exists(_.exists {
      case _: graft.functions.DotProduct => true
      case _ => false
    }))
    assert(q3.head().getDouble(0) == 21.0)
  }

  test("window row_number top-k filter rewrites to the custom TopK operator") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-topk-sql").toString
    (for (k <- 0 until 4; i <- 0 until 30)
      yield (k.toLong, (i % 5).toDouble, (k * 100 + i).toLong))
      .toDF("key", "value", "id").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("ranked_src")
    val q = spark.sql(
      """SELECT key, rn, id FROM (
        |  SELECT key, id, row_number() OVER
        |    (PARTITION BY key ORDER BY value DESC, id) AS rn
        |  FROM ranked_src) WHERE rn <= 4
        |ORDER BY key, rn""".stripMargin)
    val rows = q.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKFinal"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("Window"), s"window survived the rewrite:\n$plan")
    // equivalence against the un-rewritten form (plain window on a
    // LocalRelation-free path but rule disabled via excludedRules)
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.plans.WindowTopKRule")
    try {
      val want = spark.sql(
        """SELECT key, rn, id FROM (
          |  SELECT key, id, row_number() OVER
          |    (PARTITION BY key ORDER BY value DESC, id) AS rn
          |  FROM ranked_src) WHERE rn <= 4
          |ORDER BY key, rn""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      assert(rows.toSeq == want.toSeq)
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
    // latest-row-per-key form (rn = 1) rewrites too
    val q1 = spark.sql(
      """SELECT key, id FROM (
        |  SELECT key, id, row_number() OVER
        |    (PARTITION BY key ORDER BY value DESC, id) AS rn
        |  FROM ranked_src) WHERE rn = 1""".stripMargin)
    q1.collect()
    assert(q1.queryExecution.executedPlan.toString.contains("TopKFinal"))
  }

  test("HOF rewrite and compiled expression agree on length mismatch (null)") {
    import spark.implicits._
    Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)))
      .toDF("a", "b").createOrReplaceTempView("vecs_mm")
    val viaHof = spark.sql(
      """SELECT aggregate(zip_with(a, b, (x, y) -> x * y),
        |                 0.0D, (acc, v) -> acc + v) AS d
        |FROM vecs_mm""".stripMargin).head()
    val viaExpr = spark.sql("SELECT dot_product(a, b) AS d FROM vecs_mm").head()
    assert(viaHof.isNullAt(0) && viaExpr.isNullAt(0))
  }
}
