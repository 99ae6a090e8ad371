package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** As-of and range join semantics (graft.operators.Joins). */
class JoinsSpec extends SparkSpec {

  private def df(schema: StructType, rows: Seq[Row]) =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)

  private lazy val trades = df(
    StructType(Seq(StructField("sym", StringType), StructField("t", LongType),
      StructField("qty", LongType))),
    Seq(Row("A", 5L, 1L), Row("A", 10L, 2L), Row("A", 20L, 3L),
      Row("B", 10L, 4L), Row("A", 3L, 5L)))

  private lazy val quotes = df(
    StructType(Seq(StructField("sym", StringType), StructField("t", LongType),
      StructField("px", DoubleType))),
    Seq(Row("A", 4L, 1.0), Row("A", 10L, 2.0), Row("A", 15L, 3.0),
      Row("B", 50L, 9.0)))

  private def asof(exact: Boolean) =
    Joins.asofBackward(trades,
        quotes.select(col("sym"), col("t"), col("px"), col("t").as("q_t")),
        Seq("sym"), "t", payload = Seq("px", "q_t"), exactMatches = exact)
      .orderBy(col("sym"), col("t"))
      .select(col("sym"), col("t"), col("qty"), col("px"), col("q_t"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))

  test("asof backward: latest right row at-or-before each left row") {
    assert(asof(exact = true).toSeq == Seq(
      ("A", 3L, None, None),              // before first quote
      ("A", 5L, Some(1.0), Some(4L)),     // t=4 quote
      ("A", 10L, Some(2.0), Some(10L)),   // exact-ts match counts
      ("A", 20L, Some(3.0), Some(15L)),   // latest at-or-before wins
      ("B", 10L, None, None)))            // B's only quote is later
  }

  test("asof backward with exactMatches=false: same-instant rows excluded") {
    assert(asof(exact = false).toSeq == Seq(
      ("A", 3L, None, None),
      ("A", 5L, Some(1.0), Some(4L)),
      ("A", 10L, Some(1.0), Some(4L)),    // t=10 quote no longer eligible
      ("A", 20L, Some(3.0), Some(15L)),
      ("B", 10L, None, None)))
  }

  test("asof right-side ties resolved by tieBreak: last wins") {
    val q2 = df(quotes.schema.add(StructField("seq", LongType)),
      Seq(Row("A", 10L, 7.0, 1L), Row("A", 10L, 8.0, 2L)))
      .select(col("sym"), col("t"), col("px"), col("seq"))
    val got = Joins.asofBackward(trades.filter(col("t") === 20), q2,
        Seq("sym"), "t", payload = Seq("px", "seq"),
        tieBreak = Some("seq"))
      .select(col("px")).collect()
    assert(got.map(_.getDouble(0)).toSeq == Seq(8.0))
  }

  private def asofFwd(exact: Boolean) =
    Joins.asofForward(trades,
        quotes.select(col("sym"), col("t"), col("px"), col("t").as("q_t")),
        Seq("sym"), "t", payload = Seq("px", "q_t"), exactMatches = exact)
      .orderBy(col("sym"), col("t"))
      .select(col("sym"), col("t"), col("qty"), col("px"), col("q_t"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))

  test("asof forward: earliest right row at-or-after each left row") {
    assert(asofFwd(exact = true).toSeq == Seq(
      ("A", 3L, Some(1.0), Some(4L)),     // next quote is t=4
      ("A", 5L, Some(2.0), Some(10L)),
      ("A", 10L, Some(2.0), Some(10L)),   // exact-ts match counts
      ("A", 20L, None, None),             // after the last quote
      ("B", 10L, Some(9.0), Some(50L))))
  }

  test("asof forward with exactMatches=false: same-instant rows excluded") {
    assert(asofFwd(exact = false).toSeq == Seq(
      ("A", 3L, Some(1.0), Some(4L)),
      ("A", 5L, Some(2.0), Some(10L)),
      ("A", 10L, Some(3.0), Some(15L)),   // t=10 quote no longer eligible
      ("A", 20L, None, None),
      ("B", 10L, Some(9.0), Some(50L))))
  }

  test("asof forward ties resolved by tieBreak: first wins") {
    val q2 = df(quotes.schema.add(StructField("seq", LongType)),
      Seq(Row("A", 30L, 7.0, 2L), Row("A", 30L, 8.0, 1L)))
      .select(col("sym"), col("t"), col("px"), col("seq"))
    val got = Joins.asofForward(trades.filter(col("t") === 20), q2,
        Seq("sym"), "t", payload = Seq("px", "seq"),
        tieBreak = Some("seq"))
      .select(col("px")).collect()
    assert(got.map(_.getDouble(0)).toSeq == Seq(8.0)) // min seq wins
  }

  test("asof nearest: closer side wins, exact match is distance zero") {
    val got = Joins.asofNearest(trades,
        quotes.select(col("sym"), col("t"), col("px"), col("t").as("q_t")),
        Seq("sym"), "t", payload = Seq("px", "q_t"))
      .orderBy(col("sym"), col("t"))
      .select(col("sym"), col("t"), col("px"), col("q_t"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(got.toSeq == Seq(
      ("A", 3L, Some(1.0), Some(4L)),     // only forward exists → forward
      ("A", 5L, Some(1.0), Some(4L)),     // |5-4|=1 < |10-5|=5 → backward
      ("A", 10L, Some(2.0), Some(10L)),   // exact match, distance 0
      ("A", 20L, Some(3.0), Some(15L)),   // only backward exists
      ("B", 10L, Some(9.0), Some(50L))))  // only forward exists
  }

  test("asof nearest: equidistant candidates go backward") {
    val q2 = df(
      StructType(Seq(StructField("sym", StringType), StructField("t", LongType),
        StructField("px", DoubleType))),
      Seq(Row("A", 8L, 1.0), Row("A", 12L, 2.0)))
      .select(col("sym"), col("t"), col("px"), col("t").as("q_t"))
    val got = Joins.asofNearest(trades.filter(col("t") === 10), q2,
        Seq("sym"), "t", payload = Seq("px", "q_t"))
      .select(col("px")).head().getDouble(0)
    assert(got == 1.0) // |10-8| == |12-10| → earlier row wins
  }

  test("asof nearest plan: ONE window node computes both direction frames") {
    val plan = Joins.asofNearest(trades,
        quotes.select(col("sym"), col("t"), col("px"), col("t").as("q_t")),
        Seq("sym"), "t", payload = Seq("px", "q_t"))
      .queryExecution.executedPlan.toString
    val nWindow = plan.linesIterator.count(l =>
      l.replaceAll("^[\\s+:*()-]*", "").startsWith("Window"))
    assert(nWindow == 1, s"nearest as-of must sort once:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"))
  }

  test("range join: overlapping intervals each match independently") {
    val pts = df(
      StructType(Seq(StructField("pid", LongType), StructField("x", DoubleType))),
      Seq(Row(1L, 5.0), Row(2L, 15.0), Row(3L, 25.0), Row(4L, 10.0)))
    val iv = df(
      StructType(Seq(StructField("iv", StringType), StructField("lo", DoubleType),
        StructField("hi", DoubleType))),
      Seq(Row("a", 0.0, 20.0), Row("b", 10.0, 30.0)))
    val got = Joins.pointInInterval(pts, "x", iv, "lo", "hi", bucketWidth = 7.0)
      .select(col("pid"), col("iv")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // [lo, hi): x=10 is IN [10,30) and IN [0,20); x=25 only in b
    assert(got == Set((1L, "a"), (2L, "a"), (2L, "b"), (3L, "b"),
      (4L, "a"), (4L, "b")))
  }

  test("asof match is row-atomic: a NULL payload cell stays NULL") {
    // matched right row (t=10) has px = NULL; it must NOT inherit the
    // older row's px = 1.0 (per-column ignoreNulls windows would)
    val q2 = df(
      StructType(Seq(StructField("sym", StringType), StructField("t", LongType),
        StructField("px", DoubleType), StructField("q_t", LongType))),
      Seq(Row("A", 4L, 1.0, 4L), Row("A", 10L, null, 10L)))
    val got = Joins.asofBackward(trades.filter(col("t") === 20), q2,
        Seq("sym"), "t", payload = Seq("px", "q_t"))
      .select(col("px"), col("q_t")).head()
    assert(got.isNullAt(0) && got.getLong(1) == 10L)
  }

  test("asof plan: exactly one shuffle (by key), no nested-loop join") {
    val df = Joins.asofBackward(trades,
      quotes.select(col("sym"), col("t"), col("px"), col("t").as("q_t")),
      Seq("sym"), "t", payload = Seq("px", "q_t"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"asof must never nested-loop:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 2, // one per union branch pre-AQE, same partitioning
      s"asof should shuffle each side once by key, got $shuffles:\n$plan")
  }

  test("range join plan: shuffled/broadcast equi-join on bucket, no nested loop") {
    val pts = df(
      StructType(Seq(StructField("pid", LongType), StructField("x", DoubleType))),
      (0 until 50).map(i => Row(i.toLong, i * 2.0)))
    val iv = df(
      StructType(Seq(StructField("iid", LongType), StructField("lo", DoubleType),
        StructField("hi", DoubleType))),
      (0 until 5).map(i => Row(i.toLong, i * 20.0, i * 20.0 + 30.0)))
    val plan = Joins.pointInInterval(pts, "x", iv, "lo", "hi", bucketWidth = 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join must be an equi-join on the bucket key:\n$plan")
  }

  test("range join matches a naive theta join on random data") {
    val rng = new scala.util.Random(11)
    val pts = df(
      StructType(Seq(StructField("pid", LongType), StructField("x", DoubleType))),
      (0 until 200).map(i => Row(i.toLong, rng.nextDouble() * 100)))
    val iv = df(
      StructType(Seq(StructField("iid", LongType), StructField("lo", DoubleType),
        StructField("hi", DoubleType))),
      (0 until 20).map { i =>
        val lo = rng.nextDouble() * 90
        Row(i.toLong, lo, lo + rng.nextDouble() * 30)
      })
    val fast = Joins.pointInInterval(pts, "x", iv, "lo", "hi", bucketWidth = 13.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = pts.crossJoin(iv)
      .filter(col("x") >= col("lo") && col("x") < col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive)
  }
}
