package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The r15 session-shared slice layout (`Prefix.sliceLayout`): the
  * keyCol-tied scan operators consume ONE persisted
  * (base + order + slice id) layout per session, with the per-query
  * derived value projections applied ABOVE it. These tests pin
  *
  *   1. bit-identity of every shared entry point against its legacy
  *      materialized form (same rows, same doubles, NaN-for-NaN) on a
  *      fuzzed NULL/NaN-bearing frame — the layout must not change the
  *      merge order or any emitted value;
  *   2. the plan contract: the shared emit consumes the cached layout
  *      with NO exchange between the in-memory scan and the
  *      mapPartitions emitter (the per-query exchange + sort is gone);
  *   3. reuse: two different shared queries over the same base register
  *      exactly one layout; and the per-session registry stays bounded
  *      by its cap under distinct bases.
  */
class SliceLayoutSpec extends SparkSpec {

  private def frame(n: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("rid", LongType, nullable = false),
      StructField("a", DoubleType, nullable = true),
      StructField("b", DoubleType, nullable = true)))
    val rnd = new scala.util.Random(42)
    val rows = (0 until n).map { i =>
      def cell(): java.lang.Double = rnd.nextInt(10) match {
        case 0 => null
        case 1 => Double.box(Double.NaN)
        case _ => Double.box(math.rint(rnd.nextDouble() * 50) / 2.0)
      }
      Row(i.toLong, cell(), cell())
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
      .repartition(5) // multi-partition input, unlike the cached bench base
  }

  /** Exact (bitwise-for-doubles, NaN == NaN) frame comparison in rid
    * order over the named output columns. */
  private def assertSame(legacy: DataFrame, shared: DataFrame,
                         outs: Seq[String]): Unit = {
    def dump(df: DataFrame): Seq[Seq[java.lang.Long]] =
      df.orderBy(col("rid")).select(outs.map(col): _*).collect().toSeq
        .map(r => outs.indices.map(i =>
          if (r.isNullAt(i)) null
          else Long.box(java.lang.Double.doubleToLongBits(r.getDouble(i)))))
    val (l, s) = (dump(legacy), dump(shared))
    assert(l == s, s"shared path diverged from legacy: ${
      l.zip(s).zipWithIndex.filter(p => p._1._1 != p._1._2).take(3)}")
  }

  private def derived(df: DataFrame, names: Seq[String]): Seq[
      org.apache.spark.sql.Column] =
    Seq(when(col("a").isNull || isnan(col("a")), lit(Double.NaN))
        .otherwise(col("a")).as(names(0)),
      when(col("b").isNull || isnan(col("b")), lit(Double.NaN))
        .otherwise(col("b")).as(names(1)))

  test("positionalLagShared window fuse is bit-identical to the legacy path") {
    val df = frame(400)
    val names = Seq("va", "vb")
    val d = derived(df, names)
    val legacy = Prefix.positionalLag(df.select(col("*") +: d: _*), "rid",
      col("rid"), names, 4, names.map(_ + "_w"), fuse = "winmean",
      winMinPeriods = 2)
    val shared = Prefix.positionalLagShared(df, d, "rid", col("rid"),
      names, 4, names.map(_ + "_w"), fuse = "winmean", winMinPeriods = 2)
    assertSame(legacy, shared, names.map(_ + "_w"))
  }

  test("positionalLagShared diff fuse and lead are bit-identical") {
    val df = frame(300)
    val names = Seq("va", "vb")
    val d = derived(df, names)
    for (n <- Seq(3, -2)) {
      val legacy = Prefix.positionalLag(df.select(col("*") +: d: _*),
        "rid", col("rid"), names, n, names.map(_ + "_s"),
        fuse = if (n > 0) "diff" else "none")
      val shared = Prefix.positionalLagShared(df, d, "rid", col("rid"),
        names, n, names.map(_ + "_s"), fuse = if (n > 0) "diff" else "none")
      assertSame(legacy, shared, names.map(_ + "_s"))
    }
  }

  test("ewmScan / ewmScanRecursive shared are bit-identical") {
    val df = frame(350)
    val names = Seq("va", "vb")
    val d = derived(df, names)
    val m = df.select(col("*") +: d: _*)
    for (stat <- Seq("mean", "var")) {
      assertSame(
        Prefix.ewmScan(m, "rid", col("rid"), names, 0.3,
          names.map(_ + "_w"), stat, 2),
        Prefix.ewmScan(df, "rid", col("rid"), names, 0.3,
          names.map(_ + "_w"), stat, 2, shared = Some(d)),
        names.map(_ + "_w"))
      assertSame(
        Prefix.ewmScanRecursive(m, "rid", col("rid"), names, 0.3,
          names.map(_ + "_w"), stat, 2),
        Prefix.ewmScanRecursive(df, "rid", col("rid"), names, 0.3,
          names.map(_ + "_w"), stat, 2, shared = Some(d)),
        names.map(_ + "_w"))
    }
  }

  test("runningQuantile shared is bit-identical (domains, counts, emit)") {
    val df = frame(300)
    val names = Seq("va", "vb")
    val d = derived(df, names)
    val m = df.select(col("*") +: d: _*)
    assertSame(
      Prefix.runningQuantile(m, "rid", col("rid"), names, 0.25, 0,
        names.map(_ + "_q"), 2),
      Prefix.runningQuantile(df, "rid", col("rid"), names, 0.25, 0,
        names.map(_ + "_q"), 2, shared = Some(d)),
      names.map(_ + "_q"))
  }

  test("shared emit reads the cached layout with no exchange above it") {
    val df = frame(200)
    val names = Seq("va", "vb")
    val d = derived(df, names)
    val shared = Prefix.positionalLagShared(df, d, "rid", col("rid"),
      names, 2, names.map(_ + "_w"), fuse = "winsum", winMinPeriods = 1)
    shared.count() // materialize the layout so the final plan is real
    val plan = shared.queryExecution.executedPlan
    // find the MapPartitions emitter and walk its subtree: it must reach
    // an InMemoryTableScan without crossing a shuffle exchange
    import org.apache.spark.sql.execution.SparkPlan
    def findEmit(p: SparkPlan): Option[SparkPlan] =
      if (p.getClass.getSimpleName.startsWith("MapPartitions")) Some(p)
      else p.children.iterator.map(findEmit).collectFirst {
        case Some(x) => x }
    def collapse(p: SparkPlan): SparkPlan = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        collapse(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collapse(q.plan)
      case other => other
    }
    val emit = findEmit(collapse(plan))
    assert(emit.isDefined, s"no MapPartitions emitter in:\n$plan")
    def scanBelow(p: SparkPlan): Boolean = {
      val c = collapse(p)
      if (c.getClass.getSimpleName.startsWith("ShuffleExchange")) false
      else if (c.getClass.getSimpleName.startsWith("InMemoryTableScan")) true
      else c.children.exists(scanBelow)
    }
    assert(scanBelow(emit.get),
      s"shared emit does not sit on the cached layout:\n${emit.get}")
  }

  test("one layout per (base, order, key); registry bounded by its cap") {
    val df = frame(250)
    val names = Seq("va", "vb")
    val d1 = derived(df, names)
    val d2 = Seq((col("a") * 2).as(names(0)), (col("b") * 3).as(names(1)))
    Prefix.positionalLagShared(df, d1, "rid", col("rid"), names, 2,
      names.map(_ + "_w"), fuse = "winsum", winMinPeriods = 1).count()
    val afterOne = Prefix.sliceLayoutCount(spark)
    Prefix.ewmScan(df, "rid", col("rid"), names, 0.5,
      names.map(_ + "_e"), "mean", 0, shared = Some(d2)).count()
    assert(Prefix.sliceLayoutCount(spark) == afterOne,
      "a second shared query over the same base registered a new layout")
    // distinct bases may not grow the registry past its cap
    (0 until 20).foreach { i =>
      Prefix.positionalLagShared(frame(60 + i), d1, "rid", col("rid"),
        names, 1, names.map(_ + "_w"), fuse = "winsum",
        winMinPeriods = 1).count()
    }
    // the shared suite session may already sit AT the cap from earlier
    // suites' compiled formulas, so pin the bound and that registration
    // happens at all — not growth relative to an unknown start
    assert(Prefix.sliceLayoutCount(spark) <= 16,
      s"layout registry exceeded its cap: ${Prefix.sliceLayoutCount(spark)}")
    assert(Prefix.sliceLayoutCount(spark) >= 1,
      "layouts were never registered")
  }
}
