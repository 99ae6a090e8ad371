package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[Prefix.runningAgg]] — the two-phase distributed prefix that replaces
  * single-partition `ORDER BY` windows for running aggregates. Checked
  * against a driver-side sequential fold on inputs that exercise NULL
  * skipping, values spread across many range partitions, and partitions
  * left empty by the range partitioner.
  */
class PrefixSpec extends SparkSpec {

  private def frame(values: Seq[java.lang.Double]) = {
    val schema = StructType(Seq(
      StructField("ord", LongType, nullable = false),
      StructField("v", DoubleType, nullable = true)))
    val rows = values.zipWithIndex.map { case (v, i) => Row(i.toLong, v) }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
  }

  private def sequential(values: Seq[java.lang.Double],
                         combine: (Double, Double) => Double): Seq[java.lang.Double] = {
    var acc: java.lang.Double = null
    values.map { v =>
      if (v == null) acc
      else { acc = if (acc == null) v else Double.box(combine(acc, v)); acc }
    }
  }

  private def check(kind: String, combine: (Double, Double) => Double): Unit = {
    val values: Seq[java.lang.Double] =
      Seq[java.lang.Double](3.0, null, 1.0, 7.0, null, 2.0, 2.0, 9.0, null, 4.0, 0.0, 8.0)
    val out = Prefix.runningAgg(frame(values), col("ord"), Seq("v"), Seq(kind), Seq("run"))
      .orderBy(col("ord")).select(col("run")).collect()
      .map(r => if (r.isNullAt(0)) null else Double.box(r.getDouble(0))).toSeq
    assert(out == sequential(values, combine), s"$kind mismatch: $out")
  }

  test("running sum matches a sequential fold, NULLs skipped") { check("sum", _ + _) }
  test("running max matches a sequential fold") { check("max", math.max) }
  test("running min matches a sequential fold") { check("min", math.min) }

  test("leading NULLs stay NULL until the first value") {
    val values: Seq[java.lang.Double] = Seq[java.lang.Double](null, null, 5.0, null, 1.0)
    val out = Prefix.runningAgg(frame(values), col("ord"), Seq("v"), Seq("sum"), Seq("run"))
      .orderBy(col("ord")).select(col("run")).collect()
      .map(r => if (r.isNullAt(0)) null else Double.box(r.getDouble(0))).toSeq
    assert(out == Seq[java.lang.Double](null, null, 5.0, 5.0, 6.0))
  }

  test("multiple specs over one pass agree with independent calls") {
    val values: Seq[java.lang.Double] =
      Seq[java.lang.Double](5.0, 2.0, null, 8.0, 1.0, 1.0, 9.0)
    val out = Prefix.runningAgg(frame(values), col("ord"),
        Seq("v", "v", "v"), Seq("sum", "max", "min"), Seq("s", "mx", "mn"))
      .orderBy(col("ord")).select(col("s"), col("mx"), col("mn")).collect()
    def colOf(i: Int) = out.map(r => if (r.isNullAt(i)) null else Double.box(r.getDouble(i))).toSeq
    assert(colOf(0) == sequential(values, _ + _))
    assert(colOf(1) == sequential(values, math.max))
    assert(colOf(2) == sequential(values, math.min))
  }

  test("no data-scaled single-partition window in the plan") {
    val df = Prefix.runningAgg(frame(Seq[java.lang.Double](1.0, 2.0, 3.0)),
      col("ord"), Seq("v"), Seq("sum"), Seq("run"))
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, s"expected window nodes in:\n$plan")
    windows.foreach { w =>
      // unpartitioned windows may only sit on the bounded ≤nParts partials
      // aggregate (the offsets scan); the running window must be
      // partitioned by the physical partition id
      val boundedOffsets = w.child.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
            if a.groupingExpressions.exists(_.toString.contains("__pfx_pid")) => a
      }.nonEmpty
      assert(w.partitionSpec.nonEmpty || boundedOffsets,
        s"data-scaled single-partition window:\n$plan")
    }
    assert(plan.toString.contains("__pfx_pid"),
      s"expected pid-partitioned window:\n$plan")
  }

  test("grouped running agg restarts per group, distributed within each") {
    val schema = StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("ord", LongType, nullable = false),
      StructField("v", DoubleType, nullable = true)))
    val rows = for (g <- Seq("a", "b", "c"); i <- 0 until 40) yield
      Row(g, i.toLong, if ((i + g.hashCode) % 5 == 0) null
        else Double.box(((i * 31 + g.hashCode) % 17).toDouble))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
    val out = Prefix.runningAgg(df, col("ord"), Seq("v"), Seq("sum"), Seq("run"),
        partitionCols = Seq("g"))
      .orderBy(col("g"), col("ord"))
      .select(col("g"), col("v"), col("run")).collect()
    // driver reference: per-group sequential fold
    val byG = rows.groupBy(_.getString(0))
    for (g <- Seq("a", "b", "c")) {
      val vals = byG(g).sortBy(_.getLong(1)).map(r =>
        if (r.isNullAt(2)) null else Double.box(r.getDouble(2)))
      val expect = sequential(vals, _ + _)
      val got = out.filter(_.getString(0) == g)
        .map(r => if (r.isNullAt(2)) null else Double.box(r.getDouble(2))).toSeq
      assert(got == expect, s"group $g mismatch")
    }
  }

  test("larger-than-partition-count input: global order holds across partitions") {
    val n = 5000
    val values: Seq[java.lang.Double] =
      (0 until n).map(i => if (i % 7 == 3) null
        else Double.box(((i * 2654435761L) % 1000).toDouble)) // deterministic spread
    val out = Prefix.runningAgg(frame(values), col("ord"), Seq("v"), Seq("sum"), Seq("run"))
      .orderBy(col("ord")).select(col("run")).collect()
      .map(r => if (r.isNullAt(0)) null else Double.box(r.getDouble(0))).toSeq
    assert(out == sequential(values, _ + _))
  }

  test("slice ids agree across plan branches at high partition counts") {
    // REGRESSION: an earlier formulation derived the slice id from
    // repartitionByRange + spark_partition_id; the RangePartitioner seeds
    // its boundary sampling by RDD id, so the partials branch and the
    // output branch could bucket the SAME row differently unless the
    // exchange happened to be reused — silently double-counting offsets
    // (caught only at 32 partitions on the sf0.01 oracle). The slice id is
    // now a pure projection of the data; this pins the failing condition.
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      val n = 5000
      val values: Seq[java.lang.Double] =
        (0 until n).map(i => if (i % 11 == 5) null
          else Double.box(((i * 1103515245L) % 997).toDouble))
      val out = Prefix.runningAgg(frame(values), col("ord"), Seq("v"), Seq("sum"), Seq("run"))
        .orderBy(col("ord")).select(col("run")).collect()
        .map(r => if (r.isNullAt(0)) null else Double.box(r.getDouble(0))).toSeq
      assert(out == sequential(values, _ + _))
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }
}
