package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: Morton-key correctness, the zero-shuffle projection
  * promise, and the pruning win that justifies the operator (z layout
  * must dominate a 1-D sort on multi-dimensional box predicates). */
class LayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("interleaveBits is the Morton curve (hand-checked bit pattern)") {
    // x=0b101 (5), y=0b011 (3) → z bits: y2 x2 y1 x1 y0 x0 = 0 1 1 0 1 1 = 27
    val df = spark.range(1).select(
      Layout.interleaveBits(lit(5L), lit(3L), 3).as("z"),
      Layout.interleaveBits(lit(0L), lit(0L), 3).as("z0"),
      Layout.interleaveBits(lit(7L), lit(7L), 3).as("z7"))
    val r = df.head()
    assert(r.getLong(0) == 27L)
    assert(r.getLong(1) == 0L)
    assert(r.getLong(2) == 63L) // all 6 bits set
  }

  test("eqWidthBucket stays in [0, 2^bits) with no clamp branch") {
    val df = spark.range(1).select(
      Layout.eqWidthBucket(lit(10L), lit(10L), lit(109L), 8).as("lo"),
      // span 100 < 256 buckets: max value → floor(99*256/100) = 253
      Layout.eqWidthBucket(lit(109L), lit(10L), lit(109L), 8).as("hi"),
      Layout.eqWidthBucket(lit(60L), lit(10L), lit(109L), 8).as("mid"),
      // span ≥ bucket count: the top bucket is exactly 2^bits - 1
      Layout.eqWidthBucket(lit(1023L), lit(0L), lit(1023L), 8).as("hiWide"))
    val r = df.head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 253L)
    assert(r.getLong(2) == 128L) // (50*256)/100 = 128
    assert(r.getLong(3) == 255L)
  }

  test("z-value computation is a projection: no exchange beyond the 1-row bounds broadcast") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id", "event_id")
    val z = Layout.withZValue(ev, "user_id", "event_id", 8)
    val plan = z.queryExecution.executedPlan.toString
    // the only join is the broadcast of the 1-row bounds aggregate
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"bounds must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"no shuffled join for a projection:\n$plan")
    assert(!plan.contains("UDF"), s"no UDFs in the hot path:\n$plan")
  }

  test("zorderLayout narrows per-file extents on BOTH dimensions") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id", "event_id")
    val parts = 8
    def meanExtents(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val e = df
        .withColumn("p", org.apache.spark.sql.functions.spark_partition_id())
        .groupBy("p")
        .agg((max("user_id") - min("user_id")).cast("double").as("ux"),
          (max("event_id") - min("event_id")).cast("double").as("ex"))
        .agg(avg("ux").as("ux"), avg("ex").as("ex")).head()
      (e.getDouble(0), e.getDouble(1))
    }
    val (uBase, eBase) = meanExtents(ev.repartition(parts))
    val (uZ, eZ) =
      meanExtents(Layout.zorderLayout(ev, "user_id", "event_id", 8, parts))
    // random layout: every partition spans ~the full range of both dims.
    // z layout: both dims should narrow substantially (≥2× here; the
    // exact factor grows with file count at scale)
    assert(uZ < uBase / 2.0, s"user_id extent did not narrow: $uZ vs $uBase")
    assert(eZ < eBase / 2.0, s"event_id extent did not narrow: $eZ vs $eBase")
  }

  test("z-ordered parquet prunes at the REAL reader: scan emits a fraction of the rows") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id", "event_id")
    val b = ev.agg(min("user_id"), max("user_id"),
      min("event_id"), max("event_id")).head()
    def box(lo: Long, hi: Long) =
      (lo + (hi - lo + 1) * 4 / 10, lo + (hi - lo + 1) * 5 / 10)
    val (buLo, buHi) = box(b.getLong(0), b.getLong(1))
    val (beLo, beHi) = box(b.getLong(2), b.getLong(3))
    val tmp = java.nio.file.Files.createTempDirectory("zlay").toString
    Layout.zorderLayout(ev, "user_id", "event_id", 8, 16)
      .write.parquet(s"$tmp/z")
    ev.repartition(16).write.parquet(s"$tmp/r")
    // rows the parquet reader actually materializes = rows in row groups /
    // pages surviving min-max skipping (per-row filtering happens later,
    // in the Filter node — scan numOutputRows isolates the layout effect)
    def scanRows(plan: org.apache.spark.sql.execution.SparkPlan): Long =
      plan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scanRows(a.executedPlan)
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numOutputRows").value
        case p => p.children.map(scanRows).sum
      }
    def scanned(path: String): (Long, Long) = {
      val df = spark.read.parquet(path).filter(
        col("user_id").between(buLo, buHi) &&
          col("event_id").between(beLo, beHi))
      val matched = df.collect().length.toLong
      (scanRows(df.queryExecution.executedPlan), matched)
    }
    val (zScan, zMatch) = scanned(s"$tmp/z")
    val (rScan, rMatch) = scanned(s"$tmp/r")
    assert(zMatch == rMatch, "both layouts must return identical results")
    // random layout: every file spans both full ranges → nothing skips.
    // z layout: only the files whose z-range intersects the box survive.
    assert(zScan < rScan / 2,
      s"z layout must let the reader skip most row groups: z=$zScan r=$rScan")
  }

  test("pruneStats: z layout strictly dominates the 1-D sort on a box predicate") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id", "event_id")
    val r = Layout.pruneStats(ev, "user_id", "event_id",
      bits = 8, fileShift = 8, boxNum = 1, boxDen = 10).head()
    val filesZ = r.getAs[Long]("files_kept_z")
    val rowsZ = r.getAs[Long]("rows_kept_z")
    val rowsLin = r.getAs[Long]("rows_kept_lin")
    val matching = r.getAs[Long]("rows_matching")
    assert(matching > 0, "box predicate must match some rows")
    // pruning is sound: kept rows are a superset of matching rows
    assert(rowsZ >= matching && rowsLin >= matching)
    // the win: a 10%x10% box keeps ~1% of z files but ~10% of 1-D files
    assert(rowsZ < rowsLin,
      s"z pruning ($rowsZ rows) must beat 1-D pruning ($rowsLin rows)")
    assert(filesZ < r.getAs[Long]("n_files_z") / 4,
      s"a 10% box must prune >75% of z files, kept $filesZ")
    // the Hilbert layout is sound too, and never worse than Morton here
    val rowsH = r.getAs[Long]("rows_kept_h")
    assert(rowsH >= matching && rowsH < rowsLin)
  }

  test("hilbert_2d is a space-filling curve: bijective with unit-step adjacency") {
    val bits = 3; val n = 1 << bits // the full 8x8 grid, driver-checked
    val rows = spark.range(n.toLong * n)
      .select((col("id") % n).as("x"), expr(s"id div $n").as("y"))
      .select(col("x"), col("y"),
        graft.functions.ArrayOps.hilbert_2d(col("x"), col("y"), bits).as("d"))
      .collect()
    val byD = rows.map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1))).toMap
    assert(byD.keySet == (0L until n.toLong * n).toSet, "bijection onto [0, n^2)")
    (0L until n.toLong * n - 1).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"cells at d=$d and ${d + 1} must be grid-adjacent")
    }
  }

  test("eqWidthBucket enforces the span*2^bits < 2^53 exactness bound (ADVICE r5)") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // a 60-bit hashed dimension: span ~2^60, bits 12 → far past 2^53
    val wide = Seq((0L, Long.MinValue + 1), (1L, Long.MaxValue)).toDF("id", "x")
    val e = intercept[Exception] {
      wide.select(Layout.eqWidthBucket(col("x"), min(col("x")).over(),
        max(col("x")).over(), 12)).collect()
    }
    assert(e.getMessage.contains("2^53"), e.getMessage)
    // in-contract spans still bucket fine
    val ok = Seq((0L, 0L), (1L, 1000L)).toDF("id", "x")
      .select(Layout.eqWidthBucket(col("x"), lit(0L), lit(1000L), 12).as("b"))
      .collect().map(_.getLong(0))
    assert(ok.forall(b => b >= 0 && b < 4096))
  }
}
