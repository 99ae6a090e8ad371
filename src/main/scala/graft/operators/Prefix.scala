package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Distributed running aggregates over a GLOBAL ordering without ever
  * collapsing the data onto one window partition.
  *
  * The naive `agg(c) OVER (ORDER BY o ROWS UNBOUNDED PRECEDING)` plans a
  * single-partition Window — the whole frame serializes through one task, a
  * scale-killer at cluster data sizes. This runs the same two-phase
  * distributed prefix as [[Packing.packContiguous]] / [[Sampling.shuffleOrder]]
  * instead, generalized to any (sum | max | min) running aggregate over any
  * column set:
  *
  *   1. range-partition by the order column and sort within partitions
  *      (ONE shuffle; the global order becomes partition-major order), pin
  *      the sorted frame with `localCheckpoint` so both passes read the
  *      identical partitioning;
  *   2. per-partition partial aggregates — `nParts` rows, collected to the
  *      driver and scanned into EXCLUSIVE base offsets (the only
  *      driver-side step, bounded by the partition count, never the data);
  *   3. a fully-parallel second pass: within-partition running window
  *      (partitioned by the physical partition id) combined with the
  *      broadcast-joined base offset.
  *
  * NULL cells are skipped (SQL aggregate semantics): the running output is
  * the aggregate of all non-NULL cells up to and including the current row,
  * and is NULL while no value has been seen yet. Callers encode their own
  * invalid-cell markers (NaN → NULL) before calling and decode after.
  *
  * Floating-point note: two-phase summation associates differently from a
  * strictly sequential scan; integer-valued doubles and decimals are exact,
  * arbitrary doubles can differ in the last ulps — the standard trade of
  * every distributed prefix sum.
  */
object Prefix {

  /** Appends `outNames(i)` = running `kinds(i)` aggregate of `inNames(i)`
    * (both physical columns of `df`) in the global `orderCol` order.
    * All original columns are preserved. `kinds(i)` ∈ sum | max | min.
    */
  def runningAgg(df: DataFrame, orderCol: Column,
                 inNames: Seq[String], kinds: Seq[String],
                 outNames: Seq[String]): DataFrame = {
    require(inNames.length == kinds.length && kinds.length == outNames.length,
      "inNames, kinds and outNames must align")
    require(kinds.forall(Set("sum", "max", "min")),
      s"unsupported running-aggregate kind in $kinds")
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt

    // phase 1: one range exchange + in-partition sort; pinned so the
    // partials pass and the output pass see the exact same partitioning
    val sorted = df
      .repartitionByRange(parts, orderCol)
      .sortWithinPartitions(orderCol)
      .withColumn("__pfx_pid", spark_partition_id())
      .localCheckpoint()

    def aggOf(kind: String, c: Column): Column = kind match {
      case "sum" => sum(c); case "max" => max(c); case "min" => min(c)
    }

    // phase 2a: per-partition partials — nParts rows on the driver
    val partialCols = inNames.zip(kinds).zipWithIndex.map {
      case ((n, k), i) => aggOf(k, col(n)).as(s"__pfx_p_$i")
    }
    val partials = sorted.groupBy(col("__pfx_pid")).agg(partialCols.head, partialCols.tail: _*)
    val partialSchema = partials.schema
    val byPid: Map[Int, Row] =
      partials.collect().map(r => r.getInt(0) -> r).toMap
    val nParts = sorted.rdd.getNumPartitions

    // exclusive prefix per spec: offsets(p) folds partials 0..p-1 with the
    // same combine the aggregate uses; null = nothing seen before p
    def combine(kind: String, a: Any, b: Any): Any = (a, b) match {
      case (null, x) => x
      case (x, null) => x
      case (x: java.lang.Double, y: java.lang.Double) => kind match {
        case "sum" => Double.box(x + y)
        case "max" => Double.box(math.max(x, y))
        case "min" => Double.box(math.min(x, y))
      }
      case (x: java.lang.Long, y: java.lang.Long) => kind match {
        case "sum" => Long.box(x + y)
        case "max" => Long.box(math.max(x, y))
        case "min" => Long.box(math.min(x, y))
      }
      case (x: java.math.BigDecimal, y: java.math.BigDecimal) => kind match {
        case "sum" => x.add(y)
        case "max" => if (x.compareTo(y) >= 0) x else y
        case "min" => if (x.compareTo(y) <= 0) x else y
      }
      case other => throw new IllegalArgumentException(
        s"runningAgg supports double, long and decimal columns, got: $other")
    }
    val offsetRows = new Array[Row](nParts)
    val acc = new Array[Any](kinds.length)
    for (p <- 0 until nParts) {
      offsetRows(p) = Row.fromSeq(p +: acc.toSeq)
      byPid.get(p).foreach { r =>
        for (i <- kinds.indices)
          acc(i) = combine(kinds(i), acc(i), r.get(i + 1))
      }
    }
    val offSchema = StructType(
      StructField("__pfx_pid", IntegerType, nullable = false) +:
        kinds.indices.map(i =>
          StructField(s"__pfx_o_$i", partialSchema(i + 1).dataType, nullable = true)))
    val offsets = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows.toIndexedSeq, 1), offSchema)

    // phase 2b: parallel within-partition running window + base offset
    val w = Window.partitionBy(col("__pfx_pid")).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = sorted.join(broadcast(offsets), Seq("__pfx_pid"), "left")
    val outCols = inNames.zip(kinds).zipWithIndex.map { case ((n, k), i) =>
      val run = aggOf(k, col(n)).over(w)
      val off = col(s"__pfx_o_$i")
      val merged = k match {
        case "sum" => when(run.isNull, off).otherwise(
          when(off.isNull, run).otherwise(off + run))
        case "max" => greatest(off, run) // greatest/least skip NULLs
        case "min" => least(off, run)
      }
      merged.as(outNames(i))
    }
    joined.select(col("*") +: outCols: _*)
      .drop(kinds.indices.map(i => s"__pfx_o_$i"): _*)
  }
}
