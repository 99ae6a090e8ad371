package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering: Z-order (Morton) keys,
  * per-file extent statistics, and min/max pruning effectiveness.
  *
  * WHY (the 100 TB lever): engines skip parquet files/row-groups via
  * min/max statistics, which only helps when each file covers a NARROW
  * slice of the queried columns. A 1-D sort narrows exactly one column;
  * a bit-interleaved z-value narrows ALL interleaved columns at once
  * (each extra low bit halves the extent of one dimension), so
  * multi-dimensional box predicates prune most files. This is the layout
  * mechanism behind Delta's OPTIMIZE ZORDER and Iceberg's sort orders;
  * see also Morton, "A computer oriented geodetic data base" (1966).
  *
  * Execution shape: the z-value is a PURE PROJECTION — an unrolled
  * shift/mask/or fold over built-in functions, fully inside whole-stage
  * codegen, zero shuffle, zero UDFs. Writing the layout costs exactly ONE
  * range exchange on z (the same exchange any sorted write pays); the
  * extent/pruning reports are single hash aggregates over the projection.
  *
  * Numeric contract: buckets are equi-width over [lo, hi] computed as
  * floor((x-lo)·2^bits / (hi-lo+1)) in binary64 — exact (and therefore
  * engine-portable) while (hi-lo+1)·2^bits < 2^53, which any sane
  * (bits ≤ 20, 32-bit-ish key span) layout satisfies. x ∈ [lo, hi]
  * implies bucket ∈ [0, 2^bits) with no clamping branch.
  */
object Layout {

  /** Interleave the low `bits` bits of two bucket columns into a Morton
    * z-value: bit i of `bx` lands at position 2i, bit i of `by` at 2i+1.
    * Unrolled fold over shiftleft/AND/OR — codegen'd, no UDF. */
  def interleaveBits(bx: Column, by: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc.bitwiseOR(shiftleft(bx.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(by.bitwiseAND(lit(1L << i)), i + 1))
    }
  }

  /** Equi-width integer bucket of `x` into [0, 2^bits) given inclusive
    * bounds columns. Exact only for span·2^bits < 2^53 (see object doc);
    * the precondition is ENFORCED at runtime — wide long keys (e.g. 60-bit
    * hashed dims) would otherwise make the double math silently inexact
    * and engine-divergent. Bounds subtract in double space so extreme
    * lo/hi cannot overflow the long subtraction under ANSI. */
  def eqWidthBucket(x: Column, lo: Column, hi: Column, bits: Int): Column = {
    // Two span forms with distinct jobs. The GUARD evaluates in double
    // space (cannot overflow, at worst a 1-ulp-lenient threshold); the
    // BUCKET math subtracts in LONG first (exact — the oracle mirror
    // subtracts in BIGINT too), because a double-space subtract silently
    // rounds for |bounds| > 2^53 even when the span itself is tiny and
    // in-contract (lo = 2^55, hi = 2^55 + 999). CASE short-circuits, so
    // the long subtraction only runs once the guard has bounded
    // |hi − lo| < 2^53 — no ANSI overflow possible.
    val spanGuard = hi.cast("double") - lo.cast("double") + 1.0
    val spanExact = (hi - lo).cast("double") + 1.0
    val twoP53 = 9007199254740992.0 // 2^53
    when(spanGuard * lit(math.pow(2, bits)) >= lit(twoP53),
        raise_error(lit(s"eqWidthBucket: span * 2^$bits >= 2^53 — the " +
          "double bucket math goes inexact; reduce bits or pre-scale the " +
          "dimension")).cast("long"))
      .otherwise(floor(((x - lo).cast("double") * (1L << bits)) / spanExact)
        .cast("long"))
  }

  /** Append the z-value column for two long dimensions, computing the
    * dimension bounds in one 1-row aggregate broadcast back onto the scan
    * (the scalar-subquery shape — no driver round-trip in the plan). */
  def withZValue(df: DataFrame, dimX: String, dimY: String, bits: Int,
                 zCol: String = "z"): DataFrame = {
    val b = df.agg(
      min(col(dimX)).as("__lo_x"), max(col(dimX)).as("__hi_x"),
      min(col(dimY)).as("__lo_y"), max(col(dimY)).as("__hi_y"))
    df.crossJoin(broadcast(b))
      .withColumn(zCol, interleaveBits(
        eqWidthBucket(col(dimX), col("__lo_x"), col("__hi_x"), bits),
        eqWidthBucket(col(dimY), col("__lo_y"), col("__hi_y"), bits), bits))
      .drop("__lo_x", "__hi_x", "__lo_y", "__hi_y")
  }

  /** Append the Hilbert-curve key for two long dimensions (same bounds
    * derivation as [[withZValue]]; the key itself is the compiled
    * [[graft.functions.HilbertIndex2D]] walk). Hilbert keys preserve
    * locality strictly better than Morton: consecutive cells are always
    * grid-adjacent, so equal-size key-range files carry tighter min/max
    * extents — fewer files survive pruning for the same box. */
  def withHilbert(df: DataFrame, dimX: String, dimY: String, bits: Int,
                  hCol: String = "h"): DataFrame = {
    val b = df.agg(
      min(col(dimX)).as("__lo_x"), max(col(dimX)).as("__hi_x"),
      min(col(dimY)).as("__lo_y"), max(col(dimY)).as("__hi_y"))
    df.crossJoin(broadcast(b))
      .withColumn(hCol, graft.functions.ArrayOps.hilbert_2d(
        eqWidthBucket(col(dimX), col("__lo_x"), col("__hi_x"), bits),
        eqWidthBucket(col(dimY), col("__lo_y"), col("__hi_y"), bits), bits))
      .drop("__lo_x", "__hi_x", "__lo_y", "__hi_y")
  }

  /** Per-file extent report for the Hilbert layout (the [[fileExtents]]
    * twin on the Hilbert key). */
  def hilbertExtents(df: DataFrame, dimX: String, dimY: String,
                     bits: Int, fileShift: Int): DataFrame =
    withHilbert(df, dimX, dimY, bits, "__h")
      .groupBy(shiftright(col("__h"), fileShift).as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(dimX)).as("x_lo"), max(col(dimX)).as("x_hi"),
        min(col(dimY)).as("y_lo"), max(col(dimY)).as("y_hi"))

  /** Cluster `df` for a z-ordered write: one range exchange on the
    * z-value, rows sorted by z within each output partition. Feed straight
    * into `.write.parquet(...)` — each file then carries narrow min/max
    * extents on BOTH dimensions. */
  def zorderLayout(df: DataFrame, dimX: String, dimY: String,
                   bits: Int = 12, numFiles: Int = 0): DataFrame = {
    val z = withZValue(df, dimX, dimY, bits, "__z")
    val parts = if (numFiles > 0) numFiles
      else df.sparkSession.sparkContext.defaultParallelism
    z.repartitionByRange(parts, col("__z"))
      .sortWithinPartitions("__z").drop("__z")
  }

  /** Per-file extent report: assign rows to 2^(2·bits-fileShift) z-range
    * files and return each file's row count and min/max extent of both
    * dimensions — the statistics a scan planner would prune on. */
  def fileExtents(df: DataFrame, dimX: String, dimY: String,
                  bits: Int, fileShift: Int): DataFrame =
    withZValue(df, dimX, dimY, bits, "__z")
      .groupBy(shiftright(col("__z"), fileShift).as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(dimX)).as("x_lo"), max(col(dimX)).as("x_hi"),
        min(col(dimY)).as("y_lo"), max(col(dimY)).as("y_hi"))

  /** Pruning-effectiveness report for a centered box predicate covering
    * `boxNum/boxDen` of each dimension's span (integer-exact bounds):
    * compares the z-ordered AND Hilbert layouts against a 1-D layout
    * bucketed on dimY alone, at the same file count. One row:
    * (n_files, files/rows surviving min-max pruning under each layout,
    * rows actually matching). rows_z / rows_matching ≈ 1 and
    * rows_lin >> rows_z is the argument for multi-dim clustering;
    * rows_h ≤ rows_z is Hilbert's locality edge over Morton. */
  def pruneStats(df: DataFrame, dimX: String, dimY: String,
                 bits: Int, fileShift: Int,
                 boxNum: Int, boxDen: Int): DataFrame = {
    val half = (boxDen - boxNum) / 2
    val b = df.agg(
      min(col(dimX)).as("lo_x"), max(col(dimX)).as("hi_x"),
      min(col(dimY)).as("lo_y"), max(col(dimY)).as("hi_y"))
    // integer-exact box bounds: lo + span·half/den ≤ x ≤ lo + span·(half+num)/den
    val withBox = df.crossJoin(broadcast(b))
      .withColumn("bx_lo", col("lo_x") + expr(s"((hi_x - lo_x + 1) * $half) div $boxDen"))
      .withColumn("bx_hi", col("lo_x") + expr(s"((hi_x - lo_x + 1) * ${half + boxNum}) div $boxDen"))
      .withColumn("by_lo", col("lo_y") + expr(s"((hi_y - lo_y + 1) * $half) div $boxDen"))
      .withColumn("by_hi", col("lo_y") + expr(s"((hi_y - lo_y + 1) * ${half + boxNum}) div $boxDen"))
    val keyed = withBox
      .withColumn("__z", interleaveBits(
        eqWidthBucket(col(dimX), col("lo_x"), col("hi_x"), bits),
        eqWidthBucket(col(dimY), col("lo_y"), col("hi_y"), bits), bits))
      .withColumn("__h", graft.functions.ArrayOps.hilbert_2d(
        eqWidthBucket(col(dimX), col("lo_x"), col("hi_x"), bits),
        eqWidthBucket(col(dimY), col("lo_y"), col("hi_y"), bits), bits))
      .withColumn("zfile", shiftright(col("__z"), fileShift))
      .withColumn("hfile", shiftright(col("__h"), fileShift))
      // the 1-D strawman: same file count, bucketed on dimY only
      .withColumn("lfile", eqWidthBucket(col(dimY), col("lo_y"), col("hi_y"),
        2 * bits - fileShift))
      .withColumn("inbox",
        (col(dimX) >= col("bx_lo") && col(dimX) <= col("bx_hi") &&
          col(dimY) >= col("by_lo") && col(dimY) <= col("by_hi")).cast("long"))
    // ONE corpus scan: collapse to the (zfile × lfile) cell grid first
    // (≤ 2^(2·bits−fileShift) · 2^(2·bits−fileShift) tiny rows), pin it,
    // and derive both layouts' file statistics plus the exact match count
    // by re-aggregating the grid — never re-scanning the input
    val cells = keyed.groupBy(col("zfile"), col("lfile"), col("hfile"))
      .agg(count(lit(1)).as("n"),
        min(col(dimX)).as("x_lo"), max(col(dimX)).as("x_hi"),
        min(col(dimY)).as("y_lo"), max(col(dimY)).as("y_hi"),
        sum(col("inbox")).as("nin"),
        // box bounds are constant per row; carry one copy per cell
        min(col("bx_lo")).as("bx_lo"), min(col("bx_hi")).as("bx_hi"),
        min(col("by_lo")).as("by_lo"), min(col("by_hi")).as("by_hi"))
      .localCheckpoint()
    def layoutAgg(fileCol: String, suffix: String) = {
      val survives =
        col("x_hi") >= col("bx_lo") && col("x_lo") <= col("bx_hi") &&
          col("y_hi") >= col("by_lo") && col("y_lo") <= col("by_hi")
      cells.groupBy(col(fileCol))
        .agg(sum(col("n")).as("n"),
          min(col("x_lo")).as("x_lo"), max(col("x_hi")).as("x_hi"),
          min(col("y_lo")).as("y_lo"), max(col("y_hi")).as("y_hi"),
          min(col("bx_lo")).as("bx_lo"), min(col("bx_hi")).as("bx_hi"),
          min(col("by_lo")).as("by_lo"), min(col("by_hi")).as("by_hi"))
        .agg(count(lit(1)).as(s"n_files_$suffix"),
          sum(when(survives, 1L).otherwise(0L)).as(s"files_kept_$suffix"),
          sum(when(survives, col("n")).otherwise(0L)).as(s"rows_kept_$suffix"))
    }
    val exact = cells.agg(sum(col("nin")).as("rows_matching"))
    layoutAgg("zfile", "z").crossJoin(layoutAgg("lfile", "lin"))
      .crossJoin(layoutAgg("hfile", "h")).crossJoin(exact)
  }
}
