package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed running aggregates over a GLOBAL ordering without ever
  * collapsing row-scaled data onto one window partition.
  *
  * The naive `agg(c) OVER (ORDER BY o ROWS UNBOUNDED PRECEDING)` plans a
  * single-partition Window — the whole frame serializes through one task, a
  * scale-killer at cluster data sizes. This runs a two-phase distributed
  * prefix instead (the [[Packing.packContiguous]] / [[Sampling.shuffleOrder]]
  * family), generalized to any (sum | max | min) running aggregate over any
  * column set and kept entirely LAZY inside one plan:
  *
  *   1. every row gets a DETERMINISTIC slice id: its order-column value
  *      equi-width-bucketed into `spark.sql.shuffle.partitions` slices
  *      against broadcast min/max bounds (per group, when `partitionCols`
  *      is given — the scalar-subquery shape, no driver round-trip). A
  *      pure projection of the data: unlike `repartitionByRange` +
  *      `spark_partition_id`, whose sampled boundaries change per exchange
  *      instance (the RangePartitioner seeds by RDD id), the slice id is
  *      identical in every subtree that computes it, so the plan needs no
  *      checkpoint to keep its two consumers consistent;
  *   2. per-slice partial aggregates — ≤ `parts` rows per group — turned
  *      into EXCLUSIVE base offsets by a window over that bounded partial
  *      frame (one task, but over slice-count-many rows, never
  *      data-scaled — the winsor/pipe_curr bounded-cardinality pattern);
  *   3. a fully-parallel second pass: within-slice running window
  *      (partitioned by the slice id) combined with the broadcast-joined
  *      base offset. ONE hash exchange on the slice id — the window's own
  *      requirement — moves the data.
  *
  * NULL cells are skipped (SQL aggregate semantics): the running output is
  * the aggregate of all non-NULL cells up to and including the current row,
  * and is NULL while no value has been seen yet. Callers encode their own
  * invalid-cell markers (NaN → NULL) before calling and decode after.
  * `orderCol` must be numeric (slice bucketing is arithmetic) and
  * (near-)unique: rows tied on it receive an arbitrary relative order,
  * exactly as under a global ORDER BY window. Slice balance follows the
  * order column's VALUE distribution (equi-width, not equi-height); dense
  * row ids — the engine's ordering contract — bucket evenly, while a
  * heavily skewed order domain concentrates slices (correctness holds;
  * parallelism degrades toward the skew).
  *
  * Floating-point note: two-phase summation associates differently from a
  * strictly sequential scan; integer-valued doubles and decimals are exact,
  * arbitrary doubles can differ in the last ulps — the standard trade of
  * every distributed prefix sum.
  */
object Prefix {

  /** Appends `outNames(i)` = running `kinds(i)` aggregate of `inNames(i)`
    * (both physical columns of `df`) in the global `orderCol` order —
    * restarting per group when `partitionCols` is non-empty (the grouped
    * running aggregate, still distributed WITHIN each group, so one huge
    * group cannot serialize onto one task).
    * All original columns are preserved. `kinds(i)` ∈ sum | max | min.
    *
    * `descending` mirrors the slice id (`parts − 1 − slice`) and sorts
    * within-slice windows DESC, so the running order is by falling
    * `orderCol`; `nullsLast` sends NULL order values to the last slice
    * instead of the first. Defaults reproduce Spark's `ASC NULLS FIRST`.
    * NaN order values (doubles) are excluded from the bounds and pinned
    * to the slice matching Spark's sort convention (greatest value: last
    * slice ASC, first slice DESC) — without the guard the slice cast
    * would throw under ANSI.
    */
  def runningAgg(df: DataFrame, orderCol: Column,
                 inNames: Seq[String], kinds: Seq[String],
                 outNames: Seq[String],
                 partitionCols: Seq[String] = Nil,
                 descending: Boolean = false,
                 nullsLast: Boolean = false): DataFrame = {
    require(inNames.length == kinds.length && kinds.length == outNames.length,
      "inNames, kinds and outNames must align")
    require(kinds.forall(Set("sum", "max", "min")),
      s"unsupported running-aggregate kind in $kinds")
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val pCols = partitionCols.map(col)

    def aggOf(kind: String, c: Column): Column = kind match {
      case "sum" => sum(c); case "max" => max(c); case "min" => min(c)
    }

    // deterministic slice id: equi-width bucket of orderCol against the
    // (per-group) broadcast bounds — a pure projection, stable across
    // every subtree that evaluates it. Bounds exclude NaN (min/max would
    // otherwise return NaN — Spark sorts NaN greatest — and poison every
    // slice via a NaN span).
    val ord = orderCol.cast("double")
    val ordFinite = when(isnan(ord), lit(null)).otherwise(ord)
    val bounds =
      if (pCols.isEmpty)
        df.agg(min(ordFinite).as("__pfx_lo"), max(ordFinite).as("__pfx_hi"))
      else
        df.groupBy(pCols: _*)
          .agg(min(ordFinite).as("__pfx_lo"), max(ordFinite).as("__pfx_hi"))
    val withBounds =
      if (pCols.isEmpty) df.crossJoin(broadcast(bounds))
      else df.join(broadcast(bounds), partitionCols)
    val span = col("__pfx_hi") - col("__pfx_lo")
    val nullSlice = if (nullsLast) parts - 1 else 0
    val nanSlice = if (descending) 0 else parts - 1 // NaN sorts greatest
    val bucket = least(lit(parts - 1),
      floor((ord - col("__pfx_lo")) / span * parts).cast("int"))
    val valueSlice = if (descending) lit(parts - 1) - bucket else bucket
    // NULL/NaN order values take the slice matching their sort position,
    // so callers need no guard of their own; a degenerate span (all equal
    // or all NULL/NaN) collapses real values onto slice 0, where the
    // within-slice sort still places them correctly vs NULL/NaN slices
    val sliced = withBounds.withColumn("__pfx_pid",
        when(ord.isNull, lit(nullSlice))
          .when(isnan(ord), lit(nanSlice))
          .when(span.isNull || span <= 0.0, lit(0))
          .otherwise(valueSlice))
      .drop("__pfx_lo", "__pfx_hi")

    // per-(slice, group) partials → exclusive base offsets via a window
    // over the BOUNDED partial frame (≤ parts rows per group) — slice-
    // count-scaled, never data-scaled. Grouped mode partitions the window
    // by the group; ungrouped mode is a single task over ≤parts rows
    // (SequentialPlanSpec verifies every empty-spec window sits on a
    // partials aggregate)
    val partialCols = inNames.zip(kinds).zipWithIndex.map {
      case ((n, k), i) => aggOf(k, col(n)).as(s"__pfx_p_$i")
    }
    val partials = sliced.groupBy(col("__pfx_pid") +: pCols: _*)
      .agg(partialCols.head, partialCols.tail: _*)
    val offW = (if (pCols.isEmpty) Window.orderBy(col("__pfx_pid"))
                else Window.partitionBy(pCols: _*).orderBy(col("__pfx_pid")))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = partials.select(
      (col("__pfx_pid") +: pCols) ++
        kinds.zipWithIndex.map { case (k, i) =>
          aggOf(k, col(s"__pfx_p_$i")).over(offW).as(s"__pfx_o_$i")
        }: _*)

    // parallel within-slice running window + base offset; the window's
    // (slice, group) requirement plans the single hash exchange. The
    // within-slice sort mirrors the requested global order exactly.
    val slOrd = (descending, nullsLast) match {
      case (false, false) => orderCol.asc_nulls_first
      case (false, true)  => orderCol.asc_nulls_last
      case (true, false)  => orderCol.desc_nulls_first
      case (true, true)   => orderCol.desc_nulls_last
    }
    val w = Window.partitionBy(col("__pfx_pid") +: pCols: _*).orderBy(slOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = sliced.join(broadcast(offsets),
      "__pfx_pid" +: partitionCols, "left")
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
    // drop ALL working columns — __pfx_pid leaking into caller schemas
    // forced every call site to project around it (and the USING join put
    // it first in column order)
    joined.select(col("*") +: outCols: _*)
      .drop(kinds.indices.map(i => s"__pfx_o_$i"): _*)
      .drop("__pfx_pid")
  }

  /** Appends `outNames(i)` = the value of `inNames(i)` at global POSITION
    * `p − n` in the `orderCol` order (positional lag; `n < 0` is a lead),
    * NULL beyond the data edge. Positions are the dense 1..N ranks of
    * `orderCol` — rows need not be contiguous on it (the engine's
    * shift/diff densification). `keyCol` must be a non-null UNIQUE key of
    * `df` (the engine's row id): the lag is computed on a NARROW
    * projection and joined back on it.
    *
    * Why not a window `lag()` over the distributed slices? Offset window
    * frames (lag/lead) make WindowExec BUFFER every partition's rows
    * (`ExternalAppendOnlyUnsafeRowArray`) instead of streaming them the
    * way running-aggregate frames do — measured at 4–15× the executor
    * time of the cumsum pass on the same data, before even paying for the
    * cross-slice boundary handoff. And any design that moves the FULL
    * frame through the positional machinery pays wide-row exchange and
    * materialization costs (checkpointing the wide frame measured 0.7 s
    * at 10× where the narrow pin is ~free).
    *
    * So the movement-optimal shape keeps the wide frame still:
    *
    *   1. project `(key, order, values)` — the only columns positions
    *      need (column-pruned straight into the scan);
    *   2. dense pos via [[runningAgg]] of ones — a STREAMING running-sum
    *      window, never an offset frame; pinned (`localCheckpoint`, the
    *      duplicateGroups discipline — narrow, so the pin is cheap) so
    *      the self-join below reads materialized partitions instead of
    *      carrying two copies of the prefix subtree (un-pinned this
    *      measured 14 Spark jobs and >1 s of driver re-planning);
    *   3. narrow self-equi-join on `pos − n` — both sides ~5 columns, a
    *      plannable shuffle join with a unique dense key, no skew;
    *   4. ONE wide join back on `keyCol`. On a cluster where the base is
    *      bucketed / hash-partitioned by the row id (the engine's layout
    *      contract) this plans exchange-free on the wide side — the
    *      100 TB frame never moves for a shift.
    */
  def positionalLag(df: DataFrame, keyCol: String, orderCol: Column,
                    inNames: Seq[String], n: Int,
                    outNames: Seq[String]): DataFrame = {
    require(n != 0, "positionalLag needs a non-zero offset")
    require(inNames.length == outNames.length, "inNames/outNames must align")
    val okey = "__lag_ord"
    val narrow = df.select(
      col(keyCol) +: (orderCol.as(okey) +: inNames.map(col)): _*)
    val posed = runningAgg(narrow.withColumn("__lag_one", lit(1L)),
        col(okey), Seq("__lag_one"), Seq("sum"), Seq("__lag_p"))
      .drop("__lag_one")
      .localCheckpoint()
    val donor = posed.select(
      (col("__lag_p") + lit(n.toLong)).as("__lag_p") +:
        inNames.zip(outNames).map { case (i, o) => col(i).as(o) }: _*)
    val shifted = posed.select(col(keyCol), col("__lag_p"))
      .join(donor, Seq("__lag_p"), "left")
      .drop("__lag_p")
    df.join(shifted, Seq(keyCol), "left")
  }
}
