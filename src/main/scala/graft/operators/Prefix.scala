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
  *   1. every row gets a DETERMINISTIC slice id. Ungrouped: sampled
  *      QUANTILE boundaries (equi-height) — a bounded deterministic
  *      hash-sample of the order domain (smallest-hash top-K, fully
  *      tie-broken, so every evaluation picks the SAME sample — unlike
  *      `repartitionByRange`, whose RangePartitioner seeds by RDD id and
  *      re-samples per exchange instance), exact quantiles of that
  *      sample broadcast back, and a codegen'd boundary-count bucket of
  *      the composite (order value, row-entropy hash) key. Ties on the
  *      order value may legally SPLIT across adjacent slices (any split
  *      is a valid arbitrary tie order), so even a single heavy value
  *      balances when the tie hash has row entropy. Grouped mode keeps
  *      the per-group equi-width bucket against broadcast min/max bounds
  *      (the scalar-subquery shape, no driver round-trip) — per-group
  *      top-K sampling would cost a data-scaled shuffle. Either way the
  *      slice id is a pure projection of the data, identical in every
  *      subtree that computes it, so the plan needs no checkpoint to
  *      keep its two consumers consistent;
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
  * `orderCol` must be numeric (slice bucketing is arithmetic) and rows
  * tied on it receive an arbitrary relative order, exactly as under a
  * global ORDER BY window. Ungrouped slice balance is equi-HEIGHT
  * (sampled quantiles of the actual row distribution, ties split by the
  * `tieCols` hash), so a skewed — even constant — order domain still
  * parallelizes as long as `tieCols` carries row entropy (default:
  * order + value columns; pass the full row when values repeat, as
  * [[graft.plans.GlobalRowNumberRule]] does). Grouped mode stays
  * equi-width per group: callers there order by dense per-group
  * positions, which bucket evenly by construction (a skewed grouped
  * order domain would concentrate slices — correctness holds,
  * parallelism degrades).
  *
  * Floating-point note: two-phase summation associates differently from a
  * strictly sequential scan; integer-valued doubles and decimals are exact,
  * arbitrary doubles can differ in the last ulps — the standard trade of
  * every distributed prefix sum.
  */
object Prefix {

  /** All columns of `df` whose types `xxhash64` can digest (maps excluded,
    * structs/arrays recursed) — the full-row entropy set callers pass as
    * `tieCols` when their order domain may repeat and the value columns
    * carry no entropy of their own (a `row_number() OVER (ORDER BY
    * skewed_col)` rewrite sums constant ones, so only the rest of the row
    * can split the heavy value across slices). */
  def entropyCols(df: DataFrame): Seq[Column] = {
    import org.apache.spark.sql.types._
    def ok(t: DataType): Boolean = t match {
      case _: MapType    => false
      case s: StructType => s.fields.forall(f => ok(f.dataType))
      case a: ArrayType  => ok(a.elementType)
      case _             => true
    }
    df.schema.fields.filter(f => ok(f.dataType)).map(f => df.col(f.name)).toSeq
  }

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
                 nullsLast: Boolean = false,
                 tieCols: Seq[Column] = Nil): DataFrame = {
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

    val sliced = withSliceId(df, orderCol, inNames, partitionCols,
      descending, nullsLast, tieCols, parts)

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

  /** The deterministic slice-id projection behind [[runningAgg]]: appends
    * `__pfx_pid` ∈ [0, parts). Ungrouped: sampled-quantile (equi-height)
    * boundaries over the composite (order value, tie hash) key; grouped:
    * per-group equi-width bucket against broadcast min/max bounds.
    * `private[graft]` so probes can measure slice balance directly. */
  private[graft] def withSliceId(df: DataFrame, orderCol: Column,
                                 inNames: Seq[String],
                                 partitionCols: Seq[String],
                                 descending: Boolean, nullsLast: Boolean,
                                 tieCols: Seq[Column],
                                 parts: Int): DataFrame = {
    val pCols = partitionCols.map(col)
    val ord = orderCol.cast("double")
    val ordFinite = when(isnan(ord), lit(null)).otherwise(ord)
    val nullSlice = if (nullsLast) parts - 1 else 0
    val nanSlice = if (descending) 0 else parts - 1 // NaN sorts greatest

    if (pCols.isEmpty) {
      // ---- ungrouped: sampled-QUANTILE slices (equi-height) ----
      // composite sort key (order value, tie hash): the tie hash breaks
      // order-value ties deterministically, so a heavy value may split
      // across adjacent slices — a valid arbitrary tie order — and slice
      // balance follows the ROW distribution, not the value domain
      val tie = xxhash64((if (tieCols.nonEmpty) tieCols
                          else orderCol +: inNames.map(col)) :+
        lit("__pfx_tie"): _*)
      // bounded deterministic sample: the sampleK rows with the smallest
      // row hash — a uniform sample that every evaluation of this subtree
      // reproduces bit-for-bit (the order below is TOTAL: hash, then the
      // composite key itself, so even a hash collision at the cut line
      // picks an interchangeable row)
      // 256 sample rows per slice → per-boundary quantile error ≈
      // 1/√256 ≈ 6% of a slice width (measured: parts·64 left 42% slice
      // imbalance on the Zipf probe, parts·256 ~20%); the sample is
      // driver-tiny either way and the offsets frame stays ≤ parts rows
      val sampleK = parts * 256
      val narrow = df.select(ordFinite.as("__pfx_o"), tie.as("__pfx_t"))
        .where(col("__pfx_o").isNotNull)
      val samp = narrow
        .withColumn("__pfx_h",
          xxhash64(col("__pfx_o"), col("__pfx_t"), lit("__pfx_h")))
        .orderBy(col("__pfx_h"), col("__pfx_o"), col("__pfx_t"))
        .limit(sampleK)
      // exact quantiles of the sorted sample → parts−1 boundary pairs as
      // SCALAR columns of a 1-row frame (empty input → NULL boundaries →
      // every real row lands in slice 0, the degenerate collapse)
      val allSorted = samp.agg(sort_array(collect_list(
        struct(col("__pfx_o").as("o"), col("__pfx_t").as("t"))))
        .as("__pfx_all"))
      val bndCols = (1 until parts).flatMap { i =>
        val n = size(col("__pfx_all"))
        val idx = least(n, greatest(lit(1),
          floor(n * lit(i) / lit(parts)).cast("int")))
        // size-guarded element_at with a clamped index (never out of range
        // under ANSI); NOT try_element_at — that is RuntimeReplaceable and
        // cannot codegen when this plan is built inside a post-optimizer
        // rule (GlobalRowNumberRule), where ReplaceExpressions already ran
        val b = when(n > 0, element_at(col("__pfx_all"), idx))
        Seq(b.getField("o").as(s"__pfx_bo_$i"),
          b.getField("t").as(s"__pfx_bt_$i"))
      }
      val bnds = allSorted.select(bndCols: _*)
      // bucket = how many boundaries (bo, bt) are ≤ (ord, tie) — parts−1
      // flat codegen'd comparisons (no interpreted higher-order function),
      // monotone in the order value, deterministic in the tie
      val bucket = (1 until parts).map { i =>
        when(col(s"__pfx_bo_$i") < ord ||
          (col(s"__pfx_bo_$i") === ord && col(s"__pfx_bt_$i") <= tie),
          1).otherwise(0)
      }.reduceLeft(_ + _)
      val valueSlice = if (descending) lit(parts - 1) - bucket else bucket
      df.crossJoin(broadcast(bnds))
        .withColumn("__pfx_pid",
          when(ord.isNull, lit(nullSlice))
            .when(isnan(ord), lit(nanSlice))
            .otherwise(valueSlice))
        .drop((1 until parts).flatMap(i =>
          Seq(s"__pfx_bo_$i", s"__pfx_bt_$i")): _*)
    } else {
      // ---- grouped: per-group equi-width bucket against broadcast
      // min/max bounds — a pure projection, stable across every subtree
      // that evaluates it (per-group quantile sampling would need a
      // data-scaled shuffle). Bounds exclude NaN (min/max would otherwise
      // return NaN — Spark sorts NaN greatest — and poison every slice
      // via a NaN span).
      val bounds = df.groupBy(pCols: _*)
        .agg(min(ordFinite).as("__pfx_lo"), max(ordFinite).as("__pfx_hi"))
      val withBounds = df.join(broadcast(bounds), partitionCols)
      val span = col("__pfx_hi") - col("__pfx_lo")
      val bucket = least(lit(parts - 1),
        floor((ord - col("__pfx_lo")) / span * parts).cast("int"))
      val valueSlice = if (descending) lit(parts - 1) - bucket else bucket
      // NULL/NaN order values take the slice matching their sort position,
      // so callers need no guard of their own; a degenerate span (all equal
      // or all NULL/NaN) collapses real values onto slice 0, where the
      // within-slice sort still places them correctly vs NULL/NaN slices
      withBounds.withColumn("__pfx_pid",
          when(ord.isNull, lit(nullSlice))
            .when(isnan(ord), lit(nanSlice))
            .when(span.isNull || span <= 0.0, lit(0))
            .otherwise(valueSlice))
        .drop("__pfx_lo", "__pfx_hi")
    }
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
        col(okey), Seq("__lag_one"), Seq("sum"), Seq("__lag_p"),
        // the unique row id is the perfect tie column: slices balance
        // even when the user order value repeats heavily
        tieCols = Seq(col(keyCol)))
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
