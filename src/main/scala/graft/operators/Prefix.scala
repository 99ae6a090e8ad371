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
      // composite sort key (order value, native surrogate, tie hash): the
      // tie hash breaks order-value ties deterministically, so a heavy
      // value may split across adjacent slices — a valid arbitrary tie
      // order — and slice balance follows the ROW distribution, not the
      // value domain.
      //
      // r9 (native-order surrogate `v`, compared BEFORE the hash): the
      // bucket key's first component is the order value cast to DOUBLE,
      // but within-slice sorts use the NATIVE type — so for columns whose
      // distinct native values can collide after the cast (BIGINT beyond
      // 2^53), the hash alone could split a collision group across slices
      // in an order that contradicts the native sort. For such columns
      // the native long value itself (exact, monotone with the double
      // cast) sits between the double and the hash; for types whose
      // double cast is injective+monotone (int/float/double/short
      // decimals) the surrogate is a constant 0. Types with neither
      // property (high-precision decimals, strings) do not tie-split at
      // all (v = t = 0): double-colliding or equal values stay in ONE
      // slice, where the native within-slice sort orders them — the
      // r7 equi-width behavior, traded back for correctness on exotic
      // order domains only.
      val ordType = df.select(orderCol).schema.head.dataType
      import org.apache.spark.sql.types._
      val (vCol, tieSplit) = ordType match {
        case LongType => (orderCol.cast(LongType), true)
        case TimestampType => (unix_micros(orderCol), true)
        case ByteType | ShortType | IntegerType | FloatType | DoubleType |
             BooleanType => (lit(0L), true)
        case d: DecimalType if d.precision <= 15 => (lit(0L), true)
        case _ => (lit(0L), false)
      }
      val v = coalesce(vCol, lit(0L))
      val tie =
        if (tieSplit)
          xxhash64((if (tieCols.nonEmpty) tieCols
                    else orderCol +: inNames.map(col)) :+
            lit("__pfx_tie"): _*)
        else lit(0L)
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
      val narrow = df.select(ordFinite.as("__pfx_o"), v.as("__pfx_v"),
          tie.as("__pfx_t"))
        .where(col("__pfx_o").isNotNull)
      val samp = narrow
        .withColumn("__pfx_h",
          xxhash64(col("__pfx_o"), col("__pfx_v"), col("__pfx_t"),
            lit("__pfx_h")))
        .orderBy(col("__pfx_h"), col("__pfx_o"), col("__pfx_v"),
          col("__pfx_t"))
        .limit(sampleK)
      // the ONE broadcast column: the sorted sample array itself (empty
      // input → empty array → every real row lands in slice 0, the
      // degenerate collapse). The slice id is a compiled binary search
      // against it ([[graft.functions.QuantileBucket]]): a flat
      // boundary-column formulation (parts−1 comparison terms) generated
      // a projection method past the JIT's 8 KB bytecode ceiling, which
      // HotSpot then refused to compile — the interpreted-bytecode
      // projection measured ~25× the scan cost of the same frame.
      val bnds = samp.agg(sort_array(collect_list(
        struct(col("__pfx_o").as("o"), col("__pfx_v").as("v"),
          col("__pfx_t").as("t"))))
        .as("__pfx_all"))
      val bucket = graft.functions.ArrayOps.quantile_bucket(
        col("__pfx_all"), ord, v, tie, parts)
      val valueSlice = if (descending) lit(parts - 1) - bucket else bucket
      df.crossJoin(broadcast(bnds))
        .withColumn("__pfx_pid",
          when(ord.isNull, lit(nullSlice))
            .when(isnan(ord), lit(nanSlice))
            .otherwise(coalesce(valueSlice, lit(0))))
        .drop("__pfx_all")
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
    * `df` (the engine's row id): it breaks order ties into a TOTAL
    * deterministic order, so the result is reproducible across runs and
    * task retries.
    *
    * Why not a window `lag()` over the distributed slices? Offset window
    * frames (lag/lead) make WindowExec BUFFER every partition's rows
    * (`ExternalAppendOnlyUnsafeRowArray`) instead of streaming them the
    * way running-aggregate frames do — measured at 4–15× the executor
    * time of the cumsum pass on the same data, before even paying for the
    * cross-slice boundary handoff.
    *
    * r8: TRUE single-pass (the r7 shape computed dense positions on a
    * pinned narrow projection, self-joined on `pos − n`, and joined the
    * wide frame back — three narrow shuffles plus a wide join). Now the
    * donor travels WITH the row:
    *
    *   1. [[withSliceId]] over the (order, key) total order — the same
    *      deterministic sampled-quantile slices as [[runningAgg]];
    *   2. the |n| EDGE rows of every slice (a bounded per-slice
    *      `row_number ≤ |n|` over the narrow projection — parts·|n| rows
    *      in total, driver-collected by contract, like the prefix's own
    *      ≤ parts-row offsets frame) become each slice's incoming ring
    *      buffer: exactly the |n| rows that globally precede (follow,
    *      for a lead) the slice's first processed row;
    *   3. ONE hash exchange of the frame on the slice id + a
    *      within-partition sort on the total order, then a streaming
    *      `mapPartitions` ring buffer of size |n| emits every row with
    *      its donor values attached — O(|n|) state, no window buffering,
    *      no join, and the wide frame moves exactly once.
    *
    * `mapPartitions` is deliberate (the last-resort clause earned): the
    * semantics need the row |n| places back in a total order — offset
    * window frames are measured-forbidden, and every join formulation
    * moves the data at least twice. Offsets beyond 256 fall back to the
    * r7 positional join (the edge collect is parts·|n| rows — bounded
    * only while |n| is small).
    */
  def positionalLag(df: DataFrame, keyCol: String, orderCol: Column,
                    inNames: Seq[String], n: Int,
                    outNames: Seq[String]): DataFrame =
    positionalLag(df, keyCol, orderCol, inNames, n, outNames,
      fuse = "none")

  /** Boolean-flag form kept for callers of the r9 fused-diff API. */
  def positionalLag(df: DataFrame, keyCol: String, orderCol: Column,
                    inNames: Seq[String], n: Int,
                    outNames: Seq[String], fuseDiff: Boolean): DataFrame =
    positionalLag(df, keyCol, orderCol, inNames, n, outNames,
      fuse = if (fuseDiff) "diff" else "none")

  /** As [[positionalLag]], but with a fused per-cell combine: `fuse =
    * "diff"` emits the DIFFERENCE `value − donor` (the pandas `.diff()`
    * cell), `"pct"` the RATIO `value / donor − 1` (the pandas
    * `.pct_change()` cell) instead of the donor itself — std-mode
    * semantics: a missing donor (edge row or NULL lagged value) combines
    * as NaN; a NULL current value stays NULL. r9: fusing the combine into
    * the streaming emit saves a full wide projection pass over the frame
    * — the donor values are already in hand in the ring buffer.
    *
    * Window-aggregate fuses (r9 session 3): `"winsum" | "winmin" |
    * "winmax" | "wincount" | "winmed"` emit the aggregate of the (n+1)-position
    * window ending at the current row — the ring already buffers exactly
    * the n predecessors, so a pandas `.rolling(n+1)` aggregate is ONE
    * slice pass instead of running-prefix + lag + projection. Unformed
    * windows (fewer than n predecessors) emit NaN; NULL/NaN cells poison
    * sum/min/max (pandas default min_periods = window size) and are
    * skipped by count. Window fuses require the streaming path (n > 0,
    * n ≤ 256, edge cells within budget) — there is no one-donor join
    * equivalent of a window aggregate.
    * DoubleType columns only when fused. */
  def positionalLag(df: DataFrame, keyCol: String, orderCol: Column,
                    inNames: Seq[String], n: Int,
                    outNames: Seq[String], fuse: String,
                    fuseArg: Double = 0.0): DataFrame = {
    require(n != 0, "positionalLag needs a non-zero offset")
    require(inNames.length == outNames.length, "inNames/outNames must align")
    require(Set("none", "diff", "pct", "winsum", "winmin", "winmax",
      "wincount", "winmed", "winvar", "winewm")(fuse),
      s"unknown fuse mode '$fuse'")
    if (fuse != "none") {
      val sch = df.schema
      inNames.foreach { nm =>
        require(sch(nm).dataType ==
          org.apache.spark.sql.types.DoubleType,
          s"fuse='$fuse' requires DoubleType columns, got " +
            s"${sch(nm).dataType} for $nm")
      }
    }
    // r9 (ADVICE): the streaming path's driver edge-collect is parts·|n|
    // ROWS but each row carries every shifted value column — |n| ≤ 256
    // bounds only the row count. Gate on the CELL volume too
    // (parts·|n|·width ≤ graft.lag.maxEdgeCells, default 4M ≈ tens of MB
    // on the driver), falling back to the positional join whose edge
    // state never leaves the executors.
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val maxCells = df.sparkSession.conf
      .getOption("graft.lag.maxEdgeCells").map(_.toLong).getOrElse(4000000L)
    val cells = parts.toLong * math.abs(n) * inNames.length
    if (fuse.startsWith("win"))
      require(n > 0 && n <= 256 && cells <= maxCells,
        s"fuse='$fuse' requires the streaming lag path (0 < n <= 256 and " +
          s"parts*n*width <= $maxCells edge cells); got n=$n, " +
          s"cells=$cells — use the prefix-sum rolling formulation for " +
          "larger windows")
    if (math.abs(n) <= 256 && cells <= maxCells)
      positionalLagStream(df, keyCol, orderCol, inNames, n, outNames, fuse,
        fuseArg)
    else
      positionalLagJoin(df, keyCol, orderCol, inNames, n, outNames, fuse)
  }

  /** The fused window-aggregate cell: the k ring-buffered predecessors
    * plus the current row form the (k+1)-position window. Unformed window
    * (fewer than k predecessors seen) → NaN; a NULL/NaN cell poisons
    * sum/min/max and is skipped by count — pandas rolling semantics with
    * the default min_periods. Sum accumulates in STREAM order (oldest
    * first), the same association as a sequential pandas scan. */
  private def winEmit(fuse: String,
                      buf: scala.collection.mutable.ArrayDeque[Array[Any]],
                      cur: Array[Any], j: Int, k: Int,
                      fuseArg: Double = 0.0): java.lang.Double = {
    // winewm has NO unformed-window gate: pandas ewm emits from the
    // first valid row, a shorter ring just means fewer (tiny) weights
    if (fuse != "winewm" && buf.length < k)
      return java.lang.Double.valueOf(Double.NaN)
    var cnt = 0; var acc = 0.0; var poisoned = false; var ewmDen = 0.0
    val m = buf.length
    // median and variance need the whole window at once (an order
    // statistic / an exact two-pass): O(k+1) to O((k+1) log(k+1)) per
    // row, bounded by the ring gate. The two-pass variance centers on
    // the WINDOW's own mean — exact under any trend or offset, where
    // both raw power sums and global-mean centering cancel (pandas is
    // windowed-online and matches).
    val med = if (fuse == "winmed" || fuse == "winvar")
      new Array[Double](m + 1) else null
    var b = 0
    while (b <= m) {
      val v = if (b < m) buf(b)(j) else cur(j)
      if (v == null) poisoned = true
      else {
        val dv = v.asInstanceOf[Double]
        if (java.lang.Double.isNaN(dv)) poisoned = true
        else {
          cnt += 1
          if (fuse == "winsum") acc += dv
          else if (fuse == "winmin") acc = if (cnt == 1) dv else math.min(acc, dv)
          else if (fuse == "winmax") acc = if (cnt == 1) dv else math.max(acc, dv)
          else if (fuse == "winewm") {
            // adjust=True, ignore_na=False: weight by POSITION distance
            // (NaN positions decay the weights but feed neither sum)
            val w = math.pow(1.0 - fuseArg, (m - b).toDouble)
            acc += w * dv; ewmDen += w
          } else if (med != null) med(b) = dv
        }
      }
      b += 1
    }
    java.lang.Double.valueOf(
      if (fuse == "wincount") cnt.toDouble
      else if (fuse == "winewm") {
        if (cnt == 0) Double.NaN else acc / ewmDen
      } else if (poisoned || cnt == 0) Double.NaN
      else if (fuse == "winmed") {
        java.util.Arrays.sort(med)
        val n = med.length
        if (n % 2 == 1) med(n / 2) else (med(n / 2 - 1) + med(n / 2)) / 2.0
      } else if (fuse == "winvar") {
        val n = med.length
        var s = 0.0; var i = 0
        while (i < n) { s += med(i); i += 1 }
        val mu = s / n
        var q = 0.0; i = 0
        while (i < n) { val d = med(i) - mu; q += d * d; i += 1 }
        q / (n - 1)
      } else acc)
  }

  private def positionalLagStream(df: DataFrame, keyCol: String,
                                  orderCol: Column, inNames: Seq[String],
                                  n: Int, outNames: Seq[String],
                                  fuse: String,
                                  fuseArg: Double = 0.0): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val k = math.abs(n)
    val rev = n < 0 // lead: process the total order in reverse
    val okey = "__lag_ord"
    val sliced = withSliceId(df.withColumn(okey, orderCol), col(okey),
      inNames, Nil, descending = false, nullsLast = false,
      tieCols = Seq(col(keyCol)), parts)

    // the total processing order: (order asc nulls first, key asc) — or
    // its exact mirror for a lead. NaN doubles sort greatest either way
    // (Spark's convention), matching the slice placement in withSliceId.
    val ordAsc  = Seq(col(okey).asc_nulls_first, col(keyCol).asc)
    val ordDesc = Seq(col(okey).desc_nulls_last, col(keyCol).desc)
    val streamOrd = if (rev) ordDesc else ordAsc

    // per-slice edge rows: the k rows a NEIGHBOURING slice needs as its
    // incoming buffer — the LAST k of each slice for a lag, the FIRST k
    // for a lead. r9: ranked on the bounded-heap TopKPerKey (partial
    // heaps cut every input partition to ≤ k rows per slice BEFORE any
    // exchange) — the prior per-slice row_number window exchanged AND
    // sorted the whole frame a second time just to keep parts·k rows,
    // doubling the data motion of what is sold as a single-pass operator.
    val edgeOrd = if (rev) ordAsc else ordDesc
    val edges = graft.plans.TopKPerKey(
        sliced.select(col("__pfx_pid") +: col(okey) +: col(keyCol) +:
          inNames.map(col): _*),
        Seq(col("__pfx_pid")), edgeOrd, k)
      // collect in GLOBAL ascending order so the driver never re-implements
      // the engine's NULL/NaN sort semantics
      .orderBy((col("__pfx_pid").asc +: ordAsc): _*)
      .select(col("__pfx_pid") +: inNames.map(col): _*)
      .collect()

    // incoming buffer per slice, oldest-processed first: for a lag, the
    // last k edge rows of slices BELOW s (ascending); for a lead, the
    // first k edge rows of slices ABOVE s, reversed (the reversed stream
    // processes larger rows earlier)
    val byPid = edges.groupBy(_.getInt(0))
    val incoming: Map[Int, Array[Array[Any]]] =
      (0 until parts).map { s =>
        val vals =
          if (rev)
            (s + 1 until parts).iterator
              .flatMap(p => byPid.getOrElse(p, Array.empty[org.apache.spark.sql.Row]))
              .take(k).toArray.reverse
          else
            (0 until s).iterator
              .flatMap(p => byPid.getOrElse(p, Array.empty[org.apache.spark.sql.Row]))
              .toArray.takeRight(k)
        s -> vals.map(r => inNames.indices.map(i => r.get(i + 1)).toArray)
      }.toMap

    val inSchema = sliced.schema
    val inIdx = inNames.map(inSchema.fieldIndex)
    val pidIdx = inSchema.fieldIndex("__pfx_pid")
    val outSchema = org.apache.spark.sql.types.StructType(
      inSchema.fields ++ outNames.zip(inNames).map { case (o, i) =>
        inSchema(inSchema.fieldIndex(i)).copy(name = o, nullable = true)
      })
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(outSchema)

    val streamed = sliced
      .repartition(parts, col("__pfx_pid"))
      .sortWithinPartitions((col("__pfx_pid").asc +: streamOrd): _*)
      .mapPartitions { it =>
        var curPid = Int.MinValue
        val buf = scala.collection.mutable.ArrayDeque.empty[Array[Any]]
        it.map { r =>
          val pid = r.getInt(pidIdx)
          if (pid != curPid) { // new contiguous slice run
            buf.clear()
            incoming.getOrElse(pid, Array.empty).foreach(buf.append)
            curPid = pid
          }
          val donor: Array[Any] =
            if (buf.length >= k) buf(buf.length - k) else null
          val cur = inIdx.map(r.get).toArray
          val outVals = new Array[Any](r.length + inIdx.length)
          var i = 0
          while (i < r.length) { outVals(i) = r.get(i); i += 1 }
          var j = 0
          while (j < inIdx.length) {
            outVals(r.length + j) =
              if (fuse == "none") {
                if (donor == null) null else donor(j)
              } else if (fuse.startsWith("win")) {
                winEmit(fuse, buf, cur, j, k, fuseArg)
              } else if (cur(j) == null) null
              else {
                // missing donor (edge row or NULL lagged value) = NaN —
                // the std-mode `.diff()`/`.pct_change()` edge fill,
                // fused into the emit
                val dv =
                  if (donor == null || donor(j) == null) Double.NaN
                  else donor(j).asInstanceOf[Double]
                val cv = cur(j).asInstanceOf[Double]
                java.lang.Double.valueOf(
                  if (fuse == "diff") cv - dv else cv / dv - 1.0)
              }
            j += 1
          }
          buf.append(cur)
          if (buf.length > k) buf.removeHead()
          new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
            outVals, outSchema): org.apache.spark.sql.Row
        }
      }
    streamed.drop("__pfx_pid", okey)
  }

  /** The r7 positional-join fallback for very large offsets: dense pos on
    * a pinned narrow projection via [[runningAgg]] of ones, a narrow
    * self-equi-join on `pos − n`, and one wide join back on the unique
    * `keyCol`. */
  private def positionalLagJoin(df: DataFrame, keyCol: String,
                                orderCol: Column, inNames: Seq[String],
                                n: Int, outNames: Seq[String],
                                fuse: String = "none"): DataFrame = {
    require(!fuse.startsWith("win"),
      "window-aggregate fuses have no one-donor join formulation")
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
    val joined = df.join(shifted, Seq(keyCol), "left")
    if (fuse == "none") joined
    else {
      // same fused contract as the streaming path: out = v ∘ donor,
      // missing donor combines as NaN, NULL current value stays NULL
      val keep = df.columns.map(col).toSeq
      val combined = inNames.zip(outNames).map { case (i, o) =>
        val dv = coalesce(col(o), lit(Double.NaN))
        val l = col(i)
        // the pct division must be IEEE like the streaming emit's JVM
        // `/` (Spark's Divide yields NULL on a zero denominator)
        val ratio = when(dv === 0.0,
            when(isnan(l) || l === 0.0, lit(Double.NaN))
              .when(l > 0.0, lit(Double.PositiveInfinity))
              .otherwise(lit(Double.NegativeInfinity)))
          .otherwise(l / dv)
        (if (fuse == "diff") l - dv else ratio - lit(1.0)).as(o)
      }
      joined.select(keep ++ combined: _*)
    }
  }
}
