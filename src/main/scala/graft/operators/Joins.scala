package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Explicit join operators beyond Catalyst's built-in equi-join strategies:
  * backward as-of join and point-in-interval range join (SURVEY §2.8 lists
  * both as absent from the reference — these are the additive pipeline
  * operators a time-series / feature-engineering workload needs).
  *
  * Scale design — both operators avoid the naive theta-join (a broadcast
  * nested-loop that either OOMs the driver or degenerates to all-pairs):
  *
  *  - as-of join: union both sides and run ONE analytic window per key
  *    (`last(payload, ignoreNulls)` over rows-unbounded-preceding). Exactly
  *    one shuffle, keyed by the join key; per-key state never leaves the
  *    executor; skew is bounded by per-key row counts. This is the shape
  *    that holds at 100 TB — no per-row range probe, no broadcast of a
  *    growing right side.
  *  - range join: discretize intervals into fixed-width buckets (explode
  *    each interval to the buckets it covers), equi-join points on their
  *    bucket, then filter the exact containment predicate. Catalyst gets a
  *    plain shuffled equi-join it can plan (and AQE can skew-split); cost
  *    is |points| + Σ interval-width/bucket-width instead of |points|·|iv|.
  */
object Joins {

  /** Backward as-of join: for each left row, attach the payload of the
    * LATEST right row with the same key and `right.ts <= left.ts`
    * (`<` when `exactMatches = false`). Left rows with no prior right row
    * keep NULL payloads (left-outer semantics).
    *
    * Right-side ties on (key, ts) are resolved by `tieBreak` ascending —
    * the row sorting LAST (max tieBreak) wins, matching "latest wins".
    *
    * @param payload  right-side columns to carry onto left rows; must not
    *                 collide with left column names (rename beforehand)
    */
  def asofBackward(left: DataFrame, right: DataFrame,
                   keys: Seq[String], tsCol: String,
                   payload: Seq[String],
                   tieBreak: Option[String] = None,
                   exactMatches: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"payload/left name collision: ${payload.intersect(leftCols)}")
    val nullOf = (df: DataFrame, c: String) =>
      lit(null).cast(df.schema(c).dataType).as(c)
    // at equal ts: right sorts before left when exact matches count,
    // after left when they don't — so the window's "last right row so far"
    // includes/excludes same-instant right rows accordingly
    val (rSide, lSide) = if (exactMatches) (0, 1) else (1, 0)
    // the payload travels as ONE struct so the match is row-atomic: a NULL
    // payload CELL must not fall back to an older right row's value, which
    // per-column last(ignoreNulls) windows would silently do
    val pType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c).copy(name = c)))
    val l2 = left.select(
      (leftCols.map(col) :+ lit(lSide).as("__side__")) :+
        lit(null).cast(pType).as("__p__"): _*)
    val r2 = right.select(
      (leftCols.map(c => if (keys.contains(c) || c == tsCol) col(c)
                         else nullOf(left, c)) :+ lit(rSide).as("__side__")) :+
        struct(payload.map(col): _*).as("__p__"): _*)
    // tieBreak names a payload column, which now lives inside the struct
    val order: Seq[Column] = col(tsCol) +: col("__side__") +:
      tieBreak.map(c => col(s"__p__.$c")).toSeq
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.union(r2)
      .select((leftCols.map(col) :+ col("__side__")) :+
        last(col("__p__"), ignoreNulls = true).over(w).as("__p__"): _*)
      .filter(col("__side__") === lSide)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"__p__.$c").as(c)): _*)
  }

  /** Forward as-of join: for each left row, attach the payload of the
    * EARLIEST right row with the same key and `right.ts >= left.ts`
    * (`>` when `exactMatches = false`). Mirror of [[asofBackward]]:
    * same union + ONE analytic window shape (single shuffle by key),
    * with a [current, unbounded following] frame and `first(ignoreNulls)`.
    *
    * Right-side ties on (key, ts) are resolved by `tieBreak` ascending —
    * the row sorting FIRST (min tieBreak) wins, matching "earliest wins".
    */
  def asofForward(left: DataFrame, right: DataFrame,
                  keys: Seq[String], tsCol: String,
                  payload: Seq[String],
                  tieBreak: Option[String] = None,
                  exactMatches: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"payload/left name collision: ${payload.intersect(leftCols)}")
    val nullOf = (df: DataFrame, c: String) =>
      lit(null).cast(df.schema(c).dataType).as(c)
    // at equal ts the right row must fall INSIDE the left row's following
    // frame when exact matches count (right sorts after left), OUTSIDE it
    // when they don't (right sorts before left)
    val (rSide, lSide) = if (exactMatches) (1, 0) else (0, 1)
    val pType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c).copy(name = c)))
    val l2 = left.select(
      (leftCols.map(col) :+ lit(lSide).as("__side__")) :+
        lit(null).cast(pType).as("__p__"): _*)
    val r2 = right.select(
      (leftCols.map(c => if (keys.contains(c) || c == tsCol) col(c)
                         else nullOf(left, c)) :+ lit(rSide).as("__side__")) :+
        struct(payload.map(col): _*).as("__p__"): _*)
    val order: Seq[Column] = col(tsCol) +: col("__side__") +:
      tieBreak.map(c => col(s"__p__.$c")).toSeq
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l2.union(r2)
      .select((leftCols.map(col) :+ col("__side__")) :+
        first(col("__p__"), ignoreNulls = true).over(w).as("__p__"): _*)
      .filter(col("__side__") === lSide)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"__p__.$c").as(c)): _*)
  }

  /** Nearest as-of join: for each left row, attach the payload of the right
    * row with the same key minimizing `|right.ts - left.ts|`; ties between
    * an equally-near earlier and later right row go to the EARLIER one
    * (backward wins). Exact-ts matches are distance 0 and always win.
    *
    * Both direction candidates come from ONE window node: the union is
    * shuffled and sorted once per key, and the backward
    * `last(ignoreNulls)` / forward `first(ignoreNulls)` frames share that
    * sort — the 100 TB cost is identical to a single as-of join.
    */
  def asofNearest(left: DataFrame, right: DataFrame,
                  keys: Seq[String], tsCol: String,
                  payload: Seq[String],
                  tieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"payload/left name collision: ${payload.intersect(leftCols)}")
    val nullOf = (df: DataFrame, c: String) =>
      lit(null).cast(df.schema(c).dataType).as(c)
    // right rows sort BEFORE left at equal ts: a same-instant right row is
    // a backward candidate at distance 0, and the backward-wins tie rule
    // makes the forward frame's view of it irrelevant
    val (rSide, lSide) = (0, 1)
    // the right ts rides inside the struct so each candidate's distance is
    // computed from the row that actually matched (row-atomic, like the
    // payload itself)
    val pType = org.apache.spark.sql.types.StructType(
      right.schema(tsCol).copy(name = "__rts__") +:
        payload.map(c => right.schema(c).copy(name = c)))
    val l2 = left.select(
      (leftCols.map(col) :+ lit(lSide).as("__side__")) :+
        lit(null).cast(pType).as("__p__"): _*)
    val r2 = right.select(
      (leftCols.map(c => if (keys.contains(c) || c == tsCol) col(c)
                         else nullOf(left, c)) :+ lit(rSide).as("__side__")) :+
        struct(col(tsCol).as("__rts__") +: payload.map(col): _*).as("__p__"): _*)
    val order: Seq[Column] = col(tsCol) +: col("__side__") +:
      tieBreak.map(c => col(s"__p__.$c")).toSeq
    val part = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val wb = part.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = part.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val chooseBwd = col("__f__").isNull ||
      (col("__b__").isNotNull &&
        (col(tsCol) - col("__b__.__rts__")) <= (col("__f__.__rts__") - col(tsCol)))
    l2.union(r2)
      .select((leftCols.map(col) :+ col("__side__")) :+
        last(col("__p__"), ignoreNulls = true).over(wb).as("__b__") :+
        first(col("__p__"), ignoreNulls = true).over(wf).as("__f__"): _*)
      .filter(col("__side__") === lSide)
      .withColumn("__p__", when(chooseBwd, col("__b__")).otherwise(col("__f__")))
      .select(leftCols.map(col) ++
        payload.map(c => col(s"__p__.$c").as(c)): _*)
  }

  /** Point-in-interval range join: rows of `points` paired with every
    * interval `[lo, hi)` of `intervals` that contains `ptCol`. Intervals
    * may overlap (a point matches each one independently).
    *
    * `bucketWidth` trades interval fan-out against bucket selectivity:
    * each interval is replicated ceil(width/bucketWidth)+1 times; each
    * point probes exactly one bucket. Pick it near the median interval
    * width.
    */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucket(c: Column): Column = floor(c / bucketWidth).cast("long")
    val iv = intervals.withColumn("__bucket__",
      explode(sequence(bucket(col(loCol)), bucket(col(hiCol)))))
    points.withColumn("__bucket__", bucket(col(ptCol)))
      .join(iv, Seq("__bucket__"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__bucket__")
  }

  /** Interval-overlap join (closed intervals: `l.lo ≤ r.hi ∧ r.lo ≤ l.hi`)
    * as a plannable equi-join: both sides explode their covered
    * fixed-width buckets (fanout = interval length / bucketWidth, bounded
    * for bounded intervals), join on (keys, bucket), and each qualifying
    * pair is emitted EXACTLY once — in the first bucket the two intervals
    * share, `bucket == max(bucket(l.lo), bucket(r.lo))` — so no
    * distinct-dedup shuffle is ever needed. The theta-join alternative is
    * a per-key nested loop; this shape hash-partitions on a real key and
    * AQE can split skewed buckets.
    *
    * Caller aliases overlapping column names; `keys` (optional) co-keys
    * the join (e.g. per-user intervals). */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
                      right: DataFrame, rLo: String, rHi: String,
                      bucketWidth: Double,
                      keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucket(c: Column): Column = floor(c / bucketWidth).cast("long")
    val l = left.withColumn("__bucket__",
      explode(sequence(bucket(col(lLo)), bucket(col(lHi)))))
    val r = right.withColumn("__bucket__",
      explode(sequence(bucket(col(rLo)), bucket(col(rHi)))))
    l.join(r, keys :+ "__bucket__")
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__bucket__") ===
        greatest(bucket(col(lLo)), bucket(col(rLo))))
      .drop("__bucket__")
  }
}
