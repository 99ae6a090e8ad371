package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto a
  * fixed-width bucket grid per key and forward-fill the gaps — the standard
  * preprocessing step before feature windows / as-of joins consume a
  * regular series.
  *
  * Scale shape: one groupBy to the (key, bucket) grain (map-side combine
  * absorbs raw events), a per-key min/max to bound the grid, a sequence
  * explode whose fan-out is the GRID size (bounded by time span ÷ bucket
  * width, independent of event count), and ONE analytic window per key for
  * the fill — the same single-shuffle-by-key discipline as the as-of join.
  * No per-row gap probing, no driver-side loops.
  */
object TimeSeries {

  /** Resample `events` to one row per (key, bucket) over each key's
    * [min, max] bucket range; empty buckets carry the last seen aggregate
    * value (forward fill) and `n_events = 0`.
    *
    * @param bucketCol  integer bucket expression over the event time (e.g.
    *                   epoch-µs `div` 3600000000 for hours)
    * @param valueCol   value to sum per bucket (summed as DECIMAL(18,2) for
    *                   order-independent exactness, delivered as double)
    */
  def resampleForwardFill(events: DataFrame, keyCol: String, bucketCol: Column,
                          valueCol: String): DataFrame = {
    val agg = events
      .groupBy(col(keyCol), bucketCol.as("bucket"))
      .agg(sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .as("v"), count(lit(1)).as("n_events"))
    val grid = agg.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col(keyCol), explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("v"), ignoreNulls = true).over(w)
          .cast(org.apache.spark.sql.types.DoubleType).as("v_filled"))
  }

  /** Linear interpolation over the same per-key bucket grid as
    * [[resampleForwardFill]]: an empty bucket between two observed ones
    * gets the straight line between them; leading/trailing gaps fall back
    * to the nearest observed value (there is nothing to interpolate
    * toward).
    *
    * Determinism: the interpolated value is computed MULTIPLIED-THROUGH in
    * exact decimal — `(pv·(nb−b) + nv·(b−pb)) / (nb−pb)` with decimal
    * values and integer bucket gaps — so the only floating-point step is
    * one final IEEE division of two exactly-agreed numbers. No rounding
    * anywhere, hence no round-at-half-way cross-engine hazard.
    *
    * Scale shape: the four neighbor columns (previous/next value and
    * bucket) come from two frames of the SAME partition+order window spec,
    * so Spark computes all of them in one WindowExec — one shuffle by key,
    * one sort, grid-sized input. */
  def interpolateLinear(events: DataFrame, keyCol: String, bucketCol: Column,
                        valueCol: String): DataFrame = {
    val agg = events
      .groupBy(col(keyCol), bucketCol.as("bucket"))
      .agg(sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .as("v"), count(lit(1)).as("n_events"))
    val grid = agg.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col(keyCol), explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val dbl = org.apache.spark.sql.types.DoubleType
    grid.join(agg, Seq(keyCol, "bucket"), "left")
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("pb", last(when(col("v").isNotNull, col("bucket")),
        ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("nb", first(when(col("v").isNotNull, col("bucket")),
        ignoreNulls = true).over(wNext))
      .select(col(keyCol), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        when(col("v").isNotNull, col("v").cast(dbl))
          .when(col("pv").isNull, col("nv").cast(dbl))
          .when(col("nv").isNull, col("pv").cast(dbl))
          .otherwise(
            (col("pv") * (col("nb") - col("bucket")) +
              col("nv") * (col("bucket") - col("pb"))).cast(dbl) /
              (col("nb") - col("pb")).cast(dbl))
          .as("v_interp"))
  }

  /** Finite-horizon exponentially-weighted moving average per key: the
    * last `taps` observations weighted w_j = 2^-j (newest first),
    * normalized over the weights actually present at the start of a
    * series.
    *
    * Two determinism choices make the result bit-identical across engines
    * with NO rounding inside the recurrence:
    *  - the weights are powers of two, so every product `value * 2^-j` is
    *    EXACT in IEEE double (scaling by 2^-j only shifts the exponent);
    *  - the numerator/denominator are explicit left-to-right `+` chains
    *    over the taps (not a window SUM whose order an engine could
    *    choose), so both engines add in the same order.
    * Only the final normalized ratio is rounded (6 places).
    *
    * Scale shape: ONE window node computes all `taps` lags in a single
    * shuffle-by-key + sort — the same single-window discipline as the
    * as-of joins. The infinite-horizon recurrence (ewma = αx + (1-α)prev)
    * is inherently sequential per key; the finite horizon is what makes
    * the operator a plan, not a loop. */
  def ewmaFiniteHorizon(events: DataFrame, keyCol: String, orderCols: Seq[Column],
                        valueCol: String, taps: Int = 10): DataFrame = {
    require(taps >= 1 && taps <= 50, s"need 1 <= taps <= 50, got $taps")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
    val lags = (0 until taps).map { j =>
      (if (j == 0) col(valueCol) else lag(col(valueCol), j).over(w))
        .as(s"__l$j")
    }
    val withLags = events.select(col("*") +: lags: _*)
    val weight = (j: Int) => lit(math.pow(2.0, -j)) // exact double
    val num = (0 until taps).map(j =>
        coalesce(col(s"__l$j") * weight(j), lit(0.0)))
      .reduceLeft(_ + _)
    val den = (0 until taps).map(j =>
        when(col(s"__l$j").isNotNull, weight(j)).otherwise(lit(0.0)))
      .reduceLeft(_ + _)
    withLags
      .withColumn("ewma", round(num / den, 6))
      .drop((0 until taps).map(j => s"__l$j"): _*)
  }
}
