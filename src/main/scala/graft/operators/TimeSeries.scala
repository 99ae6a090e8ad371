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
}
