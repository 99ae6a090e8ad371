package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Dataset profiling: per-column statistics in ONE pass over the data.
  *
  * The profile of every requested column — row count, null count, distinct
  * count, min/max, decimal-exact mean — is computed by a single aggregate
  * (multi-column `count(DISTINCT x)`s expand map-side via Catalyst's Expand,
  * everything else is an ordinary partial aggregate), so the input is
  * scanned exactly once no matter how many columns are profiled. The 1-row
  * aggregate is then exploded into one output row per column — a driver-size
  * pivot of an already-tiny result, not a data-size operation.
  *
  * At 100 TB the plan is the same: one scan, map-side partials, a 1-row
  * final aggregate; the Expand multiplies rows by #distinct-columns before
  * the partial agg absorbs them, which is the standard price of exact
  * multi-column distinct counts (swap in HLL sketches when approximate
  * counts are acceptable).
  *
  * Reference scope: the reference library has no profiling surface
  * (`/root/reference/src/ssb_coefficient_maker/coeff_maker.py` exposes only
  * formula evaluation); this is one of the requested training-pipeline
  * additions (data-quality profiling before curation).
  */
object Profiling {

  /** Profile `cols` (numeric) of `df`: one row per column with
    * (column, n_rows, n_nulls, n_distinct, min_v, max_v, mean_v).
    * Sums go through DECIMAL(18,2) so the mean is exact and
    * order-independent; mean is rounded to 6 places.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast(DoubleType).as(s"__min_$c"),
        max(col(c)).cast(DoubleType).as(s"__max_$c"),
        sum(col(c).cast(DecimalType(18, 2))).as(s"__sum_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_v"),
        col(s"__max_$c").as("max_v"),
        round(col(s"__sum_$c").cast(DoubleType) / col(s"__nn_$c"), 6).as("mean_v"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}
