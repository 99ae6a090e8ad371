package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream product analytics: cohort retention and ordered funnels.
  *
  * Neither exists in the reference (its only event-shaped construct is the
  * synchronous batch loop, `/root/reference/src/ssb_coefficient_maker/
  * coeff_maker.py:989-1016`); both are SURVEY §2.8 extension categories a
  * warehouse user expects from an analytics engine.
  *
  * Scale posture: both operators aggregate raw events down to bounded
  * per-user shapes BEFORE any window/join — raw events are touched exactly
  * once, in the scan stage, by a map-side-combinable groupBy. The per-user
  * row counts that flow into windows are bounded (active days per user,
  * not events per user), so no window partition can become a straggler even
  * when one user has millions of events.
  */
object Funnel {

  /** Cohort retention matrix: cohort = the user's first active day; each
    * (cohort_day, day_offset) cell counts the cohort's users active that
    * many days later (plus their event volume).
    *
    * Plan shape: groupBy(user, day) — ONE pass over raw events with
    * map-side combine — then a per-user unbounded-frame `min` window over
    * the (user, day) rows (≤ days-per-user rows per partition key), then a
    * second bounded groupBy on (cohort_day, offset). At 100 TB the only
    * full-data shuffle carries one row per user-day.
    *
    * @param dayCol event day as an integral column (e.g. epoch-µs div 86.4e9)
    */
  def cohortRetention(events: DataFrame, userCol: String,
                      dayCol: Column): DataFrame = {
    val ud = events
      .groupBy(col(userCol).as("user_id"), dayCol.cast("long").as("day"))
      .agg(count(lit(1)).as("n_ev"))
    val w = Window.partitionBy(col("user_id"))
    ud.withColumn("cohort_day", min(col("day")).over(w))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        sum(col("n_ev")).cast("long").as("n_events"))
  }

  /** Strictly-ordered conversion funnel: step i counts users whose first
    * step-i event happens AFTER their first qualifying step-(i-1) event
    * (first-touch semantics: t1 = min ts of step 1; t_i = min ts of step i
    * with ts > t_{i-1}).
    *
    * Plan shape: one shuffle by user, then one window node PER STEP over
    * the same partitioning (Catalyst reuses the exchange — the steps are
    * sequentially dependent, so some per-user pass per step is inherent),
    * then one per-user aggregate and one tiny final aggregate. Returns one
    * row per step: (step, event_type, n_users, conv_from_prev).
    *
    * @param tsCol event time as an integral column (epoch-µs)
    */
  def funnel(events: DataFrame, userCol: String, tsCol: Column,
             typeCol: Column, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col("user_id"))
    val base = events.select(col(userCol).as("user_id"),
      tsCol.cast("long").as("tu"), typeCol.as("et"))
    val withTs = steps.zipWithIndex.foldLeft(base) { case (df, (step, i)) =>
      val cond = if (i == 0) col("et") === step
        else col("et") === step && col("tu") > col(s"t$i")
      df.withColumn(s"t${i + 1}", min(when(cond, col("tu"))).over(w))
    }
    val perUser = withTs.groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"),
        steps.indices.drop(1).map(i => max(col(s"t${i + 1}")).as(s"t${i + 1}")): _*)
    val counts = perUser.agg(
      count(col("t1")).as("n1"),
      steps.indices.drop(1).map(i => count(col(s"t${i + 1}")).as(s"n${i + 1}")): _*)
    val stepRows = steps.zipWithIndex.map { case (step, i) =>
      val conv = if (i == 0) lit(1.0)
        else when(col(s"n$i") === 0, lit(0.0))
          .otherwise(round(col(s"n${i + 1}").cast("double") / col(s"n$i"), 6))
      struct(lit(i + 1).as("step"), lit(step).as("event_type"),
        col(s"n${i + 1}").as("n_users"), conv.as("conv_from_prev"))
    }
    counts.select(explode(array(stepRows: _*)).as("r")).select(col("r.*"))
  }

  /** RFM (recency / frequency / monetary) customer scoring with quartile
    * bins — the classic CRM segmentation, here with every stage
    * scale-shaped: metrics come from ONE map-side-combined groupBy over
    * raw events; each quartile threshold set is rank-selected over a
    * bounded distinct-value counts table and broadcast back; bins are a
    * scan-stage projection (`1 + (v>p25) + (v>p50) + (v>p75)`), no ntile
    * (a global ntile is a single-partition sort over every user).
    *
    * Monetary sums go through DECIMAL(18,2) (order-independent) and out
    * as double. `rfm_score = r_bin·100 + f_bin·10 + m_bin`. */
  def rfm(events: DataFrame, userCol: String, dayCol: Column,
          typeCol: Column, valueCol: Column,
          monetaryType: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val per = events.groupBy(col(userCol).as("user_id"))
      .agg(max(dayCol).cast("long").as("recency"),
        sum(when(typeCol === monetaryType, 1L).otherwise(0L)).as("frequency"),
        coalesce(sum(when(typeCol === monetaryType, valueCol.cast(dec))),
          lit(0).cast(dec)).cast("double").as("monetary"))
    def thresholds(c: String): DataFrame = {
      val counts = per.groupBy(col(c).as("__v")).agg(count(lit(1)).as("__c"))
      val cum = Window.orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      counts.select(col("__v"), sum(col("__c")).over(cum).as("__cum"),
          sum(col("__c")).over(all).as("__n"))
        .agg(
          min(when(col("__cum") >= ceil(col("__n") * 0.25), col("__v")))
            .as(s"${c}_p25"),
          min(when(col("__cum") >= ceil(col("__n") * 0.5), col("__v")))
            .as(s"${c}_p50"),
          min(when(col("__cum") >= ceil(col("__n") * 0.75), col("__v")))
            .as(s"${c}_p75"))
    }
    def bin(c: String): Column =
      (lit(1) + (col(c) > col(s"${c}_p25")).cast("int")
        + (col(c) > col(s"${c}_p50")).cast("int")
        + (col(c) > col(s"${c}_p75")).cast("int"))
    Seq("recency", "frequency", "monetary")
      .foldLeft(per)((df, c) => df.crossJoin(broadcast(thresholds(c))))
      .select(col("user_id"), col("recency"), col("frequency"), col("monetary"),
        bin("recency").as("r_bin"), bin("frequency").as("f_bin"),
        bin("monetary").as("m_bin"))
      .withColumn("rfm_score",
        col("r_bin") * 100 + col("f_bin") * 10 + col("m_bin"))
  }
}
