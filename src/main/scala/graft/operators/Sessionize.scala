package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Event sessionization — the canonical "custom state" pipeline operator
  * (gap-based user sessions), in both batch and streaming form.
  *
  * Batch: the classic two-window formulation — a session starts where the
  * gap to the previous event exceeds the timeout; the session index is the
  * running count of starts. Both windows partition by user, so the single
  * shuffle is by user_id and everything after is per-partition sort +
  * scan — the shape that holds at 100 TB (state never leaves the executor,
  * no driver involvement, skew bounded by per-user event counts).
  *
  * Streaming: flatMapGroupsWithState with event-time timeout — the Spark
  * primitive for custom per-key state (SURVEY §2.8: absent from the
  * reference; first-class for a continuously-ingesting pipeline). Sessions
  * are emitted when the watermark passes their gap timeout.
  */
object Sessionize {

  /** Batch gap sessionization. One shuffle (by user), two analytic windows,
    * one aggregation. Value sums go through DECIMAL(18,2) so results are
    * order-independent and engine-exact (driver-oracle rule).
    *
    * Timestamps are normalized to epoch MICROSECONDS as BIGINT, whatever
    * the parquet's physical encoding: TIMESTAMP(NANOS) (readable only as
    * LongType under the nanosAsLong legacy flag — truncated ns→µs),
    * TIMESTAMP(MICROS) (Spark 4 reads TIMESTAMP_NTZ; diffed against the
    * NTZ epoch so the result is session-timezone-free), or a tz-aware
    * TIMESTAMP. Integer µs is the exact common denominator with engines
    * that read the file natively.
    */
  def batch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes.toLong * 60 * 1000000L
    val tsUs = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("ts div 1000") // long nanos → truncated µs
      case org.apache.spark.sql.types.TimestampNTZType =>
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
      case _ => unix_micros(col("ts"))
    }
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(tsUs, col("event_id"))
    val newSession = when(
      lag(tsUs, 1).over(byUser).isNull ||
        tsUs - lag(tsUs, 1).over(byUser) > gapUs, 1L).otherwise(0L)
    events
      .withColumn("__ts_ns__", tsUs)
      .withColumn("session_idx",
        sum(newSession).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("__ts_ns__")).as("session_start"),
        max(col("__ts_ns__")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("sum_value"))
  }

  case class EvIn(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                        session_end: java.sql.Timestamp, n_events: Long,
                        sum_value: Double)

  /** Streaming gap sessionization: per-user session state, closed and
    * emitted when the event-time watermark passes `start-of-gap`. Input
    * needs (user_id, ts, value) and a watermark-compatible ts column. */
  def stream(events: DataFrame, gapMinutes: Int = 30,
             watermark: String = "1 hour"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes.toLong * 60 * 1000

    def fn(uid: Long, rows: Iterator[EvIn],
           state: GroupState[SessionState]): Iterator[SessionOut] = {
      def emit(s: SessionState) = SessionOut(uid,
        new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end),
        s.n, s.sum)
      if (state.hasTimedOut) {
        val out = state.getOption.map(emit).iterator
        state.remove()
        out
      } else {
        val evs = rows.toArray.sortBy(_.ts.getTime)
        var closed = List.empty[SessionOut]
        var cur = state.getOption
        evs.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.end <= gapMs =>
              cur = Some(SessionState(s.start, math.max(s.end, t),
                s.n + 1, s.sum + e.value))
            case Some(s) =>
              closed ::= emit(s)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // Spark rejects a timeout at or before the current watermark; a
          // late-but-in-watermark event for an already-expired session
          // would otherwise throw (and the restart replays the same batch
          // and throws again) — clamp to watermark+1 so the session closes
          // at the next trigger instead (same guard as nearDupStream)
          state.setTimeoutTimestamp(math.max(s.end + gapMs,
            state.getCurrentWatermarkMs() + 1))
        }
        closed.reverse.iterator
      }
    }

    events.withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"),
        col("value").cast("double"))
      .as[EvIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
