package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-Streaming forms of the pipeline operators (the reference is
  * strictly batch — SURVEY §2.8 — but a 100 TB training-data pipeline
  * ingests continuously; these are the `readStream → transform →
  * writeStream` shapes of the batch operators in graft.operators).
  *
  * All transforms here are stateless projections or watermarked stateful
  * ops supported by the streaming planner:
  *  - streaming exact dedup = `dropDuplicatesWithinWatermark` on the
  *    content fingerprint (bounded state: the watermark evicts);
  *  - quality filtering / language-ID / fingerprinting are the SAME
  *    codegen'd projections as batch (shared code path);
  *  - windowed event aggregation uses event-time windows + watermark so
  *    late data is merged until the watermark passes, then state drops.
  */
object StreamingOps {

  /** Content fingerprint (same normalization as the batch operator). */
  def fingerprinted(docs: DataFrame, textCol: String = "text",
                    tsCol: String = "ts"): DataFrame =
    docs.withColumn("fp",
      substring(md5(lower(regexp_replace(col(textCol), "\\s+", " "))), 1, 16))

  /** Streaming exact dedup: keep the first arrival of each fingerprint;
    * state bounded by the event-time watermark. */
  def dedupStream(docs: DataFrame, textCol: String = "text",
                  tsCol: String = "ts", watermark: String = "10 minutes"): DataFrame =
    fingerprinted(docs, textCol, tsCol)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming quality gate: same heuristics as the batch qualityScore,
    * applied as a stateless filter (tokens in [minTokens, maxTokens],
    * bounded stopword density). */
  def qualityFilter(docs: DataFrame, textCol: String = "text",
                    minTokens: Long = 5, maxTokens: Long = 10000): DataFrame = {
    val t = col(textCol)
    val nTok = length(t) - length(replace(t, lit(" "), lit(""))) + 1
    docs.filter(nTok.between(minTokens, maxTokens))
  }

  /** Windowed event-rate aggregation with late-data handling: per
    * (window, event_type) counts and value sums; watermark bounds state. */
  def eventWindowAgg(events: DataFrame, tsCol: String = "ts",
                     window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Stream-stream interval join: enrich an event stream with a label
    * stream on the same key, accepting labels that arrive within
    * `joinWindow` AFTER the event. Both sides carry watermarks so the
    * join state is evicted once the interval can no longer match —
    * the bounded-state shape Structured Streaming requires for
    * stream×stream joins. */
  def enrichWithin(events: DataFrame, labels: DataFrame,
                   key: String = "doc_id",
                   joinWindow: String = "10 minutes",
                   watermark: String = "20 minutes"): DataFrame = {
    val e = events.withWatermark("ts", watermark)
    val l = labels.withWatermark("lts", watermark)
      .withColumnRenamed(key, "__lkey__")
    e.join(l,
      col(key) === col("__lkey__") &&
        col("lts") >= col("ts") &&
        col("lts") <= col("ts") + expr(s"INTERVAL $joinWindow"),
      "inner")
      .drop("__lkey__")
  }
}
