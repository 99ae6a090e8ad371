package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** End-to-end Structured Streaming demo: stream the events table from disk
  * (file source), apply the watermarked window aggregation, collect to a
  * memory sink. Usage: runMain graft.StreamDemo [sfDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
      // rejects; read as long nanos and convert
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // the file-stream source wants a directory: point it at the sf dir and
    // glob-filter to the events table
    val toTs = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // legacy long nanos
        timestamp_seconds(col("ts") / lit(1000000000L))
      case _ => col("ts").cast("timestamp") // µs NTZ / tz-aware
    }
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", toTs)
    val agg = StreamingOps.eventWindowAgg(stream, window_ = "30 days",
      watermark = "60 days")
    // complete mode: a one-shot AvailableNow run never advances the
    // watermark past its own (single) batch, so append would emit nothing
    val q = agg.writeStream.format("memory").queryName("ev_agg")
      .outputMode("complete").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("ev_agg")
    println(s"[stream] windows x types: ${out.count()} rows")
    out.orderBy(col("win_start"), col("event_type")).show(10)
    spark.stop()
  }
}
