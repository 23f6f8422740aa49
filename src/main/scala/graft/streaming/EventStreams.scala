package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.util.concurrent.atomic.AtomicInteger

/** Structured Streaming surface: event-time windowed aggregation with a
  * watermark over the events table, driven to completion with
  * Trigger.AvailableNow + a memory sink so a batch oracle can check it.
  *
  * The reference has no streaming at all (SURVEY §2.10) — this is the
  * beyond-reference surface: at scale the same code runs on a Kafka/file
  * stream; `readStream` over the parquet directory is the local stand-in.
  */
object EventStreams {
  private val counter = new AtomicInteger

  /** Tumbling 6h windows of count/sum(value) per event_type.
    * Returns the final (complete-mode) result as a batch DataFrame. */
  def windowedCounts(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchSchema = spark.read
      .parquet(s"$dir/events.parquet").schema
    // file streams need a directory source: stream the sf dir, filtered
    // down to the events table
    val raw = spark.readStream
      .schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val events =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw
    val agg = events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("sum_value"))
      .select(unix_seconds(col("window.start")).as("win_start_s"),
        col("event_type"), col("n"), col("sum_value"))
    val name = s"graft_stream_${counter.incrementAndGet()}"
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally if (q.isActive) q.stop()
    spark.table(name)
  }
}
