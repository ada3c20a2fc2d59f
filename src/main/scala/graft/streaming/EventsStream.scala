package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface: tumbling-window aggregation over the
  * events table, driven synchronously from the parquet file for
  * verification (`processAllAvailable`), identical plan shape to a real
  * `readStream` deployment (watermark + windowed agg → append/complete
  * sink).
  *
  * The reference is batch-only (SURVEY.md §2.8); this is the engine's
  * incremental twin of the batch windowed aggregation, showing the same
  * query runs in both modes — the Spark "unified batch/streaming"
  * contract.
  */
object EventsStream {

  /** Daily event counts + value sums per event_type, computed by a
    * streaming query over `<dir>/events.parquet`, returned as a batch
    * DataFrame once the file is fully processed. */
  def dailyTypeCounts(spark: SparkSession, dir: String): DataFrame = {
    // ts is parquet TIMESTAMP(NANOS): read as long nanos, truncate to
    // micros — identical to the batch reader (see Tables.readEvents).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // the file-stream source wants a directory: stream the sf dir with
    // a glob pinned to the events file
    val stream = spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value_dec"))
    val name = "graft_stream_daily"
    spark.streams.active.filter(_.name == name).foreach(_.stop())
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
      .select(
        col("window.start").as("day_start"),
        col("event_type"),
        col("n_events"),
        col("sum_value_dec").cast("double").as("sum_value"))
  }
}
