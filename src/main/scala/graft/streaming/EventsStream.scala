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

  /** The event file as a stream, ts normalized to microseconds —
    * shared plumbing for every streaming query here. */
  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    graft.Tables.normalizeEventTs(
      spark.readStream
        .schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** Run a streaming DataFrame to completion into a memory sink and
    * return the sink table. */
  private def runToMemory(spark: SparkSession, df: DataFrame, name: String,
                          mode: String): DataFrame =
    StreamRun.toMemory(spark, df, name, mode) // state-store sizing there

  /** Stream-static enrichment: the event stream joined to the static
    * customer dimension (broadcast — the dim is small and the join
    * adds NO stream state), aggregated per market segment. The
    * streaming twin of the batch dim join (SURVEY.md J1/J3): identical
    * results, incremental execution. */
  def enrichedSegmentTotals(spark: SparkSession, dir: String): DataFrame = {
    val customers = broadcast(
      spark.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_mktsegment")))
    val agg = eventsStream(spark, dir)
      .join(customers, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value_dec"))
    runToMemory(spark, agg, "graft_stream_enrich", "complete")
      .select(col("c_mktsegment"), col("n_events"),
        col("sum_value_dec").cast("double").as("sum_value"))
  }

  /** Streaming exact dedup: distinct (user_id, event_type) pairs via
    * `dropDuplicates` over the stream (state = one entry per key — the
    * incremental form of batch DISTINCT; at 100 TB the same code runs
    * with `dropDuplicatesWithinWatermark` to bound the state store),
    * then a batch rollup of the emitted pairs. Projecting to exactly
    * the key columns first makes the surviving row per key unique, so
    * the result is partition-order independent. */
  def distinctUserTypePairs(spark: SparkSession, dir: String): DataFrame = {
    val pairs = eventsStream(spark, dir)
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
    runToMemory(spark, pairs, "graft_stream_dedup", "append")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_distinct_users"))
  }

  /** The bounded-state form of [[distinctUserTypePairs]]:
    * `dropDuplicatesWithinWatermark` keys state to the watermark
    * horizon instead of retaining one entry per key forever — the
    * shape a 100 TB/day stream actually deploys (a key's state
    * evicts once the watermark passes its event time; duplicates
    * separated by more than the watermark re-emit, which is the
    * documented contract of the operator). Driven synchronously over
    * the fixture the file arrives as one batch, so no state evicts
    * mid-run and the result equals the exact dedup — which is what
    * the spec pins against the batch twin. */
  def distinctPairsWithinWatermark(spark: SparkSession,
                                   dir: String): DataFrame = {
    val pairs = eventsStream(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"))
    runToMemory(spark, pairs, "graft_stream_dedup_wm", "append")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_distinct_users"))
  }

  /** Watermarked stream-stream interval self-join: each error event
    * joined to the same user's purchase events in the preceding 30
    * minutes. Both sides carry watermarks and the join carries a time
    * bound, so the state store retains only the watermark horizon per
    * side (the unbounded-state trap of naive stream-stream joins) and
    * append mode emits each matched pair exactly once — making the
    * result identical to the batch interval join, which is what the
    * DuckDB oracle checks. */
  def errorPurchaseIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsStream(spark, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id").as("e_user"),
        col("ts").as("e_ts"))
      .withWatermark("e_ts", "1 hour")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = errors.join(purchases,
      expr("""e_user = p_user AND
              p_ts >= e_ts - INTERVAL 30 MINUTES AND p_ts <= e_ts"""))
    runToMemory(spark, joined, "graft_stream_interval_join", "append")
      .groupBy(col("e_user").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("error_id")).as("first_error_id"))
  }

  /** LEFT OUTER watermarked stream-stream join — the half of the
    * stream-join surface [[errorPurchaseIntervalJoin]] doesn't cover:
    * unmatched left rows must ALSO emit (with nulls), which only
    * happens once the watermark evicts their state. On a finite
    * replay the tail of the stream never gets evicted (no later data
    * advances the watermark past it), so the DETERMINISTIC portion is
    * the RESOLVED REGION: rows with e_ts ≤ max(ts) − 2·delay have
    * certainly either matched or emitted their null row before the
    * drive ended. The query publishes exactly that region, and the
    * batch left join under the same cutoff is a full-strength oracle
    * — the honest contract for auditing outer-join completeness on a
    * replayed stream.
    *
    * Output per user: rows in the resolved region, matched pairs,
    * unmatched (null-emitted) errors. */
  def errorPurchaseOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsStream(spark, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id").as("e_user"),
        col("ts").as("e_ts"))
      .withWatermark("e_ts", "1 hour")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = errors.join(purchases,
      expr("""e_user = p_user AND
              p_ts >= e_ts - INTERVAL 30 MINUTES AND p_ts <= e_ts"""),
      "leftOuter")
    val raw = runToMemory(spark, joined, "graft_stream_outer_join",
      "append")
    // the JOIN's watermark is the MIN across both inputs — the side
    // that ends earlier governs eviction, so the resolved-region
    // cutoff must use the smaller per-side max
    val batchEv = graft.Tables.events(spark, dir)
    val sideMax = batchEv
      .filter(col("event_type").isin("error", "purchase"))
      .groupBy("event_type").agg(max(col("ts")).as("mx"))
      .agg(min(col("mx"))).head().getTimestamp(0).toInstant
    val cutoff = sideMax.minusSeconds(2 * 3600)
    raw.filter(col("e_ts") <= lit(java.sql.Timestamp.from(cutoff)))
      .groupBy(col("e_user").as("user_id"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("purchase_id")).as("n_matched"),
        sum(when(col("purchase_id").isNull, 1L).otherwise(0L))
          .as("n_unmatched"))
  }

  /** FULL OUTER watermarked stream-stream join — completes the
    * stream-join matrix ([[errorPurchaseIntervalJoin]] inner,
    * [[errorPurchaseOuterJoin]] left): BOTH sides emit null-padded
    * rows on watermark eviction. Same resolved-region contract as
    * q281, applied per side: a row is deterministic once ITS
    * timestamp — e_ts for error-bearing rows, p_ts for
    * purchase-only rows — is ≤ min-side max(ts) − 2·delay; the batch
    * full join under the same per-side cutoff is a full-strength
    * oracle.
    *
    * Output per user (either side): resolved rows, matched pairs,
    * null-emitted errors, null-emitted purchases. */
  def errorPurchaseFullOuterJoin(spark: SparkSession,
                                 dir: String): DataFrame = {
    val ev = eventsStream(spark, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id").as("e_user"),
        col("ts").as("e_ts"))
      .withWatermark("e_ts", "1 hour")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = errors.join(purchases,
      expr("""e_user = p_user AND
              p_ts >= e_ts - INTERVAL 30 MINUTES AND p_ts <= e_ts"""),
      "fullOuter")
    val raw = runToMemory(spark, joined, "graft_stream_full_outer_join",
      "append")
    val batchEv = graft.Tables.events(spark, dir)
    val sideMax = batchEv
      .filter(col("event_type").isin("error", "purchase"))
      .groupBy("event_type").agg(max(col("ts")).as("mx"))
      .agg(min(col("mx"))).head().getTimestamp(0).toInstant
    val cutoffTs = lit(java.sql.Timestamp.from(
      sideMax.minusSeconds(2 * 3600)))
    raw.filter(
        (col("e_ts").isNotNull && col("e_ts") <= cutoffTs) ||
        (col("e_ts").isNull && col("p_ts") <= cutoffTs))
      .groupBy(coalesce(col("e_user"), col("p_user")).as("user_id"))
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("error_id").isNotNull &&
          col("purchase_id").isNotNull, 1)).as("n_matched"),
        sum(when(col("purchase_id").isNull, 1L).otherwise(0L))
          .as("n_err_unmatched"),
        sum(when(col("error_id").isNull, 1L).otherwise(0L))
          .as("n_purch_unmatched"))
  }

  /** Daily event counts + value sums per event_type, computed by a
    * streaming query over `<dir>/events.parquet`, returned as a batch
    * DataFrame once the file is fully processed. */
  def dailyTypeCounts(spark: SparkSession, dir: String): DataFrame = {
    // ts normalization identical to the batch reader (Tables.normalizeEventTs)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // the file-stream source wants a directory: stream the sf dir with
    // a glob pinned to the events file
    val stream = graft.Tables.normalizeEventTs(
      spark.readStream
        .schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value_dec"))
    StreamRun.toMemory(spark, agg, "graft_stream_daily", "complete")
      .select(
        col("window.start").as("day_start"),
        col("event_type"),
        col("n_events"),
        col("sum_value_dec").cast("double").as("sum_value"))
  }

  /** Sliding windows under streaming: 1 h windows every 15 min — the
    * incremental twin of the batch q127 (every event updates 4 window
    * states; the watermark bounds how long each stays live). Complete-
    * mode memory sink for verification; the driver oracle is the SAME
    * SQL as q127's, so streaming must reproduce batch exactly. */
  def slidingTypeCounts(spark: SparkSession, dir: String): DataFrame = {
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).as("sum_dec"))
    runToMemory(spark, agg, "graft_stream_sliding", "complete")
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"), col("n"),
        col("sum_dec").cast("double").as("sum_value"))
  }
}
