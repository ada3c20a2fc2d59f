package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal versioning operators — the warehouse moves layered on the
  * reference's append-only upsert (Scraper.py keeps first-seen rows
  * forever; a real pipeline needs to know WHEN each version was true).
  */
object Temporal {

  /** SCD-2 interval assembly: turn a change stream (key, ts, attrs…)
    * into validity intervals — each version valid from its own ts
    * until the next change of the same key (null = still current).
    * `seqCol` breaks same-instant ties deterministically.
    *
    * One hash shuffle on the key; the window is per-key (bounded), so
    * no global sort and no skew beyond the key histogram — the
    * standard changes-table → dimension-table step run at any scale.
    */
  def scd2Intervals(changes: DataFrame, keyCol: String, tsCol: String,
                    seqCol: String,
                    openEnd: String = "2100-01-01 00:00:00"): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(seqCol).asc)
    changes
      .withColumn("valid_from", col(tsCol))
      // the conventional SCD-2 open-end sentinel instead of NULL, so
      // range predicates (`ts < valid_to`) need no null branch; a
      // far-future-but-datetime64[ns]-safe default (9999-12-31 would
      // overflow pandas/Arrow nanosecond readers downstream)
      .withColumn("valid_to",
        coalesce(lead(col(tsCol), 1).over(w), lit(openEnd).cast("timestamp")))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current",
        col("valid_to") === lit(openEnd).cast("timestamp"))
  }

  /** Date-spine gap fill: for each key, generate its full month
    * calendar between first and last activity (`sequence` + explode —
    * a generator, no join against a global spine table) and left-join
    * the observed per-month aggregates back, zero-filling the silent
    * months. The regularized series every time-series consumer
    * (forecasting, retention, training-mixture drift) wants.
    *
    * Scale shape: the aggregate side is one hash shuffle on
    * (key, month); the spine explodes AFTER a per-key min/max agg, so
    * generated rows = Σ active-months-per-key, never |keys| × global
    * calendar. The spine-to-agg join is on the same (key, month) key —
    * co-partitioned by the previous exchange, and AQE broadcasts it
    * when one side is small. */
  def monthSpine(df: DataFrame, keyCol: String, tsCol: String,
      aggs: Map[String, Column]): DataFrame = {
    val month = date_trunc("month", col(tsCol))
    val observed = df.groupBy(col(keyCol), month.as("month"))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }.toSeq: _*)
    val spine = df.groupBy(col(keyCol))
      .agg(min(month).as("lo"), max(month).as("hi"))
      .select(col(keyCol),
        explode(sequence(col("lo"), col("hi"),
          expr("interval 1 month"))).as("month"))
    val zeroed = aggs.keys.foldLeft(
        spine.join(observed, Seq(keyCol, "month"), "left")) {
      (d, n) => d.withColumn(n, coalesce(col(n), lit(0)))
    }
    zeroed
  }

  /** Trailing time-window aggregate via a RANGE frame over the epoch-
    * second axis: for every event, the mean of `valueCol` over the
    * same key's events in the preceding `windowSec` (inclusive).
    * Decimal-exact sum ÷ count — one correctly-rounded double
    * division, so a SQL window oracle matches bit-for-bit.
    *
    * One hash shuffle on the key + per-key sort; the frame is
    * evaluated by Spark's sliding window-frame executor in O(rows)
    * per key (two moving pointers), not O(rows × frame). */
  def trailingAvg(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, windowSec: Long): DataFrame = {
    // microsecond axis (unix_micros ⇄ the oracle's epoch_us): the
    // event timestamps carry sub-second parts, so a seconds axis would
    // quantize frame membership
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowSec * 1000000L, 0)
    df.withColumn("win_n", count(lit(1)).over(w))
      .withColumn("win_avg",
        sum(col(valueCol).cast("decimal(18,4)")).over(w).cast("double") /
          col("win_n"))
  }
}
