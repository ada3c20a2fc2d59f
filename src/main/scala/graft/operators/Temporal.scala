package graft.operators

import org.apache.spark.sql.DataFrame
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
}
