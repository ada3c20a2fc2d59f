package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a grouped aggregate table
  * current under appended batches WITHOUT re-scanning the base data —
  * the materialized-view half of the CDC story ([[Cdc]] maintains the
  * rows, this maintains the rollups). The algebra requires additive
  * measures (count / sum — avg is maintained as sum÷count, min/max are
  * append-only-safe too); the merge is a full outer join on the group
  * keys with coalesce-to-zero addition.
  *
  * Scale shape: the base SIDE IS ALREADY AGGREGATED — O(groups) rows,
  * not O(rows); the delta aggregates map-side before the merge join,
  * and steady-state deltas are small, so AQE broadcasts them. The raw
  * base table is never touched. This is how a 100 TB nightly rollup
  * absorbs an hourly batch in seconds.
  */
object IncrementalAgg {

  /** Merge two aggregate states with identical schemas:
    * (keys..., measures...) where every measure is additive.
    * Missing keys on either side count as zero. */
  def merge(baseAgg: DataFrame, deltaAgg: DataFrame,
      keys: Seq[String], measures: Seq[String]): DataFrame = {
    val b = baseAgg.select(
      keys.map(col) ++ measures.map(m => col(m).as("_b_" + m)): _*)
    val d = deltaAgg.select(
      keys.map(col) ++ measures.map(m => col(m).as("_d_" + m)): _*)
    val merged = b.join(d, keys, "full_outer")
    measures.foldLeft(merged) { (df, m) =>
      df.withColumn(m,
        coalesce(col("_b_" + m), lit(0)) + coalesce(col("_d_" + m), lit(0)))
    }.select((keys ++ measures).map(col): _*)
  }
}
