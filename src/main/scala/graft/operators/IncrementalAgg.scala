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

  /** Delta-join maintenance: the insert-delta of A ⋈ B given the base
    * relations and their insert deltas, WITHOUT recomputing the full
    * join — Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB (the standard bag-algebra
    * derivative of ⋈ for insert-only deltas; deletes ride the same
    * identity with anti-join application downstream, see [[Cdc]]).
    *
    * Why this is THE incremental shape at 100 TB: the three terms
    * touch each base table once against a DELTA-sized side, so with
    * day-sized deltas every join broadcasts the delta and the nightly
    * maintenance cost is two base scans — versus a full base⋈base
    * shuffle for recompute. (A and B here are the PRE-delta bases;
    * feeding post-delta frames double-counts the ΔA⋈ΔB term.)
    *
    * Output: the delta rows of the join, keyed like an inner join of
    * the given frames on `key`. */
  def joinDelta(baseA: DataFrame, deltaA: DataFrame,
                baseB: DataFrame, deltaB: DataFrame,
                key: String): DataFrame =
    deltaA.join(baseB, key)
      .unionByName(baseA.join(deltaB, key))
      .unionByName(deltaA.join(deltaB, key))


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
