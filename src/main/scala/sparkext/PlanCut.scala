package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}

/** Lineage cut that ALSO resets plan statistics.
  *
  * `Dataset.localCheckpoint()` truncates the physical lineage but the
  * resulting `LogicalRDD` carries `originStats` — a snapshot of the
  * checkpointed plan's Catalyst `Statistics`. Under the default
  * size-only estimator a join's `sizeInBytes` is the PRODUCT of its
  * children's, so an unrolled iteration that self-joins its own
  * iterate (pointer jumping `p ⨝ p`, mutual-pair probes `m ⨝ m`)
  * doubles the BigInt's bit-length per round even though every round
  * is checkpointed: after k rounds the snapshot holds a ~2^k-bit
  * integer and plan-time stats visitation degenerates into
  * Karatsuba/Toom-Cook multiplies on multi-megabit BigIntegers — the
  * driver burns minutes inside `BigInteger.multiply` before a single
  * task launches (observed on q306's Borůvka forest at sf0.1).
  *
  * The fix is to re-wrap the checkpointed RDD in a fresh `LogicalRDD`
  * with NO origin stats, so downstream planning sees the flat
  * `defaultSizeInBytes` instead of the compounded product. The RDD is
  * already materialized by the eager checkpoint — `toRdd` over a
  * `LogicalRDD` is a scan of the persisted blocks, not a recompute —
  * so this costs nothing at execution time. Broadcast planning is
  * unaffected in practice: the compounded products were astronomically
  * past every threshold anyway, and AQE re-plans joins from observed
  * runtime sizes.
  *
  * Lives in `org.apache.spark.sql.graft` for `private[sql]` access to
  * `classic.SparkSession.internalCreateDataFrame` (the same door
  * `Dataset.ofRows` uses).
  */
object PlanCut {

  /** `df.localCheckpoint()` with flattened statistics. */
  def localCheckpointFlatStats(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val spark = cp.sparkSession
    spark.internalCreateDataFrame(cp.queryExecution.toRdd, cp.schema)
  }
}
