package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Manual Bloom-filter join pruning built from Spark's OWN runtime-
  * filter expressions (`BloomFilterAggregate` / `BloomFilterMightContain`
  * — the pair `InjectRuntimeFilter` wires up when AQE decides a join
  * deserves one). Build the sketch over the small/selective side's
  * join keys (a partial-aggregating sketch, kilobytes to the driver),
  * then pre-filter the big side map-side BEFORE its shuffle: rows
  * whose key cannot be on the build side never cross the wire. The
  * sketch has no false negatives, so the downstream join result is
  * unchanged — the prune only deletes shuffle volume.
  *
  * This is the hand-held form for when the optimizer can't see the
  * selectivity (e.g. the build side is the output of an arbitrary
  * operator, not a filtered scan). Codegen'd end to end — no UDF, no
  * driver-side key set. */
object BloomPrune {

  /** Aggregate `key` (via xxhash64, matching Spark's runtime-filter
    * convention) into serialized Bloom-filter bytes. */
  def sketchBytes(df: DataFrame, key: Column, expectedItems: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(ExpressionUtils.expression(key))), expectedItems)
    df.select(ExpressionUtils.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Membership probe against a built sketch — false positives
    * possible (refined by the real join), false negatives never. */
  def mightContain(key: Column, sketch: Array[Byte]): Column =
    // arg order: (bloomFilterExpression, valueExpression)
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(sketch, BinaryType),
      new XxHash64(Seq(ExpressionUtils.expression(key)))))
}
