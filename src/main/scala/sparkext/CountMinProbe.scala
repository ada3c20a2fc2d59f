package org.apache.spark.sql.graft

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point estimate from a serialized Count-Min sketch (Cormode &
  * Muthukrishnan 2005): `cms_estimate(sketch, item)`.
  *
  * The sketch side is Spark's BUILT-IN `count_min_sketch(...)`
  * aggregate — mergeable, so partial aggregation ships one w×d counter
  * grid per partition instead of the token stream; this expression is
  * the probe side, evaluated over the handful of (key, sketch) rows
  * that remain AFTER aggregation. CodegenFallback is deliberate: the
  * probe row count is O(probe keys), never corpus-sized, and the
  * deserialize cost is cached per sketch byte-array identity.
  *
  * Guarantee probed by callers (q103's exact verify): est ≥ true count,
  * and est ≤ true + eps·N with probability ≥ confidence per key.
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  // one sketch is typically probed for many keys in a row — memoize the
  // last deserialization (per-task instance, no cross-thread sharing)
  @transient private var lastBytes: Array[Byte] = _
  @transient private var lastSketch: CountMinSketch = _

  override protected def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val bytes = sketchBytes.asInstanceOf[Array[Byte]]
    if (!(bytes eq lastBytes)) {
      lastSketch = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      lastBytes = bytes
    }
    // probe with the same item representation the builtin aggregate
    // inserted (UTF8String), so hashing agrees
    lastSketch.estimateCount(item.asInstanceOf[UTF8String].getBytes)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  def column(sketch: Column, item: Column): Column =
    ExpressionUtils.column(CmsEstimate(
      ExpressionUtils.expression(sketch), ExpressionUtils.expression(item)))
}
