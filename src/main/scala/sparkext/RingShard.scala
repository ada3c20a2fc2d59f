package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Consistent-hash ring successor lookup as ONE native expression:
  * given a key's ring position, return the shard owning the first
  * vnode position ≥ it (wrapping to the ring's minimum) — binary
  * search over the sorted vnode positions baked into the expression.
  *
  * The declarative form ([[graft.operators.HashRing.assign]]'s
  * original `array_min(filter(posLiteral, _ >= p))` + map
  * `element_at`) walks all |ring| literal entries per row through
  * interpreted higher-order functions — ~512 comparisons + a map
  * probe per corpus row at the q357 geometry, where ⌈log₂ 512⌉ = 9
  * suffice. Wrong cost class for a pass that touches every row of a
  * 100 TB corpus. This is the O(log |ring|) walk, inside whole-stage
  * codegen via an addReferenceObj instance call (the scratch arrays
  * make inline emission pointless — the JaroWinkler stance).
  * Semantics are pinned against the declarative construction AND the
  * plain-Scala successor scan in HashRingSpec; the DuckDB oracle
  * re-derives the whole ring independently.
  *
  * `positions` must be sorted ascending and parallel to `shards`
  * (ring construction guarantees both); Seq fields keep case-class
  * structural equality for plan canonicalization. */
case class RingShard(child: Expression, positions: Seq[Long],
                     shards: Seq[Long])
    extends UnaryExpression with ExpectsInputTypes {

  require(positions.length == shards.length && positions.nonEmpty,
    "ring must be non-empty with parallel positions/shards")

  @transient private lazy val posArr: Array[Long] = positions.toArray
  @transient private lazy val shardArr: Array[Long] = shards.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ring_shard"

  /** First vnode clockwise from `p`, wrapping past the last. */
  def lookup(p: Long): Long = {
    var lo = 0
    var hi = posArr.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (posArr(mid) >= p) hi = mid else lo = mid + 1
    }
    shardArr(if (lo == posArr.length) 0 else lo)
  }

  override protected def nullSafeEval(input: Any): Any =
    lookup(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ringShard", this,
      classOf[RingShard].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.lookup($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object RingShard {
  def column(pos: Column, positions: Seq[Long],
             shards: Seq[Long]): Column =
    ExpressionUtils.column(RingShard(
      ExpressionUtils.expression(pos), positions, shards))
}
