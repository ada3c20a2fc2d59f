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
  require(RingShard.strictlyAscending(positions),
    "ring positions must be strictly ascending (sorted, distinct) — " +
      "the binary search silently mis-routes on an unsorted ring")

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

  /** Strictly-ascending check shared by both ring expressions: O(n)
    * once per expression construction, and it implies sorted AND
    * distinct in one pass (no extra allocation). */
  private[graft] def strictlyAscending(xs: Seq[Long]): Boolean = {
    val it = xs.iterator
    if (!it.hasNext) return true
    var prev = it.next()
    while (it.hasNext) {
      val x = it.next()
      if (x <= prev) return false
      prev = x
    }
    true
  }
}

/** Dynamo-style REPLICATED ring lookup: the first `replicas` DISTINCT
  * shards clockwise from the key's ring position, in walk order —
  * element 0 is exactly [[RingShard]]'s successor (spec-pinned), the
  * rest are the replica holders a quorum read/write touches. One
  * binary search + a bounded clockwise walk per row (the walk skips
  * vnodes of already-collected shards; it terminates because
  * `replicas` ≤ #distinct shards, checked at construction). Same
  * addReferenceObj codegen stance as [[RingShard]]. */
case class RingReplicas(child: Expression, positions: Seq[Long],
                        shards: Seq[Long], replicas: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(positions.length == shards.length && positions.nonEmpty,
    "ring must be non-empty with parallel positions/shards")
  require(replicas >= 1 && replicas <= shards.distinct.length,
    s"replicas=$replicas must be in [1, ${shards.distinct.length} " +
      "(#distinct shards)]")
  require(RingShard.strictlyAscending(positions),
    "ring positions must be strictly ascending (sorted, distinct) — " +
      "the binary search and clockwise walk silently return wrong " +
      "replica sets on an unsorted or duplicated ring")

  @transient private lazy val posArr: Array[Long] = positions.toArray
  @transient private lazy val shardArr: Array[Long] = shards.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ring_replicas"

  /** First `replicas` distinct shards clockwise from `p`. */
  def lookup(p: Long): org.apache.spark.sql.catalyst.util.ArrayData = {
    var lo = 0
    var hi = posArr.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (posArr(mid) >= p) hi = mid else lo = mid + 1
    }
    val start = if (lo == posArr.length) 0 else lo
    val out = new Array[Long](replicas)
    var n = 0
    var i = start
    while (n < replicas) {
      val s = shardArr(i)
      var dup = false
      var j = 0
      while (j < n && !dup) { if (out(j) == s) dup = true; j += 1 }
      if (!dup) { out(n) = s; n += 1 }
      i += 1
      if (i == posArr.length) i = 0
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    lookup(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ringReplicas", this,
      classOf[RingReplicas].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.lookup($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object RingReplicas {
  def column(pos: Column, positions: Seq[Long], shards: Seq[Long],
             replicas: Int): Column =
    ExpressionUtils.column(RingReplicas(
      ExpressionUtils.expression(pos), positions, shards, replicas))
}
