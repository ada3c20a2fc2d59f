package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst aggregate: a Misra–Gries frequency sketch
  * (Misra & Gries 1982) with `k` counters over a string column —
  * the mergeable-summaries form (Agarwal et al., PODS 2012), so
  * partial aggregation applies: each partition builds its own
  * k-counter summary map-side, and summaries MERGE associatively at
  * the exchange. The shuffle carries at most k (word, count) pairs
  * per partition no matter how many rows flow in — the sketch is what
  * makes corpus-scale "what are the frequent tokens" a one-pass,
  * fixed-memory question.
  *
  * Guarantees (both preserved by the merge): every item with true
  * frequency > N/(k+1) is present in the output, and each reported
  * estimate undercounts by at most N/(k+1). The exact-verify pattern
  * ([[MisraGriesTopK.column]] callers): treat the sketch output
  * as a candidate set, semi-join the corpus against it (a broadcast
  * of ≤ k words — map-side filter), and count exactly; with the
  * threshold above the guarantee line the sketch+verify result is
  * EXACTLY the true heavy-hitter set, which is why a plain SQL
  * oracle can check it.
  *
  * Buffer is a java.util.HashMap[String, Long] (a
  * TypedImperativeAggregate — Spark serializes the buffer only when
  * a partial crosses the wire, via [[serialize]]/[[deserialize]]).
  * Eval output is deterministic: entries sorted by estimate
  * descending, then word ascending.
  */
case class MisraGriesTopK(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k > 0, "misra_gries requires k > 0 counters")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("word", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buffer: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String is an unsafe-buffer view; materialize a stable key
      val key = v.asInstanceOf[UTF8String].toString
      val cur = buffer.get(key)
      if (buffer.containsKey(key)) buffer.put(key, cur + 1L)
      else if (buffer.size < k) buffer.put(key, 1L)
      else {
        // decrement-all round: pays one unit from every counter (and
        // one from the arriving item); amortized O(1) per update
        val it = buffer.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buffer
  }

  override def merge(buffer: java.util.HashMap[String, Long],
                     input: java.util.HashMap[String, Long])
      : java.util.HashMap[String, Long] = {
    val it = input.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buffer.get(e.getKey)
      buffer.put(e.getKey,
        (if (buffer.containsKey(e.getKey)) cur else 0L) + e.getValue)
    }
    if (buffer.size > k) {
      // mergeable-summaries step: subtract the (k+1)-th largest
      // counter from every counter, drop the non-positive — size
      // falls back to <= k, both MG guarantees carry through
      val values = new Array[Long](buffer.size)
      var i = 0
      val vit = buffer.values().iterator()
      while (vit.hasNext) { values(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(values)
      val sub = values(values.length - (k + 1)) // (k+1)-th largest
      val bit = buffer.entrySet().iterator()
      while (bit.hasNext) {
        val e = bit.next()
        if (e.getValue <= sub) bit.remove() else e.setValue(e.getValue - sub)
      }
    }
    buffer
  }

  override def eval(buffer: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buffer.size)
    var i = 0
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
    }
    val sorted = entries.sortBy { case (w, est) => (-est, w) }
    new GenericArrayData(sorted.map { case (w, est) =>
      InternalRow(UTF8String.fromString(w), est)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) { m.put(in.readUTF(), in.readLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesTopK =
    copy(child = newChild)
}

object MisraGriesTopK {
  def column(e: Column, k: Int): Column =
    ExpressionUtils.column(
      MisraGriesTopK(ExpressionUtils.expression(e), k).toAggregateExpression())
}
