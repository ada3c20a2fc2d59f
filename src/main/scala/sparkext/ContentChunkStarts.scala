package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Fused kernel for content-defined chunk boundaries, shared by the
  * interpreted and codegen paths of [[ContentChunkStarts]].
  *
  * Semantics are pinned BIT-FOR-BIT to the declarative reference
  * ([[graft.operators.Dedup.contentChunkBoundariesDeclarative]], the
  * q202 oracle's replayed arithmetic):
  *   - token hash = left fold (acc·31 + codepoint) mod 1e9+7 over the
  *     token's Unicode code points — exactly what
  *     `aggregate(split(w, ""), 0, (acc, c) -> pmod(acc*31+ascii(c)))`
  *     computes: Spark's split-by-empty-regex yields one element per
  *     code point (surrogate pairs stay whole, no trailing empty) and
  *     `ascii` returns the leading code point;
  *   - window hash = left fold (acc·33 + tokHash) mod 1e9+7 over the
  *     trailing `window` token hashes;
  *   - a boundary END position e (1-based, window ≤ e ≤ n) is emitted
  *     when the window hash is ≡ 0 mod `avgLen`.
  * All intermediates are non-negative and < 2³⁵, so plain `%` equals
  * the declarative `pmod` and nothing can overflow a long. */
object ContentChunkAlgo {
  private val P = 1000000007L

  def boundaries(toks: ArrayData, window: Int, avgLen: Int): ArrayData = {
    val n = toks.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i).toString
      var acc = 0L
      var j = 0
      while (j < s.length) {
        val cp = s.codePointAt(j)
        acc = (acc * 31 + cp) % P
        j += Character.charCount(cp)
      }
      th(i) = acc
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    var e = window
    while (e <= n) {
      var win = 0L
      var k = e - window
      while (k < e) { win = (win * 33 + th(k)) % P; k += 1 }
      if (win % avgLen == 0) out += e
      e += 1
    }
    new GenericArrayData(out.result())
  }
}

/** Native Catalyst expression: content-defined chunk boundary ENDs of
  * a token-array column in one fused pass (token char-fold hashes +
  * rolling window scan).
  *
  * The declarative form needs the token-hash array as an intermediate
  * column, and every formulation either re-evaluates it per boundary
  * position once CollapseProject inlines it (the O(n²)-per-doc trap
  * that cost q202 110 s at sf0.1 when it joined the bench headliners)
  * or walks a struct-state aggregate whose per-element ring
  * concat/slice allocations dominate the scan. This expression is the
  * O(n·window) tight loop with one allocation per row, stays inside
  * whole-stage codegen via a static call (the JaroWinkler pattern —
  * the scratch arrays make inline emission a wall of Java for zero
  * win), and is spec-pinned bit-equal to the declarative reference.
  */
case class ContentChunkStarts(child: Expression, window: Int, avgLen: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "content_chunk_starts"

  override protected def nullSafeEval(input: Any): Any =
    ContentChunkAlgo.boundaries(input.asInstanceOf[ArrayData], window, avgLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.graft.ContentChunkAlgo" +
        s".boundaries($v, $window, $avgLen);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ContentChunkStarts {
  def column(toks: Column, window: Int, avgLen: Int): Column =
    ExpressionUtils.column(ContentChunkStarts(
      ExpressionUtils.expression(toks), window, avgLen))
}
