package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The repo's portable token hash — left fold (acc·31 + codepoint)
  * mod 1e9+7 — as ONE native codegen'd expression. Semantics are
  * pinned BIT-FOR-BIT to the declarative idiom used across the
  * winnowing / content-chunk / feature-hash family:
  * `aggregate(split(w, ""), 0L, (acc, c) -> pmod(acc*31 + ascii(c), P))`
  * (split-by-empty-regex yields one element per code point, `ascii`
  * returns the leading code point) and to the DuckDB oracle replay
  * (`list_reduce` over `unicode(c)`).
  *
  * Why native: the declarative form materializes a per-character
  * string ARRAY and walks it with a lambda — per-token allocation and
  * per-element closure dispatch on hot paths that hash every token
  * occurrence of the corpus (q259's vectorizer). This is the zero-
  * allocation codepoint walk, kept inside whole-stage codegen via a
  * static call (the ContentChunkStarts / JaroWinkler convention).
  * NativeExprSpec pins equality against the declarative twin on
  * random strings including multi-byte code points. */
object CharFoldAlgo {
  private val P = 1000000007L

  def fold(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }
}

case class CharFoldHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_fold_hash"

  override protected def nullSafeEval(input: Any): Any =
    CharFoldAlgo.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.graft.CharFoldAlgo.fold($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharFoldHash {
  def column(s: Column): Column =
    ExpressionUtils.column(CharFoldHash(ExpressionUtils.expression(s)))
}
