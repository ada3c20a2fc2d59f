package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity of two float-array
  * columns, with `doGenCode` emitting one fused loop (dot product and
  * both norms in a single pass). Works for any vector length, stays
  * inside whole-stage codegen, allocates nothing per row.
  *
  * Tier (b) of the extension ladder (SURVEY.md §7): the built-in
  * surface can only express this as interpreted higher-order functions
  * (`aggregate`/`zip_with`, ~10× slower) or a fixed-dim unrolled sum
  * that bloats generated code. Accumulation is left-to-right in double,
  * bit-identical to both of those forms (and to the DuckDB oracle's
  * list_aggregate).
  *
  * Lives under org.apache.spark.sql because Catalyst's extension SPI
  * (AbstractDataType, ExpressionUtils.column) is private[sql] — the
  * standard placement for third-party native expressions.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / math.sqrt(nx) / math.sqrt(ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $x.getFloat($i);
         |  double $yi = (double) $y.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / Math.sqrt($nx) / Math.sqrt($ny);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: squared L2 distance of two float-array
  * columns — the IVF assign/probe kernel (argmin over centroids), where
  * the interpreted `aggregate(zip_with(...))` form touches every
  * (vector × centroid) pair. One fused codegen loop, accumulation
  * left-to-right in double — bit-identical to the HOF form
  * `aggregate(zip_with(a,b,(x,y)=>(x-y)*(x-y)), 0.0, _+_)` (pinned in
  * NativeExprSpec). */
case class L2DistanceSq(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2_dist_sq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $x.getFloat($i) - (double) $y.getFloat($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: integer dot product of two long-array
  * columns — the kernel under every portable-arithmetic ANN ranking
  * (q175 LSH, q285 multi-probe, q344 fusion inputs, q348 SQ8):
  * fixed-point vectors, exact integer scores. The interpreted
  * `aggregate(zip_with(a,b,_*_), 0L, _+_)` form allocates a zipped
  * array and evaluates lambda trees per element; this is one fused
  * loop inside whole-stage codegen. Long addition is associative and
  * exact, so on EQUAL-LENGTH inputs the result is bit-identical to
  * the HOF form at any evaluation order (pinned in NativeExprSpec).
  * Mismatched lengths THROW (round-13 advisory: the HOF form
  * null-pads to NULL there; silently truncating to the shorter array
  * would rank on a wrong score — every kernel call site carries
  * fixed-dimension vectors, so a mismatch is corrupt data and fails
  * loud, the ANSI-mode house convention). */
case class IntDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "int_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"int_dot: length mismatch ($n vs ${y.numElements()})")
    var s = 0L; var i = 0
    while (i < n) {
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "int_dot: length mismatch (" + $n + " vs " +
         |    $y.numElements() + ")");
         |}
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: integer squared L2 distance of two
  * long-array columns — the kernel under the portable PQ/IVF family
  * (Lloyd assignment, PQ encode, ADC re-rank: q176/q226/q227/q238/
  * q242/q286 evaluate it per (vector × centroid/code) pair). One
  * fused codegen loop replacing interpreted aggregate(zip_with(...));
  * integer arithmetic, so bit-identical at any order on EQUAL-LENGTH
  * inputs (NativeExprSpec); mismatched lengths throw — see [[IntDot]]'s
  * round-13 note. */
case class IntDist2(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "int_dist2"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"int_dist2: length mismatch ($n vs ${y.numElements()})")
    var s = 0L; var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "int_dist2: length mismatch (" + $n + " vs " +
         |    $y.numElements() + ")");
         |}
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $x.getLong($i) - $y.getLong($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points for graft's native expressions. */
object GraftFunctions {
  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def l2DistSq(a: Column, b: Column): Column =
    ExpressionUtils.column(L2DistanceSq(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def intDot(a: Column, b: Column): Column =
    ExpressionUtils.column(IntDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def intDist2(a: Column, b: Column): Column =
    ExpressionUtils.column(IntDist2(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
