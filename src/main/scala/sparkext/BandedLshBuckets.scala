package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expression: all `nBands` banded random-hyperplane
  * LSH bucket ids of a float-vector column in ONE fused pass.
  *
  * The declarative form (a sum of `planesPerBand × nBands × dims`
  * multiply-add terms per row) exceeds janino's 64 KB method limit at
  * production parameters and kicks the whole stage out of codegen;
  * this expression generates a three-level loop over a constant
  * hyperplane matrix instead — O(1) generated code regardless of
  * parameters, still inside whole-stage codegen.
  *
  * Bit-exactness: per plane, the projection accumulates
  * `(double) vec[d] * C(plane, d)` left-to-right in dimension order —
  * exactly the declarative `reduce(_ + _)` association, so bucket ids
  * are bit-identical to `Similarity.lshBucketAt` (pinned in
  * NativeExprSpec) and to the DuckDB oracle's emitted-literal SQL.
  * The hyperplane matrix derives from the same deterministic
  * `planeComponent` hash, reconstructed from the three int parameters
  * (keeps the expression's semantic equality structural).
  */
case class BandedLshBuckets(child: Expression, dims: Int,
                            planesPerBand: Int, nBands: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "banded_lsh_buckets"

  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(planesPerBand * nBands, dims)(
      (p, d) => graft.operators.Similarity.planeComponent(p, d))

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dims)
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var bucket = 0L
      var p = 0
      while (p < planesPerBand) {
        val c = planes(b * planesPerBand + p)
        var proj = 0.0
        var d = 0
        while (d < n) { proj += v.getFloat(d).toDouble * c(d); d += 1 }
        if (proj >= 0) bucket |= (1L << p)
        p += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val c = ctx.freshName("c")
      val proj = ctx.freshName("proj")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = Math.min($v.numElements(), $dims);
         |long[] $out = new long[$nBands];
         |for (int $b = 0; $b < $nBands; $b++) {
         |  long $bucket = 0L;
         |  for (int $p = 0; $p < $planesPerBand; $p++) {
         |    double[] $c = $mat[$b * $planesPerBand + $p];
         |    double $proj = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $proj += ((double) $v.getFloat($d)) * $c[$d];
         |    }
         |    if ($proj >= 0) $bucket |= (1L << $p);
         |  }
         |  $out[$b] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BandedLshBuckets {
  def column(vec: Column, dims: Int, planesPerBand: Int, nBands: Int): Column =
    ExpressionUtils.column(BandedLshBuckets(
      ExpressionUtils.expression(vec), dims, planesPerBand, nBands))
}
