package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mean vector per group — centroid computation over an embedding
  * column. Two implementations:
  *
  *  - [[centroidsLong]]: long-form posexplode → groupBy(label, dim) →
  *    decimal-exact average — codegen aggregates, SQL-oracle-able, the
  *    form used by the driver-checked query.
  *  - [[MeanVectorAgg]]: a typed `Aggregator[Array[Float], …, Array
  *    [Double]]` — the engine's custom-UDAF surface (SURVEY.md §2.10),
  *    one pass, per-group state = one running-sum array. Tested against
  *    the long form.
  */
object VectorMean {

  /** (label, pos, avg_value): element-wise centroid, decimal sums
    * (order-independent), divided in double. Floats are widened to
    * DOUBLE before the decimal cast: Spark converts float→decimal via
    * the float's shortest string (~9 significant digits), which
    * diverges from engines that round the exact binary value — the
    * double's 17-digit string removes the discrepancy. */
  def centroidsLong(vectors: DataFrame, labelCol: String,
                    vecCol: String): DataFrame =
    vectors
      .select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(
        (sum(col("v").cast("double").cast("decimal(18,9)")).cast("double")
          / count(lit(1))).as("avg_value"),
        count(lit(1)).as("n"))

  /** Typed one-pass mean-vector aggregator. */
  class MeanVectorAgg(dims: Int)
      extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {
    override def zero: (Array[Double], Long) = (new Array[Double](dims), 0L)
    override def reduce(b: (Array[Double], Long),
                        a: Array[Float]): (Array[Double], Long) = {
      var i = 0
      while (i < dims && i < a.length) { b._1(i) += a(i); i += 1 }
      (b._1, b._2 + 1)
    }
    override def merge(x: (Array[Double], Long),
                       y: (Array[Double], Long)): (Array[Double], Long) = {
      var i = 0
      while (i < dims) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }
    override def finish(r: (Array[Double], Long)): Array[Double] =
      r._1.map(_ / r._2)
    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Array[Double], Long)]()
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Centroids via the typed aggregator: (label, centroid array). */
  def centroidsTyped(spark: SparkSession, vectors: DataFrame,
                     labelCol: String, vecCol: String,
                     dims: Int): DataFrame = {
    import spark.implicits._
    val ds: Dataset[(Int, Array[Float])] = vectors
      .select(col(labelCol).cast("int"), col(vecCol))
      .as[(Int, Array[Float])]
    ds.groupByKey(_._1)
      .mapValues(_._2)
      .agg(new MeanVectorAgg(dims).toColumn.name("centroid"))
      .toDF("label", "centroid")
  }
}
