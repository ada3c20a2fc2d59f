package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 quantization audit for embedding columns — the
  * storage/serving-side companion of the ANN operators: before a 100 TB
  * embedding corpus is quantized 4× smaller for the vector index, this
  * measures exactly what the compression costs per vector.
  *
  * Engine-exactness: every per-element op (cast, divide, floor, clamp,
  * multiply, subtract) is deterministic double math in ONE fixed order,
  * so Spark and DuckDB produce bit-identical errors; the only
  * order-sensitive step — summing the squared errors — goes through the
  * house DECIMAL quantization trick (cast each term to DECIMAL(28,15),
  * sum exactly, ONE double division at the end), making the result
  * independent of partitioning and engine.
  *
  * Scale shape: amax is computed map-side with array higher-order
  * functions (no shuffle), the explode carries it along, and the single
  * shuffle is the map-side-combined groupBy on vec_id. No joins, no
  * windows, no driver state.
  */
object Quantization {

  /** Per-vector int8 quantization report:
    * (vec_id, dim, amax, mse, max_abs_err).
    *
    * q_i = clamp(floor(x_i / (amax/127) + 0.5), -127, 127);
    * err_i = x_i − q_i · scale. All-zero vectors quantize losslessly
    * (guarded against 0/0).
    */
  def int8Report(embs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val base = embs.select(
      col(idCol).as("vec_id"),
      array_max(transform(col(vecCol), x => abs(x.cast("double"))))
        .as("amax"),
      size(col(vecCol)).as("dim"),
      explode(col(vecCol)).as("xf"))
      .withColumn("x", col("xf").cast("double"))
    val scale: Column = col("amax") / lit(127.0d)
    val q: Column = greatest(lit(-127.0d), least(lit(127.0d),
      floor(col("x") / scale + lit(0.5d))))
    val err: Column = when(col("amax") === lit(0.0d), lit(0.0d))
      .otherwise(col("x") - q * scale)
    base
      .withColumn("err", err)
      .groupBy("vec_id", "dim", "amax")
      .agg(
        (sum((col("err") * col("err")).cast("decimal(28,15)"))
          .cast("double") / col("dim")).as("mse"),
        max(abs(col("err"))).as("max_abs_err"))
      .select("vec_id", "dim", "amax", "mse", "max_abs_err")
  }
}
