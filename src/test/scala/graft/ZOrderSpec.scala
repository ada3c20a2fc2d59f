package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Z-order layout: interleave bijectivity and the data-skipping
  * property single-column sorting cannot give (bounded per-partition
  * extents in EVERY interleaved dimension). */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleaveBits is a bijection (deinterleave round-trips)") {
    val df = spark.range(0, 1 << 16) // all (a, b) pairs of 8-bit dims
      .select((col("id") % 256).as("a"), expr("id div 256").as("b"))
    val z = ZOrder.interleaveBits(Seq(col("a"), col("b")), 8)
    val bad = df.select(col("a"), col("b"), z.as("z"))
      .withColumn("a2", ZOrder.deinterleaveBits(col("z"), 2, 0, 8))
      .withColumn("b2", ZOrder.deinterleaveBits(col("z"), 2, 1, 8))
      .filter(col("a") =!= col("a2") || col("b") =!= col("b2"))
      .count()
    assert(bad == 0L)
    // and distinct z-values == distinct inputs (injective)
    val nz = df.select(z.as("z")).distinct().count()
    assert(nz == (1L << 16))
  }

  test("quantize clamps into [0, 2^bits)") {
    val df = Seq(-5.0, 0.0, 1.0, 2499.9, 2500.0, 639999.9, 640000.0, 1e9)
      .toDF("x")
      .select(ZOrder.quantize(col("x"), 0.0, 640000.0, 8).as("b"))
    val got = df.as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 0L, 0L, 1L, 255L, 255L, 255L))
  }

  test("z-layout bounds BOTH dimension extents per partition; " +
    "single-column sort leaves the other dimension unbounded") {
    val orders = Tables.orders(spark, sf)
      .select(pmod(col("o_custkey"), lit(256L)).as("ck"),
        ZOrder.quantize(col("o_totalprice"), 0.0, 640000.0, 8).as("pb"))
    val z = ZOrder.interleaveBits(Seq(col("ck"), col("pb")), 8)

    def extents(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("ck") - min("ck")).as("ce"), (max("pb") - min("pb")).as("pe"))
        .select("ce", "pe").as[(Long, Long)].collect().toSeq

    val zExt = extents(ZOrder.layout(orders.withColumn("z", z), col("z"), 8))
    val linExt = extents(orders
      .repartitionByRange(8, col("ck").asc).sortWithinPartitions(col("ck")))

    // The data-skipping claim: a custkey-sorted layout leaves every
    // partition spanning (nearly) the FULL price range — a price
    // predicate prunes nothing — while the z-layout bounds the price
    // extent in every partition: the WORST z partition is tighter on
    // price than the BEST linear partition.
    val zWorstPe = zExt.map(_._2).max
    val linBestPe = linExt.map(_._2).min
    assert(zWorstPe < linBestPe,
      s"z worst price extent $zWorstPe !< linear best $linBestPe " +
        s"($zExt vs $linExt)")
  }
}
