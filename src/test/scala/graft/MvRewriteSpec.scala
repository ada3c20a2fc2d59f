package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.MvRewrite

/** The materialized-view rewrite rule: fires only on provably-safe
  * rollups, redirects the scan to the MV, never changes answers. */
class MvRewriteSpec extends SparkSpec {

  private def dec2(c: org.apache.spark.sql.Column) =
    c.cast("decimal(18,2)")

  // the rewrite happens at the LOGICAL level; AQE additionally hides
  // physical scans inside AdaptiveSparkPlanExec, so assert on the
  // optimized plan's relations
  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case org.apache.spark.sql.execution.datasources.LogicalRelation(
          h: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
          _, _, _, _) =>
        h.location.rootPaths.map(_.toString)
    }.flatten

  private def setup(): (org.apache.spark.sql.DataFrame, String) = {
    val base = Tables.orders(spark, sf)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_mv_spec").toString
    base.groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        min(dec2(col("o_totalprice"))).as("min_total"),
        max(dec2(col("o_totalprice"))).as("max_total"))
      .write.mode("overwrite").parquet(tmp)
    MvRewrite.clear()
    MvRewrite.register(base,
      dims = Seq("o_orderpriority", "o_orderstatus"),
      mv = spark.read.parquet(tmp),
      minCols = Seq(dec2(col("o_totalprice")) -> "min_total"),
      maxCols = Seq(dec2(col("o_totalprice")) -> "max_total"),
      countCol = Some("cnt"))
    (base, tmp)
  }

  test("subset rollup is answered from the MV, and the answer matches " +
      "the base aggregation exactly") {
    val (base, tmp) = setup()
    def query() = base.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        min(dec2(col("o_totalprice"))).as("min_total"),
        max(dec2(col("o_totalprice"))).as("max_total"))
      .orderBy("o_orderpriority")
    val rewritten = query()
    val paths = scanPaths(rewritten)
    assert(paths.nonEmpty && paths.forall(_.contains(tmp)),
      s"expected only MV scans, got $paths")
    val viaMv = rewritten.collect().map(_.toSeq).toSeq
    MvRewrite.clear()
    val direct = query()
    assert(scanPaths(direct).exists(_.contains("orders")))
    assert(viaMv == direct.collect().map(_.toSeq).toSeq)
  }

  test("exact-dims query also rewrites; unsupported aggregates and " +
      "global aggregates do not") {
    val (base, tmp) = setup()
    val exact = base.groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n"))
    assert(scanPaths(exact).forall(_.contains(tmp)))
    // sum over an UNREGISTERED expression -> no rewrite
    val unsupported = base.groupBy("o_orderpriority")
      .agg(sum(col("o_custkey")).as("s"))
    assert(scanPaths(unsupported).exists(_.contains("orders")))
    // grouping by a non-dimension -> no rewrite
    val wrongDim = base.groupBy("o_custkey")
      .agg(count(lit(1)).as("n"))
    assert(scanPaths(wrongDim).exists(_.contains("orders")))
    // global aggregate -> no rewrite (empty-base count semantics)
    val global = base.agg(count(lit(1)).as("n"))
    assert(scanPaths(global).exists(_.contains("orders")))
    MvRewrite.clear()
  }

  test("rewrite preserves output dataType and nullability under the " +
      "kept exprId: decimal sum does not re-widen, count(*) stays " +
      "non-nullable") {
    val base = Tables.orders(spark, sf)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_mv_spec_ty").toString
    base.groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        sum(dec2(col("o_totalprice"))).as("sum_total"))
      .write.mode("overwrite").parquet(tmp)
    MvRewrite.clear()
    MvRewrite.register(base,
      dims = Seq("o_orderpriority", "o_orderstatus"),
      mv = spark.read.parquet(tmp),
      sumCols = Seq(dec2(col("o_totalprice")) -> "sum_total"),
      countCol = Some("cnt"))
    def query() = base.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("o_totalprice"))).as("s"))
      .orderBy("o_orderpriority")
    val rewritten = query()
    assert(scanPaths(rewritten).forall(_.contains(tmp)),
      "decimal-sum rollup should rewrite to the MV")
    // optimizedPlan schema is what parents bound to the exprId see
    val rwFields = rewritten.queryExecution.optimizedPlan.schema.fields
    val viaMv = rewritten.collect().map(_.toSeq).toSeq
    MvRewrite.clear()
    val direct = query()
    val dFields = direct.queryExecution.optimizedPlan.schema.fields
    assert(rwFields.map(f => (f.name, f.dataType, f.nullable)).toSeq ==
      dFields.map(f => (f.name, f.dataType, f.nullable)).toSeq,
      s"schema drift: ${rwFields.toSeq} vs ${dFields.toSeq}")
    assert(viaMv == direct.collect().map(_.toSeq).toSeq)
  }

  test("a filtered base does not match (the MV cannot answer it)") {
    val (base, tmp) = setup()
    val filtered = base.filter(col("o_orderkey") > 100)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    assert(scanPaths(filtered).exists(_.contains("orders")))
    MvRewrite.clear()
  }
}
