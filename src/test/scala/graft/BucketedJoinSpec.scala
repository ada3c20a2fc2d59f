package graft

import org.apache.spark.sql.functions._

/** Bucketed-layout co-location: the join itself must run with ZERO
  * shuffle exchange on either side — the plan-shape claim behind
  * "bucket once, join shuffle-free nightly". */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed sort-merge join has no exchange under the join") {
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("graft_orders_bkt_spec")
    Tables.customer(spark, sf).write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("graft_customer_bkt_spec")
    val joined = spark.table("graft_orders_bkt_spec").hint("merge")
      .join(spark.table("graft_customer_bkt_spec"),
        col("o_custkey") === col("c_custkey"))
    // collect() can't see through the AdaptiveSparkPlan wrapper, so
    // assert on the rendered tree: a SortMergeJoin over Bucketed: true
    // scans with NO Exchange anywhere under it
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SortMergeJoin in:\n$plan")
    assert(plan.contains("Bucketed: true"), s"expected bucketed scans in:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle, found:\n$plan")
    // and the answer equals the plain (unbucketed) join
    val got = joined.count()
    val want = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey")).count()
    assert(got == want)
  }
}
