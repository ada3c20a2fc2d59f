package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{AsOfJoinNative, AsOfJoinNode}
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}

import graft.operators.AsOfJoin

/** The native whole-operator as-of join (LogicalPlan + Strategy +
  * SparkPlan via spark.experimental) must agree row-for-row with the
  * composed union-tag/window form, plan through its own exec node,
  * and accept the pushdown rule. */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val left = Seq(
    (1L, 10L, ts(100)), // exact-tie with right at ts 100
    (2L, 10L, ts(150)), // between right rows
    (3L, 10L, ts(50)),  // before any right row -> null
    (4L, 20L, ts(500)), // key with single earlier right row
    (5L, 30L, ts(10))   // key absent on the right -> null
  ).toDF("id", "k", "t")

  private val right = Seq(
    (10L, ts(100), 1000L),
    (10L, ts(120), 1001L),
    (10L, ts(200), 1002L),
    (20L, ts(1), 2000L)
  ).toDF("k", "t", "payload")

  test("native as-of matches hand-computed semantics incl. ties and misses") {
    val got = AsOfJoinNative.asOf(left, right, "k", "t", Seq("payload"))
      .select($"id", $"asof_payload").as[(Long, Option[Long])]
      .collect().toMap
    assert(got == Map(
      1L -> Some(1000L), 2L -> Some(1001L), 3L -> None,
      4L -> Some(2000L), 5L -> None))
  }

  test("native == composed on a randomized fixture") {
    val rnd = new scala.util.Random(42)
    val l = (1 to 400).map(i =>
      (i.toLong, (rnd.nextInt(12) + 1).toLong, ts(rnd.nextInt(1000).toLong)))
      .toDF("id", "k", "t")
    // right unique per (k, t) by construction: ts derived from index
    val r = (1 to 300).map(i =>
      ((rnd.nextInt(15) + 1).toLong, ts(i.toLong * 3), i.toLong * 10))
      .toDF("k", "t", "payload")
      .groupBy("k", "t").agg(max("payload").as("payload"))
    val native = AsOfJoinNative.asOf(l, r, "k", "t", Seq("payload"))
      .select("id", "asof_payload").as[(Long, Option[Long])].collect().sorted
    val composed = AsOfJoin.asOf(l, r, "k", "t", Seq("payload"))
      .select("id", "asof_payload").as[(Long, Option[Long])].collect().sorted
    assert(native.sameElements(composed))
  }

  test("plans through AsOfJoinExec, not a cartesian/range join") {
    val df = AsOfJoinNative.asOf(left, right, "k", "t", Seq("payload"))
    df.collect() // finalize the adaptive plan before inspecting it
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // AQE nests the final plan inside leaf QueryStageExec wrappers that
    // TreeNode.collect cannot descend through — assert on the rendered
    // plan instead (nodeName strips the Exec suffix)
    val s = plan.toString
    assert(s.contains("AsOfJoin "), s"expected the custom operator in:\n$s")
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"))
  }

  test("left-only filters are pushed below the custom node") {
    val df = AsOfJoinNative.asOf(left, right, "k", "t", Seq("payload"))
      .filter($"id" > 2L)
    val opt = df.queryExecution.optimizedPlan
    // no Filter may remain sitting directly on the AsOfJoinNode
    val filterAbove = opt.collect {
      case f: LFilter if f.child.isInstanceOf[AsOfJoinNode] => f
    }
    assert(filterAbove.isEmpty, "filter was not pushed through the as-of join")
    // and the results are unchanged by the pushdown
    val got = df.select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(3L, 4L, 5L))
  }

  test("q70 native twin equals q38 composed on sf0.001 events") {
    val a = SparkEntry.queries("q38_asof_purchase")(spark, sf).collect()
    val b = SparkEntry.queries("q70_asof_native")(spark, sf).collect()
    assert(a.sameElements(b))
  }
}
