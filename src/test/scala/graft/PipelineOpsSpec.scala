package graft

import org.apache.spark.sql.functions._
import graft.operators.{Cdc, Expectations, Triangles}

/** Fixtures for the batch-pipeline operators: expectations report,
  * CDC apply, triangle counting. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("expectations report counts violations per fused check") {
    val df = Seq(
      (Some(1L), 5.0), (None, -2.0), (Some(3L), 12.0), (Some(3L), 0.0))
      .toDF("k", "v")
    val got = Expectations.report(df, Seq(
      "k_not_null" -> col("k").isNull,
      "v_nonnegative" -> (col("v") < 0),
      "v_upper" -> (col("v") > 10.0)))
      .as[(String, Long, Boolean)].collect()
      .map { case (c, n, p) => c -> ((n, p)) }.toMap
    assert(got("k_not_null") == ((1L, false)))
    assert(got("v_nonnegative") == ((1L, false)))
    assert(got("v_upper") == ((1L, false)))
  }

  test("referential check counts orphans, ignores nulls") {
    val fact = Seq(Some(1L), Some(2L), Some(9L), None).toDF("k")
    val dim = Seq(1L, 2L, 3L).toDF("d")
    val got = Expectations.referential(fact, "k", dim, "d", "fk")
      .as[(String, Long, Boolean)].head()
    assert(got == (("fk", 1L, false)))
  }

  test("cdc apply: last-writer-wins, deletes drop, untouched survive") {
    val snapshot = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "p")
    val changes = Seq(
      (2L, 10L, "U", "b2"), (2L, 11L, "U", "b3"),   // last wins: b3
      (3L, 5L, "D", "x"),                           // delete 3
      (4L, 1L, "I", "d"),                           // insert new key
      (5L, 1L, "I", "e"), (5L, 2L, "D", "y"))       // insert then delete
      .toDF("k", "seq", "op", "p")
    val got = Cdc.apply(snapshot, changes, "k", "seq", "op")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "b3", 4L -> "d"))
  }

  test("triangle count: known graph, dup/self-loop tolerant") {
    // K4 on {1,2,3,4} has 4 triangles; node 5 pendant adds none
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 4L), (3L, 3L))).toDF("u", "v")
    val got = Triangles.count(edges).as[Long].head()
    assert(got == 4L)
  }

  test("triangle count matches naive count on a hub graph") {
    // star hub 0 -> 1..8 plus ring edges 1-2, 3-4, 5-6: 3 triangles
    val edges = ((1L to 8L).map(i => (0L, i)) ++
      Seq((1L, 2L), (3L, 4L), (5L, 6L))).toDF("u", "v")
    assert(Triangles.count(edges).as[Long].head() == 3L)
  }
}
