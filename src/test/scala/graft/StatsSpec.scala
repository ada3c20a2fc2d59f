package graft

import graft.operators.Stats

/** ANALYZE-side operators: column profile and the sort-free equi-depth
  * histogram. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("columnProfile: counts, nulls, ndv, exact decimal sum — one pass") {
    val d = Seq(
      (Some(1.0), 10.0), (Some(2.0), 20.0),
      (Some(2.0), 30.0), (None, 40.0))
      .toDF("a", "b")
    val got = Stats.columnProfile(d, Seq("a", "b"))
      .select("col_name", "n", "n_null", "ndv", "min_v", "max_v", "sum_v")
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 4L, 1L, 2L, 1.0, 2.0, 5.0)))
    assert(got("b") == (("b", 4L, 0L, 4L, 10.0, 40.0, 100.0)))
  }

  test("equiDepthHistogram: boundary ties land in the lower bin") {
    // median of (1,2,2,2,3,4) is 2.0; strict > sends all the 2s low.
    val d = Seq(1.0, 2.0, 2.0, 2.0, 3.0, 4.0).toDF("v")
    val got = Stats.equiDepthHistogram(d, "v", 2)
      .select("bin", "n", "lo", "hi")
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1, 4L, 1.0, 2.0), (2, 2L, 3.0, 4.0)))
  }

  test("equiDepthHistogram: uniform input splits evenly across deciles") {
    val d = (1 to 100).map(_.toDouble).toDF("v")
    val got = Stats.equiDepthHistogram(d.repartition(7), "v", 10)
      .select("bin", "n").as[(Int, Long)].collect().toMap
    assert(got.size == 10 && got.values.forall(_ == 10L))
  }
}
