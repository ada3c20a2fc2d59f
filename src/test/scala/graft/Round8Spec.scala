package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Round-8 additions: the all-integer q191/q96 publications and the
  * advisory hardening items (lazy cap probe, left-join election). */
class Round8Spec extends SparkSpec {
  import spark.implicits._

  // --- compressibilityBySource (q96's new hashable surface) -------------
  test("compressibilityBySource: exact per-source rollup on fixtures") {
    val df = Seq(
      (1L, "a a a a a a a a", "s1"),          // 5 grams, 1 distinct
      (2L, "w0 w1 w2 w3 w4 w5 w6 w7", "s1"),  // 5 grams, 5 distinct
      (3L, "a b c", "s2")                      // too short: 0 grams
    ).toDF("id", "t", "src")
    val out = TextAnalysis.compressibilityBySource(df, "id", "t", "src")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // s1: Σbytes = 15 + 23, Σgrams = 10, Σdup = 4 -> mass-weighted
    // 400000 ppm; only doc 1 (800000 ppm) clears the 25% doc flag
    assert(out(0) == (("s1", 2L, 38L, 10L, 4L, 400000L, 1L)))
    assert(out(1) == (("s2", 1L, 5L, 0L, 0L, 0L, 0L)))
  }
}
