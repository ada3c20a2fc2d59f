package graft

import java.sql.Timestamp

import graft.operators.{Funnel, Quantization, TextAnalysis, TfIdf}

/** Round-4 analytics/curation additions: ordered funnel, cohort
  * retention, vocabulary coverage cut, int8 quantization audit, BM25 —
  * fixture-pinned semantics plus partition-count invariance for the
  * order-sensitive aggregations. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("funnel reach: strict ordering, per-step narrowing, conversion rate") {
    // u1 completes all 4 steps; u2's only click precedes the view
    // (strict order → stops at step 1); u3 skips signup; u4 never views.
    val events = Seq(
      (1L, "view", ts(10)), (1L, "click", ts(20)),
      (1L, "signup", ts(30)), (1L, "purchase", ts(40)),
      (2L, "click", ts(5)), (2L, "view", ts(10)),
      (3L, "view", ts(10)), (3L, "click", ts(15)), (3L, "purchase", ts(20)),
      (4L, "click", ts(1)))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.reach(events,
        Seq("view", "click", "signup", "purchase"))
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1, "view", 3L, 1.0),
      (2, "click", 2L, 2.0 / 3),
      (3, "signup", 1L, 1.0 / 3),
      (4, "purchase", 1L, 1.0 / 3)))
  }

  test("cohort retention: Monday cohorts, whole-week offsets, distinct users") {
    def t(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (1L, t("2024-01-02 08:00:00")), // Tue → cohort Mon 2024-01-01
      (1L, t("2024-01-10 09:00:00")), // +8 days → offset 1
      (1L, t("2024-01-10 10:00:00")), // same user+week: counted once
      (2L, t("2024-01-09 12:00:00"))) // cohort Mon 2024-01-08
      .toDF("user_id", "ts")
    val got = Funnel.cohortRetention(events)
      .as[(Timestamp, Long, Long)].collect().toSeq
    assert(got == Seq(
      (t("2024-01-01 00:00:00"), 0L, 1L),
      (t("2024-01-01 00:00:00"), 1L, 1L),
      (t("2024-01-08 00:00:00"), 0L, 1L)))
  }

  test("vocabCoverage keeps the exact integer-boundary prefix") {
    // counts a:4 b:2 c:1 d:1, total 8; target 3/4 → keep while the mass
    // BEFORE the token is < 6: a(0), b(4); c arrives at exactly 6 → cut.
    val d = Seq((1L, "a a a a b b"), (2L, "c d")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(d, "doc_id", "text", 3, 4)
      .as[(String, Long, Int, Double)].collect().sortBy(_._3).toSeq
    assert(got == Seq(("a", 4L, 1, 0.5), ("b", 2L, 2, 0.75)))
  }

  test("int8 quantization: exact errors, zero-vector guard, partition invariance") {
    val d = Seq(
      (1L, Array(127.0f, -0.5f, 0.0f)), // scale = 1.0 → errs 0, -0.5, 0
      (2L, Array(0.0f, 0.0f)))          // all-zero: lossless by definition
      .toDF("vec_id", "embedding")
    val got = Quantization.int8Report(d, "vec_id", "embedding")
      .as[(Long, Int, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((3, 127.0, 0.25 / 3, 0.5)))
    assert(got(2L) == ((2, 0.0, 0.0, 0.0)))
    val again = Quantization
      .int8Report(d.repartition(5), "vec_id", "embedding")
      .as[(Long, Int, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(again == got, "decimal-grid sum must not depend on partitioning")
  }

  test("bm25: hand-computed scores in the operator's exact op order") {
    val d = Seq((1L, "spark spark fast"), (2L, "spark slow"),
        (3L, "other words here four"))
      .toDF("doc_id", "text")
    val got = TfIdf.bm25(d, "doc_id", "text", Seq("spark"),
        k1 = 1.2, b = 0.75, topK = 10)
      .select("doc_id", "tf", "df", "dl", "score", "rnk")
      .as[(Long, Long, Long, Long, Double, Int)].collect()
      .map(r => r._1 -> r).toMap
    // N=3, avgdl = 9/3; idf = (3-2+0.5)/(2+0.5)
    def score(tf: Double, dl: Double): Double =
      (1.5 / 2.5) * (tf * 2.2) /
        (tf + 1.2 * (0.25 + 0.75 * (dl / (9.0 / 3))))
    assert(got(1L) == ((1L, 2L, 2L, 3L, score(2.0, 3.0), 1)))
    assert(got(2L) == ((2L, 1L, 2L, 2L, score(1.0, 2.0), 2)))
    assert(!got.contains(3L))
  }

  test("compressionRatio: repetition compresses, results partition-stable") {
    val rep = Array.fill(200)("spam").mkString(" ")
    val div = (1 to 200).map(i => s"w${i * 7919 % 1000}x$i").mkString(" ")
    val d = Seq((1L, rep), (2L, div)).toDF("doc_id", "text")
    val got = TextAnalysis.compressionRatio(d, "doc_id", "text")
      .collect().map(c => c.doc_id -> c).toMap
    assert(got(1L).n_bytes == rep.length && got(2L).n_bytes == div.length)
    assert(got(1L).ratio < 0.1, s"pure repetition: ${got(1L).ratio}")
    assert(got(2L).ratio > got(1L).ratio * 3,
      "diverse text must compress far worse than repetition")
    assert(got.values.forall(c => c.ratio > 0 && c.ratio < 1.2))
    val again = TextAnalysis.compressionRatio(
      d.repartition(5), "doc_id", "text")
      .collect().map(c => c.doc_id -> c.n_compressed).toMap
    assert(again == got.view.mapValues(_.n_compressed).toMap,
      "zlib output is deterministic across partitionings")
  }
}
