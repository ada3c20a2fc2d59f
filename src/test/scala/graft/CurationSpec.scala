package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, TextAnalysis, TfIdf}

/** Curation operators: quota sampling, shard packing, representative
  * election, TF-IDF, redaction — fixture-pinned semantics plus
  * partition-count determinism. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    Seq((1L, "a", "s1"), (2L, "a", "s1"), (3L, "a", "s1"),
        (4L, "a", "s2"), (5L, "b", "s1"), (6L, "b", "s1"))
      .toDF("doc_id", "lang", "source")

  test("repetitionSignals: hand-computed fractions incl. short-doc nulls") {
    val d = Seq(
      (1L, "a a b"),     // words {a:2,b:1}; bigrams {"a a","a b"}; trigram "a a b"
      (2L, "x"),         // single word: no bigrams/trigrams -> nulls
      (3L, "c c c c"))   // fully repeated
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(d, "doc_id", "text")
      .select("doc_id", "n_words", "top_word_frac", "top_bigram_frac",
        "top_trigram_frac")
      .as[(Long, Int, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((3, Some(2.0 / 3), Some(0.5), Some(1.0))))
    assert(got(2L) == ((1, Some(1.0), None, None)))
    assert(got(3L) == ((4, Some(1.0), Some(1.0), Some(1.0))))
  }

  test("unigramLogProb: hand-computed corpus-LM scores, partition-invariant") {
    // corpus: tokens a:3, b:2, c:1 -> total 6
    val d = Seq((1L, "a a b"), (2L, "a b c")).toDF("doc_id", "text")
    def lnp9(cnt: Int) =
      BigDecimal(math.log(cnt / 6.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val got = TextAnalysis.unigramLogProb(d.repartition(7), "doc_id", "text")
      .as[(Long, Long, Double, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // mirror the operator's op order: exact decimal sum -> ONE double division
    val exp1 = (lnp9(3) * 2 + lnp9(2)).toDouble / 3
    val exp2 = (lnp9(3) + lnp9(2) + lnp9(1)).toDouble / 3
    assert(got(1L) == ((3L, exp1, math.log(2 / 6.0))))
    assert(got(2L) == ((3L, exp2, math.log(1 / 6.0))))
  }

  test("chunkWindows: hand-computed overlapping chunks incl. short tail") {
    val d = Seq((1L, "t1 t2 t3 t4 t5"), (2L, "a")).toDF("doc_id", "text")
    val got = Curation.chunkWindows(d, "doc_id", "text", w = 3, s = 2)
      .select("doc_id", "chunk_id", "chunk_text", "n_chunk_tokens")
      .as[(Long, Int, String, Int)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 0, "t1 t2 t3", 3), (1L, 1, "t3 t4 t5", 3), (1L, 2, "t5", 1),
      (2L, 0, "a", 1)))
  }

  test("mixtureSample: budget math, determinism, pass-through under budget") {
    val d = (1L to 200L).map(i =>
      (i, if (i <= 150) "big" else "small", 10L)).toDF("doc_id", "source", "n_words")
    // big: 1500 tokens vs budget 500 -> rate 1/3; small: 500 == budget -> rate 1, all kept
    val out = Curation.mixtureSample(d, "doc_id", "source", "n_words", 500L)
      .select("doc_id", "source").as[(Long, String)].collect()
    val (big, small) = out.partition(_._2 == "big")
    assert(small.length == 50, "under-budget source must pass through whole")
    assert(big.length > 20 && big.length < 80, s"~1/3 of 150 expected, got ${big.length}")
    val again = Curation
      .mixtureSample(d.repartition(7), "doc_id", "source", "n_words", 500L)
      .select("doc_id").as[Long].collect().sorted
    assert(again.toSeq == out.map(_._1).sorted.toSeq,
      "sample must not depend on partitioning")
  }

  test("winsorize clamps into the group percentile band, identity inside it") {
    // group g: values 1..10 -> p0=1..p100=10; band [0.1, 0.9] = [1.9, 9.1]
    val d = (1 to 10).map(i => ("g", i.toLong, i.toDouble)).toDF("grp", "id", "v")
    val got = Curation.winsorize(d, "grp", "v", 0.1, 0.9)
      .select("id", "v_winsorized").as[(Long, Double)].collect().toMap
    assert(got(1L) == 1.9 && got(2L) == 2.0 && got(9L) == 9.0 && got(10L) == 9.1)
  }

  test("scd2Intervals: versions, tie-break, and open current interval") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val changes = Seq(
      (1L, 10L, ts(100)), (2L, 10L, ts(100)), // same instant: seq breaks tie
      (3L, 10L, ts(200)),
      (4L, 20L, ts(50))
    ).toDF("event_id", "user_id", "ts")
    val sentinel = Timestamp.valueOf("2100-01-01 00:00:00")
    val got = operators.Temporal.scd2Intervals(changes, "user_id", "ts", "event_id")
      .select("event_id", "version", "valid_to", "is_current")
      .as[(Long, Int, Timestamp, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((1, ts(100), false))) // closed by the tie row
    assert(got(2L) == ((2, ts(200), false)))
    assert(got(3L) == ((3, sentinel, true)))
    assert(got(4L) == ((1, sentinel, true)))
  }

  test("zscore: exact moments give the textbook standardization") {
    // group g: 2, 4, 6 -> mean 4, sample std 2
    val d = Seq(("g", 1L, 2.0), ("g", 2L, 4.0), ("g", 3L, 6.0))
      .toDF("grp", "id", "v")
    val got = Curation.zscore(d, "grp", "v")
      .select("id", "v_z").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> -1.0, 2L -> 0.0, 3L -> 1.0))
    // partition-count invariance: exact decimal sums don't depend on order
    val again = Curation.zscore(d.repartition(3), "grp", "v")
      .select("id", "v_z").as[(Long, Double)].collect().toMap
    assert(again == got)
  }

  test("trainValTestSplit: exact per-stratum proportions, stable under repartition") {
    val d = (1L to 200L).map(i => (i, if (i <= 100) "en" else "de"))
      .toDF("doc_id", "lang")
    val out = Curation.trainValTestSplit(d, "doc_id", Seq("lang"))
    val byStratum = out.groupBy("lang", "split").count()
      .as[(String, String, Long)].collect()
      .map { case (l, s, n) => (l, s) -> n }.toMap
    for (l <- Seq("en", "de")) {
      assert(byStratum((l, "train")) == 80L)
      assert(byStratum((l, "val")) == 10L)
      assert(byStratum((l, "test")) == 10L)
    }
    val again = Curation.trainValTestSplit(d.repartition(7), "doc_id", Seq("lang"))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val once = out.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(again == once, "split assignment must not depend on partitioning")
  }

  test("quotaSample caps every stratum and is partition-count invariant") {
    val out = Curation.quotaSample(docs, "doc_id", Seq("lang", "source"), 2)
    val perStratum = out.groupBy("lang", "source").count()
      .as[(String, String, Long)].collect()
      .map { case (l, s, n) => (l, s) -> n }.toMap
    assert(perStratum.values.forall(_ <= 2))
    assert(perStratum(("a", "s1")) == 2) // 3 candidates → capped
    assert(perStratum(("a", "s2")) == 1) // fewer than quota → all kept
    val once = out.select("doc_id").as[Long].collect().sorted.toSeq
    val again = Curation
      .quotaSample(docs.repartition(7), "doc_id", Seq("lang", "source"), 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(once == again, "sample must not depend on partitioning")
  }

  test("packByTokenBudget cuts shards at the running-total boundary") {
    val d = Seq((1L, "s", 4000L), (2L, "s", 4000L), (3L, "s", 4000L),
        (4L, "s", 9000L), (5L, "s", 500L), (6L, "t", 20000L))
      .toDF("doc_id", "source", "n_chars")
    val out = Curation
      .packByTokenBudget(d, "source", "doc_id", "n_chars", 10000L)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    // s: before = 0, 4000, 8000, 12000, 21000 → shards 0,0,0,1,2
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 2L,
      6L -> 0L))
  }

  test("electRepresentatives keeps the best-scored row, min id on ties") {
    val d = Seq((1L, "x", 0.5), (2L, "x", 0.9), (3L, "x", 0.9),
        (4L, "y", 0.1))
      .toDF("doc_id", "text", "quality")
    val out = Curation.electRepresentatives(d, "text", "doc_id", "quality")
      .select("doc_id", "dup_count").as[(Long, Long)].collect().toMap
    assert(out == Map(2L -> 3L, 4L -> 1L)) // id 2 beats 3 on the tie
  }

  test("TfIdf ranks rare terms above ubiquitous ones") {
    val d = Seq((1L, "rare common common"), (2L, "common common common"),
        (3L, "common other other"))
      .toDF("doc_id", "text")
    val top = TfIdf.topTerms(d, "doc_id", "text", 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    // doc 1: rare (df=1, score 3) beats common (tf=2, df=3, score 2)
    assert(top(1L) == "rare")
    assert(top(3L) == "other")
    val scored = TfIdf.topTerms(d, "doc_id", "text", 3)
      .filter($"doc_id" === 1L && $"term" === "rare")
      .select("score").as[Double].head()
    assert(scored == 3.0) // tf 1 × N 3 / df 1
  }

  test("redact replaces every match and counts them") {
    val d = Seq((1L, "call 415-555-0199 or 650-555-0123"),
        (2L, "no digits here")).toDF("id", "t")
    val out = TextAnalysis.redact(d, "t", "[0-9]{3,}", "<NUM>")
      .select("id", "n_redacted", "redacted")
      .as[(Long, Int, String)].collect()
      .map { case (i, n, r) => i -> ((n, r)) }.toMap
    assert(out(1L) == ((6, "call <NUM>-<NUM>-<NUM> or <NUM>-<NUM>-<NUM>")))
    assert(out(2L) == ((0, "no digits here")))
  }

  test("globalRowIds: contiguous, order-correct, partition-invariant") {
    val d = (1L to 300L).map(i => (i, s"s${i % 7}")).toDF("id", "grp")
    def ids(df: org.apache.spark.sql.DataFrame) =
      Curation.globalRowIds(df, Seq("grp", "id"))
        .select("id", "global_id").as[(Long, Long)].collect().toMap
    val got = ids(d)
    assert(got.values.toSeq.sorted == (1L to 300L),
      "ids are exactly 1..N, no gaps, no duplicates")
    val expected = (1L to 300L).sortBy(i => (s"s${i % 7}", i))
      .zipWithIndex.map { case (i, k) => i -> (k + 1L) }.toMap
    assert(got == expected, "id order follows the (grp, id) total order")
    assert(ids(d.repartition(11)) == expected,
      "pure function of the order columns, not of input partitioning")
  }

  test("weightedSample: k rows, contiguous ranks, partition-invariant") {
    val d = (1L to 200L).map(i => (i, 10L)).toDF("doc_id", "w")
    val got = Curation.weightedSample(d, "doc_id", "w", k = 25)
    val ranks = got.select("sample_rank").as[Int].collect().sorted
    assert(ranks.toSeq == (1 to 25))
    val again = Curation.weightedSample(d.repartition(7), "doc_id", "w", 25)
      .select("doc_id", "sample_rank").as[(Long, Int)].collect().toSet
    assert(again ==
      got.select("doc_id", "sample_rank").as[(Long, Int)].collect().toSet,
      "sample is a pure function of ids, not of partitioning")
  }

  test("weightedSample: overwhelming weight dominates the sample") {
    // u^(1/w) -> 1 as w -> inf: the giant-weight row must be drawn,
    // and with u quantized it lands at rank 1 (key rounds to 1.0).
    val d = ((1L to 99L).map(i => (i, 5L)) :+ (100L, 1000000000L))
      .toDF("doc_id", "w")
    val top = Curation.weightedSample(d, "doc_id", "w", k = 10)
      .filter($"sample_rank" === 1).select("doc_id").as[Long].head()
    assert(top == 100L)
  }
}
