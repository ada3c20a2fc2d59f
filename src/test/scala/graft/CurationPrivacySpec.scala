package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, IncrementalAgg, Metrics, Privacy, Similarity, Stats}

/** Containment join, k-anonymity audit, blocklist screen,
  * hard-negative mining, round-robin interleave (q160–q164). */
class CurationPrivacySpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------- containment

  /** Exhaustive directional word-set containment — the oracle the
    * one-sided prefix filter must reproduce exactly. */
  private def exhaustiveContainment(docs: Seq[(Long, String)],
      num: Int, den: Int): Set[(Long, Long, Int)] = {
    val sets = docs.map { case (id, t) =>
      id -> t.toLowerCase.split(" ").toSet }.toMap
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a != b
      common = (sa & sb).size
      if common * den >= sa.size * num
    } yield (a, b, common)).toSet
  }

  private def runContainment(docs: Seq[(Long, String)], num: Int,
      den: Int): Set[(Long, Long, Int)] =
    Dedup.containmentPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", 1, num, den)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("containment prefix filter is lossless vs the exhaustive join") {
    val docs = Seq(
      1L -> "a b c d",                  // fully inside 2 and 3
      2L -> "a b c d e f g h",
      3L -> "a b c d x y z w q r",
      4L -> "m n o p",                  // disjoint
      5L -> "a b")                      // inside 1, 2, 3
    for ((num, den) <- Seq((1, 2), (3, 5), (4, 5), (1, 1)))
      assert(runContainment(docs, num, den) ==
        exhaustiveContainment(docs, num, den), s"threshold $num/$den")
  }

  test("containment is directional where Jaccard is not") {
    // 5 ⊂ 2: C(5,2) = 1 but C(2,5) = 2/8 — only one direction at 4/5
    val docs = Seq(2L -> "a b c d e f g h", 5L -> "a b")
    val got = runContainment(docs, 4, 5)
    assert(got.contains((5L, 2L, 2)))
    assert(!got.exists { case (a, b, _) => a == 2L && b == 5L })
  }

  test("containment losslessness holds on randomized corpora") {
    // 40 docs over a 12-letter alphabet, sizes 1-8 — hot tokens and
    // subset relations arise constantly at this density
    val rnd = new scala.util.Random(20260813L)
    val alphabet = ('a' to 'l').map(_.toString)
    for (trial <- 1 to 5) {
      val docs = (1L to 40L).map { id =>
        val n = 1 + rnd.nextInt(8)
        id -> Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size)))
          .distinct.mkString(" ")
      }
      for ((num, den) <- Seq((1, 2), (4, 5)))
        assert(runContainment(docs, num, den) ==
          exhaustiveContainment(docs, num, den),
          s"trial $trial threshold $num/$den")
    }
  }

  // ---------------------------------------------------- k-anonymity

  test("kAnonymity classes and threshold flags") {
    val df = Seq(
      ("us", 30), ("us", 31), ("us", 39),
      ("de", 30), ("de", 35),
      ("fr", 41)).toDF("country", "age")
    val out = Privacy.kAnonymity(df,
        Seq("country" -> col("country"),
          "decade" -> (col("age") / 10).cast("int")),
        k = 3)
      .collect().map(r => (r.getString(0), r.getInt(1),
        r.getLong(2), r.getBoolean(3))).toSet
    assert(out == Set(
      ("us", 3, 3L, true), ("de", 3, 2L, false), ("fr", 4, 1L, false)))
  }

  // ---------------------------------------------------- blocklist

  test("blocklistFlag: sorted matches, scalar columns, empty string when clean") {
    val docs = Seq(
      (1L, "the skew and the spill"),
      (2L, "clean text only"),
      (3L, "Spill SKEW spill")).toDF("doc_id", "text")
    val out = Curation.blocklistFlag(docs, "doc_id", "text",
        Seq("spill", "skew"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (1L, 2, "skew,spill", true),
      (2L, 0, "", false),
      (3L, 2, "skew,spill", true)))
  }

  // ---------------------------------------------------- hard negatives

  test("hardNegatives matches a label-filtered brute force") {
    val vecs = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(0.8f, 0.2f), 1), (3L, Array(0f, 1f), 1),
      (4L, Array(0.7f, 0.3f), 2), (5L, Array(-1f, 0f), 0))
    val df = vecs.toDF("vec_id", "embedding", "label")
    val queries = df.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").as("qlabel"))
    val corpus = df.select(col("vec_id").as("cid"),
      col("embedding").as("cvec"), col("label").as("clabel"))
    val got = Similarity.hardNegatives(spark, queries, corpus, k = 2)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    // brute force: candidates with label != 0, cosine vs (1,0):
    //   2 -> 0.970, 4 -> 0.919, 3 -> 0.0  ⇒ top-2 = [2, 4]
    assert(got.toSeq == Seq((0L, 1, 2L, 1), (0L, 2, 4L, 2)))
  }

  // ---------------------------------------------------- interleave

  test("interleaveOrder is a round-robin permutation") {
    val docs = Seq(
      (10L, "a"), (11L, "a"), (12L, "a"), (13L, "a"),
      (20L, "b"), (21L, "b"),
      (30L, "c")).toDF("doc_id", "source")
    val out = Curation.interleaveOrder(docs, "source", "doc_id")
      .select("doc_id", "source", "round", "global_pos")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3))).sortBy(_._4)
    // positions are exactly 1..n
    assert(out.map(_._4).toSeq == (1L to 7L))
    // (round, source) is the global order: round 1 of every source
    // first, sources alphabetical within a round
    assert(out.map(t => (t._3, t._2)).toSeq ==
      Seq((1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"),
        (3, "a"), (4, "a")))
    // within a source, rounds follow doc_id order
    assert(out.filter(_._2 == "a").sortBy(_._3).map(_._1).toSeq ==
      Seq(10L, 11L, 12L, 13L))
  }

  test("benford: digit extraction, spine zeros, chi2 total") {
    val df = Seq(1.0, 19.5, 25.0, 3.99, 99.0, 541.0, 0.5).toDF("v")
    val out = Stats.benford(df, "v")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(4), r.getDouble(5)))
      .toMap
    // 0.5 excluded; digits: 1->{1,19.5}, 2->{25}, 3->{3.99}, 5->{541}, 9->{99}
    assert(out.keySet == (1 to 9).toSet)
    assert(out(1)._1 == 2L && out(2)._1 == 1L && out(3)._1 == 1L &&
      out(5)._1 == 1L && out(9)._1 == 1L)
    assert(out(4)._1 == 0L && out(6)._1 == 0L)
    val total = out.values.map(_._2).sum
    assert(out.values.forall(v => math.abs(v._3 - total) < 1e-9))
  }

  // ---------------------------------------------------- eval metrics

  test("ndcgAtK: hand-computed DCG, ideal from the full group, no-rel group") {
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val df = Seq(
      // group 1: rels at predicted ranks 1 and 3 of [1,2,3]; one
      // relevant row (id 14, low score) pushed OUT of the top-3 cut,
      // so IDCG@3 sees three relevant rows
      (1L, 10L, 9.0, 1), (1L, 11L, 8.0, 0), (1L, 12L, 7.0, 1),
      (1L, 13L, 6.0, 0), (1L, 14L, 5.0, 1),
      // group 2: nothing relevant
      (2L, 20L, 9.0, 0), (2L, 21L, 8.0, 0))
      .toDF("g", "id", "score", "rel")
    val out = Metrics.ndcgAtK(df, "g", "id", "score", "rel", k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    def q9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dcg1 = q9(1.0 / log2(2.0) + 1.0 / log2(4.0))
    val idcg1 = q9(1.0 / log2(2.0) + 1.0 / log2(3.0) + 1.0 / log2(4.0))
    assert(out(1L)._1 == dcg1)
    assert(out(1L)._2 == idcg1)
    assert(out(1L)._3 == dcg1 / idcg1)
    assert(out(2L) == ((0.0, 0.0, 0.0)))
  }

  test("rocAuc: perfect, inverted, tied, and degenerate groups") {
    val df = Seq(
      // g=a: positives strictly above negatives -> AUC 1
      ("a", 4.0, true), ("a", 3.0, true), ("a", 2.0, false), ("a", 1.0, false),
      // g=b: positives strictly below -> AUC 0
      ("b", 1.0, true), ("b", 2.0, false),
      // g=c: all scores tied -> AUC 1/2
      ("c", 5.0, true), ("c", 5.0, false), ("c", 5.0, false),
      // g=d: no negatives -> undefined
      ("d", 1.0, true))
      .toDF("g", "score", "label")
    val out = Metrics.rocAuc(df, "g", "score", "label")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out("a") == ((2L, 2L, Some(1.0))))
    assert(out("b") == ((1L, 1L, Some(0.0))))
    assert(out("c") == ((1L, 2L, Some(0.5))))
    assert(out("d") == ((1L, 0L, None)))
  }

  test("calibrationBins: edges, max-in-last-bin, exact means") {
    // scores 0..10 over bins=5 -> width 2; score 10 lands in bin 4
    val df = (0 to 10).map(i => (i.toDouble, i >= 8)).toDF("s", "lbl")
    val out = Metrics.calibrationBins(df, "s", "lbl", bins = 5)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(out.keySet == Set(0, 1, 2, 3, 4))
    // bin 4 holds scores 8, 9, 10 (max closes into the last bin)
    assert(out(4)._1 == 3L && out(4)._2 == 3L)
    assert(out(4)._3 == 9.0)          // exact decimal mean
    assert(out(4)._4 == 1.0)          // acc
    assert(out(4)._5 == 0.9)          // conf = (9-0)/(10-0)
    assert(out(0) == ((2L, 0L, 0.5, 0.0, 0.05)))
  }

  test("joinDelta equals full-join minus base-join (bag semantics)") {
    val o = (1L to 40L).map(k => (k, k * 10)).toDF("k", "a")
    val l = (1L to 40L).flatMap(k => (1 to (k % 3).toInt + 1)
      .map(i => (k, i))).toDF("k", "b")
    val (aBase, aDelta) = (o.filter($"k" % 7 =!= 0), o.filter($"k" % 7 === 0))
    val (bBase, bDelta) = (l.filter($"k" % 5 =!= 0), l.filter($"k" % 5 === 0))
    val delta = IncrementalAgg.joinDelta(aBase, aDelta, bBase, bDelta, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val full = o.join(l, "k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val base = aBase.join(bBase, "k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val expected = full.groupBy(identity).view.mapValues(_.length).toMap
      .map { case (k, n) => k -> (n - base.getOrElse(k, 0)) }
      .filter(_._2 > 0)
    assert(delta == expected)
  }

  test("lDiversity: a k-passing class can still fail l") {
    val df = Seq(
      ("us", "flu"), ("us", "flu"), ("us", "flu"),   // 3 rows, 1 value
      ("de", "flu"), ("de", "cold"), ("de", "hiv"))  // 3 rows, 3 values
      .toDF("zip", "diag")
    val out = Privacy.lDiversity(df, Seq("zip" -> $"zip"), $"diag", l = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out("us") == ((3L, 1L, false)))
    assert(out("de") == ((3L, 3L, true)))
  }

  test("quantileNormalize: hand-checked mapping and identity on one group") {
    // groups: a = {10, 20, 30}, b = {100, 200, 300}; pooled sorted =
    // [10, 20, 30, 100, 200, 300]; each rank r of 3 maps to pooled
    // index 1 + round((r-1)*5/2) = 1, 4((2.5 half-up)), 6
    val df = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (4L, "b", 100.0), (5L, "b", 200.0), (6L, "b", 300.0))
      .toDF("id", "g", "v")
    val out = Stats.quantileNormalize(df, "g", "id", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out == Map(1L -> 10.0, 2L -> 100.0, 3L -> 300.0,
      4L -> 10.0, 5L -> 100.0, 6L -> 300.0))
    // a single group normalizes onto itself: norm_value == value
    val one = Seq((1L, "x", 5.0), (2L, "x", 1.0), (3L, "x", 9.0))
      .toDF("id", "g", "v")
    val idOut = Stats.quantileNormalize(one, "g", "id", "v")
      .collect().map(r => (r.getDouble(2), r.getDouble(3)))
    assert(idOut.forall { case (v, nv) => v == nv })
  }

  test("quantileNormalize preserves within-group rank order (randomized)") {
    val rnd = new scala.util.Random(42L)
    val df = (1L to 120L).map(i =>
      (i, s"g${i % 4}", math.floor(rnd.nextDouble() * 50) / 2))
      .toDF("id", "g", "v")
    val out = Stats.quantileNormalize(df, "g", "id", "v")
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getLong(0),
        r.getDouble(3)))
    assert(out.length == 120)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(t => (t._2, t._3)).map(_._4)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b })
    }
  }

  test("globalCumsum equals a sequential scan; contextPack windows/straddles") {
    val docs = Seq(
      (1L, "a b c"),            // 3 tokens, cum 3
      (2L, "d e f g h i"),      // 6, cum 9  -> straddles the 8-boundary
      (3L, "j k"),              // 2, cum 11
      (4L, "l m n o p"))        // 5, cum 16 -> ends exactly at 2*8
      .toDF("doc_id", "text")
    val out = Curation.contextPack(docs, "doc_id", "text", budget = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 3L, 3L, 0L, 0L, false),
      (2L, 6L, 9L, 0L, 1L, true),
      (3L, 2L, 11L, 1L, 1L, false),
      (4L, 5L, 16L, 1L, 1L, false)))
  }

  test("decontaminateByEmbedding: true max, threshold flag, map-only") {
    val bench = Seq((100L, Array(1f, 0f)), (101L, Array(0f, 1f)))
      .toDF("qid", "qvec")
    val corpus = Seq(
      (1L, Array(1f, 0f)),      // exact benchmark copy -> sim 1
      (2L, Array(0.6f, 0.8f)),  // max sim 0.8 (vs (0,1))
      (3L, Array(-1f, 0f)))     // max sim 0 (vs (0,1))
      .toDF("cid", "cvec")
    val out = Similarity.decontaminateByEmbedding(spark, corpus, bench, 0.9)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(out(0) == ((1L, 1.0, true)))
    assert(math.abs(out(1)._2 - 0.8) < 1e-6 && !out(1)._3)
    assert(out(2)._2 == 0.0 && !out(2)._3)
  }

  test("corpusPipeline: dispositions, stage order, packing only over kept") {
    val docs = Seq(
      (1L, "a b c d e f"),        // kept (6 tokens), windows over budget 4
      (2L, "a b c d e f"),        // duplicate of 1
      (3L, "x y"),                // short
      (4L, "x y"),                // short too — must NOT make 3 a keeper-loser
      (5L, "bad w1 w2 w3 w4"),    // blocked (5 tokens)
      (6L, "p q r s t"))          // kept (5 tokens)
      .toDF("doc_id", "text")
    val out = Curation.corpusPipeline(docs, "doc_id", "text",
        minTokens = 4, blocklist = Seq("bad"), budget = 4)
      .collect().map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(3)) None else Some((r.getLong(3), r.getLong(4)))))
      .toMap
    assert(out(1L)._1 == "kept")
    assert(out(2L)._1 == "duplicate")
    assert(out(3L)._1 == "short" && out(4L)._1 == "short")
    assert(out(5L)._1 == "blocked")
    assert(out(6L)._1 == "kept")
    // packing covers ONLY kept docs: doc 1 spans windows 0-1 (tokens
    // 1-6 of budget 4), doc 6 spans 1-2 (tokens 7-11)
    assert(out(1L)._2 == Some((0L, 1L)))
    assert(out(6L)._2 == Some((1L, 2L)))
    assert(out(2L)._2.isEmpty && out(5L)._2.isEmpty)
  }
}
