package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.functions.Strings

/** Unit fixtures for the core operators (SURVEY.md §5). */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  // --- K1: nested-limit semantics differ from a two-key sort ------------
  test("nestedLimit restricts stage 2 to the stage-1 pool") {
    // global argmax by `b` (id 99, b=100) lies OUTSIDE the top-2 by `a`
    val df = Seq(
      (1L, 10.0, 1.0), (2L, 9.0, 2.0), (99L, 0.0, 100.0))
      .toDF("id", "a", "b")
    val got = TopK.nestedLimit(df, poolSize = 2,
      first = Seq($"a".desc, $"id".asc),
      second = Seq($"b".desc, $"id".asc), take = 1)
      .select("id").as[Long].collect()
    assert(got.toSeq == Seq(2L)) // b=2 beats b=1 within the pool; 99 excluded
    // while the naive two-key sort would pick id 1 (a desc, then b desc)
    val naive = df.orderBy($"a".desc, $"b".desc).limit(1)
      .select("id").as[Long].head()
    assert(naive == 1L)
  }

  // --- K4: per-group top-n with deterministic tie-break ------------------
  test("perGroupTopN breaks score ties by explicit key") {
    val df = Seq(("g", 1L, 5.0), ("g", 2L, 5.0), ("g", 3L, 4.0))
      .toDF("grp", "id", "score")
    val got = TopK.perGroupTopN(df, Seq($"grp"),
      Seq($"score".desc, $"id".asc), 2)
      .select("id", "rn").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 1, 2L -> 2))
  }

  // --- J4: upsert replace + append, idempotent ---------------------------
  test("upsert replaces colliding keys and appends new ones; idempotent") {
    val existing = Seq((1L, "old"), (2L, "keep")).toDF("k", "v")
    val incoming = Seq((1L, "new"), (3L, "add")).toDF("k", "v")
    val once = Joins.upsert(existing, incoming, Seq("k"))
    assert(once.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "new"), (2L, "keep"), (3L, "add")))
    val twice = Joins.upsert(once, incoming, Seq("k"))
    assert(twice.orderBy("k").collect().toSeq ==
      once.orderBy("k").collect().toSeq)
  }

  // --- F4: conditional colon strip (reference Scraper.py:295-297) --------
  test("conditionalStrip keeps ':' only for excluded ids, ',' never") {
    val df = Seq((19L, "a: b, c"), (1L, "a: b, c")).toDF("id", "name")
    val got = df.select($"id",
      Strings.conditionalStrip($"name", $"id", Seq(19, 25, 32, 35)).as("s"))
      .as[(Long, String)].collect().toMap
    assert(got(19L) == "a: b c")
    assert(got(1L) == "a b c")
  }

  test("capitalize matches Python str.capitalize semantics") {
    val got = Seq("hELLO wORLD").toDF("s")
      .select(Strings.capitalize($"s")).as[String].head()
    assert(got == "Hello world")
  }

  test("slug collapses whitespace runs to single underscores") {
    val got = Seq("a  b\tc").toDF("s")
      .select(Strings.slug($"s")).as[String].head()
    assert(got == "a_b_c")
  }

  // --- R1: unpivot round-trips against the wide layout -------------------
  test("wide->long unpivot preserves every (id, emotion, score) cell") {
    val wide = graft.domain.Emotions.episodesWide(spark, sf)
    val long = graft.domain.Emotions.toLong(wide, Seq("episode_id"))
    assert(long.count() == wide.count() * 6)
    val happy7 = wide.orderBy("episode_id").limit(1)
      .select("happy").as[Double].head()
    val viaLong = long.filter($"emotion" === "happy")
      .orderBy("episode_id").limit(1).select("score").as[Double].head()
    assert(happy7 == viaLong)
  }

  // --- Sessions ----------------------------------------------------------
  test("sessionize splits on gaps > threshold only") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000)
    val df = Seq(
      (1L, at(0), 7L), (2L, at(100), 7L), (3L, at(2000), 7L),
      (4L, at(2100), 7L), (5L, at(0), 8L))
      .toDF("event_id", "ts", "user_id")
    val got = Sessions.sessionize(df, gapSeconds = 1800)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 1))
  }

  // --- Empty-input edges -------------------------------------------------
  test("operators behave on empty inputs") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(operators.Dedup.ngramJaccardPairs(emptyDocs, "doc_id", "text", 3)
      .count() == 0)
    assert(operators.MinHashLSH.nearDuplicates(emptyDocs, "doc_id", "text")
      .count() == 0)
    val emptyLong = Seq.empty[(Long, String, Double)]
      .toDF("episode_id", "emotion", "score")
    val emptyTop2 = operators.Matching.top2Emotions(emptyLong, "episode_id")
    val strains = Seq((1L, "happy", 0.5)).toDF("strain_id", "emotion", "score")
    assert(operators.Matching.greedyMatch(spark, emptyTop2, strains, 10)
      .count() == 0)
    val emptyEdges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(operators.DuplicateClusters.resolve(emptyEdges).count() == 0)
  }

  // --- As-of join --------------------------------------------------------
  test("asOf picks most recent right row at-or-before, null when none") {
    val left = Seq((10L, 1L, 100L), (11L, 1L, 5L), (12L, 2L, 50L))
      .toDF("id", "k", "t")
    val right = Seq((1L, 20L, "r20"), (1L, 100L, "r100"), (2L, 60L, "r60"))
      .toDF("k", "t", "payload")
    val got = operators.AsOfJoin.asOf(left, right, "k", "t", Seq("payload"))
      .select("id", "asof_payload").as[(Long, Option[String])]
      .collect().toMap
    assert(got(10L).contains("r100")) // tie at t=100 -> inclusive (<=)
    assert(got(11L).isEmpty)          // no right row at or before t=5
    assert(got(12L).isEmpty)          // right at t=60 is AFTER t=50
  }

  // --- Multimodal --------------------------------------------------------
  test("decodeResizeFeaturize produces fixed-size feature grids per batch") {
    val docs = Seq((1L, "abcd"), (2L, "xy")).toDF("doc_id", "text")
    val got = Multimodal.decodeResizeFeaturize(spark,
      Multimodal.withPayload(docs, "doc_id", "text"), targetSide = 4)
      .collect().map(m => m.doc_id -> m).toMap
    assert(got.size == 2)
    got.values.foreach { m =>
      assert(m.features.length == 16)
      assert(m.width >= 16 && m.width < 32 && m.height >= 16 && m.height < 32)
      assert(m.features.forall(f => f >= 0.0f && f <= 1.0f))
    }
    // deterministic: same input -> same features
    assert(got(1L).features(0) == 'a'.toInt / 255.0f)
  }

  test("sampleFrames fans one payload row out to capped frame rows") {
    val docs = Seq((1L, "a" * 200), (2L, "b" * 10)).toDF("doc_id", "text")
    val got = Multimodal.sampleFrames(spark,
      Multimodal.withPayload(docs, "doc_id", "text"),
      stride = 64, maxFrames = 4)
      .as[(Long, Int, Int, Int)].collect().groupBy(_._1)
    assert(got(1L).length == 3) // 200/64 = 3 frames
    assert(got(1L).map(_._3).sorted.toSeq == Seq(0, 64, 128))
    assert(!got.contains(2L)) // shorter than one stride -> no frames
  }

  test("media extraction computes real byte-level features") {
    val docs = Seq((1L, "ab"), (2L, "")).toDF("doc_id", "text")
    val got = Multimodal.extract(spark,
      Multimodal.withPayload(docs, "doc_id", "text"))
      .collect().map(m => m.doc_id -> m).toMap
    assert(got(1L).byte_len == 2 && got(1L).first_byte == 97 &&
      got(1L).last_byte == 98 && got(1L).checksum == 97 + 98)
    assert(got(2L).byte_len == 0 && got(2L).first_byte == -1 &&
      got(2L).checksum == 0)
  }
}
