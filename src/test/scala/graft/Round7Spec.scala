package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Round-7 additions: the replayable compressibility proxy (q211) and
  * its association with the real zlib signal it stands in for. */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  // --- compressibilityProxy ---------------------------------------------
  test("compressibilityProxy: exact gram counts on hand fixtures") {
    val df = Seq(
      (1L, "a a a a a a a a"),          // 5 grams, 1 distinct
      (2L, "w0 w1 w2 w3 w4 w5 w6 w7"),  // 5 grams, 5 distinct
      (3L, "a b c"),                    // too short: 0 grams
      (4L, "")).toDF("id", "t")
    val out = TextAnalysis.compressibilityProxy(df, "id", "t")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) == 5L && out(0).getLong(3) == 1L)
    assert(out(0).getLong(4) == 800000L) // 10^6 * 4 DIV 5
    assert(out(1).getLong(2) == 5L && out(1).getLong(3) == 5L)
    assert(out(1).getLong(4) == 0L)
    assert(out(2).getLong(2) == 0L && out(2).getLong(4) == 0L)
    assert(out(2).getLong(1) == 5L) // "a b c" is 5 UTF-8 bytes
    assert(out(3).getLong(2) == 0L && out(3).getLong(4) == 0L)
  }

  // --- canonicalByQuality -----------------------------------------------
  test("canonicalByQuality keeps the best-score member, min-id on ties") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val scores = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, -2L), (11L, -2L))
      .toDF("doc_id", "logit")
    val out = graft.operators.DuplicateClusters
      .canonicalByQuality(clusters, scores)
      .orderBy("doc_id")
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toSeq
    // cluster 1: docs 2 and 3 tie at 9 -> min id 2 keeps; cluster 10:
    // tie at -2 -> min id 10 keeps
    assert(out == Seq(1L -> false, 2L -> true, 3L -> false,
      10L -> true, 11L -> false))
  }

  test("canonicalByQuality: exactly one keeper per cluster on the corpus") {
    val docs = Tables.documents(spark, sf)
    val clusters = graft.operators.DuplicateClusters.resolveContracted(
      graft.operators.MinHashLSH
        .nearDuplicatesPortable(docs, "doc_id", "text").select("a", "b"))
    val out = graft.operators.DuplicateClusters.canonicalByQuality(clusters,
      graft.operators.TextAnalysis.linearScore(docs, "doc_id", "text", 64))
    val perCluster = out.groupBy("cluster_id")
      .agg(sum(when($"keep", 1L).otherwise(0L)).as("keepers"),
        count(lit(1)).as("members"))
    assert(perCluster.filter($"keepers" =!= 1L).count() == 0)
    assert(perCluster.filter($"members" < 2).count() == 0) // no singletons
  }

  // --- benchmarkNgramContamination ---------------------------------------
  test("benchmarkNgramContamination: leaked 4-gram flags, self never does") {
    // doc 0 is the benchmark; doc 1 shares its "a b c d"; doc 2 shares
    // nothing; doc 3 is an exact copy of the benchmark doc
    val docs = Seq(
      (0L, "a b c d e f"),
      (1L, "x y a b c d z"),
      (2L, "p q r s t u v"),
      (3L, "a b c d e f")).toDF("id", "t")
    val out = graft.operators.Dedup.benchmarkNgramContamination(
        docs, "id", "t", col("id") === 0, n = 4)
      .orderBy("doc_id").collect()
    // benchmark doc itself: contaminated grams from OTHER bench docs
    // only (none) -> 0, never flagged
    assert(out(0).getBoolean(1) && out(0).getLong(3) == 0L
      && !out(0).getBoolean(5))
    // doc 1: one shared 4-gram of its 4 -> 250000 ppm, flagged
    assert(!out(1).getBoolean(1) && out(1).getLong(2) == 4L
      && out(1).getLong(3) == 1L && out(1).getLong(4) == 250000L
      && out(1).getBoolean(5))
    // doc 2: clean
    assert(out(2).getLong(3) == 0L && !out(2).getBoolean(5))
    // doc 3: full overlap -> 1000000 ppm, flagged
    assert(out(3).getLong(4) == 1000000L && out(3).getBoolean(5))
  }

  // --- plan shape of the round-7 composites -------------------------------
  test("q212/q213 plan no cartesian products") {
    Seq("q212_canonical_quality", "q213_benchmark_decontam")
      .foreach { name =>
        val df = SparkEntry.queries(name)(spark, sf)
        df.collect()
        assert(!df.queryExecution.executedPlan.toString
          .contains("CartesianProduct"), s"$name plans a cartesian")
      }
  }

  // --- prCurve integer-score contract -----------------------------------
  test("prCurve rejects fractional score columns instead of flooring them") {
    val df = Seq((0.5, true), (0.3, false)).toDF("score", "gold")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Metrics.prCurve(df, "score", "gold")
    }
    assert(e.getMessage.contains("DISTINCT integer score"))
    // fixed-pointing upstream is the documented route
    val fixed = df.select(($"score" * 1000000).cast("long").as("score"),
      $"gold")
    assert(graft.operators.Metrics.prCurve(fixed, "score", "gold")
      .count() == 2)
  }

  test("compressibilityProxy tracks the real zlib ratio by construction") {
    // 30 repetitive docs (one phrase looped) vs 30 diverse docs
    // (distinct token streams): the proxy must rank them the same way
    // the Deflater does — repetitive ⇒ high dup4_ppm AND low ratio.
    val docs = ((0 until 30).map { i =>
      (i.toLong, Seq.fill(40)(s"tok$i repeated phrase unit").mkString(" "))
    } ++ (0 until 30).map { i =>
      (100L + i, (0 until 160).map(j => s"w${i}_$j").mkString(" "))
    }).toDF("doc_id", "text")
    val proxy = TextAnalysis.compressibilityProxy(docs, "doc_id", "text")
      .select($"doc_id", $"dup4_ppm")
    val zlib = TextAnalysis.compressionRatio(docs, "doc_id", "text")
      .toDF().select($"doc_id", $"ratio")
    val j = proxy.join(zlib, "doc_id")
      .withColumn("rep", $"doc_id" < 100)
      .groupBy("rep")
      .agg(avg($"dup4_ppm").as("dup"), avg($"ratio").as("zr"))
      .collect().map(r => r.getBoolean(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(j(true)._1 > j(false)._1 + 500000,
      s"repetitive docs should have far higher dup mass: $j")
    assert(j(true)._2 < j(false)._2 - 0.2,
      s"repetitive docs should deflate far better: $j")
  }
}
