package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Metrics, Similarity}

/** Round-6 hardening: broadcast-collect row caps fail loudly,
  * decontamination degrades to null (not -Inf/NaN) on empty/zero-norm
  * inputs, AUC rank-doubling stays in long, calibration decimal scale
  * is parameterizable for probability-valued scores. */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  // --- broadcast-side row-cap guards ------------------------------------
  test("bruteForceTopKFast rejects an over-cap query side loudly") {
    val queries = (1L to 20L).map(i => (i, Array(1f, 0f))).toDF("qid", "qvec")
    val corpus = Seq((100L, Array(1f, 1f))).toDF("cid", "cvec")
    val e = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopKFast(spark, queries, corpus, k = 1,
        maxQueries = 10).collect()
    }
    assert(e.getMessage.contains("broadcast"))
    // at the cap it still runs
    assert(Similarity.bruteForceTopKFast(spark, queries, corpus, k = 1,
      maxQueries = 20).count() == 20)
  }

  test("hardNegatives and decontaminateByEmbedding enforce their caps") {
    val q = (1L to 5L).map(i => (i, Array(1f, 0f), (i % 2).toInt))
      .toDF("qid", "qvec", "qlabel")
    val c = Seq((9L, Array(1f, 0f), 1)).toDF("cid", "cvec", "clabel")
    intercept[IllegalArgumentException] {
      Similarity.hardNegatives(spark, q, c, k = 1, maxQueries = 4).collect()
    }
    val bench = (1L to 5L).map(i => (i, Array(1f, 0f))).toDF("qid", "qvec")
    intercept[IllegalArgumentException] {
      Similarity.decontaminateByEmbedding(spark,
        c.select($"cid", $"cvec"), bench, 0.9, maxBench = 4).collect()
    }
  }

  // --- decontamination degenerate inputs --------------------------------
  test("decontaminateByEmbedding: empty bench -> null max_sim, no flags") {
    val corpus = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("cid", "cvec")
    val bench = Seq.empty[(Long, Array[Float])].toDF("qid", "qvec")
    val out = Similarity.decontaminateByEmbedding(spark, corpus, bench, 0.5)
      .collect()
    assert(out.length == 2)
    assert(out.forall(r => r.isNullAt(1) && !r.getBoolean(2)))
  }

  test("decontaminateByEmbedding: zero-norm vectors never produce NaN") {
    val bench = Seq((100L, Array(0f, 0f)), (101L, Array(0f, 1f)))
      .toDF("qid", "qvec")
    val corpus = Seq(
      (1L, Array(0f, 2f)),   // sim 1 vs the non-degenerate bench vector
      (2L, Array(0f, 0f)))   // zero-norm corpus row -> null, unflagged
      .toDF("cid", "cvec")
    val out = Similarity.decontaminateByEmbedding(spark, corpus, bench, 0.9)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getBoolean(2)))
      .sortBy(_._1)
    assert(out(0) == ((1L, Some(1.0), true)))
    assert(out(1) == ((2L, None, false)))
    // all-zero-norm bench behaves exactly like an empty bench
    val zb = Seq((100L, Array(0f, 0f))).toDF("qid", "qvec")
    val out2 = Similarity.decontaminateByEmbedding(spark,
      corpus.filter($"cid" === 1L), zb, 0.5).collect()
    assert(out2.head.isNullAt(1) && !out2.head.getBoolean(2))
  }

  // --- AUC long-domain rank doubling ------------------------------------
  test("rocAuc doubled rank is computed in long (column dtype)") {
    val df = Seq(("g", 1.0, true), ("g", 2.0, false), ("g", 3.0, true))
      .toDF("grp", "score", "lbl")
    val out = Metrics.rocAuc(df, "grp", "score", "lbl")
    val auc = out.collect().head.getAs[Double]("auc")
    // positives at ranks 1 and 3 vs one negative: U = 1 of 2 -> 0.5
    assert(auc == 0.5)
    // the s2 feeding column must be LongType end to end (no int wrap)
    val r2Type = df.withColumn("_r2",
        lit(2L) * org.apache.spark.sql.functions.rank()
          .over(org.apache.spark.sql.expressions.Window
            .partitionBy($"grp").orderBy($"score")).cast("long"))
      .schema("_r2").dataType
    assert(r2Type == org.apache.spark.sql.types.LongType)
  }

  // --- containment hot-token chunking -----------------------------------
  test("containment pairs identical under a pathological hot token " +
      "whatever the chunk cap") {
    // 40 docs all sharing the shingle "hot"; several real containments
    val docs: Seq[(Long, String)] =
      (1L to 40L).map(i => i -> s"hot u$i v$i w$i x$i") ++ Seq(
        101L -> "hot a b c",
        102L -> "hot a b c d e f g",
        103L -> "a b")
    def run(cap: Int): Set[(Long, Long, Int)] =
      Dedup.containmentPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", 1, 1, 2, chunkCap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = run(4096)
    assert(full.contains((101L, 102L, 4)))        // "hot a b c" ⊂ 102
    assert(run(2) == full)                        // heavy chunking: lossless
    assert(run(7) == full)
  }

  test("chunked posting buckets are bounded for a hot token") {
    // one token with df=1000 against cap 50: every hash-salted bucket
    // stays far below the unchunked 1000-element array (deterministic —
    // xxhash64 salting — so this asserts a reproducible occupancy)
    val flagged = (1L to 1000L).map(p => ("hot", 1000, p))
      .toDF("tok", "df", "packed")
    val sizes = Dedup.chunkedPostings(flagged, 50)
      .select(size($"bucket").as("n")).collect().map(_.getInt(0))
    assert(sizes.sum == 1000)
    assert(sizes.length == 20)                    // ceil(1000/50) chunks
    assert(sizes.max <= 150, s"max bucket ${sizes.max}")
    // a small token is untouched: single chunk, intact bucket
    val small = Seq(("t", 3, 1L), ("t", 3, 2L), ("t", 3, 3L))
      .toDF("tok", "df", "packed")
    val one = Dedup.chunkedPostings(small, 50).collect()
    assert(one.length == 1 &&
      one.head.getSeq[Long](one.head.fieldIndex("bucket")).size == 3)
  }

  // --- URL canonicalization ---------------------------------------------
  test("canonicalize: tracking, fragments, www, slashes, param order") {
    import graft.operators.UrlOps
    val cases = Seq(
      // tracking stripped, params sorted, fragment dropped
      ("https://www.Ex.com/a/1/?b=2&utm_source=x&a=1#frag",
        "http://ex.com/a/1?a=1&b=2"),
      // empty path -> "/", gclid dropped, empty query dropped
      ("http://site.org?gclid=zz", "http://site.org/"),
      // already canonical is a fixed point
      ("http://ex.com/a/1?a=1&b=2", "http://ex.com/a/1?a=1&b=2"))
    val out = cases.map(_._1).toDF("url")
      .select(UrlOps.canonicalize($"url").as("c"))
      .collect().map(_.getString(0))
    assert(out.toSeq == cases.map(_._2))
    // idempotence on the synthesized corpus shapes
    val urls = Seq("https://www.s.example.com/a/3/?b=1&a=2&utm_source=x#frag")
      .toDF("url").select(UrlOps.canonicalize($"url").as("c1"))
      .select($"c1", UrlOps.canonicalize($"c1").as("c2")).collect().head
    assert(urls.getString(0) == urls.getString(1))
  }

  // --- PRF pseudonymization ---------------------------------------------
  test("pseudonym: injective, stable, key never leaks") {
    import graft.operators.Privacy
    val ids = (1L to 2000L).toDF("id")
      .select($"id", Privacy.pseudonym($"id", "user_", 7L).as("p"))
    assert(ids.select("p").distinct().count() == 2000)   // bijection mod p
    val one = ids.filter($"id" === 42L).collect().head.getString(1)
    assert(one.startsWith("user_") && one.length == 15)  // 10-digit pad
    // stable across evaluations
    val again = (42L to 42L).toDF("id")
      .select(Privacy.pseudonym($"id", "user_", 7L)).collect().head.getString(0)
    assert(again == one)
    // different seed -> different token space
    val otherSeed = (42L to 42L).toDF("id")
      .select(Privacy.pseudonym($"id", "user_", 8L)).collect().head.getString(0)
    assert(otherSeed != one)
  }

  // --- hashed linear scorer ---------------------------------------------
  test("linearScore: zero-shuffle integer logit, empty docs score 0") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "hello world"), (2L, ""), (3L, "  "),
      (4L, "hello hello")).toDF("doc_id", "text")
    val out = TextAnalysis.linearScore(docs, "doc_id", "text", buckets = 64)
      .orderBy("doc_id").collect()
    assert(out.length == 4)
    // empty / whitespace-only docs: no tokens, logit 0, kept
    assert(out(1).getInt(1) == 0 && out(1).getLong(2) == 0L)
    assert(out(2).getInt(1) == 0 && out(2).getLong(2) == 0L)
    // the logit is additive over occurrences: "hello hello" = 2×"hello"
    val hh = out(3).getLong(2)
    val hOnly = TextAnalysis.linearScore(
      Seq((9L, "hello")).toDF("doc_id", "text"), "doc_id", "text", 64)
      .collect().head.getLong(2)
    assert(hh == 2 * hOnly)
    // keep flag is exactly logit >= 0
    assert(out.forall(r => r.getBoolean(3) == (r.getLong(2) >= 0)))
    // no shuffle in the plan: map-side only
    val plan = TextAnalysis.linearScore(docs, "doc_id", "text", 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  // --- matryoshka truncation audit --------------------------------------
  test("matryoshkaRecall: full-width truncation is a perfect-recall " +
      "fixed point; narrow truncation stays in [0,1]") {
    import graft.operators.Similarity
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(d => ((i * 7 + d * 13) % 19).toFloat - 9f))
    }.toDF("vec_id", "embedding")
    val full = Similarity.matryoshkaRecall(vecs, truncDims = 8, k = 3,
      queryMod = 10).collect()
    assert(full.nonEmpty)
    assert(full.forall(_.getAs[Double]("recall") == 1.0))
    val narrow = Similarity.matryoshkaRecall(vecs, truncDims = 2, k = 3,
      queryMod = 10).collect()
    assert(narrow.forall { r =>
      val rec = r.getAs[Double]("recall"); rec >= 0.0 && rec <= 1.0 })
  }

  // --- randomized invariants for the round-6 operators -------------------
  test("canonicalize is idempotent over randomized messy URLs") {
    val rnd = new scala.util.Random(606L)
    val urls = (1 to 200).map { _ =>
      val scheme = if (rnd.nextBoolean()) "http" else "https"
      val www = if (rnd.nextBoolean()) "www." else ""
      val host = s"h${rnd.nextInt(20)}.example.org"
      val path = (0 until rnd.nextInt(3)).map(_ => s"p${rnd.nextInt(9)}")
        .mkString("/", "/", if (rnd.nextBoolean()) "/" else "")
      val params = new scala.util.Random(rnd.nextLong()).shuffle(List(
        s"z=${rnd.nextInt(5)}", s"a=${rnd.nextInt(5)}",
        "utm_campaign=c", "fbclid=f").take(1 + rnd.nextInt(4)))
      val frag = if (rnd.nextBoolean()) "#x" else ""
      s"$scheme://$www$host$path?${params.mkString("&")}$frag"
    }
    val once = urls.toDF("u")
      .select(graft.operators.UrlOps.canonicalize($"u").as("c1"))
    val twice = once
      .select($"c1", graft.operators.UrlOps.canonicalize($"c1").as("c2"))
      .collect()
    assert(twice.forall(r => r.getString(0) == r.getString(1)))
    // canonical forms never retain tracking params or fragments
    assert(twice.forall { r =>
      val c = r.getString(0)
      !c.contains("utm_") && !c.contains("fbclid") && !c.contains("#")
    })
  }

  test("containment pairs are chunk-cap invariant on random corpora") {
    val rnd = new scala.util.Random(607L)
    (1 to 3).foreach { trial =>
      val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "hot")
      val docs = (1L to 30L).map { i =>
        val n = 2 + rnd.nextInt(6)
        // every doc carries the hot token => one pathological bucket
        val ws = "hot" +: Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
        (i, ws.mkString(" "))
      }
      def run(cap: Int) =
        graft.operators.Dedup.containmentPairs(docs.toDF("doc_id", "text"),
            "doc_id", "text", 1, 1, 2, chunkCap = cap)
          .select("a", "b", "common").as[(Long, Long, Int)]
          .collect().toSet
      val ref = run(4096)
      assert(run(3) == ref, s"trial $trial: cap=3 diverged")
      assert(run(1) == ref, s"trial $trial: cap=1 diverged")
    }
  }

  // --- calibration decimal scale ----------------------------------------
  test("calibrationBins scoreScale=18 keeps probability precision") {
    // scores quantized at 0.01 would bias this mean by ~0.005
    val df = Seq((0.105, true), (0.115, false), (0.125, true), (0.135, false))
      .toDF("p", "y")
    val out = Metrics.calibrationBins(df, "p", "y", bins = 1, scoreScale = 18)
      .collect().head
    assert(out.getAs[Double]("mean_score") == 0.12)
    // the default scale still matches the registered money-query shape
    val money = Metrics.calibrationBins(df, "p", "y", bins = 1)
      .collect().head
    // at scale 2: 0.11 + 0.12 + 0.13 + 0.14 = 0.50 -> mean 0.125
    assert(money.getAs[Double]("mean_score") == 0.125)
  }
}
