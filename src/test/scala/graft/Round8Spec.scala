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

  // --- canonicalByQuality: missing scores lose ties, never vanish -------
  test("canonicalByQuality: unscored members kept, lose to any score") {
    val clusters = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    // doc 2 unscored; cluster 10 entirely unscored
    val scores = Seq((1L, -5L)).toDF("doc_id", "logit")
    val out = graft.operators.DuplicateClusters
      .canonicalByQuality(clusters, scores)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(3)))
    // every member still present; scored doc 1 beats unscored doc 2
    // even at logit -5; all-unscored cluster 10 elects min id
    assert(out.toSeq == Seq((1L, true), (2L, false),
      (10L, true), (11L, false)))
    // one-keeper-per-cluster invariant under partial coverage
    val keepers = graft.operators.DuplicateClusters
      .canonicalByQuality(clusters, scores)
      .filter(col("keep")).groupBy("cluster_id").count()
      .filter(col("count") =!= 1).count()
    assert(keepers == 0)
  }

  // --- welchTTest range guards ------------------------------------------
  test("welchTTest: out-of-contract inputs fail loudly, not silently") {
    // q_a+q_b blows the 1.8e14 exact-Long staging cap with a tiny arm
    // (the advisory's window) while staying inside the Σx²
    // accumulator's own (28,4) range, so the guard — not a bare ANSI
    // cast overflow — is what fires
    val wide = Seq((true, 9.0e6), (true, -9.0e6),
      (false, 9.0e6), (false, 8.0e6)).toDF("arm", "v")
    val e = intercept[Exception] {
      graft.operators.Metrics.welchTTest(wide, "arm", "v").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("welchTTest")))
    // and an in-contract frame still publishes (regression guard)
    val ok = Seq((true, 10.0), (true, 12.0), (false, 9.0), (false, 8.5))
      .toDF("arm", "v")
    val row = graft.operators.Metrics.welchTTest(ok, "arm", "v").collect()
    assert(row.length == 1 && !row(0).isNullAt(5))
  }

  // --- benchmarkNgramContamination: restructured single-pass form -------
  test("benchmark decontam: self-exclusion and bench-vs-bench hits") {
    // docs 0 and 97 are bench ("% 97"); 1 shares a 3-gram with 0;
    // 2 shares nothing; 0 and 97 share one 3-gram with each other
    val df = Seq(
      (0L, "alpha beta gamma delta"),
      (97L, "alpha beta gamma zeta"),
      (1L, "x alpha beta gamma y"),
      (2L, "p q r s t")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.benchmarkNgramContamination(
        df, "doc_id", "text", col("doc_id") % 97 === 0, n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2),
        r.getLong(3), r.getBoolean(5)))
    // doc 0: 2 grams, "alpha beta gamma" also in doc 97 -> 1 hit, but
    // is_bench so never flagged; doc 97 symmetric
    assert(out(0) == ((0L, true, 2L, 1L, false)))
    assert(out(1) == ((1L, false, 3L, 1L, true)))
    assert(out(2) == ((2L, false, 3L, 0L, false)))
    assert(out(3) == ((97L, true, 2L, 1L, false)))
  }

  // --- audioFrameEnergy: frame arithmetic + VAD semantics ---------------
  test("audioFrameEnergy: frame count, exact energies, silence inactive") {
    import graft.functions.AudioCodec
    // doc 1: 40 samples alternating ±2000 (loud); doc 2: 20 samples of
    // ±1 (near-silence); doc 3: 10 samples (shorter than one frame)
    val loud = Array.tabulate(40)(i => if (i % 2 == 0) 2000 else -2000)
    val quiet = Array.tabulate(20)(i => if (i % 2 == 0) 1 else -1)
    val payloads = Seq(
      (1L, AudioCodec.encodeWavPcm16(8000, 1, loud)),
      (2L, AudioCodec.encodeWavPcm16(8000, 1, quiet)),
      (3L, AudioCodec.encodeWavPcm16(8000, 1, Array.fill(10)(5)))
    ).toDF("doc_id", "payload")
    val out = graft.operators.Multimodal
      .audioFrameEnergy(spark, payloads, frameLen = 16, hop = 8,
        thr = 333000L)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    // doc 1: (40-16)/8+1 = 4 frames, each 16·2000² = 64e6, active
    assert(out.keys.count(_._1 == 1L) == 4)
    (0 until 4).foreach(f => assert(out((1L, f)) == ((64000000L, true))))
    // doc 2: 1 frame of 16·1 = 16, inactive
    assert(out.keys.count(_._1 == 2L) == 1)
    assert(out((2L, 0)) == ((16L, false)))
    // doc 3: shorter than a frame -> zero rows
    assert(!out.keys.exists(_._1 == 3L))
  }

  // --- imageDHash: reference bits + uniform-brightness invariance -------
  test("imageDHash: matches a reference computation and shrugs off brightness") {
    import graft.functions.ImageCodec
    val rnd = new scala.util.Random(108)
    val img = ImageCodec.Image(20, 15,
      Array.fill(300)((rnd.nextInt(128) << 16) | (rnd.nextInt(128) << 8) |
        rnd.nextInt(128))) // channels < 128: +0x40 can never carry
    def refHash(im: ImageCodec.Image): (Long, Long) = {
      val small = ImageCodec.resizeNearest(im, 9, 8)
      val gray = small.rgb.map(ImageCodec.luma)
      var hash = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        if (gray(y * 9 + x + 1) > gray(y * 9 + x)) hash |= 1L << (y * 8 + x)
      (hash >>> 32, hash & 0xffffffffL)
    }
    val payloads = Seq(
      (1L, ImageCodec.encodePng(img)),
      (2L, ImageCodec.encodeBmp24(img)),
      // +64 on every channel: all pairwise gray comparisons unchanged
      (3L, ImageCodec.encodePng(ImageCodec.Image(img.width, img.height,
        img.rgb.map(px => px + 0x404040)))),
      (4L, "not an image".getBytes.padTo(64, 0.toByte))
    ).toDF("doc_id", "payload")
    val out = graft.operators.Multimodal.imageDHash(spark, payloads)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    val (hi, lo) = refHash(img)
    assert(out(1L) == ((hi, lo, true)))
    assert(out(2L) == ((hi, lo, true)))  // same pixels, other container
    assert(out(3L)._1 == hi && out(3L)._2 == lo) // brightness-invariant
    assert(out(4L) == ((0L, 0L, false)))
  }

  // --- plan shapes: decode runs ONCE; codec queries stay map-only -------
  test("q218 plans one decode pass; q214-217 plan no pre-sort exchange") {
    // q218's dup_count is a window, not groupBy+self-join: the join
    // form evaluated the decode+hash MapPartitions pipeline twice
    // (broadcast + aggregate sides). Two MapPartitions = encode +
    // decode, exactly once each.
    val q218 = SparkEntry.queries("q218_image_dhash")(spark, sf)
    val plan218 = q218.queryExecution.executedPlan.toString
    assert("MapPartitions".r.findAllIn(plan218).length == 2,
      "decode pipeline duplicated")
    // the pure codec queries: single Exchange (the published ORDER BY)
    for (name <- Seq("q214_image_pixels", "q215_audio_pcm",
        "q216_gif_frames", "q217_audio_frames")) {
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert("Exchange".r.findAllIn(plan).length <= 1,
        s"$name shuffles before the publication sort")
    }
  }

  // --- sorted-neighborhood dedup (q219) ---------------------------------
  test("sortedNeighborhoodPairs: exact window pairs on a known order") {
    // keys sort as: d4(''), d2('aaa'), d1('abc'), d3('abd'), d5('zzz')
    // → positions 1..5. window=3 pairs: Δpos ∈ {1,2}.
    val docs = Seq(
      (1L, "abc x y"), (2L, "aaa x y"), (3L, "abd x y"),
      (4L, "!!!"), (5L, "zzz q r")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup
      .sortedNeighborhoodPairs(docs, "doc_id", "text", window = 3)
      .orderBy("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val pairs = out.map(t => (t._1, t._2)).toSet
    assert(pairs == Set((4L, 2L), (4L, 1L), (2L, 1L), (2L, 3L),
      (1L, 3L), (1L, 5L), (3L, 5L)))
    // positions are the global order, not ids
    val posOf = out.flatMap(t => Seq(t._1 -> t._3, t._2 -> t._4)).toMap
    assert(posOf == Map(4L -> 1L, 2L -> 2L, 1L -> 3L, 3L -> 4L, 5L -> 5L))
  }

  test("sortedNeighborhoodPairs: band join ≡ brute-force window; " +
      "partition-invariant; integer jaccard") {
    val docs = Tables.documents(spark, sf).limit(80)
    val w = 4
    val out = graft.operators.Dedup
      .sortedNeighborhoodPairs(docs, "doc_id", "text", window = w)
    // brute force: single-partition row_number (test-only), all pairs
    val keyed = docs.select(col("doc_id"),
      substring(regexp_replace(lower(col("text")), "[^a-z0-9]", ""),
        1, 16).as("k"),
      array_distinct(split(lower(col("text")), " ")).as("toks"))
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("k"), col("doc_id"))
    val ranked = keyed.coalesce(1)
      .withColumn("pos", row_number().over(win).cast("long"))
    val brute = ranked.as("a").join(ranked.as("b"),
        col("b.pos") > col("a.pos") && col("b.pos") < col("a.pos") + w)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = out.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute)
    // repartition invariance: ordinal is a pure function of the order
    val got2 = graft.operators.Dedup
      .sortedNeighborhoodPairs(docs.repartition(7), "doc_id", "text",
        window = w)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 == brute)
    // jaccard of a doc with itself would be 1e6; sanity: all in range
    val jac = out.select("jacc_ppm").collect().map(_.getLong(0))
    assert(jac.forall(j => j >= 0 && j <= 1000000))
    // no cartesian anywhere (band join is equi on the bucket claim)
    assert(!out.queryExecution.executedPlan.toString
      .contains("CartesianProduct"))
  }

  // --- Unicode-script profile (q220) ------------------------------------
  test("scriptProfile: real multi-script text, dominance, ties, none") {
    val docs = Seq(
      (1L, "hello мир"),              // 5 latin, 3 cyrillic, 1 space
      (2L, "漢字漢 abc"),             // 3 cjk, 3 latin → tie: latin wins
      (3L, "12345 !!"),               // no letters at all
      (4L, "ΑΒΓαβγ"),                 // 6 greek
      (5L, "カタカナです 42")          // 4 katakana + 2 hiragana = 6 kana
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scriptProfile(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    def row(i: Int) = out(i)
    assert(row(0).getAs[Long]("latin") == 5 &&
      row(0).getAs[Long]("cyrillic") == 3 &&
      row(0).getAs[Long]("space") == 1 &&
      row(0).getAs[String]("dominant_script") == "latin" &&
      row(0).getAs[Long]("dominant_ppm") == 625000L) // 5/8
    assert(row(1).getAs[Long]("cjk") == 3 &&
      row(1).getAs[Long]("latin") == 3 &&
      row(1).getAs[String]("dominant_script") == "latin") // canonical tie
    assert(row(2).getAs[String]("dominant_script") == "none" &&
      row(2).getAs[Long]("dominant_ppm") == 0L &&
      row(2).getAs[Long]("digit") == 5 &&
      row(2).getAs[Long]("other") == 2)
    assert(row(3).getAs[String]("dominant_script") == "greek" &&
      row(3).getAs[Long]("dominant_ppm") == 1000000L)
    assert(row(4).getAs[Long]("kana") == 6 &&
      row(4).getAs[String]("dominant_script") == "kana" &&
      row(4).getAs[Long]("n_chars") == 9)
    // map-only: no exchange other than the (absent here) publication sort
    val plan = TextAnalysis.scriptProfile(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "script profile must be map-only")
  }

  // --- Newman modularity (q221) -----------------------------------------
  test("modularity: two bridged triangles give the textbook 70/196") {
    // triangles {1,2,3} and {4,5,6} bridged by 3-4; m=7
    // per community: e_c=3, d_c=7 → q_num = 4·7·3 − 49 = 35 each,
    // q_den = 196, Q = 70/196 ≈ 0.357
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 4L)).toDF("src", "dst")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("node", "label")
    val out = graft.operators.LabelProp.modularity(edges, labels)
      .orderBy("community").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq((1L, 3L, 3L, 7L, 35L, 196L),
      (4L, 3L, 3L, 7L, 35L, 196L)))
    // reversed/duplicated directed edges canonicalize to the same graph
    val noisy = edges.unionAll(edges.select(col("dst").as("src"),
      col("src").as("dst"))).unionAll(edges)
    val out2 = graft.operators.LabelProp.modularity(noisy, labels)
      .orderBy("community").collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5)))
    assert(out2.toSeq == Seq((1L, 35L, 196L), (4L, 35L, 196L)))
    // a community with zero intra edges contributes −d_c²
    val lab2 = Seq((1L, 1L), (2L, 2L), (3L, 3L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("node", "label")
    val solo = graft.operators.LabelProp.modularity(edges, lab2)
      .orderBy("community").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(4)))
    // node 1: e=0, d=2 → −4; node 2: −4; node 3: e=0, d=3 → −9
    assert(solo.toSeq == Seq((1L, 0L, -4L), (2L, 0L, -4L),
      (3L, 0L, -9L), (4L, 3L, 35L)))
  }

  // --- audio ZCR + silence trim (q222) ----------------------------------
  test("audioSilenceProfile: crossings, trim bounds, all-silent, junk") {
    val wav1 = graft.functions.AudioCodec.encodeWavPcm16(8000, 1,
      Array(0, 50, -50, 200, 0, -300, 20, 0))
    val wav2 = graft.functions.AudioCodec.encodeWavPcm16(16000, 1,
      Array(0, 10, -20))
    val payloads = Seq((1L, wav1), (2L, wav2),
      (3L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val out = graft.operators.Multimodal
      .audioSilenceProfile(spark, payloads, silenceThr = 100)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getBoolean(8)))
    // signs FFTFFTFF → 4 crossings; |s|>=100 at idx 3,5 → lead 3,
    // trail 2, span 3; zcr_ppm = 4e6 DIV 7
    assert(out(0) == ((8L, 8000L, 4L, 571428L, 3L, 2L, 3L, true)))
    // all-silent: lead = n, trail 0, span 0; one crossing over 2 steps
    assert(out(1) == ((3L, 16000L, 1L, 500000L, 3L, 0L, 0L, true)))
    assert(out(2) == ((0L, 0L, 0L, 0L, 0L, 0L, 0L, false)))
  }

  // --- distributed suffix array (q223/q224) -----------------------------
  test("tokenSuffixRanks: prefix doubling ≡ local suffix sort; " +
      "ties preserved; partition-invariant") {
    val docs = Tables.documents(spark, sf).limit(40)
    val got = graft.operators.SuffixArray
      .tokenSuffixRanks(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // brute force: collect tokens, rank suffixes by Seq lexicographic
    val toks = docs.select(col("doc_id"),
        split(lower(col("text")), " ").as("ws")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).filter(_.nonEmpty))
    val sufs = toks.flatMap { case (id, ws) =>
      (1 to ws.length).map(i => ((id, i.toLong), ws.drop(i - 1)))
    }
    implicit val ord: Ordering[Seq[String]] = Ordering.Implicits
      .seqOrdering(Ordering.String)
    val sorted = sufs.map(_._2).distinct.sorted
    val rankOf = sorted.zipWithIndex.map { case (s, i) => s -> (i + 1L) }
      .toMap
    val expect = sufs.map { case (key, s) => key -> rankOf(s) }.toMap
    assert(got == expect)
    // partition invariance
    val got2 = graft.operators.SuffixArray
      .tokenSuffixRanks(docs.repartition(7), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got2 == expect)
  }

  test("repeatedSpans: verbatim repeat found with exact span and count") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a sentence then the quick brown fox jumps over a fence"),
      (3L, "unrelated words entirely here")
    ).toDF("doc_id", "text")
    val out = graft.operators.SuffixArray
      .repeatedSpans(docs, "doc_id", "text", minSpan = 2, topK = 10)
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // longest shared span: "the quick brown fox jumps over" (6 tokens)
    // — an adj LCP between the two suffixes starting at it
    val top = out.head
    assert(top._1 == "adj" && top._2 == 6L)
    // its representative is doc 1 off 1 or doc 2 off 4 (rank order
    // decides which is 'a'); both start the same 6-token run
    assert((top._4, top._5) == ((1L, 1L)) || (top._4, top._5) == ((2L, 4L)))
    // no dup rows: no two suffixes are exactly equal in this fixture
    assert(out.forall(_._1 == "adj"))
  }

  test("repeatedSpans: equal whole suffixes appear as dup tie groups") {
    val docs = Seq(
      (1L, "alpha beta gamma common tail tokens"),
      (2L, "totally different start common tail tokens")
    ).toDF("doc_id", "text")
    val out = graft.operators.SuffixArray
      .repeatedSpans(docs, "doc_id", "text", minSpan = 2, topK = 10)
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    // "common tail tokens" (3), "tail tokens" (2) are equal suffixes
    // in both docs → dup groups of size 2 with exact spans
    assert(out.contains(("dup", 3L, 2L)))
    assert(out.contains(("dup", 2L, 2L)))
  }

  // --- Fellegi–Sunter record linkage (q225) -----------------------------
  test("fellegiSunter: blocked pairs, weights, nulls disagree, thresholds") {
    import graft.operators.RecordLinkage.{Field, fellegiSunter}
    val a = Seq((1L, 10L, Some("x"), 5L), (2L, 10L, None, 7L),
      (3L, 20L, Some("y"), 5L)).toDF("id", "blk", "f1", "f2")
    val b = Seq((101L, 10L, Some("x"), 5L), (102L, 10L, Some("z"), 7L),
      (103L, 30L, Some("y"), 5L)).toDF("id", "blk", "f1", "f2")
    val out = fellegiSunter(a, "id", b, "id", Seq("blk"),
        Seq(Field("f1", 1000L, -500L), Field("f2", 600L, -200L)),
        upperMilli = 1200L, lowerMilli = 0L)
      .orderBy("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getLong(4), r.getString(5)))
    // block 10: pairs (1,101) (1,102) (2,101) (2,102); block 20/30: none
    assert(out.length == 4)
    assert(out(0) == ((1L, 101L, true, true, 1600L, "match")))
    assert(out(1) == ((1L, 102L, false, false, -700L, "non_match")))
    // null f1 on a-side: disagrees even against a real value
    assert(out(2) == ((2L, 101L, false, false, -700L, "non_match")))
    assert(out(3) == ((2L, 102L, false, true, 100L, "possible")))
    // plan: blocked equi-join only — no cartesian
    val plan = fellegiSunter(a, "id", b, "id", Seq("blk"),
        Seq(Field("f1", 1L, 0L)), 1L, 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  // --- product quantization (q226/q227) ---------------------------------
  test("pq: separable clusters recover their centroids; qerr exact") {
    import graft.operators.Quantization
    // 2 subspaces × 2 dims, k=2, seeds (ids 1,2) in DIFFERENT
    // clusters per subspace so Lloyd separates and the floor-means
    // are hand-computable.
    val vecs = Seq(
      (1L, Seq(0L, 2L, 100L, 100L)),
      (2L, Seq(102L, 98L, 0L, 2L)),
      (3L, Seq(2L, 0L, 98L, 102L)),
      (4L, Seq(100L, 100L, 2L, 0L))
    ).toDF("id", "q")
    val cb = Quantization.pqTrain(vecs, subspaces = 2, subDim = 2,
      k = 2, iters = 2)
    val cbMap = cb.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    // subspace 0: {1,3} → (1,1); {2,4} → (101,99)
    // subspace 1: {1,3} → (99,101); {2,4} → (1,1)
    assert(cbMap((0, 0L)) == Seq(1L, 1L))
    assert(cbMap((0, 1L)) == Seq(101L, 99L))
    assert(cbMap((1, 0L)) == Seq(99L, 101L))
    assert(cbMap((1, 1L)) == Seq(1L, 1L))
    val codes = Quantization.pqCodes(vecs, cb, 2, 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every vector sits 2 units² off each subspace centroid → qerr 4
    assert(codes.toSeq == Seq((1L, 0L, 0L, 4L), (2L, 1L, 1L, 4L),
      (3L, 0L, 0L, 4L), (4L, 1L, 1L, 4L)))
  }

  test("pq ADC distance equals exact distance to the reconstruction") {
    import graft.operators.Quantization
    val qv = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"),
        graft.operators.Similarity.quantize16(col("embedding")).as("q"))
      .limit(60).localCheckpoint()
    val cb = Quantization.pqTrain(qv, 8, 8, k = 4, iters = 2)
    val adc = Quantization.pqAdcTopK(
      qv.filter(col("id") % 10 === 0).select(col("id").as("qid"),
        col("q")), qv, cb, 8, 8, k = 3)
    // reconstruction: codes → concatenated centroids, exact L2 from
    // the query's real q — must equal adc_d2 row for row
    val codes = Quantization.pqCodes(qv, cb, 8, 8)
    val cbm = cb.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    val qm = qv.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val cm = codes.collect().map(r => r.getLong(0) ->
      (0 until 8).map(s => r.getLong(1 + s))).toMap
    adc.collect().foreach { r =>
      val (qid, nid, d2) = (r.getLong(0), r.getLong(2), r.getLong(3))
      val rec = (0 until 8).flatMap(s => cbm((s, cm(nid)(s))))
      val exact = qm(qid).zip(rec).map { case (a, b) =>
        (a - b) * (a - b) }.sum
      assert(d2 == exact, s"ADC mismatch for ($qid,$nid)")
    }
  }

  // --- banded dHash image near-dup (q228) -------------------------------
  test("imageNearDupPairs: pigeonhole recall at ham<=3, exact counts") {
    def row(id: Long, hi: Long, lo: Long) = (id, hi, lo, true)
    val hashes = Seq(
      row(1, 0x00010002L, 0x00030004L),
      row(2, 0x00010002L, 0x00030004L),   // exact dup of 1 → same hash
      row(3, 0x00010002L, 0x00030005L),   // ham 1 from hash(1)
      row(4, 0x00110002L, 0x00030104L),   // ham 2 (two bands touched)
      row(5, 0x80018002L, 0x80038004L),   // ham 4, all four bands differ
      (6L, 0L, 0L, false)                  // undecoded: excluded
    ).toDF("doc_id", "dhash_hi", "dhash_lo", "decoded")
    val out = graft.operators.Multimodal.imageNearDupPairs(hashes)
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)), (r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getBoolean(9)))).toMap
    // distinct hashes: h1(n=2, rep=1), h3, h4, h5 — pairs by rep
    def ham(a: (Long, Long), b: (Long, Long)) =
      java.lang.Long.bitCount(a._1 ^ b._1) +
        java.lang.Long.bitCount(a._2 ^ b._2)
    val hs = Map(1L -> (0x00010002L, 0x00030004L),
      3L -> (0x00010002L, 0x00030005L), 4L -> (0x00110002L, 0x00030104L),
      5L -> (0x80018002L, 0x80038004L))
    // pigeonhole: every ham<=3 pair MUST be in the result
    for (a <- hs.keys; b <- hs.keys if a < b) {
      val d = ham(hs(a), hs(b))
      val key = (hs(a)._1, hs(a)._2, hs(b)._1, hs(b)._2)
      if (d <= 3) assert(out.contains(key), s"missing ham-$d pair $a-$b")
      out.get(key).foreach { v =>
        assert(v._5 == d, "hamming exact")
        assert(v._6 == (d <= 3), "is_near flag")
      }
    }
    // the exact-dup group collapsed: pair (h1,h3) carries n_a=2
    val p13 = out((0x00010002L, 0x00030004L, 0x00010002L, 0x00030005L))
    assert(p13._1 == 1L && p13._2 == 3L) // reps
    assert((p13._3, p13._4) == ((2L, 1L)))
    // hash 5 differs in ALL bands from hash 1 → no shared band → absent
    assert(!out.contains((0x00010002L, 0x00030004L, 0x80018002L,
      0x80038004L)))
  }

  // --- farthest-point coreset (q229) ------------------------------------
  test("farthestPointSample: greedy ≡ brute force, radii non-increasing") {
    val qv = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"),
        graft.operators.Similarity.quantize16(col("embedding")).as("q"))
      .limit(50).localCheckpoint()
    val k = 6
    val out = graft.operators.Coreset.farthestPointSample(qv, k)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // brute-force replay on the driver
    val all = qv.collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
      .sortBy(_._1)
    def d2(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var centers = Vector(all.head)
    var expect = Vector((0, all.head._1, 0L))
    (1 until k).foreach { r =>
      val best = all.map { case (id, v) =>
        (id, centers.map(c => d2(v, c._2)).min)
      }.minBy { case (id, md) => (-md, id) }
      centers :+= all.find(_._1 == best._1).get
      expect :+= ((r, best._1, best._2))
    }
    assert(out.toSeq == expect)
    // coverage radius never increases after the seed row
    val radii = out.drop(1).map(_._3)
    assert(radii.zip(radii.drop(1)).forall { case (a, b) => b <= a })
    // the chosen ids are distinct
    assert(out.map(_._2).distinct.length == k)
  }

  // --- JL projection audit (q230) ---------------------------------------
  test("jlDistanceAudit: exact projection math, concentration, identity") {
    import graft.operators.Similarity
    val qv = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"),
        Similarity.quantize16(col("embedding")).as("q"))
      .limit(60).localCheckpoint()
    val out = Similarity.jlDistanceAudit(qv, 64, 16, pairMod = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    // replay one pair by hand with the same PRF signs
    val qm = qv.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val (aId, bId, d2o, d2p, ratio) = out.minBy(_._1)
    def proj(v: Seq[Long]): Seq[Long] = (0 until 16).map { j =>
      (0 until 64).map(d =>
        Similarity.portablePlaneSign(j, d).toLong * v(d)).sum
    }
    val d2oExp = qm(aId).zip(qm(bId)).map { case (x, y) =>
      (x - y) * (x - y) }.sum
    val d2pExp = proj(qm(aId)).zip(proj(qm(bId))).map { case (x, y) =>
      (x - y) * (x - y) }.sum
    assert((d2o, d2p) == ((d2oExp, d2pExp)))
    assert(ratio == (if (d2oExp > 0) 1000 * d2pExp / (16 * d2oExp) else 0L))
    // JL concentration: the median ratio is near 1000 (±1 projections
    // concentrate; a systematic bug would shift everything)
    val ratios = out.map(_._5).sorted
    val median = ratios(ratios.length / 2)
    assert(median > 500 && median < 1800, s"median ratio $median")
    // identical vectors project identically: d2_orig 0 → d2_proj 0
    out.filter(_._3 == 0L).foreach(p => assert(p._4 == 0L))
  }

  // --- Luhn PII scan (q231) ---------------------------------------------
  test("luhnScan: known card numbers validate, off-by-one fails, counts") {
    val docs = Seq(
      (1L, "pay with 4532015112830366 now"),      // valid Visa test PAN
      (2L, "pay with 4532015112830367 now"),      // check digit off by 1
      (3L, "two: 4532015112830366 and 379254132582832"), // AmEx-ish 15d
      (4L, "short 123456789012 run"),             // 12 digits: no match
      (5L, "no digits at all")
    ).toDF("doc_id", "text")
    val out = graft.operators.Privacy.luhnScan(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out(0) == ((1L, 1L, true)))
    assert(out(1) == ((1L, 0L, false)))
    // 379254132582832: compute expected validity with a reference Luhn
    def luhn(s: String): Boolean = {
      val sum = s.reverse.zipWithIndex.map { case (c, i) =>
        val d = c - '0'
        if (i % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t } else d
      }.sum
      sum % 10 == 0
    }
    val expected3 = 1L + (if (luhn("379254132582832")) 1L else 0L)
    assert(out(2) == ((2L, expected3, true)))
    assert(out(3) == ((0L, 0L, false)))
    assert(out(4) == ((0L, 0L, false)))
    // plan: map-only
    val plan = graft.operators.Privacy.luhnScan(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  // --- Hilbert curve (q232) ---------------------------------------------
  test("hilbertIndex: bijection and unit-step adjacency on the 16x16 grid") {
    val pts = for (x <- 0 until 16; y <- 0 until 16)
      yield (x.toLong, y.toLong)
    val got = pts.toDF("x", "y")
      .withColumn("h",
        graft.operators.ZOrder.hilbertIndex(col("x"), col("y"), 4))
      .collect().map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1)))
      .toMap
    // bijection onto [0, 256)
    assert(got.keySet == (0L until 256L).toSet)
    // the defining Hilbert property: consecutive indices are adjacent
    (0L until 255L).foreach { d =>
      val (ax, ay) = got(d); val (bx, by) = got(d + 1)
      assert(math.abs(ax - bx) + math.abs(ay - by) == 1,
        s"cells $d and ${d + 1} not adjacent")
    }
    // matches the imperative reference walk
    def ref(n: Int, x0: Int, y0: Int): Long = {
      var (x, y, d) = (x0, y0, 0L); var s = n / 2
      while (s > 0) {
        val rx = if ((x & s) > 0) 1 else 0
        val ry = if ((y & s) > 0) 1 else 0
        d += s.toLong * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    pts.foreach { case (x, y) =>
      assert(got.exists { case (d, p) => p == ((x, y)) &&
        d == ref(16, x.toInt, y.toInt) })
    }
  }

  // --- portable HLL registers (q233) ------------------------------------
  test("hllRegisters: hand-checked ranks, mergeability, usable estimate") {
    import graft.operators.Sketches
    // hand-check: key k → h = (k·1000003 + 12345) mod 1e9+7
    def refReg(k: Long): (Long, Long) = {
      val h1 = (k * 1000003L + 12345L) % 1000000007L
      val h = (h1 * h1 + 17L) % 1000000007L
      val w = h / 64
      val rho = if (w == 0) 25L
        else (1 to 24).find(r => w >= (1L << (24 - r))).get.toLong
      (h % 64, rho)
    }
    val keys = Seq(0L, 1L, 7L, 123456L, 999999937L)
    val df = keys.map(k => ("g", k)).toDF("grp", "key")
    val out = Sketches.hllRegisters(df, "grp", "key")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val expect = keys.map(refReg).groupBy(_._1)
      .map { case (reg, rs) => reg -> rs.map(_._2).max }
    assert(out == expect)
    // mergeability: registers over a union = elementwise max of parts
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("grp"),
        col("l_partkey").as("key")).localCheckpoint()
    val whole = Sketches.hllRegisters(li, "grp", "key")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val p1 = Sketches.hllRegisters(li.filter(col("key") % 2 === 0),
      "grp", "key").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val p2 = Sketches.hllRegisters(li.filter(col("key") % 2 =!= 0),
      "grp", "key").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (p1.keySet ++ p2.keySet).map { k =>
      k -> math.max(p1.getOrElse(k, 0L), p2.getOrElse(k, 0L))
    }.toMap
    assert(merged == whole)
    // the registers carry a usable cardinality signal: the raw HLL
    // estimate from the registers lands within 25% of exact
    val exact = li.select("grp", "key").distinct()
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      val regs = (0 until 64).map(r =>
        whole.getOrElse((g, r.toLong), 0L))
      val z = regs.map(r => math.pow(2.0, -r.toDouble)).sum
      val est = 0.709 * 64 * 64 / z
      assert(math.abs(est - n) <= 0.25 * n,
        s"group $g: est $est vs exact $n")
    }
  }

  // --- confusable skeleton (q234) ---------------------------------------
  test("confusableSkeleton: the paypal splice, clean Cyrillic, skeleton join") {
    val docs = Seq(
      (1L, "pay with pаypаl today"),  // Cyrillic а spliced
      (2L, "привет мир"),
        // "привет мир": pure Cyrillic, has confusables (е,р,и?) but no
        // Latin letters → NOT suspicious
      (3L, "pay with paypal today"),            // clean Latin
      (4L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.confusableSkeleton(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getBoolean(3)))
    assert(out(0)._1 == 2L && out(0)._3 == true)
    // spoofed text folds onto the clean skeleton — the dedup join key
    assert(out(0)._2 == "pay with paypal today")
    assert(out(0)._2 == out(2)._2)
    // pure-Cyrillic doc: е/р are confusable but no Latin → clean
    assert(out(1)._1 > 0L && out(1)._3 == false)
    assert(out(2) == ((0L, "pay with paypal today", false)))
    assert(out(3) == ((0L, "", false)))
  }

  // --- padding audit (q235) ---------------------------------------------
  test("paddingAudit: exact waste per sorted batch, ragged tail") {
    // lengths: 1,1,2,3,5 words → sorted batches of 2: [1,1] [2,3] [5]
    val docs = Seq(
      (1L, "a"), (2L, "b"), (3L, "a b"), (4L, "a b c"),
      (5L, "a b c d e")
    ).toDF("doc_id", "text")
    val out = graft.operators.Curation
      .paddingAudit(docs, "doc_id", "text", batchSize = 2)
      .orderBy("batch").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (0L, 2L, 1L, 2L, 0L, 0L),          // [1,1]: zero waste
      (1L, 2L, 3L, 5L, 1L, 166666L),     // [2,3]: 1 pad of 6 slots
      (2L, 1L, 5L, 5L, 0L, 0L)))         // ragged [5]: zero waste
    // sorted batching never wastes more than arrival order: total
    // padding is minimal for contiguous batches of a sorted sequence
    val total = out.map(_._5).sum
    assert(total == 1L)
  }

  // --- HITS (q236) ------------------------------------------------------
  test("hits: star graph separates the hub from the authorities") {
    // node 0 points at 1,2,3; nothing points back: 0 is the only hub,
    // 1-3 are equal authorities, and hub/authority sets are disjoint
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val out = graft.operators.PageRank.hits(edges, iters = 2)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out(0) == ((0L, 0L, 1000000L)))          // pure hub
    assert(out(1) == ((1L, 333333L, 0L)))           // equal authorities
    assert(out(2) == ((2L, 333333L, 0L)))
    assert(out(3) == ((3L, 333333L, 0L)))
    // a co-citation graph: 0 and 4 both point at {1,2}; adding a
    // stray edge 4->9 makes 4 a broader hub but splits its weight
    val edges2 = Seq((0L, 1L), (0L, 2L), (4L, 1L), (4L, 2L), (4L, 9L))
      .toDF("src", "dst")
    val out2 = graft.operators.PageRank.hits(edges2, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // 1 and 2 tie as authorities and beat 9 (endorsed by both hubs)
    assert(out2(1L)._1 == out2(2L)._1 && out2(1L)._1 > out2(9L)._1)
    // both pure hubs, zero authority
    assert(out2(0L)._1 == 0L && out2(4L)._1 == 0L)
    assert(out2(0L)._2 > 0L && out2(4L)._2 > 0L)
  }

  // --- corpus data card (q237) ------------------------------------------
  test("corpusReport: exact counts on a crafted corpus") {
    val docs = Seq(
      (1L, "a b c", "en", "s1"),
      (2L, "a b c", "en", "s2"),     // exact dup of 1
      (3L, "A b C", "de", "s1"),     // dup after lowercasing
      (4L, "", "en", "s1"),          // empty
      (5L, "x y", "fr", "s3")
    ).toDF("doc_id", "text", "lang", "source")
    val out = graft.operators.Curation
      .corpusReport(docs, "doc_id", "text", "lang", "source")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map(
      "n_docs" -> 5L, "n_sources" -> 3L, "n_langs" -> 3L,
      "n_empty_docs" -> 1L, "total_tokens" -> 11L,
      "total_chars" -> 18L, "distinct_texts" -> 3L,
      "exact_dup_docs" -> 2L, "max_tokens" -> 3L, "min_tokens" -> 0L,
      "mean_tokens_ppm" -> 2200000L))
    // one shuffle only: single aggregation, no joins/windows
    val plan = graft.operators.Curation
      .corpusReport(docs, "doc_id", "text", "lang", "source")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"))
  }
}
