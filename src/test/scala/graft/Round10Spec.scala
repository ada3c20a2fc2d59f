package graft

import org.apache.spark.sql.functions._

/** Round-10 session specs. */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  // --- Rabin–Karp window fingerprints (q240 rework) -------------------------

  test("windowFingerprints: emits every valid (pos, len) exactly once, " +
      "and fingerprint equality coincides with token-text equality") {
    val docs = Seq(
      (1L, "a b c d a b c x"),
      (2L, "b c d a b z"),
      (3L, "q w e r a b c d t"),
      (4L, "a")).toDF("doc_id", "text")
    val toks = operators.SuffixArray.tokenized(docs, "doc_id", "text")
    val wsMap = toks.collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val maxLen = wsMap.values.map(_.size).max
    val lens = Seq(1, 2, 3, 4)
    val wf = operators.SuffixArray.windowFingerprints(toks, lens, maxLen)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // coverage: exactly one row per (doc, 0-based pos, len) with
    // pos + len <= docLen
    val expected = for {
      (d, ws) <- wsMap.toSeq; len <- lens
      pos <- 0 to ws.size - len
    } yield (d, pos, len)
    assert(wf.map(t => (t._1, t._2, t._3)).toSeq.sorted == expected.sorted)
    // discrimination: equal hash <=> equal token text (per len)
    val byText = wf.groupBy { case (d, pos, len, _) =>
      (len, wsMap(d).slice(pos, pos + len).mkString(" "))
    }
    for ((_, rows) <- byText)
      assert(rows.map(_._4).distinct.size == 1,
        "same text must fingerprint identically")
    val textToH = byText.map { case (k, rows) => k -> rows.head._4 }
    assert(textToH.values.toSeq.distinct.size == textToH.size,
      "distinct texts must fingerprint distinctly on this fixture")
  }

  test("spanFingerprints: the mined-side fold equals the window-side " +
      "prefix-sum fingerprint at the span's own location") {
    val docs = Seq(
      (1L, "a b c d a b c x"),
      (2L, "b c d a b z")).toDF("doc_id", "text")
    val toks = operators.SuffixArray.tokenized(docs, "doc_id", "text")
    val maxLen = 8
    // spans: (doc 1, off 1, span 4) = "a b c d"; (doc 2, off 2, span 3)
    // = "c d a"; (doc 1, off 5, span 2) = "a b"
    val mined = Seq((1L, 1L, 4L), (2L, 2L, 3L), (1L, 5L, 2L))
      .toDF("doc_id", "off", "span")
    val sp = operators.SuffixArray.spanFingerprints(mined, toks, maxLen)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val wf = operators.SuffixArray
      .windowFingerprints(toks, Seq(2, 3, 4), maxLen)
      .collect()
      .map(r => ((r.getLong(0), r.getInt(1), r.getInt(2)), r.getLong(3)))
      .toMap
    assert(sp == Set(
      (wf((1L, 0, 4)), 4), (wf((2L, 1, 3)), 3), (wf((1L, 4, 2)), 2)))
    // and the repeat is matched cross-doc: "a b" at doc 2 off 4 too
    assert(wf((2L, 3, 2)) == wf((1L, 4, 2)))
  }

  test("minedSpanRemoval: end-to-end on a fixture with a planted " +
      "verbatim repeat — the repeated span is cut everywhere") {
    val boiler = "lorem ipsum dolor sit amet consectetur"
    val docs = Seq(
      (1L, s"alpha $boiler beta"),
      (2L, s"$boiler gamma delta"),
      (3L, "unique text with no repeats at all here")
    ).toDF("doc_id", "text")
    val out = operators.SuffixArray
      .minedSpanRemoval(docs, "doc_id", "text", minSpan = 6, topK = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(out(1L)._2 >= 6 && !out(1L)._3.contains("lorem"))
    assert(out(2L)._2 >= 6 && !out(2L)._3.contains("ipsum"))
    assert(out(3L) == ((8, 0, "unique text with no repeats at all here")))
  }

  // --- Aho–Corasick pattern scan (q294) -------------------------------------

  private def bruteCount(text: String, pat: String): Int =
    (0 to text.length - pat.length)
      .count(i => text.regionMatches(i, pat, 0, pat.length))

  test("Aho–Corasick: counts equal brute force on nested, " +
      "overlapping, and fail-link-crossing pattern sets") {
    val pats = Seq("a", "aa", "aaa", "ab", "bc", "abc", "cab", "x")
    val auto = operators.PatternScan.compile(pats)
    val texts = Seq("aaaa", "abcabcab", "cabcab", "bcbcbc", "",
      "aabbaabcaaa", "xxx", "zzz")
    for (t <- texts) {
      val got = operators.PatternScan.countMatches(t, auto)
      for ((p, i) <- pats.zipWithIndex)
        assert(got(i) == bruteCount(t, p), s"pattern '$p' over '$t'")
    }
    // the canonical overlap check: 'aa' in 'aaaa' -> 3
    assert(operators.PatternScan
      .countMatches("aaaa", auto)(pats.indexOf("aa")) == 3)
  }

  test("scanCounts: DataFrame pass equals per-row brute force and " +
      "emits only matched patterns") {
    val docs = Seq((1L, "the table holds data"), (2L, "no hits here"),
      (3L, "Scan SCAN scan")).toDF("doc_id", "text")
    val pats = Seq("ta", "tab", "able", "scan", "data", "q")
    val out = operators.PatternScan
      .scanCounts(docs, "doc_id", "text", pats)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val texts = Map(1L -> "the table holds data", 2L -> "no hits here",
      3L -> "scan scan scan")
    val expected = (for {
      (id, t) <- texts.toSeq; p <- pats
      n = bruteCount(t, p) if n > 0
    } yield (id, p) -> n.toLong).toMap
    assert(out == expected)
    assert(out((3L, "scan")) == 3L) // case folding applied
  }

  // --- isotonic PAV calibration (q300) --------------------------------------

  test("isotonicCalibrate: matches the independent minimax formula " +
      "cal(k) = max_{i<=k} min_{j>=k} avg(i..j), stays monotone, and " +
      "preserves already-monotone inputs") {
    // per-bin (n, pos): rates 0.2, 0.5, 0.3, 0.6, 0.1 — two pools
    val rows = Seq(
      (0L, 10, 2), (1L, 10, 5), (2L, 10, 3), (3L, 10, 6), (4L, 10, 1))
    val df = rows.flatMap { case (b, n, pos) =>
      (0 until n).map(i => (b, i < pos))
    }.toDF("bin", "y")
    val out = operators.Calibration
      .isotonicCalibrate(df, "bin", col("y"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // independent O(n^3) minimax form of the isotonic fit
    def avgPpm(i: Int, j: Int): Double = {
      val p = (i to j).map(rows(_)._3).sum.toDouble
      val n = (i to j).map(rows(_)._2).sum.toDouble
      1e6 * p / n
    }
    val minimax = rows.indices.map { k =>
      (0 to k).map(i =>
        (k until rows.length).map(j => avgPpm(i, j)).min).max
    }
    for (k <- rows.indices)
      assert(out(k.toLong)._3 == math.floor(minimax(k)).toLong,
        s"bin $k: ${out(k.toLong)._3} vs minimax ${minimax(k)}")
    // monotone
    val cals = rows.indices.map(k => out(k.toLong)._3)
    assert(cals == cals.sorted)
    // per-bin raw stats pass through
    assert(out(1L) == ((10L, 5L, cals(1))))
    // already-monotone input is untouched
    val mono = Seq((0L, 4, 1), (1L, 4, 2), (2L, 4, 3))
    val dfm = mono.flatMap { case (b, n, pos) =>
      (0 until n).map(i => (b, i < pos))
    }.toDF("bin", "y")
    val outm = operators.Calibration
      .isotonicCalibrate(dfm, "bin", col("y"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(outm == Map(0L -> 250000L, 1L -> 500000L, 2L -> 750000L))
  }

  // --- distributed PCA top component (q298) ---------------------------------

  test("PCA power iteration: recovers the dominant axis of an " +
      "anisotropic cloud and matches an in-memory replica exactly") {
    val dims = 4
    // variance concentrated on axis 0 (amplitude 8x the noise axes)
    val vecs = (0 until 40).map { k =>
      val main = if (k % 2 == 0) 0.8f else -0.8f
      (k.toLong, Array(main + 0.01f * (k % 5),
        0.05f * ((k % 3) - 1), 0.03f * ((k % 7) - 3),
        0.02f * ((k % 4) - 2)), k % 2)
    }
    val df = vecs.toDF("vec_id", "embedding", "label")
    val out = operators.Pca
      .topComponentProjections(df, "vec_id", "embedding", "label", dims)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // in-memory replica of the exact integer pipeline
    val q = vecs.map { case (id, v, _) =>
      id -> v.map(x => math.floor(x.toDouble * 65536).toLong)
    }.toMap
    val g = Array.ofDim[BigInt](dims, dims)
    for (i <- 0 until dims; j <- 0 until dims)
      g(i)(j) = q.values.map(v => BigInt(v(i)) * v(j)).sum
    var ev = Array.fill(dims)(BigInt(65536))
    for (_ <- 0 until 8) {
      val w = Array.tabulate(dims)(i =>
        (0 until dims).map(j => g(i)(j) * ev(j)).sum)
      val s = w.map(_.abs).max
      ev = w.map(x => x * 65536 / s)
    }
    val expected = q.map { case (id, v) =>
      id -> v.indices.map(d => v(d) * ev(d).toLong).sum
    }
    assert(out == expected)
    // the dominant axis orders the projections: sign of proj tracks
    // the sign of coordinate 0 for every vector
    for ((id, v, _) <- vecs)
      assert((out(id) > 0) == (v(0) > 0) ||
        math.signum(ev(0).toLong) == -1 &&
        (out(id) < 0) == (v(0) > 0), s"vec $id")
  }

  // --- trigram backoff support (q297) ---------------------------------------

  test("backoffSupport: positions resolve at the highest order with " +
      "corpus count >= 2, singletons are unk, score floors to milli") {
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c e"),
      (3L, "zzz")).toDF("doc_id", "text")
    val out = operators.TextAnalysis
      .backoffSupport(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // doc 1: pos1 'a' uni-cnt 2 -> uni; pos2 bi 'a b' cnt 2 -> bi;
    // pos3 tri 'a b c' cnt 2 -> tri; pos4 tri 'b c d' cnt 1, bi
    // 'c d' cnt 1, uni 'd' cnt 1 -> unk
    assert(out(1L) == ((4L, 1L, 1L, 1L, 1L,
      (3000L + 2000L + 1000L) / 4)))
    assert(out(2L) == out(1L)) // symmetric twin
    // doc 3: single singleton word -> unk
    assert(out(3L) == ((1L, 0L, 0L, 0L, 1L, 0L)))
  }

  // --- PCM linear resampling (q296) -----------------------------------------

  test("audioResampleStats: identity rate is a no-op, 2x upsample " +
      "hits exact midpoints, and stats equal a brute-force resample") {
    import graft.functions.AudioCodec
    def payload(id: Long, rate: Int, samples: Array[Int]) =
      Seq((id, AudioCodec.encodeWavPcm16(rate, 1, samples)))
        .toDF("doc_id", "payload")
    val s1 = Array(100, -200, 300, -400, 500)
    // identity: same rate -> r always 0, output = input
    val idOut = operators.Multimodal
      .audioResampleStats(spark, payload(1L, 10000, s1), 10000)
      .collect()(0)
    assert(idOut.getLong(3) == 5 && idOut.getLong(4) == 5)
    assert(idOut.getLong(5) == s1.map(_.toLong).sum)
    assert(idOut.getLong(6) == s1.map(v => v.toLong * v).sum)
    // 2x upsample: odd outputs are exact midpoints (truncated)
    val up = operators.Multimodal
      .audioResampleStats(spark, payload(2L, 5000, s1), 10000)
      .collect()(0)
    val expected = Array(100L, -50L, -200L, 50L, 300L, -50L, -400L,
      50L, 500L)
    assert(up.getLong(4) == 9)
    assert(up.getLong(5) == expected.sum)
    assert(up.getLong(6) == expected.map(v => v * v).sum)
    // brute force at an awkward ratio (down 3:2), negatives included
    val s2 = Array.tabulate(31)(k => (17 * k % 2001) - 1000)
    val dn = operators.Multimodal
      .audioResampleStats(spark, payload(3L, 15000, s2), 10000)
      .collect()(0)
    val nOut = ((s2.length - 1) * 10000L / 15000L + 1).toInt
    val brute = (0 until nOut).map { i =>
      val num = i * 15000L
      val j = (num / 10000).toInt
      val r = num % 10000
      if (r == 0) s2(j).toLong
      else (s2(j) * (10000 - r) + s2(j + 1) * r) / 10000
    }
    assert(dn.getLong(4) == nOut)
    assert(dn.getLong(5) == brute.sum)
    assert(dn.getLong(6) == brute.map(v => v * v).sum)
  }

  // --- exact Mann–Whitney U (q295) ------------------------------------------

  test("mannWhitneyU: doubled-U equals the pairwise brute force " +
      "(ties half), the 2·nA·nB identity holds, AUC floors to ppm") {
    // group g: A = {1, 3, 3, 7}, B = {2, 3, 5}; pairwise 2·U_A =
    // 2·#(a>b) + #(a=b)
    val rows = Seq(
      ("g", 1L, true), ("g", 3L, true), ("g", 3L, true), ("g", 7L, true),
      ("g", 2L, false), ("g", 3L, false), ("g", 5L, false),
      ("h", 10L, true), ("h", 20L, false))
    val df = rows.toDF("grp", "v", "a")
    def brute(as: Seq[Long], bs: Seq[Long]): Long =
      (for (x <- as; y <- bs)
        yield if (x > y) 2L else if (x == y) 1L else 0L).sum
    val out = operators.Stats
      .mannWhitneyU(df, "grp", "v", col("a"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val gA = rows.filter(r => r._1 == "g" && r._3).map(_._2)
    val gB = rows.filter(r => r._1 == "g" && !r._3).map(_._2)
    val u2g = brute(gA, gB)
    assert(out("g") == ((4L, 3L, u2g, 2L * 4 * 3 - u2g,
      1000000L * u2g / (2 * 4 * 3))))
    assert(out("h") == ((1L, 1L, 0L, 2L, 0L)))
    // invariant across groups: u2_a + u2_b = 2 n_a n_b
    for ((_, (na, nb, u2a, u2b, _)) <- out)
      assert(u2a + u2b == 2 * na * nb)
  }

  // --- unigram-LM EM vocabulary (q293) --------------------------------------

  test("emVocab: prunes the bottom multi-char pieces by usage, keeps " +
      "every single char, and emSegment still segments every word") {
    // 10 words; 'abcd' dominates usage, rare pieces get pruned
    val docs = Seq((1L, "abcd abcd abcd abcd zq zq xv abcd abcd pppp"))
      .toDF("doc_id", "text")
    val vocab = operators.UnigramSegment
      .emVocab(docs, "text", emRounds = 1, prunePermille = 500)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every single char of the corpus survives
    for (c <- "abcdzqxvp")
      assert(vocab.contains(c.toString), s"single char $c pruned")
    // the dominant piece survives with usage-weighted score:
    // 'abcd' used 6 times, len 4 -> score 96
    assert(vocab.get("abcd").contains(96L))
    val seg = operators.UnigramSegment
      .emSegment(docs, "text", emRounds = 1, prunePermille = 500)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    // all four distinct words segment (singles guarantee coverage)
    assert(seg.keySet == Set("abcd", "zq", "xv", "pppp"))
    assert(seg("abcd") == "abcd")
  }

  test("emVocab: a piece the E-step never uses is dropped even when " +
      "the seed vocabulary contained it") {
    // seed vocab contains 'ab', 'bc', 'abc' (all count >= 2); Viterbi
    // prefers 'abc' (score 2*9=18 beats ab+c / a+bc), so 'ab'/'bc'
    // have usage 0 and must vanish from the refined vocabulary
    val docs = Seq((1L, "abc abc")).toDF("doc_id", "text")
    val vocab = operators.UnigramSegment
      .emVocab(docs, "text", emRounds = 1, prunePermille = 0)
      .collect().map(r => r.getString(0)).toSet
    assert(vocab.contains("abc"))
    assert(!vocab.contains("ab") && !vocab.contains("bc"),
      "unused multi-char pieces must drop out of the EM vocabulary")
  }

  test("knBigrams: discounted term + continuation backoff match the " +
      "hand-computed closed form, and the continuation count — not " +
      "raw frequency — drives the backoff term") {
    // corpus: "a b" x5, "c b" x1, "a d" x3  (as separate docs)
    val docs = (Seq.fill(5)("a b") ++ Seq("c b") ++ Seq.fill(3)("a d"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = operators.TextAnalysis.knBigrams(docs, "text", minCb = 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    // types: (a,b) cb=5, (c,b) cb=1, (a,d) cb=3; ntot=3
    // cont(b)=2 -> cont_ppm = 666666; cont(d)=1 -> 333333
    // left a: c1=8, n1l=2; left c: c1=1, n1l=1
    val (cbAB, c1AB, n1lAB, contAB, knAB) = out(("a", "b"))
    assert((cbAB, c1AB, n1lAB, contAB) == (5L, 8L, 2L, 666666L))
    // kn = (1e6*17)//32 + (3*2*666666)//32 = 531250 + 124999 = 656249
    assert(knAB == 656249L)
    val (_, _, _, contCB, knCB) = out(("c", "b"))
    // kn(c,b) = (1e6*1)//4 + (3*1*666666)//4 = 250000 + 499999
    assert((contCB, knCB) == (666666L, 749999L))
    val (_, _, _, contAD, knAD) = out(("a", "d"))
    // kn(a,d) = (1e6*9)//32 + (3*2*333333)//32 = 281250 + 62499
    assert((contAD, knAD) == (333333L, 343749L))
    // probability-mass sanity: P(b|a) + P(d|a) ~ 1 (floors only lose)
    assert(knAB + knAD <= 1000000L && knAB + knAD >= 999990L)
  }

  test("tCloseness: quantized 1-D EMD matches the hand closed form, " +
      "absent bins contribute their full deficit, uniform class = 0") {
    val rows = Seq(
      ("A", 0L), ("A", 0L), ("A", 1L),
      ("B", 2L), ("B", 2L), ("B", 1L),
      ("C", 0L), ("C", 1L), ("C", 2L))
      .toDF("grp", "sbin")
    val out = operators.Privacy.tCloseness(rows,
        Seq("grp" -> col("grp")), col("sbin"), tPpm = 250000L)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toMap
    // global: 3/3/3 of 9 -> q_ppm 333333 each, m = 3
    // A: p = (666666, 333333, 0); cums 333333, 333333 -> emd 333333
    assert(out("A") == ((3L, 333333L, false)))
    assert(out("B") == ((3L, 333333L, false)))
    // C mirrors the global distribution exactly -> 0
    assert(out("C") == ((3L, 0L, true)))
  }

  test("pitchAutocorr: a periodic waveform is detected at its true " +
      "period, R(0) is the frame energy, short docs yield no row") {
    val period = 10
    val wave = Array.tabulate(80)(i =>
      (3000 * math.sin(2 * math.Pi * i / period)).toInt)
    val payloads = Seq(
      (1L, functions.AudioCodec.encodeWavPcm16(8000, 1, wave)),
      (2L, functions.AudioCodec.encodeWavPcm16(8000, 1,
        Array.tabulate(20)(i => i * 50)))) // < frameLen, no row
      .toDF("doc_id", "payload")
    val rows = operators.Multimodal.pitchAutocorr(spark, payloads)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.length == 1 && rows.head._1 == 1L)
    assert(rows.head._2 == period,
      s"expected lag $period, got ${rows.head._2}")
    val r0 = wave.take(64).map(s => s.toLong * s).sum
    assert(rows.head._4 == r0)
    assert(rows.head._3 <= r0, "R(lag) can never exceed R(0)")
  }

  test("greedySegment: takes the longest match at every cursor, and " +
      "disagrees with Viterbi exactly where lookahead pays") {
    // counts: ab=2, bc=5 (multi-char kept), abc=1 (dropped);
    // scores: ab=8, bc=20, a=2, c=5
    val docs = Seq((1L, "abc ab bc bc bc bc")).toDF("doc_id", "text")
    val vocab = operators.UnigramSegment.pieceVocab(docs, "text")
    val g = operators.UnigramSegment.greedySegment(docs, "text", vocab)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(g("abc") == "ab|c", "greedy must take 'ab' first, blind " +
      "to the better a|bc split")
    assert(g("ab") == "ab" && g("bc") == "bc")
    val v = operators.UnigramSegment
      .viterbiSegment(docs, "text", vocab)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(v("abc") == "a|bc", "Viterbi sees score(a)+score(bc)=22 " +
      "beats score(ab)+score(c)=13")
  }

  private def kruskal(edges: Seq[(Long, Long, Long)])
      : (Int, Long) = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    var picked = 0
    var weight = 0L
    for ((u, v, w) <- edges.sortBy(e => (e._3, e._1, e._2))) {
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { parent(ru) = rv; picked += 1; weight += w }
    }
    (picked, weight)
  }

  test("boruvkaMsf equals Kruskal (weight is MSF-unique even under " +
      "ties) on random graphs with duplicate weights and " +
      "disconnected pieces") {
    val rnd = new scala.util.Random(306)
    for (trial <- 1 to 3) {
      val n = 12 + trial * 6
      val edges = (for {
        u <- 0 until n; v <- u + 1 until n
        if rnd.nextInt(100) < 18 // sparse -> usually disconnected
      } yield (u.toLong, v.toLong, (1 + rnd.nextInt(6)).toLong))
      if (edges.nonEmpty) {
        val got = operators.Mst
          .boruvkaMsf(edges.toDF("u", "v", "w"))
          .collect().map(r => (r.getLong(0), r.getLong(1),
            r.getLong(2)))
        val (expN, expW) = kruskal(edges)
        assert(got.length == expN, s"trial $trial edge count")
        assert(got.map(_._3).sum == expW, s"trial $trial weight")
        // picked edges must be a subset of the input
        val in = edges.map(e => (e._1, e._2, e._3)).toSet
        assert(got.forall(in.contains), s"trial $trial membership")
      }
    }
  }

  test("boruvkaMsf: monotone path graph — the worst case for hook " +
      "chains (every pick points left) — is recovered exactly") {
    val edges = (0 until 40).map(i =>
      (i.toLong, (i + 1).toLong, (i + 1).toLong))
    val got = operators.Mst.boruvkaMsf(edges.toDF("u", "v", "w"))
      .collect()
    assert(got.length == 40)
    assert(got.map(_.getLong(2)).sum == (1 to 40).map(_.toLong).sum)
  }

  test("bwt: the textbook banana transform — token-level " +
      "'b a n a n a' + sentinel gives a n n b <s> a a, and the run " +
      "profile collapses the grouped contexts") {
    val docs = Seq((1L, "b a n a n a")).toDF("doc_id", "text")
    val b = operators.SuffixArray.bwt(docs, "doc_id", "text")
      .orderBy("j").collect().map(_.getString(2))
    assert(b.toSeq ==
      Seq("a", "n", "n", "b", "\u0001", "a", "a"))
    val runs = operators.SuffixArray.bwtRuns(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(runs.toSeq == Seq((7L, 5L, 7L)))
  }

  test("bwtRuns: a highly repetitive doc compresses (bwt_runs well " +
      "under raw_runs) and a permutation invariant holds — the BWT " +
      "is a permutation of the sentinel-extended tokens") {
    val docs = Seq(
      (1L, Seq.fill(30)("ab cd").mkString(" ")),
      (2L, (1 to 40).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val runs = operators.SuffixArray.bwtRuns(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val (n1, bwt1, raw1) = runs(1L)
    assert(n1 == 61 && raw1 == 61, "alternating tokens: every raw " +
      "position is a run boundary")
    assert(bwt1 <= 6, s"repetitive text must collapse, got $bwt1")
    val b = operators.SuffixArray.bwt(docs, "doc_id", "text")
      .filter(col("doc_id") === 2L).collect().map(_.getString(2))
    assert(b.sorted.toSeq ==
      ((1 to 40).map(i => s"w$i") :+ "\u0001").sorted)
  }

  test("lubyMis: independence and maximality hold on random graphs, " +
      "a clique selects exactly one node, a star selects center xor " +
      "all leaves") {
    val rnd = new scala.util.Random(308)
    def check(edges: Seq[(Long, Long)]): Map[Long, Boolean] = {
      val out = operators.Mis.lubyMis(edges.toDF("u", "v"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      val sym = edges.flatMap(e => Seq(e, e.swap)).toSet
      // independence: no edge inside the set
      for ((u, v) <- sym if out(u) && out(v))
        fail(s"edge ($u,$v) inside the MIS")
      // maximality: every outside node has an inside neighbor
      for ((n, in) <- out if !in)
        assert(sym.exists { case (a, b) => a == n && out(b) },
          s"node $n outside with no MIS neighbor")
      out
    }
    for (trial <- 1 to 3) {
      val n = 20 + 7 * trial
      val edges = for {
        u <- 0 until n; v <- u + 1 until n
        if rnd.nextInt(100) < 15
      } yield (u.toLong, v.toLong)
      if (edges.nonEmpty) check(edges)
    }
    val clique = for (u <- 0 until 8; v <- u + 1 until 8)
      yield (u.toLong, v.toLong)
    assert(check(clique).values.count(identity) == 1)
    val star = (1 to 9).map(i => (0L, i.toLong))
    val s = check(star)
    assert(if (s(0L)) (1 to 9).forall(i => !s(i.toLong))
           else (1 to 9).forall(i => s(i.toLong)))
  }

  test("lsa topicProjections: mass concentrates on the dominant topic " +
      "block, L1 budget holds, and a lone off-topic doc is starved") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta"),
      (2L, "alpha beta gamma gamma"),
      (3L, "beta gamma alpha alpha"),
      (4L, "alpha gamma beta beta"),
      (5L, "zeta eta")).toDF("doc_id", "text")
    val out = operators.Lsa.topicProjections(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val big = Seq(1L, 2L, 3L, 4L).map(out).sum
    val small = out(5L)
    assert(big > 10 * math.max(small, 1L),
      s"dominant block $big vs off-topic $small")
    val total = out.values.sum
    assert(total <= 1000000L && total >= 1000000L - out.size,
      s"L1 budget: $total")
  }

  test("dirichletQl: hand closed form holds, absent terms still " +
      "carry smoothing mass, and short docs lean harder on the " +
      "collection model") {
    val docs = Seq((1L, "a a b"), (2L, "b c"), (3L, "a"))
      .toDF("doc_id", "text")
    val out = operators.TfIdf.dirichletQl(docs, "doc_id", "text",
        terms = Seq("a", "c"), mu = 10L, topK = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(4), r.getInt(5))).toMap
    // |C| = 6; cf_ppb(a) = 500000000, cf_ppb(c) = 166666666
    assert(out(("a", 1L)) == ((2L, 153846L + 384615L, 2)))
    assert(out(("a", 3L)) == ((1L, 90909L + 454545L, 1)))
    assert(out(("a", 2L)) == ((0L, 416666L, 3)),
      "a doc without the term must still score smoothing mass")
    assert(out(("c", 2L))._3 == 1 && out(("c", 3L))._3 == 2 &&
      out(("c", 1L))._3 == 3,
      "shorter docs lean harder on the collection model")
  }

  test("trianglesPerNode: closed forms on triangle-with-tail and " +
      "K4, and totals agree with Triangles.count on random graphs") {
    // triangle 1-2-3 with tail 3-4
    val g1 = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val o1 = operators.Triangles.perNode(g1.toDF("u", "v"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(o1(1L) == ((2L, 1L, 1000000L)))
    assert(o1(2L) == ((2L, 1L, 1000000L)))
    assert(o1(3L) == ((3L, 1L, 333333L)))
    assert(o1(4L) == ((1L, 0L, 0L)))
    // K4: every node in 3 triangles, lcc = 1
    val k4 = for (u <- 0 until 4; v <- u + 1 until 4)
      yield (u.toLong, v.toLong)
    val o2 = operators.Triangles.perNode(k4.toDF("u", "v"))
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(o2.forall(_ == ((3L, 1000000L))))
    // consistency with the scalar counter: sum(per-node)/3 = total
    val rnd = new scala.util.Random(311)
    val es = for {
      u <- 0 until 18; v <- u + 1 until 18 if rnd.nextInt(100) < 30
    } yield (u.toLong, v.toLong)
    val tot = operators.Triangles.count(es.toDF("u", "v"))
      .collect().head.getLong(0)
    val per = operators.Triangles.perNode(es.toDF("u", "v"))
      .collect().map(_.getLong(2)).sum
    assert(per == 3 * tot)
  }

  test("changepoint: a planted level shift is found at its true " +
      "boundary and the score matches a brute-force replica") {
    // type A: 8 days at 2/day then 6 days at 9/day; type B flat
    val rows =
      (1 to 8).flatMap(d => Seq.fill(2)(("A", d.toLong))) ++
      (9 to 14).flatMap(d => Seq.fill(9)(("A", d.toLong))) ++
      (1 to 10).flatMap(d => Seq.fill(3)(("B", d.toLong)))
    val events = rows.toDF("event_type", "day")
      .select(col("event_type"),
        expr("timestamp_micros(day * 86400000000)").as("ts"))
    val out = operators.Temporal.changepoint(events, "event_type", "ts")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("A")._1 == 14 && out("A")._2 == 8,
      s"A split: ${out("A")}")
    // brute-force argmax of S1l^2*nr + S1r^2*nl over the A series
    val xs = Seq.fill(8)(2L) ++ Seq.fill(6)(9L)
    val s = xs.sum
    val best = (1 until xs.length).maxBy { k =>
      val s1 = xs.take(k).sum
      (BigInt(s1) * s1 * (xs.length - k) +
        BigInt(s - s1) * (s - s1) * k, -k)
    }
    assert(best == 8)
    // flat series: score = c²·n·k(n−k), peaked at the middle split
    assert(out("B")._2 == 5)
  }

  test("minedSpanRemoval: nothing mined (minSpan above any repeat) " +
      "returns every document unchanged") {
    val docs = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    val out = operators.SuffixArray
      .minedSpanRemoval(docs, "doc_id", "text", minSpan = 50, topK = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3))).toSet
    assert(out == Set((1L, 3, 0, "a b c"), (2L, 3, 0, "d e f")))
  }
}
