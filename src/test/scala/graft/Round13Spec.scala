package graft

import org.apache.spark.sql.functions._

/** Round 13: the pruned span-mining path ([[operators.SuffixArray
  * .repeatedSpansPruned]]) pinned bit-identical against the exact
  * full-suffix-array path it replaces on the hot path, including the
  * global sa_rank VALUES (the part the rank-reconstruction math has
  * to get right), plus the fallback trigger. */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq

  test("repeatedSpansPruned: bit-identical to the exact path, " +
    "including global sa_rank values, on a planted-repeat corpus") {
    val phrase = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (1L, s"prefix a $phrase suffix a"),
      (2L, s"prefix b $phrase suffix b"),
      (3L, s"$phrase"), // whole doc = the phrase → dup candidates too
      (4L, "unrelated filler words with no long repeats at all"),
      (5L, "another unique document of assorted filler tokens here")
    ).toDF("doc_id", "text")
    val toks = graft.operators.SuffixArray
      .tokenized(docs, "doc_id", "text")
    for (topK <- Seq(1, 3, 5)) {
      val pruned = graft.operators.SuffixArray
        .repeatedSpansPruned(toks, 2, topK, 64, 8)
      assert(pruned.isDefined, s"pruned path must engage at topK=$topK")
      val exact = graft.operators.SuffixArray
        .repeatedSpansExact(toks, 2, topK, 64)
      assert(rows(pruned.get) == rows(exact))
    }
  }

  test("repeatedSpansPruned: short-suffix and unique-window rank " +
    "corrections exercised (candidates not at rank 1)") {
    // 'zz*' tokens sort AFTER everything in the repeated block, and
    // 'aa*' tokens BEFORE — the candidate ranks must shift by exactly
    // the distinct below-candidate unique/short suffixes
    val rep = "mid mid2 mid3 mid4 mid5 mid6 mid7 mid8 mid9"
    val docs = Seq(
      (1L, s"aa1 aa2 $rep zz1"),
      (2L, s"aa3 aa4 $rep zz2"),
      (3L, "aa0 aa5 aa6") // short + unique material below candidates
    ).toDF("doc_id", "text")
    val toks = graft.operators.SuffixArray
      .tokenized(docs, "doc_id", "text")
    val pruned = graft.operators.SuffixArray
      .repeatedSpansPruned(toks, 2, 2, 64, 8)
    assert(pruned.isDefined)
    val exact = graft.operators.SuffixArray
      .repeatedSpansExact(toks, 2, 2, 64)
    assert(rows(pruned.get) == rows(exact))
  }

  test("repeatedSpansPruned: returns None when fewer than topK rows " +
    "survive at span >= ell, and the dispatcher falls back to exact") {
    val docs = Seq(
      (1L, "a short shared bit here"),
      (2L, "b short shared bit there")
    ).toDF("doc_id", "text") // longest repeat = 3 tokens < ell = 8
    val toks = graft.operators.SuffixArray
      .tokenized(docs, "doc_id", "text")
    assert(graft.operators.SuffixArray
      .repeatedSpansPruned(toks, 2, 5, 64, 8).isEmpty)
    // the public API still answers, via the exact path
    val out = graft.operators.SuffixArray
      .repeatedSpans(docs, "doc_id", "text", minSpan = 2, topK = 5)
    val exact = graft.operators.SuffixArray
      .repeatedSpansExact(toks, 2, 5, 64)
    assert(rows(out) == rows(exact))
    assert(rows(out).head._3 == 3L) // "short shared bit"
  }

  test("repeatedSpansPruned: randomized small-vocab corpora agree " +
    "with the exact path whenever the pruned path engages") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("a", "b", "c", "d")
    var engaged = 0
    for (trial <- 1 to 6) {
      val docs = (1L to 12L).map { id =>
        // small vocab + planted block → long accidental repeats
        val planted =
          if (id % 3 == 0) " p1 p2 p3 p4 p5 p6 p7 p8 p9 p10" else ""
        val words = Seq.fill(10 + rnd.nextInt(30))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")
        (id, words + planted)
      }.toDF("doc_id", "text")
      val toks = graft.operators.SuffixArray
        .tokenized(docs, "doc_id", "text")
      val topK = 1 + rnd.nextInt(6)
      val pruned = graft.operators.SuffixArray
        .repeatedSpansPruned(toks, 2, topK, 64, 8)
      pruned.foreach { p =>
        engaged += 1
        assert(rows(p) == rows(graft.operators.SuffixArray
          .repeatedSpansExact(toks, 2, topK, 64)),
          s"trial $trial topK $topK")
      }
    }
    assert(engaged >= 2, "fixture should engage the pruned path")
  }

  test("repeatedSpansPruned: agrees with exact across prune lengths " +
    "(ell = 4, 8, 16) and when minSpan exceeds the default ell") {
    val block = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = (1L to 8L).map { id =>
      (id, s"u${id}a u${id}b $block u${id}c")
    }.toDF("doc_id", "text")
    val toks = graft.operators.SuffixArray
      .tokenized(docs, "doc_id", "text")
    for (ell <- Seq(4, 8, 16); topK <- Seq(2, 6)) {
      val pruned = graft.operators.SuffixArray
        .repeatedSpansPruned(toks, 2, topK, 64, ell)
      assert(pruned.isDefined, s"ell=$ell topK=$topK")
      assert(rows(pruned.get) ==
        rows(graft.operators.SuffixArray
          .repeatedSpansExact(toks, 2, topK, 64)), s"ell=$ell topK=$topK")
    }
    // minSpan = 12 > default ell=8: the dispatcher must lift ell to
    // minSpan (completeness only needs spans >= minSpan) — compare
    // through the public API
    val viaApi = graft.operators.SuffixArray
      .repeatedSpans(docs, "doc_id", "text", minSpan = 12, topK = 3)
    assert(rows(viaApi) == rows(graft.operators.SuffixArray
      .repeatedSpansExact(toks, 12, 3, 64)))
  }

  // --- Borůvka contracted-edge rounds + driver-Kruskal finish ---------

  test("boruvkaMsf: driver-finish path equals the pure-distributed " +
    "path (localFinishEdges = 0) edge-for-edge on random graphs") {
    val rnd = new scala.util.Random(313)
    for (trial <- 1 to 3) {
      val n = 20 + trial * 10
      val edges = (for {
        u <- 0 until n; v <- u + 1 until n
        if rnd.nextInt(100) < 15
      } yield (u.toLong, v.toLong, (1 + rnd.nextInt(5)).toLong))
        .toDF("u", "v", "w")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2))).toSet
      val fast = rows(operators.Mst.boruvkaMsf(edges))
      val pure = rows(operators.Mst.boruvkaMsf(edges,
        localFinishEdges = 0))
      assert(fast == pure, s"trial $trial")
    }
  }

  test("boruvkaMsf: mid-run switch (tiny cap forces >= 1 distributed " +
    "round before the driver finish) still yields the unique MSF") {
    // path graph: 60 nodes, distinct weights -> unique MST of 59 edges
    val edges = (0 until 59).map(i =>
      (i.toLong, (i + 1).toLong, (100 - i).toLong)).toDF("u", "v", "w")
    val got = operators.Mst.boruvkaMsf(edges, localFinishEdges = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 59)
    assert(got.map(_._3).sum == (42 to 100).map(_.toLong).sum)
  }

  test("singleLinkCut: identical clusters to resolving the " +
    "MSF-restricted edges (the Gower-Ross equivalence, exercised)") {
    val rnd = new scala.util.Random(1313)
    val edges = (for {
      u <- 0 until 40; v <- u + 1 until 40
      if rnd.nextInt(100) < 12
    } yield (u.toLong, v.toLong, rnd.nextInt(30).toLong))
      .toDF("u", "v", "w")
    val cut = 12L
    val direct = operators.Mst.singleLinkCut(edges, cut)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaMst = operators.DuplicateClusters.resolveContracted(
        operators.Mst.boruvkaMsf(edges).filter(col("w") <= cut)
          .select(col("u").as("a"), col("v").as("b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(direct == viaMst)
  }

  // --- BWT adversarial-doc guard (verdict ask #6) ----------------------

  private def naiveOrder(bytes: Array[Array[Byte]]): IndexedSeq[Int] = {
    val n = bytes.length
    def cmp(a: Array[Byte], b: Array[Byte]): Int = {
      val m = math.min(a.length, b.length)
      var i = 0
      while (i < m) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }
    def less(i: Int, k: Int): Boolean = {
      var p = i; var q = k
      while (p < n && q < n) {
        val d = cmp(bytes(p), bytes(q))
        if (d != 0) return d < 0
        p += 1; q += 1
      }
      p == n && q < n
    }
    (0 until n).sortWith(less)
  }

  private def toBytes(toks: Seq[String]) =
    toks.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  test("localSuffixOrder: identical to the naive comparator on " +
    "random, repetitive, and adversarial all-equal token arrays") {
    val rnd = new scala.util.Random(321)
    val fixtures = Seq(
      Seq.fill(500)("a"),                       // adversarial: all equal
      Seq.tabulate(300)(i => s"t${i % 3}"),     // heavy repetition
      Seq.fill(400)(s"w${rnd.nextInt(8)}"),     // random small vocab
      Seq("b", "a", "n", "a", "n", "a", ""),
      Seq("solo"), Seq.empty[String]
    ) ++ (1 to 3).map(_ =>
      Seq.fill(100 + rnd.nextInt(200))(s"v${rnd.nextInt(5)}") :+ "")
    for ((f, i) <- fixtures.zipWithIndex) {
      val b = toBytes(f)
      assert(operators.SuffixArray.localSuffixOrder(b) == naiveOrder(b),
        s"fixture $i")
    }
  }

  test("bwt guard: an adversarial all-equal-token doc ABOVE the naive " +
    "cutoff completes via prefix doubling with the exact run profile") {
    val n = operators.SuffixArray.NaiveSuffixSortCutoff + 2000
    val docs = Seq((1L, Seq.fill(n)("a").mkString(" ")))
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val runs = operators.SuffixArray.bwtRuns(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val secs = (System.nanoTime() - t0) / 1e9
    // sentinel-extended length n+1; suffix order is shortest-first
    // (every suffix is a^k $), so the BWT reads 'a' at every position
    // except the whole-text rotation wrap, which contributes the
    // sentinel last — exactly 2 runs (a…a | sentinel), same as raw
    assert(runs.toSeq == Seq(((n + 1).toLong, 2L, 2L)))
    assert(secs < 60.0, s"adversarial doc took $secs s — guard failed")
  }

  // --- round-13 advisory fixes ----------------------------------------

  test("int_dot / int_dist2: length mismatch fails loud instead of " +
    "silently truncating (both eval and codegen paths)") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(1L, 2L))).toDF("a", "b")
    for (fn <- Seq(org.apache.spark.sql.graft.GraftFunctions.intDot _,
        org.apache.spark.sql.graft.GraftFunctions.intDist2 _)) {
      val e = intercept[Exception] {
        df.select(fn(col("a"), col("b"))).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("length mismatch")))
    }
    // equal lengths still agree with the HOF form
    val ok = Seq((Seq(2L, 3L), Seq(5L, 7L))).toDF("a", "b")
    assert(ok.select(org.apache.spark.sql.graft.GraftFunctions.intDot(col("a"), col("b")))
      .head.getLong(0) == 31L)
    assert(ok.select(org.apache.spark.sql.graft.GraftFunctions.intDist2(col("a"), col("b")))
      .head.getLong(0) == 25L)
  }

  // --- SemDeDup over learned clusters (verdict ask #7) -----------------

  test("semanticDupEdges: exact integer cosine threshold matches a " +
    "double-precision brute force within each cluster") {
    val rnd = new scala.util.Random(349)
    val dims = 8
    val vecs = (1L to 40L).map { id =>
      (id, Seq.fill(dims)((rnd.nextInt(200001) - 100000).toLong),
        id % 3) // 3 clusters
    }
    val assigned = vecs.toDF("id", "q", "cluster_id")
    val got = graft.operators.Similarity
      .semanticDupEdges(assigned, 3, 10)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // brute force in exact BigInt arithmetic (the ground truth the
    // decimal128 test must reproduce)
    def dot(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, y) => BigInt(x) * y }.sum
    val expect = (for {
      (a, qa, ca) <- vecs; (b, qb, cb) <- vecs
      if a < b && ca == cb
      d = dot(qa, qb)
      if d >= 0 && d * d * 100 >= 9 * dot(qa, qa) * dot(qb, qb)
    } yield (a, b)).toSet
    assert(got == expect)
    assert(expect.nonEmpty, "fixture should produce edges")
  }

  test("semDedup group resolution: transitive chains collapse to one " +
    "min-id keeper even when endpoints are not directly similar") {
    // colinear-ish chain a~b, b~c but a!~c is impossible for cosine on
    // a line; build it in 2 dims: 0°, 40°, 80° at tau = cos(45°)-ish
    def vec(deg: Double) = Seq(
      math.round(math.cos(math.toRadians(deg)) * 100000),
      math.round(math.sin(math.toRadians(deg)) * 100000))
    val assigned = Seq(
      (1L, vec(0), 0L), (2L, vec(40), 0L), (3L, vec(80), 0L)
    ).toDF("id", "q", "cluster_id")
    val edges = graft.operators.Similarity
      .semanticDupEdges(assigned, 7, 10) // tau = 0.7 < cos40 ~ 0.766
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(edges == Set((1L, 2L), (2L, 3L))) // cos80 ~ 0.17 < 0.7
    val groups = graft.operators.DuplicateClusters.resolveContracted(
        graft.operators.Similarity.semanticDupEdges(assigned, 7, 10)
          .select(col("a"), col("b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(groups == Set((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  // --- incremental ANN index (q351/q352) -------------------------------

  test("assignPortableWithDist: d2 is the true minimum integer L2 to " +
    "any centroid, and assignPortable is its d2-less projection") {
    val rnd = new scala.util.Random(351)
    val vecs = (1L to 30L).map(id =>
      (id, Seq.fill(6)((rnd.nextInt(2001) - 1000).toLong)))
      .toDF("id", "q")
    val cents = (0L to 3L).map(cl =>
      (cl, Seq.fill(6)((rnd.nextInt(2001) - 1000).toLong)))
      .toDF("cluster_id", "c")
    val got = graft.operators.IvfIndex
      .assignPortableWithDist(vecs, cents)
      .collect().map(r => (r.getLong(0),
        (r.getLong(2), r.getLong(3)))).toMap
    val cn = cents.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    vecs.collect().foreach { r =>
      val (id, q) = (r.getLong(0), r.getSeq[Long](1))
      val best = cn.map { case (cl, c) =>
        (q.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cl)
      }.min // (d2, cl) lexicographic = ties to lower cluster id
      assert(got(id) == ((best._2, best._1)), s"vec $id")
    }
    val noD2 = graft.operators.IvfIndex.assignPortable(vecs, cents)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(noD2 == got.map { case (k, v) => k -> v._1 })
  }

  test("q351/q352: per-cluster counts partition the yesterday/delta " +
    "sets, growth_ppm is the exact integer ratio, and the drift flag " +
    "matches the cross-multiplied sums") {
    val assign = SparkEntry.queries("q351_ivf_delta_assign")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val nDelta = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 7 === 3).count()
    assert(assign.map(_._2).sum == nVecs - nDelta)
    assert(assign.map(_._3).sum == nDelta)
    assign.foreach { case (cl, ny, nd, ppm) =>
      assert(ppm == nd * 1000000L / math.max(ny, 1L), s"cluster $cl")
    }
    val drift = SparkEntry.queries("q352_centroid_drift")(spark, sf)
      .collect()
    assert(drift.length == assign.length)
    drift.foreach { r =>
      val (ny, nd) = (r.getLong(1), r.getLong(2))
      val (my, md) = (r.getLong(3), r.getLong(4))
      // floored means are consistent with the flag's direction when
      // the margin is wide; at minimum: no delta evidence -> no retrain
      if (nd == 0L || ny == 0L) assert(!r.getBoolean(5))
      assert(my >= 0L && md >= 0L)
    }
  }

  // --- sequence packing (q353/q354) ------------------------------------

  test("packSequences: hand-checked first-fit-sequential fill, " +
    "oversize docs get their own sequence, partition-order invariant") {
    val docs = Seq(
      // stratum A, capacity 10: 4+5 fit seq0; 3 overflows -> seq1;
      // an oversize 12 opens seq2 alone; 6 -> seq3
      ("A", 1L, 4L), ("A", 2L, 5L), ("A", 3L, 3L), ("A", 4L, 12L),
      ("A", 5L, 6L),
      // stratum B: exact-fit boundary — 10 fills seq0 exactly, next
      // opens seq1 (fill + len > cap strictly)
      ("B", 10L, 10L), ("B", 11L, 1L),
      // stratum C: zero-length docs never open a new sequence
      ("C", 20L, 0L), ("C", 21L, 0L), ("C", 22L, 10L)
    ).toDF("source", "doc_id", "n_chars")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Curation
        .packSequences(df, "doc_id", "n_chars", "source", 10L)
        .collect().map(r => ((r.getString(0), r.getLong(1)),
          (r.getLong(3), r.getLong(4)))).toMap
    val got = run(docs)
    val expect = Map(
      ("A", 1L) -> ((0L, 0L)), ("A", 2L) -> ((0L, 4L)),
      ("A", 3L) -> ((1L, 0L)), ("A", 4L) -> ((2L, 0L)),
      ("A", 5L) -> ((3L, 0L)),
      ("B", 10L) -> ((0L, 0L)), ("B", 11L) -> ((1L, 0L)),
      ("C", 20L) -> ((0L, 0L)), ("C", 21L) -> ((0L, 0L)),
      ("C", 22L) -> ((0L, 0L)))
    assert(got == expect)
    assert(run(docs.repartition(7)) == expect)
    // invariants on real data: offsets + lens never exceed capacity
    // except for single oversize docs; seq ids are dense per stratum
    val real = graft.operators.Curation.packSequences(
        spark.read.parquet(s"$sf/documents.parquet"),
        "doc_id", "n_chars", "source", 2000L)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    real.foreach { case (src, len, _, off) =>
      assert(off + len <= 2000L || off == 0L, s"$src overflow") }
    real.groupBy(_._1).foreach { case (src, rs) =>
      val seqs = rs.map(_._3).distinct.sorted.toSeq
      assert(seqs == (0L until seqs.length.toLong).toSeq, s"$src dense")
    }
  }

  test("q355: the SQ8-coded SemDeDup audit is internally consistent — " +
    "keep flags are booleans over the full vector set and agree " +
    "exactly where the flags match") {
    val out = SparkEntry.queries("q355_semdedup_sq8")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4)))
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(out.length == nVecs)
    out.foreach { case (id, s8, ex, agree) =>
      assert(agree == (s8 == ex), s"vec $id") }
    // the audit must not be vacuous: at sf0.001 the exact side keeps
    // a strict subset of vectors (dups exist)
    assert(out.exists(!_._3), "expected at least one exact-side dup")
  }

  test("q356: the tau sweep is monotone (edges, flagged non-increasing " +
    "in tau; kept non-decreasing) and each row is consistent") {
    val out = SparkEntry.queries("q356_semdedup_tau_sweep")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.length == 4)
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    out.foreach { case (_, _, edges, flagged, kept) =>
      assert(flagged <= edges && kept == nVecs - flagged)
    }
    val byTau = out.sortBy { case (n, d, _, _, _) => n.toDouble / d }
    assert(byTau.map(_._3).toSeq == byTau.map(_._3).sortBy(-_).toSeq,
      "edges must not increase with tau")
    assert(byTau.map(_._4).toSeq == byTau.map(_._4).sortBy(-_).toSeq,
      "flagged must not increase with tau")
    // the 3/10 row must equal q349's flag counts exactly
    val k349 = SparkEntry.queries("q349_semdedup_kmeans")(spark, sf)
      .filter(!col("keep")).count()
    assert(out.find(r => r._1 == 3 && r._2 == 10).get._4 == k349)
  }

  // ---- plan-shape tripwires for the round-13 operators -----------------

  test("plan shapes: packSequences is one stratum exchange + object " +
    "island; semanticDupEdges joins on the cluster key (no cartesian)") {
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      planOf(df).sliding("Exchange".length).count(_ == "Exchange")
    val docs = Seq(("A", 1L, 4L), ("A", 2L, 5L), ("B", 3L, 2L))
      .toDF("source", "doc_id", "n_chars")
    val packed = graft.operators.Curation
      .packSequences(docs, "doc_id", "n_chars", "source", 10L)
    assert(exchanges(packed) <= 1,
      s"packing fold must not add joins/windows:\n${planOf(packed)}")
    assert(planOf(packed).contains("SerializeFromObject"),
      "expected the typed per-stratum fold (object island)")
    val assigned = Seq((1L, Seq(1L, 2L), 0L), (2L, Seq(2L, 1L), 0L),
      (3L, Seq(9L, 9L), 1L)).toDF("id", "q", "cluster_id")
      .localCheckpoint()
    val edges = graft.operators.Similarity
      .semanticDupEdges(assigned, 3, 10)
    val p = planOf(edges)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"),
      s"intra-cluster pairing must stay an equi-join:\n$p")
  }

  test("greedyMaxCoverage: lazy-certified local path, distributed " +
    "fallback, and all-collected local greedy agree bit-for-bit") {
    // 40 docs with engineered overlap: low ids share a template (so
    // later gains collapse below early initial counts — exactly the
    // regime where the certificate fails), a few high ids are disjoint
    val docs = (1L to 40L).map { i =>
      val base = if (i <= 30) (0 until 8).map(j => s"w${(i + j) % 11}")
                 else (0 until 6).map(j => s"z${i}_$j")
      (i, base.mkString(" "))
    }.toDF("doc_id", "text")
    def run(pool: Int) = graft.operators.Curation
      .greedyMaxCoverage(docs, "doc_id", "text", n = 2, k = 5,
        candidatePool = pool)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val exact = run(1000) // all 40 docs collected -> pure local greedy
    // tiny pools force the certificate to fail mid-run -> the
    // distributed fallback finishes; results must be identical
    assert(run(2) == exact, "pool=2 (fallback) diverged")
    assert(run(7) == exact, "pool=7 (fallback) diverged")
    assert(run(40) == exact, "pool=40 boundary diverged")
    // pool == 40 collects all 40 rows but length == candidatePool, so
    // allCollected is conservatively false there — still exact via
    // certificate/fallback; and early-stop still applies
    val small = graft.operators.Curation
      .greedyMaxCoverage(Seq((1L, "a b c"), (2L, "a b c"))
        .toDF("doc_id", "text"), "doc_id", "text", n = 2, k = 4,
        candidatePool = 1)
      .collect()
    assert(small.length == 1) // second doc adds nothing -> early stop
  }

  test("viterbiSegment: duplicate pieces in a caller vocab keep the " +
    "max score deterministically, matching a pre-deduped vocab") {
    val docs = Seq((1L, "abc ab")).toDF("doc_id", "text")
    val dupVocab = Seq(("a", 10L), ("ab", 5L), ("ab", 40L), ("b", 8L),
      ("c", 9L), ("ab", 20L)).toDF("piece", "score")
    val cleanVocab = Seq(("a", 10L), ("ab", 40L), ("b", 8L), ("c", 9L))
      .toDF("piece", "score")
    def seg(v: org.apache.spark.sql.DataFrame) =
      graft.operators.UnigramSegment.viterbiSegment(docs, "text", v)
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getString(3))).toSet
    // run twice with different partitioning of the dup vocab — the
    // old rows.toMap kept whichever duplicate collected last
    assert(seg(dupVocab) == seg(cleanVocab))
    assert(seg(dupVocab.repartition(5)) == seg(cleanVocab))
  }
}
