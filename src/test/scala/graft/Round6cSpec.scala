package graft

import org.apache.spark.sql.functions._
import graft.operators.{BradleyTerry, Curation, Metrics, Stats, TextAnalysis, ZOrder}

/** Round-6 additions: PR-curve sweep, Cohen's kappa, α-sampling
  * apportionment, unigram entropy, stratified k-fold, zone-map audit,
  * Bradley–Terry strengths — each checked against hand-computed
  * fixtures plus its structural invariants. */
class Round6cSpec extends SparkSpec {
  import spark.implicits._

  // --- prCurve ----------------------------------------------------------
  test("prCurve: exact confusion counts and ppm ratios on a fixture") {
    // scores: 3 (pos), 2 (pos, neg), 1 (neg)  -> thresholds 3, 2, 1
    val df = Seq((3L, true), (2L, true), (2L, false), (1L, false))
      .toDF("score", "label")
    val rows = Metrics.prCurve(df, "score", "label")
      .orderBy(desc("thr")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // thr=3: tp=1 fp=0 fn=1 prec=1e6 rec=5e5
    assert(rows(0) == ((3L, 1L, 0L, 1L, 1000000L, 500000L)))
    // thr=2: tp=2 fp=1 fn=0 prec=666666 rec=1e6
    assert(rows(1) == ((2L, 2L, 1L, 0L, 666666L, 1000000L)))
    // thr=1: tp=2 fp=2 fn=0 prec=500000 rec=1e6
    assert(rows(2) == ((1L, 2L, 2L, 0L, 500000L, 1000000L)))
    // f1 at thr=2: 2*2e6/(3+2) = 800000
    val f1 = Metrics.prCurve(df, "score", "label")
      .filter($"thr" === 2).select("f1_ppm").as[Long].head()
    assert(f1 == 800000L)
  }

  test("prCurve: tp monotone non-decreasing as the threshold drops") {
    val df = Tables.documents(spark, sf).limit(200)
      .select((xxhash64($"text") % 7).as("score"), ($"n_chars" > 300).as("label"))
    val tps = Metrics.prCurve(df, "score", "label")
      .orderBy(desc("thr")).select("tp").as[Long].collect()
    assert(tps.zip(tps.tail).forall { case (a, b) => a <= b })
  }

  // --- cohenKappa -------------------------------------------------------
  test("cohenKappa: perfect agreement gives kappa 1e6, disagreement < 0") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("ra", "rb")
    assert(Metrics.cohenKappa(perfect, "ra", "rb")
      .select("kappa_ppm").as[Long].head() == 1000000L)
    // systematic disagreement: po = 0 < pe -> negative kappa
    val swapped = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "a"))
      .toDF("ra", "rb")
    assert(Metrics.cohenKappa(swapped, "ra", "rb")
      .select("kappa_ppm").as[Long].head() < 0L)
  }

  test("cohenKappa: hand-computed 2x2 value") {
    // cells: (a,a)=3 (a,b)=1 (b,a)=1 (b,b)=5 -> N=10 D=8
    // S = rowA*colA + rowB*colB = 4*4 + 6*6 = 52
    // kappa = (10*8-52)/(100-52) = 28/48 -> ppm 583333
    val df = (Seq.fill(3)(("a", "a")) ++ Seq(("a", "b"), ("b", "a")) ++
      Seq.fill(5)(("b", "b"))).toDF("ra", "rb")
    val r = Metrics.cohenKappa(df, "ra", "rb").collect().head
    assert(r.getLong(0) == 10L && r.getLong(1) == 8L && r.getLong(2) == 52L)
    assert(r.getLong(5) == 583333L)
  }

  // --- isqrt + alphaQuotaSample ----------------------------------------
  test("isqrt is exact on and around perfect squares") {
    val df = spark.range(0, 2000).select($"id",
      Curation.isqrt($"id").as("r"))
    assert(df.filter($"r" * $"r" > $"id" ||
      ($"r" + 1) * ($"r" + 1) <= $"id").count() == 0)
    // a large value near a perfect square
    val big = Seq(999999999999999999L, 4611686014132420609L).toDF("id")
      .select(Curation.isqrt($"id").as("r"), $"id")
    assert(big.filter($"r" * $"r" > $"id").count() == 0)
  }

  test("alphaQuotaSample: quotas apportion the exact budget, caps hold") {
    val docs = Tables.documents(spark, sf)
    val out = Curation.alphaQuotaSample(docs, "doc_id", "source", 150L)
    // every source has >= quota rows here, so kept == budget exactly
    assert(out.count() == 150L)
    // within each source the kept ranks are 1..quota (contiguous)
    val bad = out.groupBy("source")
      .agg(max("samp_rank").as("mx"), count(lit(1)).as("n"),
        first("quota").as("q"))
      .filter($"mx" =!= $"n" || $"n" =!= $"q")
    assert(bad.count() == 0)
  }

  // --- tokenEntropy -----------------------------------------------------
  test("tokenEntropy: constant text is zero entropy, uniform is ln k") {
    val df = Seq((1L, "a a a a"), (2L, "a b c d"), (3L, "")).toDF("id", "t")
    val out = TextAnalysis.tokenEntropy(df, "id", "t", lowBelow = 0.5)
      .orderBy("doc_id").collect()
    assert(out(0).getDecimal(3).doubleValue() == 0.0)
    assert(out(0).getBoolean(4)) // 0 < 0.5 -> low-entropy junk
    // ent publishes at DECIMAL(18,6) (round-7 driver-robustness guard)
    assert(math.abs(out(1).getDecimal(3).doubleValue() - math.log(4)) < 1e-5)
    assert(!out(1).getBoolean(4))
    assert(out(2).getInt(1) == 0 && out(2).getDecimal(3).doubleValue() == 0.0)
  }

  // --- tokenDiversity (round 8: the oracle-hashable integer twin) -------
  test("tokenDiversity: exact integer TTR / Simpson and the flag cut") {
    val df = Seq((1L, "a a a a"), (2L, "a b c d"), (3L, "")).toDF("id", "t")
    val out = TextAnalysis.tokenDiversity(df, "id", "t", maxEffVocab = 12)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5)))
    // constant doc: N=4, V=1, ttr=250000, Σc²=16, 12·16 ≥ 16 -> flagged
    assert(out(0) == ((4L, 1L, 250000L, 16L, true)))
    // uniform doc: N=4, V=4, ttr=1e6, Σc²=4, 12·4 ≥ 16 -> ALSO flagged
    // (effective vocab 4 ≤ 12 — short docs concentrate; the corpus
    // cut only separates at realistic lengths)
    assert(out(1) == ((4L, 4L, 1000000L, 4L, true)))
    // empty doc: all zeros, flag false (length gates own that regime)
    assert(out(2) == ((0L, 0L, 0L, 0L, false)))
    // realistic split: 30 distinct tokens ⇒ eff vocab 30 > 12, clean
    val prose = (1 to 30).map(i => s"w$i").mkString(" ")
    val junk = "spam " * 30
    val out2 = TextAnalysis.tokenDiversity(
        Seq((1L, prose), (2L, junk)).toDF("id", "t"), "id", "t")
      .orderBy("doc_id").collect()
    assert(!out2(0).getBoolean(5) && out2(1).getBoolean(5))
  }

  // --- stratifiedKFold --------------------------------------------------
  test("stratifiedKFold: balanced within strata, folds cover [0,k)") {
    val out = Curation.stratifiedKFold(
      Tables.documents(spark, sf).select($"doc_id", $"lang"),
      "doc_id", Seq("lang"), k = 5)
    val sizes = out.groupBy("lang", "fold").count()
      .groupBy("lang").agg((max("count") - min("count")).as("spread"))
    assert(sizes.filter($"spread" > 1).count() == 0)
    assert(out.filter($"fold" < 0 || $"fold" >= 5).count() == 0)
  }

  // --- zoneMapAudit -----------------------------------------------------
  test("zoneMapAudit: fixture zone maps, pruning, and match counts") {
    val df = spark.range(1, 101).select($"id".as("k"), $"id".as("v"))
    val out = ZOrder.zoneMapAudit(df, "k", "v", rowsPerFile = 10L,
        lo = 15L, hi = 25L)
      .orderBy("file_id").collect()
    assert(out.length == 10)
    // file 0 holds 1..10 (pruned), file 1 holds 11..20 (6 matches),
    // file 2 holds 21..30 (5 matches), rest pruned
    assert(out(0).getBoolean(4) && out(0).getLong(5) == 0)
    assert(!out(1).getBoolean(4) && out(1).getLong(5) == 6)
    assert(!out(2).getBoolean(4) && out(2).getLong(5) == 5)
    assert(out.drop(3).forall(_.getBoolean(4)))
    assert(out.map(_.getLong(1)).forall(_ == 10L))
  }

  test("zoneMapAudit: clustered layout prunes more than natural") {
    val orders = Tables.orders(spark, sf)
    def pruned(key: org.apache.spark.sql.Column): Long =
      ZOrder.zoneMapAudit(orders.select(key.as("k"), $"o_custkey"),
        "k", "o_custkey", 500L, 100L, 300L)
        .filter($"pruned").count()
    val natural = pruned($"o_orderkey")
    val clustered = pruned($"o_custkey" * 1000000000L + $"o_orderkey")
    assert(clustered > natural)
  }

  // --- BradleyTerry -----------------------------------------------------
  test("BradleyTerry: hand-computed two-iteration fixed point") {
    // A beats B twice, B beats C twice, A beats C twice
    val contests = Seq(("A", "B"), ("A", "B"), ("B", "C"), ("B", "C"),
      ("A", "C"), ("A", "C")).toDF("w", "l")
    val out = BradleyTerry.strengths(contests, "w", "l", iters = 2)
      .orderBy("player").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == (("A", 4L, 4L, 2400000L)))
    assert(out(1) == (("B", 2L, 4L, 750000L)))
    assert(out(2) == (("C", 0L, 4L, 0L)))
  }

  test("BradleyTerry: transitive dominance orders strengths") {
    val contests = (1 to 5).flatMap(i => (i + 1 to 5).flatMap(j =>
      Seq.fill(3)((s"p$i", s"p$j")))).toDF("w", "l")
    val ps = BradleyTerry.strengths(contests, "w", "l", iters = 3)
      .orderBy("player").select("p").as[Long].collect()
    assert(ps.zip(ps.tail).forall { case (hi, lo) => hi > lo })
  }

  // --- globalCumsums ----------------------------------------------------
  test("globalCumsums: both counters agree with single-column scans") {
    val df = Tables.documents(spark, sf)
      .select($"doc_id", lit(1L).as("one"), $"n_chars")
    val multi = Curation.globalCumsums(df, "doc_id",
      Seq("one" -> "c1", "n_chars" -> "c2"))
    val s1 = Curation.globalCumsum(df, "doc_id", "one")
      .select($"doc_id", $"cum".as("c1"))
    val s2 = Curation.globalCumsum(df, "doc_id", "n_chars")
      .select($"doc_id", $"cum".as("c2"))
    val joined = multi.select($"doc_id", $"c1", $"c2").as("m")
      .join(s1.as("a"), "doc_id").join(s2.as("b"), "doc_id")
    assert(joined.filter($"m.c1" =!= $"a.c1" || $"m.c2" =!= $"b.c2")
      .count() == 0)
  }

  // --- pmiCollocations --------------------------------------------------
  test("pmiCollocations: hand-computed PMI ordering and values") {
    // bigrams: (a,b)x2 (b,a)x1 (c,d)x1 -> T=4; unigrams a=2 b=2 c=1 d=1
    val df = Seq((1L, "a b a b"), (2L, "c d")).toDF("id", "t")
    val out = TextAnalysis.pmiCollocations(df, "id", "t",
      minCount = 1, topK = 10).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2),
        r.getLong(3)))
    assert(out.map(_._1).toSeq ==
      Seq(("c", "d"), ("a", "b"), ("b", "a")))
    // round 8: integer ratio_ppm = c12*T*1e6 DIV (c1*c2); ln is
    // monotone so the ranking is the PMI ranking, zero doubles
    assert(out(0)._3 == 4000000L)  // 1*4/(1*1) = 4
    assert(out(1)._3 == 2000000L)  // 2*4/(2*2) = 2
    assert(out(2)._3 == 1000000L)  // 1*4/(2*2) = 1
    // count floor kills the hapax-pair PMI explosion
    assert(TextAnalysis.pmiCollocations(df, "id", "t", 2, 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "b")))
  }

  // --- hapaxMass --------------------------------------------------------
  test("hapaxMass: exact hapax counts and ppm ratios") {
    val df = Seq((1L, "a a b", "g1"), (2L, "x y z", "g2"))
      .toDF("id", "t", "src")
    val out = TextAnalysis.hapaxMass(df, "id", "t", "src")
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out(0) == (("g1", 3L, 2L, 1L, 333333L, 500000L)))
    assert(out(1) == (("g2", 3L, 3L, 3L, 1000000L, 1000000L)))
  }

  // --- markovNextEventEval ----------------------------------------------
  test("markovNextEventEval: argmax model, holdout accuracy") {
    // train users 1,2 (uid%5!=0): A->B twice, A->C once  => pred(A)=B
    // test user 5: A->B (hit), then B->? none; plus A->C (miss)
    val ev = Seq(
      (1L, "A", 1L, 1L), (1L, "B", 2L, 2L), (1L, "A", 3L, 3L),
      (1L, "B", 4L, 4L),
      (2L, "A", 1L, 5L), (2L, "C", 2L, 6L),
      (5L, "A", 1L, 7L), (5L, "B", 2L, 8L), (5L, "A", 3L, 9L),
      (5L, "C", 4L, 10L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = Metrics.markovNextEventEval(ev, "user_id", "event_type",
      "ts", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // test-user transitions: A->B, B->A, A->C; model: A->B, B->A? train
    // has B->A (user1: B@2 -> A@3). pred(B)=A. So A: 2 tests 1 hit,
    // B: 1 test 1 hit.
    assert(out.toSet == Set(("A", 2L, 1L, 500000L), ("B", 1L, 1L, 1000000L)))
  }

  // --- LabelProp --------------------------------------------------------
  test("LabelProp: hand-traced two-round synchronous labels") {
    // two triangles bridged by 3-4
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val out = graft.operators.LabelProp.run(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1: 1->2 2->1 3->1 4->3 5->4 6->4
    // round 2: 1->1 2->1 3->1 4->4 5->3 6->3
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 3L, 6L -> 3L))
    // symmetrization: feeding both directions changes nothing
    val both = edges.unionByName(
      edges.select($"dst".as("src"), $"src".as("dst")))
    val out2 = graft.operators.LabelProp.run(both, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2 == out)
  }

  test("LabelProp: a clique converges to its smallest label") {
    val clique = (1L to 4L).flatMap(i => (i + 1 to 4L).map(j => (i, j)))
      .toDF("src", "dst")
    val out = graft.operators.LabelProp.run(clique, iters = 3)
      .select("label").as[Long].collect()
    assert(out.forall(_ == 1L))
  }

  // --- bootstrapMeans ---------------------------------------------------
  test("bootstrapMeans: constant values give the constant mean exactly") {
    val df = spark.range(1, 2001).select($"id", lit(10.0).as("v"))
    val out = Stats.bootstrapMeans(df, "id", "v", b = 8, seed = 7L)
    assert(out.count() == 8)
    assert(out.filter($"mean" =!= 10.0).count() == 0)
    // Poisson(1) weights: n_eff concentrates near n (±5 sigma = ±224)
    assert(out.filter(abs($"n_eff" - 2000) > 224).count() == 0)
  }

  test("bootstrapMeans: seed-deterministic, seed-sensitive") {
    val df = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_totalprice")
    def run(seed: Long) = Stats.bootstrapMeans(df, "o_orderkey",
      "o_totalprice", b = 4, seed = seed).orderBy("b").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(run(1L) == run(1L))
    assert(run(1L) != run(2L))
    // round-7: any Long seed is safe (reduced mod P before the affine
    // round — a raw Long.MaxValue previously overflowed under ANSI),
    // and a pre-reduced seed is a no-op (replay compatibility)
    assert(run(Long.MaxValue).nonEmpty && run(Long.MinValue).nonEmpty)
    assert(run(Long.MaxValue % 1000000007L) == run(Long.MaxValue))
  }

  // --- welchTTest -------------------------------------------------------
  test("welchTTest: hand-computed integer fixed-point t² and df") {
    // A = [1,2,3] (mean 2, var 1), B = [2,4] (mean 3, var 2)
    // se2a = 1/3, se2b = 1; t² = 1/(4/3) = 0.75 exactly; df = 32/19.
    // Integer pipeline (hand-traced): se2n = (333333333, 1000000000),
    // du = -1000000, t2_9 = 10^18 DIV 1333333333 = 750000000 exact;
    // df9 runs off milli-coarsened (am,bm) = (333, 1000) so it carries
    // the documented truncation: 1777289*10^9 DIV 1055444 = 1683546450
    // (true df·10^9 = 1684210526 — 4e-4 relative, contract not noise).
    val df = Seq((true, 1.0), (true, 2.0), (true, 3.0),
      (false, 2.0), (false, 4.0)).toDF("arm", "v")
    val r = Metrics.welchTTest(df, "arm", "v").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 2000000L && r.getLong(3) == 3000000L)
    assert(r.getLong(4) == -1L)
    assert(r.getLong(5) == 750000000L)
    assert(r.getLong(6) == 1683546450L)
    assert(math.abs(r.getLong(6) / 1e9 - 32.0 / 19.0) < 1e-3)
  }

  test("welchTTest: degenerate arms publish NULL, never error") {
    // one-row arm (n-1 = 0) and zero-variance pooled case
    val one = Seq((true, 1.0), (false, 2.0), (false, 4.0)).toDF("arm", "v")
    val r1 = Metrics.welchTTest(one, "arm", "v").collect().head
    assert(r1.isNullAt(5) && r1.isNullAt(6))
    val flat = Seq((true, 5.0), (true, 5.0), (false, 5.0), (false, 5.0))
      .toDF("arm", "v")
    val r2 = Metrics.welchTTest(flat, "arm", "v").collect().head
    assert(r2.getLong(4) == 0L && r2.isNullAt(5))
  }

  // --- contentChunks ----------------------------------------------------
  test("contentChunks: exact coverage — chunks reassemble every doc") {
    val docs = Tables.documents(spark, sf)
    val chunks = graft.operators.Dedup.contentChunks(docs, "doc_id",
      "text", window = 4, avgLen = 8)
    val rebuilt = chunks.groupBy("doc_id")
      .agg(sum("n_chunk_toks").as("n_sum"),
        concat_ws(" ", array_sort(collect_list(
          struct($"chunk_id", $"chunk_text"))).getField("chunk_text"))
          .as("joined"))
    val orig = docs.select($"doc_id",
      concat_ws(" ", filter(split(lower($"text"), " "), w => w =!= ""))
        .as("t"))
    val bad = rebuilt.join(orig, "doc_id")
      .filter($"joined" =!= $"t" ||
        $"n_sum" =!= size(split($"t", " ")))
    assert(bad.count() == 0)
  }

  test("contentChunks: short doc is one chunk; insertion re-syncs") {
    val short = Seq((1L, "a b")).toDF("id", "t")
    val sc = graft.operators.Dedup.contentChunks(short, "id", "t", 4, 8)
      .collect()
    assert(sc.length == 1 && sc(0).getString(4) == "a b")
    // a long doc vs the same doc with one token prepended: boundaries
    // re-synchronize after one window, so almost all chunks survive
    val base = (0 until 200).map(i => s"w${i * 7 % 97}").mkString(" ")
    val pair = Seq((1L, base), (2L, "zzz " + base)).toDF("id", "t")
    val byDoc = graft.operators.Dedup.contentChunks(pair, "id", "t", 4, 8)
      .select($"doc_id", $"chunk_text").collect()
      .groupBy(_.getLong(0)).map { case (k, v) =>
        k -> v.map(_.getString(1)).toSet }
    val common = byDoc(1L).intersect(byDoc(2L))
    assert(common.size >= byDoc(1L).size - 2,
      s"resync failed: ${byDoc(1L).size} original, ${common.size} common")
  }

  // --- mutualTopOne -----------------------------------------------------
  test("mutualTopOne: reciprocal pairs only, hub vectors excluded") {
    // 1<->2 and 3<->4 are mutual; 5 points at 2 but 2 points at 1
    val vecs = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.99f, 0.14f)),
      (3L, Array(0f, 1f)), (4L, Array(0.1f, 0.99f)),
      (5L, Array(0.7f, 0.7f))).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.mutualTopOne(spark, vecs,
        "vec_id", "embedding")
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (3L, 4L)))
  }

  test("mutualTopOne pairs are a symmetric subset of directed top-1") {
    val emb = Tables.embeddings(spark, sf).filter($"vec_id" % 20 === 0)
    val top1 = graft.operators.Similarity.bruteForceTopKFast(spark,
        emb.select($"vec_id".as("qid"), $"embedding".as("qvec")),
        emb.select($"vec_id".as("cid"), $"embedding".as("cvec")), k = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    val mutual = graft.operators.Similarity.mutualTopOne(spark, emb,
        "vec_id", "embedding")
      .select("a", "b").as[(Long, Long)].collect()
    assert(mutual.forall { case (a, b) =>
      top1(a) == b && top1(b) == a && a < b })
  }

  // --- vocabGrowth ------------------------------------------------------
  test("vocabGrowth: hand-computed curve; endpoints match corpus totals") {
    val df = Seq((1L, "a b a"), (2L, "b c"), (3L, "a d d")).toDF("id", "t")
    val out = TextAnalysis.vocabGrowth(df, "id", "t")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq((1L, 3L, 2L, 3L, 2L), (2L, 2L, 1L, 5L, 3L),
      (3L, 3L, 1L, 8L, 4L)))
    // corpus endpoints: the curve ends at (total tokens, total types)
    val docs = Tables.documents(spark, sf)
    val last = TextAnalysis.vocabGrowth(docs, "doc_id", "text")
      .orderBy(desc("doc_id")).limit(1).collect().head
    val toks = docs.select(explode(
      filter(split(lower($"text"), " "), w => w =!= "")).as("w"))
    assert(last.getLong(3) == toks.count())
    assert(last.getLong(4) == toks.distinct().count())
  }

  // --- burstiness -------------------------------------------------------
  test("burstiness: clumped token VMR exact, scattered token VMR zero") {
    // x: 4 occurrences in 1 of 4 docs -> VMR (4*16-16)/(4*4) = 3
    // y: 1 occurrence in each doc -> VMR 0
    val df = Seq((1L, "x x x x y"), (2L, "y"), (3L, "y"), (4L, "y"))
      .toDF("id", "t")
    val out = TextAnalysis.burstiness(df, "id", "t", minDf = 1, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(("x", 1L, 4L, 4L, 3000000L),
      ("y", 4L, 4L, 1L, 0L)))
  }

  // --- trendingTokens ---------------------------------------------------
  test("trendingTokens: hand-computed smoothed odds over the id split") {
    // mid = (1+4) div 2 = 2: old = {1,2} (T=4), new = {3,4} (T=5)
    // b: old 1, new 4 -> 1e6*5*4/(2*5) = 2e6; c: old 0, new 1 -> 1.6e6
    val df = Seq((1L, "a a b"), (2L, "a"), (3L, "b b b"), (4L, "b c"))
      .toDF("id", "t")
    val out = TextAnalysis.trendingTokens(df, "id", "t",
      minNew = 1, topK = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("b", 1L, 4L, 2000000L),
      ("c", 0L, 1L, 1600000L)))
  }

  // --- knnOutliers ------------------------------------------------------
  test("knnOutliers flags the isolated vector, not the cluster") {
    val vecs = ((1 to 6).map(i => (i.toLong, Array(1f, i / 100f))) :+
      (7L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.knnOutliers(spark, vecs,
        "vec_id", "embedding",
        k = 2, maxSim = 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(7L))
    assert((1L to 6L).forall(!out(_)))
  }

  // --- bestF1Threshold --------------------------------------------------
  test("bestF1Threshold picks the argmax-F1 row of the sweep") {
    // f1: thr3 -> 666666, thr2 -> 800000, thr1 -> 666666
    val df = Seq((3L, true), (2L, true), (2L, false), (1L, false))
      .toDF("score", "label")
    val r = Metrics.bestF1Threshold(df, "score", "label").collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) == 2L && r.head.getLong(6) == 800000L)
  }

  // --- dedupImpact ------------------------------------------------------
  test("dedupImpact: hand-computed three-stage mass ledger") {
    // doc2 is an exact dup of doc1; doc3's second paragraph repeats
    // its first
    val df = Seq(
      (1L, "a b"), (2L, "a b"),
      (3L, "a b c d e f g h a b c d e f g h")).toDF("id", "t")
    val out = graft.operators.Dedup.dedupImpact(df, "id", "t", paraLen = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("0_raw", 3L, 20L), ("1_exact", 2L, 18L),
      ("2_paragraph", 2L, 10L)))
  }

  // --- plan shapes ------------------------------------------------------
  test("q190 rank window prunes via WindowGroupLimit on the budget") {
    val df = SparkEntry.queries("q190_alpha_sample")(spark, sf)
    df.collect()
    assert(df.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"))
  }

  test("q192/q195/q199 plan no cartesian products") {
    Seq("q192_split_leakage", "q195_bradley_terry", "q199_label_prop")
      .foreach { name =>
        val df = SparkEntry.queries(name)(spark, sf)
        df.collect()
        assert(!df.queryExecution.executedPlan.toString
          .contains("CartesianProduct"), s"$name plans a cartesian")
      }
  }

  // --- splitLeakage -----------------------------------------------------
  test("splitLeakage pairs are exactly the cross-split near-dup pairs") {
    val docs = Tables.documents(spark, sf)
    val leaks = Curation.splitLeakage(docs, "doc_id", "text",
      Seq("lang"), n = 3, thresholdNum = 3, thresholdDen = 5)
    val pairs = graft.operators.Dedup.prefixJaccardPairs(docs, "doc_id",
      "text", 3, 3, 5).select($"a", $"b")
    val splits = Curation.trainValTestSplit(docs, "doc_id", Seq("lang"))
      .select($"doc_id", $"split")
    val expected = pairs
      .join(splits.select($"doc_id".as("a"), $"split".as("sa")), Seq("a"))
      .join(splits.select($"doc_id".as("b"), $"split".as("sb")), Seq("b"))
      .filter($"sa" =!= $"sb")
    assert(leaks.count() == expected.count())
    assert(leaks.select("a", "b").except(expected.select("a", "b"))
      .count() == 0)
    assert(leaks.filter($"split_a" === $"split_b").count() == 0)
  }
}
