package graft

import org.apache.spark.sql.functions._

/** Round-9 session-3 additions: feature-engineering operators (LOO
  * target encoding, hashing-trick vectorizer), BLEU-2 pair stats, and
  * weighted bounded Bellman-Ford. */
class Round9cSpec extends SparkSpec {
  import spark.implicits._

  // --- LOO target encoding ------------------------------------------------
  test("looTargetEncode: self-exclusion is exact; singletons get NULL") {
    val df = Seq(
      ("a", 1), ("a", 0), ("a", 1), // cat a: sum 2 of 3
      ("b", 1)) // singleton
      .toDF("cat", "t")
    val out = graft.operators.Features.looTargetEncode(df, "cat", "t")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toSet
    // a,t=1: (2-1)*1e6/2 = 500000; a,t=0: (2-0)*1e6/2 = 1000000
    assert(out == Set(
      ("a", 1, 3L, Some(500000L)),
      ("a", 0, 3L, Some(1000000L)),
      ("a", 1, 3L, Some(500000L)),
      ("b", 1, 1L, None)))
  }

  // --- feature hashing ----------------------------------------------------
  test("featureHash: occurrences accumulate signed in one bucket; " +
      "bucket/sign follow the portable char fold") {
    val P = 1000000007L
    def fold(w: String): Long =
      w.foldLeft(0L)((acc, c) => ((acc * 31 + c.toInt) % P + P) % P)
    val docs = Seq((1L, "spark spark table")).toDF("doc_id", "text")
    val out = graft.operators.Features.featureHash(docs, "doc_id", "text", 64)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    def entry(w: String, n: Long) = {
      val h = fold(w)
      (h % 64, (1L - 2L * ((h / 64) % 2)) * n, n)
    }
    assert(out == Set(entry("spark", 2), entry("table", 1)))
  }

  test("featureHash: signed collisions may cancel but count survives") {
    // sanity on the fixture: every (doc,bucket) row has n_tokens >= |val|
    val out = graft.operators.Features.featureHash(
      Tables.documents(spark, sf), "doc_id", "text", 64)
    assert(out.filter(abs(col("val")) > col("n_tokens")).isEmpty)
    assert(out.filter(col("bucket") < 0 || col("bucket") >= 64).isEmpty)
  }

  // --- BLEU pairs ---------------------------------------------------------
  test("bleuPairs: identity scores 1e6, disjoint scores 0, repeats clip") {
    val pairs = Seq(
      (1L, "a b c d", "a b c d"), // identical
      (2L, "x y", "p q r"), // disjoint
      (3L, "a a a b", "a b b")) // hyp has 3 a's, ref only 1 -> clip
      .toDF("pid", "hyp", "ref")
    val out = graft.operators.Metrics.bleuPairs(pairs, "pid", "hyp", "ref")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4),
        Option(r.get(5)).map(_.asInstanceOf[Long]),
        r.getLong(6), r.getLong(7),
        Option(r.get(8)).map(_.asInstanceOf[Long]))).toMap
    assert(out(1L) == ((4L, 4L, Some(1000000L), 3L, 3L, Some(1000000L))))
    assert(out(2L) == ((0L, 2L, Some(0L), 0L, 1L, Some(0L))))
    // clip: match1 = min(3,1) for 'a' + min(1,2) for 'b' = 2 of 4
    // bigrams: hyp {a a, a a, a b}, ref {a b, b b} -> match2 = 1 of 3
    assert(out(3L) == ((2L, 4L, Some(500000L), 1L, 3L, Some(333333L))))
  }

  // --- weighted SSSP ------------------------------------------------------
  test("sssp: a cheap 2-hop path beats an expensive direct edge; " +
      "hop bound truncates; unreached nodes are absent") {
    val edges = Seq(
      (1L, 2L, 10L), // direct but expensive
      (1L, 3L, 1L), (3L, 2L, 2L), // cheaper via 3
      (2L, 4L, 1L), (4L, 5L, 1L), // deeper chain
      (9L, 9L, 1L)) // disconnected self-loop
      .toDF("src", "dst", "cost")
    val src = Seq(1L).toDF("node")
    def run(k: Int) = graft.operators.ShortestPaths.sssp(edges, src, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val d3 = run(3)
    assert(d3(1L) == 0L && d3(3L) == 1L && d3(2L) == 3L && d3(4L) == 4L)
    assert(!d3.contains(9L)) // unreachable
    // 3 edges reach 5 only via the expensive direct hop: 10+1+1
    assert(d3(5L) == 12L)
    val d4 = run(4)
    assert(d4(5L) == 5L) // the 4-edge cheap route improves it
    assert(!run(2).contains(5L)) // needs >= 3 edges
    // 2 rounds: node 2 already improved via 3 (both paths fit in 2 hops)
    assert(run(2)(2L) == 3L)
  }

  test("sssp: multi-source takes the per-node minimum over sources") {
    val edges = Seq((1L, 3L, 5L), (2L, 3L, 2L)).toDF("src", "dst", "cost")
    val d = graft.operators.ShortestPaths
      .sssp(edges, Seq(1L, 2L).toDF("node"), iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(d(3L) == 2L && d(1L) == 0L && d(2L) == 0L)
  }

  // --- HyperBall ----------------------------------------------------------
  test("hyperBall: balls grow along the chain, the sink never grows, " +
      "and saturation matches the exact reachable-set registers") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = graft.operators.Sketches.hyperBall(edges, rounds = 3, m = 16)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // radius 0: every node's counter holds only itself
    for (n <- 1L to 3L) assert(out((n, 0))._1 == 1L)
    // the sink (node 3, no out-edges) is identical at every radius
    for (t <- 1 to 3) assert(out((3L, t)) == out((3L, 0)))
    // coverage is monotone: inv_sum never increases with t
    for (n <- 1L to 3L; t <- 1 to 3)
      assert(out((n, t))._2 <= out((n, t - 1))._2, s"node $n t $t")
    // past the diameter nothing changes
    assert(out((1L, 3)) == out((1L, 2)))
    // saturation exactness: node 1's t=2 registers are the HLL state
    // of its exact reachable set {1,2,3}
    val exact = graft.operators.Sketches.hllRegisters(
        Seq((0, 1L), (0, 2L), (0, 3L)).toDF("g", "k"), "g", "k", m = 16)
      .agg(count(lit(1)), sum(expr(
        "shiftleft(CAST(1 AS BIGINT), CAST(25 - max_rho AS INT))")))
      .head()
    val expInv = (16L - exact.getLong(0)) * (1L << 25) + exact.getLong(1)
    assert(out((1L, 2))._1 == exact.getLong(0) &&
      out((1L, 2))._2 == expInv)
  }

  // --- deterministic random walks ------------------------------------------
  test("deterministicWalks: steps follow the PRF replay; sinks stop; " +
      "walks are reproducible") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L)).toDF("src", "dst")
    def run() = graft.operators.RandomWalks
      .deterministicWalks(edges, len = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val out = run()
    // independent replay: ranked out-neighbors by dst, PRF pick
    val P = 1000000007L
    val nbrs = Map(1L -> Seq(2L, 3L), 2L -> Seq(1L))
    def walk(id: Long): Seq[(Long, Int, Long)] = {
      var cur = id
      (0, id) +: (1 to 4).flatMap { s =>
        nbrs.get(cur) match {
          case None => None
          case Some(ns) =>
            val h1 = (id * 1000003L + s * 97L + 12345L) % P
            cur = ns(((h1 * h1 + 17L) % P % ns.size).toInt)
            Some((s, cur))
        }
      }
    }.map { case (s, n) => (id, s, n) }
    assert(out.toSeq == Seq(1L, 2L, 3L).flatMap(walk))
    // node 3 is a sink: its walk is just the start row
    assert(out.count(_._1 == 3L) == 1)
    assert(run().toSeq == out.toSeq) // reproducible
  }

  // --- MMR selection --------------------------------------------------------
  test("mmrSelect: relevance ranks first, diversity penalizes " +
      "redundancy, exhaustion stops early") {
    val vecs = Seq(
      (1L, Seq(10L, 0L)), // identical to the query: rel 100
      (2L, Seq(9L, 1L)), // near the query: rel 90
      (3L, Seq(0L, 10L))) // orthogonal: rel 0
      .toDF("id", "q")
    val out = graft.operators.Coreset
      .mmrSelect(vecs, Seq(10L, 0L), k = 5, lambdaMilli = 700L)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // round 1: 700·rel -> id1 at 70000
    // round 2: id2 = 700·90 − 300·dot([9,1],[10,0]) = 63000 − 27000;
    //          id3 = 0 − 0 -> id2 wins at 36000
    // round 3: id3 = 0 − 300·max(0, 10) = −3000 (sim to id2 is 10)
    // round 4: no candidates left -> 3 rows
    assert(out.toSeq == Seq(
      (1, 1L, 100L, 70000L),
      (2, 2L, 90L, 36000L),
      (3, 3L, 0L, -3000L)))
  }

  // --- ER pipeline ---------------------------------------------------------
  test("er pipeline: clusters are bipartite-consistent on the fixture") {
    // sf0.001's customer/supplier tables are too small to produce any
    // match-decision pair; the driver's sf0.01 scale does
    val out = SparkEntry.queries("q266_er_pipeline")(
      spark, "/root/testdata/sf0.01").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (members, nc, ns) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(members == nc + ns)
      // a match edge always links one customer and one supplier, so
      // every component has both sides represented
      assert(nc >= 1 && ns >= 1)
      assert(!r.isNullAt(4) && !r.isNullAt(5))
      // the cluster label is the component's minimum encoded key
      val minEnc = math.min(r.getLong(4) * 2, r.getLong(5) * 2 + 1)
      assert(r.getLong(0) <= minEnc)
    }
  }

  // --- partition pruning ----------------------------------------------------
  test("partition pruning: the scan touches only the filtered " +
      "priority's directory") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_prune_spec").toString
    Tables.orders(spark, sf).write.mode("overwrite")
      .partitionBy("o_orderpriority").parquet(tmp)
    val pruned = spark.read.parquet(tmp)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    // the filter must reach the scan as a PARTITION filter (directory
    // pruning), not a data filter
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
    assert(scan.partitionFilters.exists(
      _.toString.contains("1-URGENT")))
    assert(scan.relation.partitionSchema.fieldNames
      .contains("o_orderpriority"))
    // and the pruned count matches the plain filter
    assert(pruned.count() ==
      Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT").count())
  }

  // --- sketch rollup --------------------------------------------------------
  test("hll registers merge: max-per-register over shards equals the " +
      "whole-data sketch") {
    val docs = Tables.documents(spark, sf)
    def regs(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Sketches.hllRegisters(
          df.withColumn("g", lit("x")), "g", "doc_id", m = 64)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    val whole = regs(docs)
    val a = regs(docs.filter(col("doc_id") % 2 === 0))
    val b = regs(docs.filter(col("doc_id") % 2 === 1))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> math.max(a.getOrElse(k, 0L), b.getOrElse(k, 0L))).toMap
    assert(merged == whole)
  }

  // --- unigram segmentation -------------------------------------------------
  test("viterbiSegment: finds the global optimum a greedy longest-" +
      "match would miss; ties break to the smaller path") {
    val docs = Seq("abcd ab").toDF("text") // words to segment
    val vocab = Seq(("a", 1L), ("b", 1L), ("c", 1L), ("d", 1L),
      ("ab", 10L), ("bcd", 100L))
      .toDF("piece", "score")
    val out = graft.operators.UnigramSegment
      .viterbiSegment(docs, "text", vocab)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2), r.getString(3))).toMap
    // greedy left-to-right longest match takes ab|c|d = 12;
    // Viterbi finds a|bcd = 101
    assert(out("abcd") == ((101L, 2, "a|bcd")))
    // 'ab': paths ab (10) and a|b (2) — score decides; with score tie
    // the smaller path string wins (see next assertion)
    assert(out("ab") == ((10L, 1, "ab")))
    val tieV = Seq(("a", 5L), ("b", 5L), ("ab", 10L))
      .toDF("piece", "score")
    val tie = graft.operators.UnigramSegment
      .viterbiSegment(Seq("ab").toDF("text"), "text", tieV)
      .collect().head
    assert(tie.getString(3) == "ab") // "ab" < "a|b" lexicographically
  }

  test("pieceVocab: overlap counts, singleton chars survive the " +
      "threshold, rare long pieces don't") {
    val v = graft.operators.UnigramSegment
      .pieceVocab(Seq("aaa").toDF("text"), "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    // a: 3 overlapping occurrences; aa: 2; aaa: 1 -> dropped (len>1, cnt<2)
    assert(v == Set(("a", 3L, 3L), ("aa", 2L, 8L)))
  }

  test("viterbiSegment: a word with no covering pieces yields no row") {
    val out = graft.operators.UnigramSegment.viterbiSegment(
      Seq("xy").toDF("text"), "text",
      Seq(("x", 1L)).toDF("piece", "score"))
    assert(out.isEmpty)
  }

  // --- streaming sketch maintenance ----------------------------------------
  test("streaming HLL registers equal the batch sketch of the same rows") {
    val stream = graft.streaming.StreamSketch.hllPerType(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.operators.Sketches.hllRegisters(
        Tables.events(spark, sf), "event_type", "user_id", m = 64)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(stream == batch && stream.nonEmpty)
  }

  // --- exact k-th / median --------------------------------------------------
  test("exactKth: equals the sorted order for every rank, across " +
      "rounds, negatives, and duplicates") {
    val xs = Seq(5L, -17L, 5L, 0L, 99999L, -17L, 42L, 7L, 7L, 123456789L)
    val df = xs.toDF("v")
    val sorted = xs.sorted
    for (k <- 1 to xs.size)
      assert(graft.operators.Stats.exactKth(df, "v", k, fanout = 4)
        == sorted(k - 1), s"k=$k")
    val (n, med) = graft.operators.Stats.exactMedian(df, "v")
    assert(n == 10L && med == sorted(4)) // lower median, rank (10+1)/2=5
  }

  test("exactKth: min/max spanning more than half the 64-bit domain " +
      "(sentinel values mixed with real data) stays exact — the " +
      "sign-bit bisection prevents silent Long overflow") {
    val xs = Seq(Long.MinValue, Long.MinValue + 3, -5L, 0L, 7L,
      Long.MaxValue - 2, Long.MaxValue)
    val df = xs.toDF("v")
    val sorted = xs.sorted
    for (k <- 1 to xs.size)
      assert(graft.operators.Stats.exactKth(df, "v", k, fanout = 4)
        == sorted(k - 1), s"k=$k")
  }

  // --- chi-square term association -----------------------------------------
  test("chi2Terms: perfect class predictor scores N*1e6, independent " +
      "token scores 0, universal token degenerates to NULL") {
    val docs = Seq(
      (1L, "x y common", "a"), (2L, "x common", "a"),
      (3L, "y common z", "b"), (4L, "common z", "b"))
      .toDF("doc_id", "text", "lang")
    val out = graft.operators.Stats
      .chi2Terms(docs, "doc_id", "text", "lang")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        Option(r.get(6)).map(_.asInstanceOf[Long])).toMap
    // 'x' occurs in both class-a docs and nowhere else: chi2 = N
    assert(out(("x", "a")) == Some(4000000L))
    // 'y' occurs once in each class: ad = bc -> 0
    assert(out(("y", "a")) == Some(0L) && out(("y", "b")) == Some(0L))
    // 'common' is in every doc: margin degenerate -> NULL
    assert(out(("common", "a")).isEmpty && out(("common", "b")).isEmpty)
  }

  // --- sequential pairs / fairness -----------------------------------------
  test("seqPairs: strict before-ness from extrema; self-pairs need " +
      "two distinct timestamps") {
    val ev = Seq(
      (1L, "a", 1L), (1L, "b", 2L), // a before b
      (2L, "b", 1L), (2L, "a", 2L), // b before a
      (3L, "a", 1L), (3L, "a", 3L)) // a twice
      .toDF("user_id", "event_type", "ts")
    val out = graft.operators.Temporal
      .seqPairs(ev, "user_id", "event_type", "ts")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out(("a", "b")) == ((1L, 333333L)))
    assert(out(("b", "a")) == ((1L, 333333L)))
    assert(out(("a", "a")) == ((1L, 333333L))) // only user 3
    assert(!out.contains(("b", "b"))) // no user saw b twice
  }

  test("fairnessRates: ppm floors and signed gaps are exact") {
    val df = Seq(("x", 1), ("x", 1), ("x", 0), ("y", 0), ("y", 1))
      .toDF("seg", "pos")
    val out = graft.operators.Temporal
      .fairnessRates(df, "seg", col("pos") === 1)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // overall: 3 of 5 = 600000
    assert(out("x") == ((3L, 2L, 666666L, 600000L, 66666L)))
    assert(out("y") == ((2L, 1L, 500000L, 600000L, -100000L)))
  }

  // --- harmonic centrality / walk PMI / dedup recall -----------------------
  test("harmonicCentrality: clamped 1/t-weighted ball deltas; chain " +
      "head outranks the sink") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val hc = graft.operators.Sketches
      .harmonicCentrality(edges, rounds = 3, m = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // independent re-derivation from the hyperBall stats
    val hb = graft.operators.Sketches.hyperBall(edges, rounds = 3, m = 16)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(4)))
      .toMap
    val exp = Seq(1L, 2L, 3L).map { n =>
      n -> (1 to 3).map(t =>
        math.max(hb((n, t)) - hb((n, t - 1)), 0L) / t).sum
    }.toMap
    assert(hc == exp)
    assert(hc(1L) > hc(3L)) // head reaches 2 nodes, sink reaches none
    assert(hc(3L) == 0L)
  }

  test("walkPmi: pair and unigram counts match an independent replay " +
      "of the walk corpus") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
      .toDF("src", "dst")
    val walks = graft.operators.RandomWalks
      .deterministicWalks(edges, len = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byWalk = walks.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3)).toMap
    val expPairs = byWalk.values.toSeq
      .flatMap(p => p.zip(p.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = graft.operators.RandomWalks.walkPmi(edges, len = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == expPairs)
  }

  test("dedup recall audit: verified LSH pairs are a subset of the " +
      "exact truth (precision is exactly 1e6 or the empty sentinel)") {
    val row = SparkEntry.queries("q280_dedup_recall")(spark, sf).head()
    val (ne, nl, nb) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nb <= ne && nb <= nl)
    assert(nb == nl) // post-verified LSH never emits a non-duplicate
    assert(row.getLong(4) == (if (nl > 0) 1000000L else -1L))
  }

  // --- outer stream-stream join --------------------------------------------
  test("stream outer join: resolved region equals the batch left join; " +
      "null rows actually emit") {
    val out = graft.streaming.EventsStream
      .errorPurchaseOuterJoin(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val ev = Tables.events(spark, sf)
    val cutoff = ev
      .filter(col("event_type").isin("error", "purchase"))
      .groupBy("event_type").agg(max(col("ts")).as("mx"))
      .agg(min(col("mx"))).head().getTimestamp(0).toInstant
      .minusSeconds(2 * 3600)
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id").as("eu"),
        col("ts").as("e_ts"))
      .filter(col("e_ts") <= lit(java.sql.Timestamp.from(cutoff)))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("pu"),
        col("ts").as("p_ts"))
    val batch = e.join(p,
        col("eu") === col("pu") &&
          col("p_ts") >= col("e_ts") - expr("INTERVAL 30 MINUTES") &&
          col("p_ts") <= col("e_ts"), "left")
      .groupBy(col("eu"))
      .agg(count(lit(1)).as("n"), count(col("purchase_id")).as("m"),
        sum(when(col("purchase_id").isNull, 1L).otherwise(0L)).as("u"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out == batch && out.nonEmpty)
    assert(out.values.map(_._3).sum > 0L) // nulls emitted
  }

  // --- lagged cross-correlation --------------------------------------------
  test("laggedCrossStats: lag 0 self-pairs are symmetric sums; a " +
      "planted 1-day lead shows full overlap at lag 1") {
    // series A fires on days 0,1,2; series B on days 1,2,3 (A leads by 1)
    def t(day: Long) = new java.sql.Timestamp(day * 86400000L)
    val ev = Seq(
      ("A", t(0)), ("A", t(1)), ("A", t(1)), ("A", t(2)),
      ("B", t(1)), ("B", t(2)), ("B", t(3)), ("B", t(3)))
      .toDF("event_type", "ts")
    val out = graft.operators.Temporal
      .laggedCrossStats(ev, "event_type", "ts", maxLag = 1)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) ->
        (r.getLong(3), r.getLong(6))).toMap
    // A daily: d0=1, d1=2, d2=1; B daily: d1=1, d2=1, d3=2
    // (A,A,0): n=3, sum_xy = 1+4+1 = 6
    assert(out(("A", "A", 0)) == ((3L, 6L)))
    // (A,B,0): overlap d1,d2 -> n=2, xy = 2*1 + 1*1 = 3
    assert(out(("A", "B", 0)) == ((2L, 3L)))
    // (A,B,1): x_t vs y_{t+1}: overlap d0,d1,d2 -> n=3,
    // xy = 1*1 + 2*1 + 1*2 = 5 (the planted lead: FULL overlap)
    assert(out(("A", "B", 1)) == ((3L, 5L)))
    // (B,A,1): y=x_{t+1} of A: B days 1,2,3 vs A days 2,3,4 ->
    // overlap d1(d2 of A): 1*1, d2(d3 of A): none... A has no d3
    assert(out(("B", "A", 1)) == ((1L, 1L)))
  }

  // --- HLL accuracy / cumulative distinct ----------------------------------
  test("hllAccuracy: estimate within the m=16 error regime on the " +
      "fixture; err sign matches est vs exact") {
    val out = graft.operators.Sketches.hllAccuracy(
        Tables.lineitem(spark, sf), "l_returnflag", "l_partkey")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (exact, est, err) = (r.getLong(1), r.getLong(5), r.getLong(6))
      // 1/sqrt(16) ~ 26% standard error; 3 sigma bound
      assert(math.abs(est - exact) <= math.max(3, (exact * 78) / 100),
        s"est $est vs exact $exact")
      assert((err >= 0) == (est >= exact))
    }
  }

  test("cumulativeDistinct: curves are the running sum of first " +
      "appearances and end at the exact distinct count") {
    def t(day: Long) = new java.sql.Timestamp(day * 86400000L)
    val ev = Seq(
      ("A", 1L, t(0)), ("A", 1L, t(5)), // user 1 repeats: counts once
      ("A", 2L, t(1)), ("A", 3L, t(1)), ("B", 1L, t(2)))
      .toDF("event_type", "user_id", "ts")
    val out = graft.operators.Temporal
      .cumulativeDistinct(ev, "event_type", "user_id", "ts")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out(("A", 0L)) == ((1L, 1L)))
    assert(out(("A", 1L)) == ((2L, 3L)))
    assert(!out.contains(("A", 5L))) // repeat adds no first-appearance
    assert(out(("B", 2L)) == ((1L, 1L)))
  }

  // --- multi-probe LSH ------------------------------------------------------
  test("lshMultiProbeTopK: candidates superset the single-probe " +
      "kernel, so per-rank scores never get worse") {
    val vecs = Tables.embeddings(spark, sf)
    def ranks(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(3)).toMap
    val single = ranks(graft.operators.Similarity
      .lshPortableTopK(vecs, 64, 8, 5, 20))
    val multi = ranks(graft.operators.Similarity
      .lshMultiProbeTopK(vecs, 64, 8, 5, 20))
    assert(multi.nonEmpty)
    // every (query, rank) present in single is present in multi with
    // an idot at least as large (probe supersets)
    single.foreach { case (qr, dot) =>
      assert(multi.contains(qr) && multi(qr) >= dot, s"$qr")
    }
    assert(multi.size >= single.size)
  }

  // --- ADC re-rank ----------------------------------------------------------
  test("adcRerankTopK: results come from the ADC shortlist, ordered " +
      "by independently-recomputed exact distance") {
    val qv = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"),
        graft.operators.Similarity.quantize16(col("embedding")).as("q"))
    val cb = graft.operators.Quantization.pqTrain(qv, 8, 8, 4, 2)
    val coarse = graft.operators.IvfIndex.trainPortable(spark, qv, 4, 2)
    val queries = qv.filter(col("id") % 20 === 0)
      .select(col("id").as("qid"), col("q"))
    val sl = graft.operators.Quantization
      .ivfAdcTopK(queries, qv, coarse, cb, 8, 8, 2, 15)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val rr = graft.operators.Quantization
      .adcRerankTopK(queries, qv, coarse, cb, 8, 8, 2, 15, 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rr.nonEmpty)
    rr.foreach { case (q, _, n, _) => assert(sl.contains((q, n))) }
    // per query, exact_d2 nondecreasing in rank
    rr.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2).map(_._4)
      assert(sorted.sliding(2).forall(p => p.head <= p.last))
    }
    // exact_d2 matches an independent recomputation
    val vecs = qv.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1)).toMap
    rr.foreach { case (q, _, n, d2) =>
      val exp = vecs(q).zip(vecs(n))
        .map { case (a, b) => (a - b) * (a - b) }.sum
      assert(d2 == exp)
    }
  }

  // --- KS drift / Theil-Sen ------------------------------------------------
  test("ksDrift: identical samples score 0; disjoint supports score " +
      "the full n_a*n_b; ties evaluate after the value") {
    val df = Seq(
      // group "same": A and B identical -> KS 0
      ("same", 1L, 1), ("same", 2L, 1), ("same", 1L, 0), ("same", 2L, 0),
      // group "disj": A all below B -> KS = nA*nB
      ("disj", 1L, 1), ("disj", 2L, 1), ("disj", 10L, 0))
      .toDF("g", "v", "a")
    val out = graft.operators.Stats
      .ksDrift(df, "g", "v", col("a") === 1)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(out("same") == ((2L, 2L, 0L, 0L)))
    assert(out("disj") == ((2L, 1L, 2L, 1000L)))
  }

  test("theilSen: robust to one outlier point; exact rational median") {
    // y = 2x line with one wild outlier at x=10
    val df = Seq(
      ("t", 0L, 0L), ("t", 1L, 2L), ("t", 2L, 4L), ("t", 3L, 6L),
      ("t", 10L, 1000L))
      .toDF("g", "x", "y")
    val r = graft.operators.Stats.theilSen(df, "g", "x", "y").head()
    // 10 pairs; 6 clean pairs all slope 2; outlier pairs larger ->
    // lower median (rank 5) lands on slope 2 (pairs sorted by slope)
    assert(r.getLong(1) == 10L)
    assert(r.getLong(2).toDouble / r.getLong(3) == 2.0)
    assert(r.getLong(4) == 2000L)
  }

  test("mmrSelect: lambda 1000 is pure relevance order") {
    val vecs = Seq(
      (1L, Seq(1L, 0L)), (2L, Seq(5L, 0L)), (3L, Seq(3L, 0L)))
      .toDF("id", "q")
    val out = graft.operators.Coreset
      .mmrSelect(vecs, Seq(1L, 0L), k = 3, lambdaMilli = 1000L)
      .collect().map(r => r.getLong(1)).toSeq
    assert(out == Seq(2L, 3L, 1L))
  }
}
