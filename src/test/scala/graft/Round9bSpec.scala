package graft

import org.apache.spark.sql.functions._

/** Round-9 session-2 additions: the Bloom sketch family (mergeable
  * registers + the runtime-filter semi-join reduction), and the
  * operators that follow in this batch. */
class Round9bSpec extends SparkSpec {
  import spark.implicits._

  // --- Bloom registers: mergeable state ---------------------------------
  test("bloomRegisters: union over a disjoint split equals the whole") {
    val orders = Tables.orders(spark, sf)
    def bits(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Sketches
        .bloomRegisters(df, "o_orderpriority", "o_custkey", 512, 3)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val whole = bits(orders)
    val a = bits(orders.filter(col("o_orderkey") % 2 === 0))
    val b = bits(orders.filter(col("o_orderkey") % 2 === 1))
    assert(whole.nonEmpty)
    assert((a union b) == whole) // Bloom merge = bitwise OR = set union
  }

  test("bloomRegisters: membership has no false negatives") {
    val orders = Tables.orders(spark, sf)
    val reg = graft.operators.Sketches
      .bloomRegisters(orders, "o_orderpriority", "o_custkey", 512, 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // every inserted key's 3 bits must all be present in its group
    val keys = orders.select(col("o_orderpriority"),
        col("o_custkey").cast("long")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val P = 1000000007L
    def bit(k: Long, j: Int): Long = {
      val h1 = Math.floorMod(k * (1000003L + 97L * j) + (12345L + 1013L * j), P)
      Math.floorMod(h1 * h1 + (17L + 29L * j), P) % 512
    }
    assert(keys.nonEmpty)
    keys.foreach { case (g, k) =>
      (0 until 3).foreach(j => assert(reg.contains((g, bit(k, j)))))
    }
  }

  // --- Bloom semi-join reduction: exactness under pruning ---------------
  test("bloomSemiReduceStats: matches equal the unreduced exact semi-join") {
    val li = Tables.lineitem(spark, sf)
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
    val stats = graft.operators.Sketches.bloomSemiReduceStats(
        li, "l_orderkey", "l_returnflag", urgent, "o_orderkey",
        mBits = 16384, depth = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    // ground truth: plain exact semi-join counts, no Bloom involved
    val exact = li.join(urgent.select(col("o_orderkey")).distinct(),
        li("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val probeTotals = li.groupBy("l_returnflag").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(stats.nonEmpty)
    stats.foreach { case (g, nProbe, nCand, nMatch, nFp) =>
      assert(nProbe == probeTotals(g))
      assert(nMatch == exact.getOrElse(g, 0L)) // no false negatives
      assert(nCand == nMatch + nFp)
      assert(nCand >= nMatch && nCand <= nProbe)
    }
  }

  // --- k-core peeling ---------------------------------------------------
  test("kcore: a planted 4-clique survives k=3, tails and bridges peel") {
    // 4-clique {1,2,3,4}; chain 4-5-6; 5 also touches 7 — nothing
    // outside the clique can keep 3 induced neighbors
    val clique = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val edges = (clique ++ Seq((4L, 5L), (5L, 6L), (5L, 7L)))
      .toDF("src", "dst")
    val out = graft.operators.KCore.peel(edges, k = 3, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == (1L to 7L).toSeq)
    assert(out.filter(_._2).map(_._1).toSet == Set(1L, 2L, 3L, 4L))
    // induced degree inside the surviving clique is exactly 3
    out.filter(_._2).foreach { case (_, _, d) => assert(d == 3L) }
    out.filterNot(_._2).foreach { case (_, _, d) => assert(d == 0L) }
  }

  test("kcore: at fixpoint every survivor keeps >= k induced neighbors") {
    // ring of 8 (degree 2 everywhere): k=2 keeps all, k=3 empties it
    val ring = (0L until 8L).map(i => (i, (i + 1) % 8)).toDF("src", "dst")
    val k2 = graft.operators.KCore.peel(ring, k = 2, rounds = 3).collect()
    assert(k2.forall(_.getBoolean(1)) && k2.length == 8)
    k2.foreach(r => assert(r.getLong(2) >= 2L))
    val k3 = graft.operators.KCore.peel(ring, k = 3, rounds = 3).collect()
    assert(k3.forall(!_.getBoolean(1)))
  }

  // --- winnowing --------------------------------------------------------
  test("winnowing: a shared run of >= w+k-1 tokens yields a shared " +
      "fingerprint (the MOSS coverage guarantee)") {
    val k = 3; val w = 4
    // shared run of exactly w+k-1 = 6 tokens inside unrelated padding
    val shared = "quick brown foxes jump over fences"
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon"),
      (2L, s"one two $shared three four five six")).toDF("doc_id", "text")
    val fps = graft.operators.Dedup
      .winnowFingerprints(docs, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val a = fps.filter(_._1 == 1L).map(_._2).toSet
    val b = fps.filter(_._1 == 2L).map(_._2).toSet
    assert((a intersect b).nonEmpty)
  }

  test("winnowing: short docs degrade to one overall-min fingerprint; " +
      "sub-k docs contribute none") {
    val docs = Seq(
      (1L, "just four little words"), // 2 grams < w=4 -> single min
      (2L, "tiny doc")                // 2 tokens < k=3 -> no grams
    ).toDF("doc_id", "text")
    val fps = graft.operators.Dedup
      .winnowFingerprints(docs, "doc_id", "text", 3, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fps.count(_._1 == 1L) == 1)
    assert(!fps.exists(_._1 == 2L))
  }

  test("winnowOverlapPairs: duplicated docs pair up, unrelated don't") {
    val body = "the winnowing scheme selects the minimum hash of every " +
      "window of consecutive gram hashes across the documents"
    val docs = Seq(
      (1L, body), (2L, body + " with a small tail edit"),
      (3L, "completely different content about nothing in particular " +
        "that shares no runs with anything else here")
    ).toDF("doc_id", "text")
    val pairs = graft.operators.Dedup
      .winnowOverlapPairs(docs, "doc_id", "text", 4, 8, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  // --- CM join-size estimation -------------------------------------------
  test("cmJoinSizeEstimate: one-sided (est >= exact) and exact when " +
      "the sketch is collision-free") {
    val li = Tables.lineitem(spark, sf)
    val pt = Tables.part(spark, sf).filter(col("p_size") > 25)
    val row = graft.operators.Sketches
      .cmJoinSizeEstimate(li, "l_partkey", pt, "p_partkey").head()
    val (est, exact) = (row.getLong(0), row.getLong(1))
    assert(exact > 0 && est >= exact) // CM inner product never undershoots
    // one key each side, wide sketch: no collisions possible -> exact
    val a = Seq(7L, 7L, 7L).toDF("k")
    val b = Seq(7L, 7L).toDF("k")
    val small = graft.operators.Sketches
      .cmJoinSizeEstimate(a, "k", b, "k", depth = 4, width = 64).head()
    assert(small.getLong(0) == 6L && small.getLong(1) == 6L)
    assert(small.getLong(2) == 1000000L)
  }

  // --- run-collapsed SCD2 -------------------------------------------------
  test("scd2Intervals: no-op updates open no interval; intervals tile") {
    val log = Seq(
      (1L, 1, "A"), (1L, 2, "A"), (1L, 3, "B"), (1L, 4, "B"), (1L, 5, "A"),
      (2L, 1, "X")).toDF("key", "seq", "v")
    val out = graft.operators.Cdc
      .scd2Intervals(log, "key", Seq("seq"), Seq("v"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        Option(r.get(3)).map(_.asInstanceOf[Int]), r.getBoolean(4)))
      .sortBy(t => (t._1, t._3))
    assert(out.toSeq == Seq(
      (1L, "A", 1, Some(3), false),
      (1L, "B", 3, Some(5), false),
      (1L, "A", 5, None, true),
      (2L, "X", 1, None, true)))
  }

  // --- TextRank ------------------------------------------------------------
  test("textRankKeywords: the hub word outranks the leaves") {
    // star graph: "central" is adjacent to every other candidate word
    val docs = Seq(
      (1L, "central alpha central beta central gamma"),
      (2L, "central delta central epsilon")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .textRankKeywords(docs, "doc_id", "text", iters = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.head._1 == "central" && out.head._3 == 1)
    assert(out.map(_._3).toSeq == (1 to out.length).toSeq)
    // ranks are non-increasing in kw_rank order
    assert(out.sliding(2).forall(p => p.head._2 >= p.last._2))
  }

  // --- personalized PageRank ----------------------------------------------
  test("personalized: mass localizes at the seeds; unreachable nodes " +
      "settle at 0; uniform seed set over all nodes equals global PR") {
    // two components: 1->2->3 (cycle back 3->1) and isolated 4->5
    val edges = Seq(
      (1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L),
      (4L, 5L, 1L), (5L, 4L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("node")
    val ppr = graft.operators.PageRank
      .personalized(edges, seeds, iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // nodes 4,5 are unreachable from seed 1 -> exactly 0
    assert(ppr(4L) == 0L && ppr(5L) == 0L)
    // reachable component holds all the mass; seed outranks nothing
    // here (cycle equalizes) but every score is positive
    assert(Seq(1L, 2L, 3L).forall(n => ppr(n) > 0L))
    // seeding EVERY node uniformly reproduces global PageRank exactly:
    // b(v) = scale/|V| = r0, the same recurrence as run()
    val all = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val uni = graft.operators.PageRank.personalized(edges, all, iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val glob = graft.operators.PageRank.run(edges, iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(uni == glob)
  }

  test("personalized: requires at least one in-graph seed") {
    val edges = Seq((1L, 2L, 1L)).toDF("src", "dst", "w")
    val none = Seq(99L).toDF("node") // not in the graph
    intercept[IllegalArgumentException] {
      graft.operators.PageRank.personalized(edges, none, iters = 2)
    }
  }

  // --- greedy max-coverage --------------------------------------------------
  test("greedyMaxCoverage: picks the superset doc first, then the " +
      "disjoint one; gains are non-increasing and totals accumulate") {
    // doc 1 covers bigrams of "a b c d"; doc 2 is a subset ("a b c");
    // doc 3 is disjoint ("x y z"); doc 4 duplicates doc 3
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c"), (3L, "x y z"), (4L, "x y z"))
      .toDF("doc_id", "text")
    val out = graft.operators.Curation
      .greedyMaxCoverage(docs, "doc_id", "text", n = 2, k = 4)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // pick 1: doc 1 (3 bigrams); pick 2: doc 3 (2 new, id tie-break
    // beats doc 4); pick 3: gain 0 -> early stop, only 2 rows
    assert(out.toSeq == Seq((1, 1L, 3L, 3L), (2, 3L, 2L, 5L)))
  }

  test("greedyMaxCoverage: covered_total matches distinct-union size " +
      "on the sf fixture") {
    val docs = Tables.documents(spark, sf)
    val picks = graft.operators.Curation
      .greedyMaxCoverage(docs, "doc_id", "text", n = 2, k = 3)
      .collect()
    assert(picks.length == 3)
    val ids = picks.map(_.getLong(1))
    val unionSize = docs
      .filter(col("doc_id").isin(ids: _*))
      .select(explode(graft.operators.Dedup.shingles(col("text"), 2)))
      .distinct().count()
    assert(picks.last.getLong(3) == unionSize)
    // gains non-increasing (submodularity of the greedy trace)
    val gains = picks.map(_.getLong(2)).toSeq
    assert(gains.sliding(2).forall(p => p.head >= p.last))
  }
}
