package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Dedup / similarity operators against constructed near-duplicate
  * corpora with known ground truth. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 7) "CHANGED" else s"tok$i")
      .mkString(" ")
    val unrelated = (100 to 140).map(i => s"other$i").mkString(" ")
    Seq((1L, base), (2L, base), (3L, nearDup), (4L, unrelated))
      .toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts under min-id keeper") {
    val got = Dedup.exact(corpus, $"text", $"doc_id")
      .filter($"dup_count" > 1)
      .select("keeper_id", "dup_count").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L)))
  }

  test("ngram Jaccard finds the near-dup with the right similarity") {
    val pairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(pairs((1L, 2L)) == 1.0)          // identical
    // doc3 differs in 1 of 40 tokens -> 3 of 38 shingles changed:
    // common = 35, union = 38 + 38 - 35 = 41
    assert(math.abs(pairs((1L, 3L)) - 35.0 / 41.0) < 1e-12)
    assert(!pairs.contains((1L, 4L)))       // no shared shingle
  }

  test("MinHash LSH surfaces the true near-dups above threshold") {
    val got = MinHashLSH.nearDuplicates(corpus, "doc_id", "text",
      shingleN = 3, k = 32, bands = 8, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)) && got.contains((1L, 3L))
      && got.contains((2L, 3L)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("SimHash: identical docs get identical fingerprints; near-dups close") {
    val fps = SimHash.fingerprints(corpus, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(2L))
    val d13 = java.lang.Long.bitCount(fps(1L) ^ fps(3L))
    val d14 = java.lang.Long.bitCount(fps(1L) ^ fps(4L))
    assert(d13 < d14, s"near-dup distance $d13 should beat unrelated $d14")
    val pairs = SimHash.nearPairs(
      SimHash.fingerprints(corpus, "doc_id", "text"), maxDist = 10)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("LSH ANN returns true top neighbors for clustered vectors") {
    // 3 tight clusters; LSH must recover same-cluster neighbors
    def vec(c: Int, j: Int): Array[Float] =
      Array.tabulate(8)(d => (if (d % 3 == c) 1.0f else 0.0f)
        + 0.01f * ((j * 7 + d) % 5))
    val rows = for (c <- 0 until 3; j <- 0 until 4)
      yield (c * 10L + j, vec(c, j))
    val df = rows.toDF("qid", "qvec")
    val corpusDf = df.toDF("cid", "cvec")
    val brute = Similarity.bruteForceTopK(df, corpusDf, k = 3)
      .filter($"rank" === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val lsh = Similarity.lshTopK(df, corpusDf, dims = 8, nPlanes = 4, k = 3)
      .filter($"rank" === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    // rank-1 neighbors from LSH must be same-cluster, and mostly agree
    // with brute force
    val agree = brute.keys.count(k => lsh.get(k).contains(brute(k)))
    assert(agree >= brute.size / 2, s"LSH agreed on $agree/${brute.size}")
    lsh.foreach { case (q, n) => assert(q / 10 == n / 10,
      s"query $q matched cross-cluster neighbor $n") }
  }

  test("minhash kernel is bit-equal to the declarative signature form") {
    val docs = Tables.documents(spark, sf).limit(200)
    val a = MinHashLSH.signaturesKernel(docs, "doc_id", "text", 3, 16)
      .as[(Long, Seq[Long])].collect().toMap
    val b = MinHashLSH.signatures(docs, "doc_id", "text", 3, 16)
      .as[(Long, Seq[Long])].collect().toMap
    assert(a.keySet == b.keySet)
    a.keys.foreach(id => assert(a(id) == b(id), s"sig mismatch for $id"))
  }

  test("sparse and dense minhash pipelines emit identical verified pairs") {
    val docs = Tables.documents(spark, sf)
    val dense = MinHashLSH.nearDuplicates(docs, "doc_id", "text")
      .select("a", "b").as[(Long, Long)].collect().toSet
    val sparse = MinHashLSH.nearDuplicatesSparse(docs, "doc_id", "text")
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(dense == sparse)
  }

  test("decontamination flags exactly the n-gram-overlapping docs") {
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // shares the 5-gram "beta gamma delta epsilon zeta" → flagged
      (20L, "x beta gamma delta epsilon zeta y"),
      // only a 4-gram overlap ("beta gamma delta epsilon") → clean
      (21L, "beta gamma delta epsilon EXTRA zeta"),
      // no overlap at all → clean
      (22L, "one two three four five six"),
      // too short for any 5-gram → clean
      (23L, "alpha beta"))
      .toDF("doc_id", "text")
    val got = Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 5)
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(20L -> true, 21L -> false, 22L -> false, 23L -> false))
  }

  test("multi-probe LSH recall dominates single-probe at equal hash bits") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" % 20 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.select($"vec_id".as("cid"), $"embedding".as("cvec"))
    val brute = Similarity.bruteForceTopKFast(spark, queries, corpus, 1)
      .filter($"rank" === 1).select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toMap
    def hits(nProbes: Int): Int = {
      val got = Similarity.lshTopK(queries, corpus, dims = 64, nPlanes = 8,
          k = 5, nProbes = nProbes)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      brute.count { case (q, n) => got.getOrElse(q, Set.empty).contains(n) }
    }
    val single = hits(0)
    val multi = hits(4)
    // probing Hamming-1 buckets can only widen each query's candidate
    // set, so recall is monotone in nProbes — and must be non-trivial
    assert(multi >= single, s"multi-probe hits $multi < single $single")
    assert(multi > 0, "multi-probe LSH found no true nearest neighbors")
  }

  test("banded-LSH near-dup pairs are a verified subset of the exact kernel") {
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.cosineNearDupPairs(spark, emb, threshold = 0.4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val banded = Similarity.lshNearDupPairs(emb, dims = 64,
        planesPerBand = 4, nBands = 8, threshold = 0.4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // precision is 1 by construction (candidates are cosine-verified
    // with the same threshold), so banded ⊆ exact …
    assert(banded.subsetOf(exact),
      s"banded emitted non-pairs: ${banded.diff(exact)}")
    // … and recall is the LSH trade: with r=4, b=8 the theoretical
    // recall at sim 0.4 (the hardest pairs kept) is 1-(1-p^4)^8 ≈ 0.75
    // with p = 1 - θ/π ≈ 0.63. Everything is deterministic, so the
    // floor below is stable; it pins "recalls most pairs" without
    // overfitting the exact count.
    assert(exact.isEmpty || banded.size.toDouble / exact.size >= 0.5,
      s"recall ${banded.size}/${exact.size} below floor")
  }

  test("duplicate clusters: deep chain converges under checkpointed lineage") {
    // a 12-node path needs ~11 label-propagation rounds — crosses the
    // every-3-rounds localCheckpoint boundary several times, so this
    // pins both convergence and that truncated lineage stays correct
    val edges = (1L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    val got = operators.DuplicateClusters.resolve(edges, maxIters = 15)
      .as[(Long, Long)].collect().toMap
    assert(got == (1L to 12L).map(_ -> 1L).toMap)
  }

  test("contracted clusters == iterative resolve on random graphs, any partitioning") {
    val rnd = new scala.util.Random(7)
    // mix of chains, stars, singleton edges across a 300-node id space
    val edges = (
      (1L until 40L).map(i => (i, i + 1)) ++                 // long chain
      (0 until 60).map(_ => { val a = rnd.nextInt(300).toLong
        val b = rnd.nextInt(300).toLong; (a, 300L + b) }) ++ // random bipartite-ish
      Seq((500L, 501L))                                      // isolated pair
    ).toDF("a", "b").filter($"a" =!= $"b")
    val want = operators.DuplicateClusters.resolve(edges, maxIters = 50)
      .as[(Long, Long)].collect().toMap
    for (nPart <- Seq(1, 3, 8)) {
      val got = operators.DuplicateClusters
        .resolveContracted(edges.repartition(nPart), maxIters = 50)
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"contracted mismatch at $nPart partitions")
    }
    // force the over-cap fallback (distributed iterative phase 2)
    val fb = operators.DuplicateClusters
      .resolveContracted(edges.repartition(5), maxIters = 50, maxDriverEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert(fb == want, "fallback path mismatch")
  }

  test("contracted clusters: deep chain split across partitions") {
    // a 30-node path shuffled over 5 partitions exercises the bridge
    // edges: many nodes appear in 2+ partitions with different local
    // roots, and the contracted root graph must still chain to node 1
    val edges = scala.util.Random.javaRandomToRandom(
      new java.util.Random(3)).shuffle((1L until 30L).map(i => (i, i + 1)))
      .toDF("a", "b").repartition(5)
    val got = operators.DuplicateClusters.resolveContracted(edges, maxIters = 50)
      .as[(Long, Long)].collect().toMap
    assert(got == (1L to 30L).map(_ -> 1L).toMap)
  }

  test("incrementalFlags: exact, near, and clean batch docs") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "  ALPHA beta gamma delta epsilon zeta "), // exact after norm
      (11L, "one two three four five seven"),          // near (shares 3 of 4+4-3 trigrams)
      (12L, "totally different words here entirely"))  // clean
      .toDF("doc_id", "text")
    val got = operators.Dedup.incrementalFlags(corpus, batch,
      "doc_id", "text", n = 3, threshold = 0.4)
      .as[(Long, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(10L) == ((true, true)))  // exact dup is also a near dup
    assert(got(11L) == ((false, true)))
    assert(got(12L) == ((false, false)))
  }

  test("duplicateSpans: cross-doc spans flag, within-doc repeats do not") {
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")   // 8-token span
    val docs = Seq(
      (1L, shared + " " + (1 to 10).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 10).map(i => s"b$i").mkString(" ") + " " + shared),
      // within-doc repetition only: the same 8 tokens twice in ONE doc
      (3L, (1 to 8).map(i => s"r$i").mkString(" ") + " " +
           (1 to 8).map(i => s"r$i").mkString(" ")),
      (4L, (1 to 20).map(i => s"u$i").mkString(" "))) // unique
      .toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(docs, "doc_id", "text", w = 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(4))))
      .toMap
    // doc 1: 18 tokens -> 11 windows; exactly one (the first) is shared
    assert(got(1L) == ((11L, 1L, true)))
    assert(got(2L) == ((11L, 1L, true)))
    // doc 3's repeated span occurs twice but in only ONE distinct doc:
    // duplication is cross-document, so nothing flags
    assert(got(3L) == ((9L, 0L, false)))
    assert(got(4L) == ((13L, 0L, false)))
  }

  test("brute-force ANN: cosine of identical vectors is 1") {
    val df = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(2.0f, 4.0f)))
      .toDF("qid", "qvec")
    val sim = Similarity.bruteForceTopK(df, df.toDF("cid", "cvec"), 1)
      .select("sim").as[Double].head()
    assert(math.abs(sim - 1.0) < 1e-12)
  }

  test("sourceOverlap counts shared distinct shingles, omits disjoint pairs") {
    val d = Seq(
      (1L, "s1", "a b c d e f"), // shingles: "a b c d e", "b c d e f"
      (2L, "s2", "a b c d e g"), // shares "a b c d e" with s1
      (3L, "s3", "x y z w v u")) // disjoint from both
      .toDF("doc_id", "source", "text")
    val got = Dedup.sourceOverlap(d, "source", "text", n = 5)
      .select("source_a", "source_b", "n_a", "n_b", "shared_shingles",
        "jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("s1", "s2", 2L, 2L, 1L, 1.0 / 3)),
      "only the sharing pair appears; jaccard = 1/(2+2-1)")
  }

  test("blockDedup drops cross-doc boilerplate blocks, keeps order") {
    // 4-word blocks; "nav nav nav nav" opens docs 1-3 (df=3 -> drop),
    // each doc keeps its unique tail block in original order.
    val d = Seq(
      (1L, "nav nav nav nav one two three four"),
      (2L, "nav nav nav nav five six seven eight"),
      (3L, "nav nav nav nav nine ten eleven twelve"),
      (4L, "nav nav nav nav")) // all boilerplate -> empty clean_text
      .toDF("doc_id", "text")
    val got = Dedup.blockDedup(d, "doc_id", "text", blockLen = 4, maxDf = 3)
      .select("doc_id", "n_blocks", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((2L, 1L, "one two three four")))
    assert(got(2L) == ((2L, 1L, "five six seven eight")))
    assert(got(3L) == ((2L, 1L, "nine ten eleven twelve")))
    assert(got(4L) == ((1L, 0L, "")), "all-boilerplate doc stays, empty")
  }

  test("blockDedup reassembles multi-kept blocks in block order") {
    val d = Seq(
      (1L, "dup dup dup dup a b c d dup dup dup dup e f g h"),
      (2L, "dup dup dup dup x y z w"),
      (3L, "dup dup dup dup p q r s"))
      .toDF("doc_id", "text")
    val got = Dedup.blockDedup(d, "doc_id", "text", blockLen = 4, maxDf = 2)
      .filter($"doc_id" === 1L)
      .select("n_blocks", "n_kept", "clean_text")
      .as[(Long, Long, String)].head()
    // doc1 blocks: [dup...] [a b c d] [dup...] [e f g h]; both dup
    // blocks hit df=3 >= 2 -> dropped; kept blocks keep text order
    assert(got == ((4L, 2L, "a b c d e f g h")))
  }

  test("semanticDedup keeps first arrival, flags later near-vectors") {
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f), 10),   // cluster 10 representative
      (2L, Array(0.99f, 0.1f, 0f), 10), // near doc 1 -> dropped
      (3L, Array(0f, 1f, 0f), 10),   // orthogonal -> kept
      (4L, Array(0f, 0f, 1f), 20))   // singleton cluster -> kept
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.semanticDedup(vecs, "vec_id", "embedding",
      "label", tau = 0.9)
      .select("vec_id", "n_earlier_dups", "keep", "max_sim_earlier")
      .as[(Long, Long, Boolean, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((0L, true)))
    assert(got(2L) == ((1L, false)))
    assert(got(3L) == ((0L, true)), "orthogonal vector is no duplicate")
    assert(got(4L) == ((0L, true)), "singleton cluster keeps its vector")
    val sentinel = Similarity.semanticDedup(vecs, "vec_id", "embedding",
      "label", tau = 0.9)
      .filter($"vec_id" === 1L || $"vec_id" === 4L)
      .select("max_sim_earlier").as[Double].collect().toSet
    assert(sentinel == Set(-2.0), "no-earlier-mate sentinel below cosine range")
  }

  test("removeDuplicateSpans cuts covered tokens, keeps the rest") {
    // docs 1+2 share the 4-token span "d1 d2 d3 d4"; doc 3 is clean;
    // doc 4 is too short for any window
    val d = Seq(
      (1L, "u1 u2 d1 d2 d3 d4 u3 u4"),
      (2L, "v1 d1 d2 d3 d4 v2 v3 v4"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8"),
      (4L, "s1 s2"))
      .toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(d, "doc_id", "text", w = 4)
      .select("doc_id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Int, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((8, 4, "u1 u2 u3 u4")))
    assert(got(2L) == ((8, 4, "v1 v2 v3 v4")))
    assert(got(3L) == ((8, 0, "c1 c2 c3 c4 c5 c6 c7 c8")),
      "document with no cross-doc span is untouched")
    assert(got(4L) == ((2, 0, "s1 s2")), "short document passes through")
  }

  test("removeDuplicateSpans: overlapping dup windows remove the union") {
    // "a a a a a" in both docs: every window is dup -> whole doc cut
    val d = Seq((1L, "a a a a a"), (2L, "a a a a a x y z w"))
      .toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(d, "doc_id", "text", w = 4)
      .select("doc_id", "n_removed", "clean_text")
      .as[(Long, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((5, "")), "fully duplicated doc empties out")
    assert(got(2L) == ((5, "x y z w")))
  }

  test("noveltyScores credits first corpus occurrence by min doc_id") {
    val d = Seq(
      (1L, "a b c d e f"), // owns both its shingles
      (2L, "a b c d e x"), // "a b c d e" first seen in doc 1
      (3L, "a b"))         // too short: no shingles, no row
      .toDF("doc_id", "text")
    val got = Dedup.noveltyScores(d, "doc_id", "text", n = 5)
      .select("doc_id", "n_shingles", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      1L -> ((2L, 2L, 1.0)),
      2L -> ((2L, 1L, 0.5))))
  }
}
