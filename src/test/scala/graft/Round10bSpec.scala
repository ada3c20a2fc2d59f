package graft

import org.apache.spark.sql.functions._

/** Round-10 session-3 specs: LZ77 factorization, single-link MST-cut
  * clustering, a-priori frequent pairs, simplified Soundex,
  * Mann–Kendall, Hamilton apportionment, WHT perceptual hash. */
class Round10bSpec extends SparkSpec {
  import spark.implicits._

  // --- LZ77 factorization ---------------------------------------------------

  test("lzFactors: hand-checked greedy parse, literals and max length") {
    // tokens: a b a b a b c a b → parse a|b|(a b a b)|c|(a b)
    //         (pos 3 matches pos 1 with length 4 — overlap allowed)
    val docs = Seq((1L, "a b a b a b c a b")).toDF("doc_id", "text")
    val r = operators.Lz.lzFactors(docs, "doc_id", "text").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 9L, "n_pos")
    assert(row.getLong(2) == 5L, "n_factors")
    assert(row.getLong(3) == 3L, "n_literals")
    assert(row.getLong(4) == 4L, "max_factor_len")
  }

  test("lzFactors: self-overlapping periodic copy takes the full run") {
    // x a a a a → x | a | (a a a): pos 3 matches pos 2 with length 3,
    // running past its own source (the DEFLATE overlap semantics)
    val docs = Seq((1L, "x a a a a")).toDF("doc_id", "text")
    val row = operators.Lz.lzFactors(docs, "doc_id", "text").head
    assert((row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4)) == ((5L, 3L, 2L, 3L)))
  }

  test("lzFactors: factor lengths telescope to n_pos on real docs, " +
      "and an all-distinct doc is all literals") {
    val docs = Seq(
      (1L, "q w e r t y"),
      (2L, "p p p p p p p p")).toDF("doc_id", "text")
    val rows = operators.Lz.lzFactors(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // all-distinct: every factor is a literal of length 1
    assert(rows(0).getLong(2) == 6L && rows(0).getLong(3) == 6L &&
      rows(0).getLong(4) == 1L)
    // p^8: p | (p p p p p p p) → 2 factors, 1 literal, max 7
    assert(rows(1).getLong(2) == 2L && rows(1).getLong(3) == 1L &&
      rows(1).getLong(4) == 7L)
  }

  test("lzFactors: match length caps at maxMatch and the parse splits") {
    // a^10 with cap 4: a | (aaaa) | (aaaa) | a → 4 factors, max 4
    val docs = Seq((1L, Seq.fill(10)("a").mkString(" ")))
      .toDF("doc_id", "text")
    val row = operators.Lz.lzFactors(docs, "doc_id", "text", maxMatch = 4)
      .head
    assert((row.getLong(1), row.getLong(2), row.getLong(4)) ==
      ((10L, 4L, 4L)))
  }

  // --- single-link MST-cut clustering ---------------------------------------

  test("single-link clusters at a cut equal consecutive-gap runs on a " +
      "line metric (MST-cut + contracted components)") {
    // balances 0 10 15 100 110 400, cut 20 → {1,2,3} {4,5} {6}
    val bal = Map(1L -> 0L, 2L -> 10L, 3L -> 15L, 4L -> 100L,
      5L -> 110L, 6L -> 400L)
    val ids = bal.keys.toSeq.sorted
    val edges = (for {
      i <- ids.indices; k <- 1 to 3; if i + k < ids.size
    } yield (ids(i), ids(i + k),
        math.abs(bal(ids(i + k)) - bal(ids(i)))))
      .toDF("u", "v", "w")
    val kept = operators.Mst.boruvkaMsf(edges)
      .filter(col("w") <= 20)
      .select(col("u").as("a"), col("v").as("b"))
    val cl = operators.DuplicateClusters.resolveContracted(kept)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl(1L) == cl(2L) && cl(2L) == cl(3L))
    assert(cl(4L) == cl(5L))
    assert(cl(1L) != cl(4L))
    assert(!cl.contains(6L), "singleton never enters the edge set")
  }

  test("q313 registered query: per-nation cluster accounting matches " +
      "the sorted-gap-run oracle on sf0.001") {
    val got = SparkEntry.queries("q313_single_link")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val cust = Tables.customer(spark, sf)
      .select(col("c_nationkey"), col("c_custkey").cast("long"),
        round(col("c_acctbal") * 100).cast("long"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val exp = cust.groupBy(_._1).map { case (nk, rows) =>
      val sorted = rows.map(r => (r._3, r._2)).sorted.toSeq
      val runs = scala.collection.mutable.ArrayBuffer[Long](1L)
      sorted.sliding(2).foreach {
        case Seq((b1, _), (b2, _)) =>
          if (b2 - b1 > 20000L) runs += 1L
          else runs(runs.size - 1) += 1L
        case _ =>
      }
      (nk, runs.size.toLong, runs.max, runs.count(_ == 1L).toLong)
    }.toSet
    assert(got.toSet == exp)
  }

  // --- a-priori frequent pairs ----------------------------------------------

  test("frequentPairs: support prune, pair counting, and floor lift") {
    // 5 docs; a in all 5, b in 4, c in 2 (infrequent at 60%), a+b in 4
    val docs = Seq(
      (1L, "a b"), (2L, "a b c"), (3L, "a b"), (4L, "a b c"),
      (5L, "a x y")).toDF("doc_id", "text")
    val r = operators.Itemsets
      .frequentPairs(docs, "doc_id", "text", minSupPpm = 600000L)
      .collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6)))
    // only (a, b) survives: c/x/y fail the 60% singleton gate,
    // so no pair containing them is ever counted
    assert(r.toSeq == Seq(("a", "b", 4L, 5L, 4L, 5L,
      1000000L))) // lift = 1e6·4·5/(5·4) = exactly independence
  }

  test("frequentPairs: duplicate tokens in a doc count once (presence " +
      "semantics)") {
    val docs = Seq((1L, "a a b b"), (2L, "a b"), (3L, "a b"))
      .toDF("doc_id", "text")
    val r = operators.Itemsets
      .frequentPairs(docs, "doc_id", "text", minSupPpm = 1000000L)
      .collect()
    assert(r.length == 1 && r.head.getLong(2) == 3L)
  }

  // --- simplified Soundex ---------------------------------------------------

  test("soundexSimplified: classic fixtures plus the documented " +
      "H/W-as-vowel variant") {
    val in = Seq("Robert", "Rupert", "Tymczak", "Pfister", "Ashcraft",
      "honeydew", "burnished", "e", "123", "")
    val got = in.toDF("w")
      .select(graft.functions.Phonetic.soundexSimplified(col("w")))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("R163"), Some("R163"), Some("T522"),
      Some("P236"), Some("A226"), // A261 under full H/W transparency
      Some("H530"), Some("B652"), Some("E000"), None, None))
  }

  // --- Mann–Kendall ---------------------------------------------------------

  test("mannKendall: strictly increasing series is a significant " +
      "uptrend with the closed-form S and variance") {
    val n = 10L
    val df = (1L to n).map(i => ("g", i, 10 * i)).toDF("g", "x", "y")
    val r = operators.Stats.mannKendall(df, "g", "x", "y").head
    assert(r.getLong(1) == n)
    assert(r.getLong(2) == n * (n - 1) / 2, "S = all pairs concordant")
    assert(r.getLong(3) == n * (n - 1) * (2 * n + 5), "no ties")
    assert(r.getLong(4) == 1L, "z = 3.57 > 1.96")
  }

  test("mannKendall: constant series has S = 0, zero variance (all " +
      "ties), no trend; alternating series is insignificant") {
    val flat = (1L to 8L).map(i => ("f", i, 5L))
    val alt = (1L to 8L).map(i => ("a", i, if (i % 2 == 0) 1L else 2L))
    val r = operators.Stats
      .mannKendall((flat ++ alt).toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r("f") == ((0L, 0L, 0L)))
    assert(r("a")._3 == 0L, "alternating must not be significant")
  }

  // --- Hamilton apportionment -----------------------------------------------

  test("q318 registered query: seats sum to exactly 1000, each seat " +
      "count is floor-quota or floor-quota+1, top-ups go to the " +
      "largest remainders") {
    val rows = SparkEntry.queries("q318_apportion")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._5).sum == 1000L)
    assert(rows.forall(r => r._5 == r._3 || r._5 == r._3 + 1))
    val bumped = rows.filter(r => r._5 == r._3 + 1)
    val notBumped = rows.filter(r => r._5 == r._3)
    if (bumped.nonEmpty && notBumped.nonEmpty) {
      // every bumped remainder ranks at or above every non-bumped one
      // under (rem desc, nation asc)
      val worstBumped = bumped.map(r => (-r._4, r._1)).max
      val bestNot = notBumped.map(r => (-r._4, r._1)).min
      assert(Ordering[(Long, Int)].lteq(worstBumped, bestNot))
    }
  }

  // --- WHT perceptual hash --------------------------------------------------

  test("imageWhtHash: brightness shift changes only the DC " +
      "coefficient, so the hash is invariant; container (BMP vs PNG) " +
      "never matters; undecodable rows degrade") {
    def gradient(shift: Int): graft.functions.ImageCodec.Image = {
      val w = 11; val h = 9
      val rgb = Array.tabulate(w * h) { p =>
        val x = p % w; val y = p / w
        val v = math.min(200, 7 * x + 11 * y) + shift
        (v << 16) | (v << 8) | v
      }
      graft.functions.ImageCodec.Image(w, h, rgb)
    }
    val bytes = Seq(
      (1L, graft.functions.ImageCodec.encodeBmp24(gradient(0))),
      (2L, graft.functions.ImageCodec.encodePng(gradient(0))),
      (3L, graft.functions.ImageCodec.encodeBmp24(gradient(40))),
      (4L, "nope".getBytes("UTF-8")))
    val r = operators.Multimodal
      .imageWhtHash(spark, bytes.toDF("doc_id", "payload"))
      .collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getBoolean(3)))).toMap
    assert(r(1L)._3 && r(2L)._3 && r(3L)._3 && !r(4L)._3)
    assert(r(1L) == r(2L), "same pixels, different container")
    assert((r(1L)._1, r(1L)._2) == ((r(3L)._1, r(3L)._2)),
      "uniform brightness shift must not flip any AC bit")
    assert(r(4L)._1 == 0L && r(4L)._2 == 0L)
  }

  test("imageWhtHash: constant raster hashes to zero (every AC " +
      "coefficient is zero, median zero, no strict exceedance)") {
    val img = graft.functions.ImageCodec.Image(8, 8,
      Array.fill(64)((130 << 16) | (130 << 8) | 130))
    val r = operators.Multimodal.imageWhtHash(spark,
        Seq((1L, graft.functions.ImageCodec.encodeBmp24(img)))
          .toDF("doc_id", "payload"))
      .head
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getBoolean(3))
  }
}
