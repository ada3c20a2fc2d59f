package graft

import org.apache.spark.sql.functions._

/** Round-10 session-4 specs, part 3: audio WHT bands, Sobel profile,
  * item-item CF. */
class Round10eSpec extends SparkSpec {
  import spark.implicits._

  test("audioWhtBands: butterfly equals the definition sum on a real " +
      "encoded WAV, DC band dominates a constant signal") {
    val samples = Array.tabulate(64)(i => ((37 * i) % 401) - 200)
    val wav = graft.functions.AudioCodec.encodeWavPcm16(8000, 1, samples)
    val got = operators.Multimodal.audioWhtBands(spark,
        Seq((1L, wav)).toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // definition sum
    val w = Array.tabulate(64) { u =>
      (0 until 64).map { i =>
        val neg = java.lang.Integer.bitCount(u & i) % 2 == 1
        if (neg) -samples(i).toLong else samples(i).toLong
      }.sum
    }
    val exp = (0 until 8).map(b =>
      b.toLong -> (b * 8 until b * 8 + 8).map(u => w(u) * w(u)).sum)
      .toMap
    assert(got == exp)
    // constant signal: all energy in W[0]
    val const = graft.functions.AudioCodec.encodeWavPcm16(8000, 1,
      Array.fill(64)(100))
    val cb = operators.Multimodal.audioWhtBands(spark,
        Seq((2L, const)).toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(cb(0L) == 6400L * 6400L && (1 to 7).forall(b => cb(b.toLong) == 0L))
  }

  test("imageSobelProfile: flat image has zero edges, a vertical step " +
      "edge yields the textbook 4x-step magnitude column") {
    def img(w: Int, h: Int, f: (Int, Int) => Int) =
      graft.functions.ImageCodec.encodeBmp24(
        graft.functions.ImageCodec.Image(w, h,
          Array.tabulate(w * h) { p =>
            val v = f(p % w, p / w) & 0xff; (v << 16) | (v << 8) | v
          }))
    val flat = img(8, 8, (_, _) => 128)
    val step = img(8, 8, (x, _) => if (x < 4) 0 else 200)
    val got = operators.Multimodal.imageSobelProfile(spark,
        Seq((1L, flat), (2L, step)).toDF("doc_id", "payload"),
        thr = 600L)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got(1L) == ((36L, 0L, 0L, 0L)), "flat: no gradient")
    // gray level of (v,v,v) luma = v; step 0→200 at x=4: columns 3 and
    // 4 see |Gx| = 4·200 = 800, 6 rows each; all others zero
    assert(got(2L) == ((36L, 12L * 800L, 12L, 800L)))
  }

  test("sequentialPatterns: containment reductions match brute-force " +
      "subsequence checks on a hand fixture") {
    // u1: a b a c   u2: b a c   u3: c a
    val ev = Seq(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "a", 3L), (1L, "c", 4L),
      (2L, "b", 1L), (2L, "a", 2L), (2L, "c", 3L),
      (3L, "c", 1L), (3L, "a", 2L))
      .toDF("u", "t", "k")
      .select(col("u"), col("t"), col("k").cast("timestamp").as("ts"),
        col("k").as("tie"))
    val got = operators.SequentialPatterns
      .mine(ev, "u", "t", "ts", "tie", minSupPpm = 0L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // brute force
    val seqs = Map(1L -> "abac", 2L -> "bac", 3L -> "ca")
    def contains(s: String, p: String): Boolean = {
      var i = 0
      s.foreach { c => if (i < p.length && c == p(i)) i += 1 }
      i == p.length
    }
    val alpha = Seq("a", "b", "c")
    val pats = alpha.map(a => a) ++
      (for (a <- alpha; b <- alpha) yield s"$a>$b") ++
      (for (a <- alpha; b <- alpha; c <- alpha) yield s"$a>$b>$c")
    pats.foreach { p =>
      val raw = p.split(">").mkString
      val exp = seqs.values.count(contains(_, raw)).toLong
      assert(got.getOrElse(p, 0L) == exp, s"pattern $p")
    }
    // spot: a>a supported only by u1; a>b>c unsupported anywhere? u1:
    // a(1) b(2) c(4) yes! so a>b>c support 1
    assert(got("a>a") == 1L && got("a>b>c") == 1L)
  }

  test("rougeL: kernel LCS equals brute-force subsequence max on " +
      "random tiny fixtures, F1 is the 2L/(n+m) floor") {
    val rnd = new scala.util.Random(7)
    def brute(x: Array[String], y: Array[String]): Int = {
      // max common subsequence by bitmask over the shorter side
      val (s, t) = if (x.length <= y.length) (x, y) else (y, x)
      (0 until (1 << s.length)).map { m =>
        val sub = s.indices.filter(i => (m & (1 << i)) != 0).map(s(_))
        var i = 0
        t.foreach { c => if (i < sub.length && c == sub(i)) i += 1 }
        if (i == sub.length) sub.length else 0
      }.max
    }
    (1 to 30).foreach { _ =>
      val x = Array.fill(rnd.nextInt(8) + 1)(
        ("a" + rnd.nextInt(3)).toString)
      val y = Array.fill(rnd.nextInt(8) + 1)(
        ("a" + rnd.nextInt(3)).toString)
      assert(operators.Rouge.lcsLen(x, y) == brute(x, y),
        s"${x.mkString(" ")} vs ${y.mkString(" ")}")
    }
    val docs = Seq((1L, "a b c d"), (2L, "a x c y")).toDF(
      "doc_id", "text")
    val got = operators.Rouge.rougeLPairs(spark, docs, "doc_id",
        "text", Seq((1L, 2L)).toDF("a", "b"))
      .collect().head
    assert(got.getLong(4) == 2L) // LCS = a c
    assert(got.getLong(5) == 2000000L * 2 / 8)
  }

  test("keySkew: uniform keys score Gini 0, a dominant key scores " +
      "high, exact hand values") {
    val uniform = (1 to 12).map(i => (i % 4).toString).toDF("k")
    val skewed = (Seq.fill(9)("hot") ++ Seq("a", "b", "c")).toDF("k")
    val got = operators.SkewProfile.keySkew(Seq(
        ("uniform", uniform, "k"), ("skewed", skewed, "k")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(got("uniform") == ((4L, 12L, 3L, 250000L, 0L)))
    // skewed: counts asc (a1,b1,c1,hot9): wsum=1+2+3+36=42, n=4, S=12
    // gini = (2*42 - 5*12)/(4*12) = 24/48 = .5
    assert(got("skewed") == ((4L, 12L, 9L, 750000L, 500000L)))
  }

  test("twoProportion: identical arms are insignificant, an extreme " +
      "split is significant, BigInt replay matches") {
    val P = BigInt(1000000007L)
    def arm(u: Long): Long =
      (((BigInt(u) * 1000003 + 12345) mod P) mod 2).toLong
    // calm: exactly every 4th unit WITHIN each arm converts → equal
    // rates by construction (a u%4 signal would correlate with the
    // PRF arm in a small sample)
    val byArm = (1L to 400L).groupBy(arm)
    val calm = byArm.toSeq.flatMap { case (_, us) =>
      us.sorted.zipWithIndex.map { case (u, i) =>
        (u, if (i % 4 == 0) 1L else 0L) }
    }
    val gotCalm = operators.Experiments
      .twoProportion(calm.toDF("unit", "conv"), "unit", "conv")
      .collect().head
    assert(!gotCalm.getBoolean(7), "near-equal rates insignificant")
    val hot = (1L to 400L).map(u => (u, if (arm(u) == 0) 1L else 0L))
    val gotHot = operators.Experiments
      .twoProportion(hot.toDF("unit", "conv"), "unit", "conv")
      .collect().head
    assert(gotHot.getBoolean(7), "perfectly-split rates significant")
    assert(gotHot.getLong(1) == gotHot.getLong(0), "arm0 all converted")
    assert(gotHot.getLong(4) == 0L, "arm1 none converted")
  }

  test("markovStationary: two-state chain converges to the known " +
      "closed form within the documented floor drain") {
    // chain a→b always, b→a 1/3 of the time, b→b 2/3: exact
    // stationary = (1/4, 3/4). Build a sequence realizing those
    // transition counts: a b b b a b b b ... (a→b ×k, b→b ×2k, b→a
    // ×(k-1)): p(a→b)=1e6, p(b→a)=333333 ppm, p(b→b)=666666 ppm.
    val seq = (1 to 40).flatMap(_ => Seq("a", "b", "b", "b"))
    val ev = seq.zipWithIndex.map { case (t, i) =>
      (1L, t, i.toLong) }
      .toDF("u", "t", "k")
      .select(col("u"), col("t"), col("k").cast("timestamp").as("ts"),
        col("k").as("tie"))
    val got = operators.Markov
      .stationaryPpm(ev, "u", "t", "ts", "tie")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // floors drain un-renormalized mass each round (documented
    // semantics): the RATIO is the stable invariant. The EMPIRICAL
    // chain has p(b→a) = 39/119 (the trailing b truncates one
    // transition), so π_a/π_b = 39/119 exactly:
    // a-share = 39/158 ≈ 246835 ppm.
    val tot = got("a") + got("b")
    assert(tot > 990000L && tot <= 1000000L, got.toString)
    assert(math.abs(1000000L * got("a") / tot - 246835L) < 3000,
      s"a share ${got("a")} of $tot")
    assert(math.abs(1000000L * got("b") / tot - 753165L) < 3000,
      s"b share ${got("b")} of $tot")
  }

  test("itemItemTopK: cosine ranking and both-direction publication " +
      "on a hand basket fixture") {
    // baskets: {1,2} ×3, {1,3} ×2, {2,3} ×1 → co(1,2)=3, co(1,3)=2,
    // co(2,3)=1(below minCo)
    val rows = Seq(
      (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 1L), (12L, 2L),
      (20L, 1L), (20L, 3L), (21L, 1L), (21L, 3L),
      (30L, 2L), (30L, 3L)).toDF("bk", "it")
    val got = operators.Recommend.itemItemTopK(rows, "bk", "it",
        minCo = 2L, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(r => (r._1, r._2))
    // n1=5, n2=4, n3=3; cos2(1,2)=1e6·9/20=450000,
    // cos2(1,3)=1e6·4/15=266666
    assert(got.toSeq == Seq(
      (1L, 1L, 2L, 3L, 450000L), (1L, 2L, 3L, 2L, 266666L),
      (2L, 1L, 1L, 3L, 450000L),
      (3L, 1L, 1L, 2L, 266666L)))
  }
}
