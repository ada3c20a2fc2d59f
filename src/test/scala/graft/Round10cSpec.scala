package graft

import org.apache.spark.sql.functions._

/** Round-10 session-4 specs: KMV/Theta set operations, FM-index
  * backward search, CUPED variance reduction. */
class Round10cSpec extends SparkSpec {
  import spark.implicits._

  // --- KMV / Theta sketch ----------------------------------------------------

  /** Test-side replica of the engine PRF: char-fold then affine. */
  private def prf(tok: String): Long = {
    val P = 1000000007L
    var acc = 0L
    var i = 0
    while (i < tok.length) {
      val cp = tok.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    (acc * 131 + 17) % P
  }

  test("kmvSetOps: estimates reproduce an independent bottom-k replay " +
      "and exact audit columns are exact") {
    val P = 1000000007L
    val k = 32
    // A = t1..t50, B = t26..t75 → |A|=|B|=50, |A∪B|=75, |A∩B|=25
    val aToks = (1 to 50).map(i => s"t$i")
    val bToks = (26 to 75).map(i => s"t$i")
    val df = (aToks.map(("sa", _)) ++ bToks.map(("sb", _)))
      .toDF("s", "tok")
    val got = operators.KmvSketch.setOpEstimates(df, "s", "tok", k)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(2) == 50L && r.getLong(4) == 50L, "exact_a/b")
    assert(r.getLong(6) == 75L && r.getLong(8) == 25L,
      "exact_union/inter")
    // independent replay
    def est(hs: Seq[Long]): Long = {
      val d = hs.distinct.sorted
      if (d.length < k) d.length.toLong else 31L * P / d(k - 1)
    }
    val ha = aToks.map(prf); val hb = bToks.map(prf)
    assert(r.getLong(3) == est(ha), "est_a")
    assert(r.getLong(5) == est(hb), "est_b")
    val skA = ha.distinct.sorted.take(k).toSet
    val skB = hb.distinct.sorted.take(k).toSet
    val merged = (skA ++ skB).toSeq.sorted.take(k)
    val estU =
      if ((skA ++ skB).size < k) (skA ++ skB).size.toLong
      else 31L * P / merged(k - 1)
    val matches = merged.count(h => skA(h) && skB(h)).toLong
    val denom = if ((skA ++ skB).size < k) (skA ++ skB).size.toLong
      else k.toLong
    assert(r.getLong(7) == estU, "est_union")
    assert(r.getLong(9) == matches * estU / denom, "est_inter")
    assert(r.getLong(10) == matches * 1000000L / denom, "jaccard ppm")
  }

  test("kmvSetOps: short sets fall back to exact-by-hash and identical " +
      "sets estimate their own union") {
    val toks = (1 to 10).map(i => s"w$i")
    val df = (toks.map(("p", _)) ++ toks.map(("q", _)))
      .toDF("s", "tok")
    val r = operators.KmvSketch.setOpEstimates(df, "s", "tok", 32)
      .collect().head
    // 10 < k: everything is the exact hash-set size
    assert(r.getLong(3) == 10L && r.getLong(5) == 10L)
    assert(r.getLong(7) == 10L, "est_union of identical sets")
    assert(r.getLong(9) == 10L, "est_inter of identical sets")
    assert(r.getLong(10) == 1000000L, "jaccard of identical sets")
  }

  // --- FM-index backward search ----------------------------------------------

  private def naiveCount(docs: Seq[(Long, String)],
                         pat: String): (Long, Long) = {
    val p = pat.split(" ").toSeq
    val per = docs.map { case (_, t) =>
      val ws = t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
      ws.indices.count(i =>
        i + p.length <= ws.length && ws.slice(i, i + p.length) == p)
    }.filter(_ > 0)
    (per.length.toLong, per.map(_.toLong).sum)
  }

  test("fmIndex: backward-search counts equal naive scan on a " +
      "repetitive fixture, absent pattern reports zero") {
    val docs = Seq(
      (1L, "a b a b c a b a"),
      (2L, "b c a b c a b c a b"),
      (3L, "c c c a b c"),
      (4L, "a"),
      (5L, "b a b a b a b a b a b")).toDF("doc_id", "text")
    val fixture = Seq(
      (1L, "a b a b c a b a"),
      (2L, "b c a b c a b c a b"),
      (3L, "c c c a b c"),
      (4L, "a"),
      (5L, "b a b a b a b a b a b"))
    val pats = Seq("a b", "b c a", "a", "c c", "z z")
    val got = operators.FmIndex
      .countPatterns(spark, docs, "doc_id", "text", pats)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    pats.foreach { p =>
      assert(got(p) == naiveCount(fixture, p), s"pattern '$p'")
    }
    assert(got("z z") == ((0L, 0L)))
  }

  test("fmIndex: single-token pattern count equals token frequency") {
    val docs = Seq((1L, "x y x x y"), (2L, "y y x")).toDF(
      "doc_id", "text")
    val got = operators.FmIndex
      .countPatterns(spark, docs, "doc_id", "text", Seq("x", "y"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("x") == 4L && got("y") == 4L)
  }

  // --- CUPED -------------------------------------------------------------

  test("cuped: theta, adjusted means and rho2 match a BigInt replay") {
    // units 1..8; fact rows: pre value = 10·u, post value = 20·u + 5
    // (perfectly correlated → near-total variance reduction)
    val units = (1L to 8L).toDF("unit")
    val facts = (1L to 8L).flatMap(u => Seq(
      (u, "1998-01-01 00:00:00", 10.0 * u),
      (u, "1998-09-01 00:00:00", 20.0 * u + 5.0)))
      .toDF("unit", "ts", "v")
      .select(col("unit"), col("ts").cast("timestamp").as("ts"),
        col("v"))
    val got = operators.Experiments
      .cuped(units, facts, "unit", "ts", "v", "1998-07-01")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .sortBy(_._1)
    // BigInt replay
    val P = BigInt(1000000007L)
    val rows = (1L to 8L).map { u =>
      val arm = ((BigInt(u) * 1000003 + 12345) mod P) mod 2
      (arm.toLong, BigInt(10 * u), BigInt(20 * u + 5))
    }
    val n = BigInt(rows.length)
    val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
    val sxx = rows.map(r => r._2 * r._2).sum
    val sxy = rows.map(r => r._2 * r._3).sum
    val syy = rows.map(r => r._3 * r._3).sum
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    val deny = n * syy - sy * sy
    got.foreach { g =>
      val arm = rows.filter(_._1 == g._1)
      val na = BigInt(arm.length)
      val sxa = arm.map(_._2).sum; val sya = arm.map(_._3).sum
      assert(g._2 == na.toLong && g._3 == sxa.toLong &&
        g._4 == sya.toLong)
      assert(g._5 == (BigInt(100) * sya / na).toLong, "mean_y_centi")
      assert(g._6 == ((BigInt(100) * (sya * den * n
        - num * (sxa * n - sx * na))) / (den * na * n)).toLong,
        "mean_adj_centi")
      assert(g._7 == (BigInt(1000) * num / den).toLong, "theta_milli")
      assert(g._8 == ((BigInt(1000000) * num / den * num) / deny)
        .toLong, "rho2_ppm")
    }
    // y = 2x + 5 exactly → theta = 2000 milli, rho2 = 1e6 ppm (up to
    // the composed floor)
    assert(got.head._7 == 2000L)
    assert(got.head._8 >= 999900L && got.head._8 <= 1000000L)
  }
}
