package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.functions.Strings

/** Property-based invariants (SURVEY.md §5), run through scalacheck's
  * own runner (the scalatest bridge isn't a dependency): slug
  * idempotence, capitalize shape, greedy matcher invariants over
  * random preference matrices. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val phrase = Gen.nonEmptyListOf(word).map(_.mkString(" "))
  private val phrases = Gen.listOfN(10, phrase).suchThat(_.nonEmpty)

  test("slug is idempotent") {
    check("slug", Prop.forAll(phrases) { ps =>
      val once = ps.toDF("s").select(Strings.slug($"s").as("x"))
      val twice = once.select(Strings.slug($"x").as("x"))
      once.collect().toSeq == twice.collect().toSeq
    }, n = 10)
  }

  test("capitalize output has upper head, lower tail") {
    check("capitalize", Prop.forAll(phrases) { ps =>
      ps.toDF("s").select(Strings.capitalize($"s")).as[String].collect()
        .forall { s =>
          (s.head.isUpper || !s.head.isLetter) &&
            s.tail.forall(c => !c.isLetter || c.isLower)
        }
    }, n = 10)
  }

  test("greedy matcher: injective and exhaustive on random score matrices") {
    val emotions = graft.domain.Emotions.names
    (1 to 8).foreach { trial =>
      val rnd = new scala.util.Random(42L + trial)
      val nEp = 3 + rnd.nextInt(6)
      val nSt = 10 + rnd.nextInt(20)
      def scores() = emotions.map(e => e -> rnd.nextInt(1024) / 1024.0)
      val epLong = (1 to nEp).flatMap(i =>
        scores().map { case (e, v) => (i.toLong, e, v) })
        .toDF("episode_id", "emotion", "score")
      val stLong = (1 to nSt).flatMap(i =>
        scores().map { case (e, v) => (i.toLong, e, v) })
        .toDF("strain_id", "emotion", "score")
      val epTop2 = graft.operators.Matching.top2Emotions(epLong, "episode_id")
      val got = graft.operators.Matching
        .greedyMatch(spark, epTop2, stLong, poolSize = 5)
        .select("episode_id", "strain_id").as[(Long, Long)].collect()
      assert(got.map(_._2).distinct.length == got.length,
        s"trial $trial: strain reused")
      assert(got.map(_._1).toSet == (1 to nEp).map(_.toLong).toSet,
        s"trial $trial: episode unmatched")
    }
  }

  test("prCurve invariants on random score/label tables") {
    val rnd = new scala.util.Random(61)
    for (_ <- 1 to 5) {
      val n = 30 + rnd.nextInt(100)
      val df = (1 to n).map(_ =>
        (rnd.nextInt(9).toLong, rnd.nextBoolean())).toDF("s", "l")
      val pAll = df.filter($"l").count()
      val rows = graft.operators.Metrics.prCurve(df, "s", "l")
        .orderBy(desc("thr")).collect()
      val tps = rows.map(_.getLong(1))
      assert(tps.zip(tps.tail).forall { case (a, b) => a <= b })
      // the loosest threshold scans everything: recall hits 1 exactly
      assert(rows.last.getLong(1) == pAll)
      if (pAll > 0) assert(rows.last.getLong(5) == 1000000L)
      // prec_ppm is exactly the integer fixed point of tp/(tp+fp)
      assert(rows.forall(r =>
        r.getLong(4) == 1000000L * r.getLong(1) /
          (r.getLong(1) + r.getLong(2))))
    }
  }

  test("cohenKappa stays within [-1e6, 1e6] on random rater pairs") {
    val rnd = new scala.util.Random(62)
    for (_ <- 1 to 5) {
      val labels = Seq("a", "b", "c")
      val df = (1 to 50 + rnd.nextInt(100)).map(_ =>
        (labels(rnd.nextInt(3)), labels(rnd.nextInt(3)))).toDF("ra", "rb")
      val k = graft.operators.Metrics.cohenKappa(df, "ra", "rb")
        .select("kappa_ppm").as[Long].head()
      assert(k >= -1000000L && k <= 1000000L, s"kappa out of range: $k")
    }
  }

  test("alphaQuotaSample: kept = min(quota, group size), total <= budget") {
    val rnd = new scala.util.Random(63)
    for (_ <- 1 to 3) {
      val rows = (1 to 300).map { i =>
        (i.toLong, s"g${rnd.nextInt(2 + rnd.nextInt(6))}") }
      val df = rows.toDF("id", "g")
      val budget = 40L + rnd.nextInt(100)
      val out = graft.operators.Curation.alphaQuotaSample(df, "id", "g",
        budget)
      assert(out.count() <= budget)
      val sizes = rows.groupBy(_._2).view.mapValues(_.size).toMap
      val kept = out.groupBy("g").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val quotas = out.select("g", "quota").distinct().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      quotas.foreach { case (g, q) =>
        assert(kept(g) == math.min(q, sizes(g).toLong), s"group $g") }
    }
  }

  test("contentChunks coverage identity on random phrases") {
    check("cdc-coverage", Prop.forAll(phrases) { ps =>
      val df = ps.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
      val chunks = graft.operators.Dedup.contentChunks(df, "id", "t", 4, 8)
      val rebuilt = chunks.groupBy("doc_id")
        .agg(concat_ws(" ", array_sort(collect_list(
          struct($"chunk_id", $"chunk_text"))).getField("chunk_text"))
          .as("joined"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      ps.zipWithIndex.forall { case (t, i) =>
        val toks = t.toLowerCase.split(" ").filter(_.nonEmpty).mkString(" ")
        rebuilt.get(i.toLong).contains(toks)
      }
    }, n = 8)
  }

  test("bootstrapMeans scales exactly: doubling values doubles means") {
    val df = Tables.orders(spark, sf)
      .select($"o_orderkey".as("id"), $"o_totalprice".as("v"))
      .limit(500)
    val m1 = graft.operators.Stats.bootstrapMeans(df, "id", "v", 6, 9L)
      .orderBy("b").select("mean").as[Double].collect()
    val m2 = graft.operators.Stats.bootstrapMeans(
        df.select($"id", ($"v" * 2).as("v")), "id", "v", 6, 9L)
      .orderBy("b").select("mean").as[Double].collect()
    assert(m1.map(_ * 2).toSeq == m2.toSeq)
  }

  // Round-7: the integer-fixed-point Welch publication tracks the
  // textbook double computation within its documented truncation
  // budget on random two-arm samples (t²·10⁹ to ~1e-6 relative from
  // the micro-Δ truncation; df·10⁹ to ~1e-3 from the milli se2n
  // coarsening), and the published integers are partition-invariant.
  test("welchTTest fixed points track the double reference on random arms") {
    val sample = for {
      na <- Gen.choose(3, 40); nb <- Gen.choose(3, 40)
      as <- Gen.listOfN(na, Gen.choose(1, 50000))
      bs <- Gen.listOfN(nb, Gen.choose(1, 50000))
    } yield (as.map(_ / 100.0), bs.map(_ / 100.0))
    check("welch", Prop.forAll(sample) { case (as, bs) =>
      val va = as.map(x => (true, x)); val vb = bs.map(x => (false, x))
      val df = (va ++ vb).toDF("arm", "v")
      val r = graft.operators.Metrics.welchTTest(df, "arm", "v")
        .collect().head
      // double reference
      def mv(xs: Seq[Double]) = {
        val n = xs.length.toDouble; val m = xs.sum / n
        (m, xs.map(x => (x - m) * (x - m)).sum / (n - 1))
      }
      val (ma, va2) = mv(as); val (mb, vb2) = mv(bs)
      val se2 = va2 / as.length + vb2 / bs.length
      val okDegenerate = se2 == 0.0 && r.isNullAt(5)
      okDegenerate || {
        val t2 = (ma - mb) * (ma - mb) / se2
        val seA = va2 / as.length; val seB = vb2 / bs.length
        val dfRef = se2 * se2 /
          (seA * seA / (as.length - 1) + seB * seB / (bs.length - 1))
        val t2got = r.getLong(5) / 1e9
        val dfGot = r.getLong(6) / 1e9
        math.abs(t2got - t2) <= 1e-4 * (1 + t2) &&
          math.abs(dfGot - dfRef) <= 5e-3 * (1 + dfRef) &&
          r.getLong(4) == math.signum(ma - mb).toLong
      }
    }, n = 15)
  }

  test("welchTTest integers are partition-invariant") {
    val df = Tables.orders(spark, sf)
      .filter($"o_orderpriority".isin("1-URGENT", "5-LOW"))
      .select(($"o_orderpriority" === "1-URGENT").as("arm"),
        $"o_totalprice".as("v"))
    def run(parts: Int) = graft.operators.Metrics
      .welchTTest(df.repartition(parts), "arm", "v")
      .collect().head.toSeq
    assert(run(2) == run(13))
  }

  // Round-7: the native chunk-boundary kernel equals the declarative
  // scan on random unicode token streams (not just the corpus) —
  // mixed ASCII/CJK/astral tokens, degenerate repeats, short docs.
  test("content_chunk_starts equals declarative scan on random unicode") {
    val tok = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString),
      Gen.nonEmptyListOf(Gen.oneOf('中', '文', '語', 'é', 'ß')).map(_.mkString),
      Gen.const("😀x"), // astral: surrogate pair + ascii
      Gen.const("a"))
    val doc = Gen.listOfN(30, tok).map(_.mkString(" "))
    check("chunkStarts", Prop.forAll(Gen.listOfN(6, doc)) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
      val toksCol = filter(split(lower($"t"), " "), w => w =!= "")
      val both = df.select(
        org.apache.spark.sql.graft.ContentChunkStarts
          .column(toksCol, 4, 8).as("native"),
        graft.operators.Dedup
          .contentChunkBoundariesDeclarative(toksCol, 4, 8).as("ref"))
      both.filter(not($"native" <=> $"ref")).count() == 0
    }, n = 10)
  }

  // Round-8 (VERDICT #6): the q212 election is the brute-force argmax
  // under (score DESC nulls last, doc_id ASC) on random clusterings
  // with PARTIAL score coverage, and elects exactly one keeper per
  // cluster regardless of coverage (the left-join fix's invariant).
  test("canonicalByQuality elects the argmax keeper on random clusters") {
    val scenario = for {
      nDocs <- Gen.choose(5, 40)
      nClusters <- Gen.choose(1, 8)
      cids <- Gen.listOfN(nDocs, Gen.choose(1, nClusters))
      // ~1/3 of members unscored; ties likely (small score range)
      scored <- Gen.listOfN(nDocs, Gen.frequency(
        2 -> Gen.choose(0L, 5L).map(Some(_)), 1 -> Gen.const(None)))
    } yield (cids.zipWithIndex.map { case (c, i) => (i.toLong, c.toLong) },
      scored.zipWithIndex.collect { case (Some(s), i) => (i.toLong, s) })
    check("election", Prop.forAll(scenario) { case (members, scores) =>
      val clusters = members.toDF("doc_id", "cluster_id")
      val scoreDf = scores.toDF("doc_id", "logit")
      val out = graft.operators.DuplicateClusters
        .canonicalByQuality(clusters, scoreDf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
      val scoreMap = scores.toMap
      val byCluster = members.groupBy(_._2)
      val keepers = out.filter(_._3).map(r => r._2 -> r._1).toMap
      out.length == members.length &&
        byCluster.forall { case (cid, ms) =>
          val expect = ms.map(_._1).sortBy(d =>
            (scoreMap.get(d).map(-_).getOrElse(Long.MaxValue), d)).head
          keepers.get(cid).contains(expect) &&
            out.count(r => r._2 == cid && r._3) == 1
        }
    }, n = 15)
  }

  // Round-8 (VERDICT #6): q213's per-doc contamination count equals
  // the brute-force set intersection |G_d ∩ ∪_{bench b≠d} G_b| on
  // random corpora (tiny vocab so cross-doc collisions are common),
  // including the self-exclusion arithmetic.
  test("benchmarkNgramContamination equals brute-force set intersection") {
    val vocab = Vector("a", "b", "c", "d", "e")
    val doc = Gen.choose(0, 8).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val scenario = for {
      nDocs <- Gen.choose(3, 12)
      texts <- Gen.listOfN(nDocs, doc)
      bench <- Gen.listOfN(nDocs, Gen.prob(0.4))
    } yield texts.zip(bench).zipWithIndex.map { case ((t, b), i) =>
      (i.toLong, t, b) }
    val n = 2
    check("decontam", Prop.forAll(scenario) { rows =>
      val df = rows.toDF("doc_id", "t", "is_b")
      val out = graft.operators.Dedup
        .benchmarkNgramContamination(df, "doc_id", "t", $"is_b", n)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(2), r.getLong(3), r.getBoolean(5))).toMap
      def grams(t: String): Set[String] = {
        val w = t.toLowerCase.split(" ", -1).toSeq // mirror split(lower, " ")
        if (w.length < n) Set.empty
        else w.sliding(n).map(_.mkString(" ")).toSet
      }
      rows.forall { case (id, t, isB) =>
        val g = grams(t)
        val leaked = rows.filter { case (b, _, bb) => bb && b != id }
          .flatMap(r => grams(r._2)).toSet
        val contaminated = g.intersect(leaked).size.toLong
        val (nG, nC, flagged) = out(id)
        nG == g.size.toLong && nC == contaminated &&
          flagged == (!isB && contaminated >= 1)
      }
    }, n = 12)
  }
}
