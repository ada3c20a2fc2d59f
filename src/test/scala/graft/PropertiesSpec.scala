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

  // --- Round-8 operator invariants --------------------------------------

  test("sorted-neighborhood pairs equal the brute-force window (random)") {
    val scenario = for {
      nDocs <- Gen.choose(2, 14)
      texts <- Gen.listOfN(nDocs, phrase)
      w <- Gen.choose(2, 5)
    } yield (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }, w)
    check("snm", Prop.forAll(scenario) { case (rows, w) =>
      val df = rows.toDF("doc_id", "text")
      val got = graft.operators.Dedup
        .sortedNeighborhoodPairs(df, "doc_id", "text", window = w)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val keyed = rows.map { case (id, t) =>
        (id, t.toLowerCase.replaceAll("[^a-z0-9]", "").take(16))
      }.sortBy { case (id, k) => (k, id) }
      val expect = (for {
        i <- keyed.indices; j <- (i + 1) until math.min(i + w, keyed.size)
      } yield (keyed(i)._1, keyed(j)._1)).toSet
      got == expect
    }, n = 12)
  }

  test("suffix ranks equal the local suffix sort (random corpora)") {
    val scenario = for {
      nDocs <- Gen.choose(1, 8)
      texts <- Gen.listOfN(nDocs,
        Gen.nonEmptyListOf(Gen.oneOf("a", "b", "ab", "ba", "aa"))
          .map(_.mkString(" ")))
    } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    implicit val ord: Ordering[Seq[String]] =
      Ordering.Implicits.seqOrdering(Ordering.String)
    check("suffix", Prop.forAll(scenario) { rows =>
      val got = graft.operators.SuffixArray
        .tokenSuffixRanks(rows.toDF("doc_id", "text"), "doc_id", "text")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val sufs = rows.flatMap { case (id, t) =>
        val ws = t.toLowerCase.split(" ").toSeq.filter(_.nonEmpty)
        (1 to ws.length).map(i => ((id, i.toLong), ws.drop(i - 1)))
      }
      val rankOf = sufs.map(_._2).distinct.sorted.zipWithIndex
        .map { case (s, i) => s -> (i + 1L) }.toMap
      got == sufs.map { case (k, s) => k -> rankOf(s) }.toMap
    }, n = 10)
  }

  test("hilbert index is a bijection with unit steps at any width") {
    check("hilbert", Prop.forAll(Gen.choose(1, 5)) { bits =>
      val n = 1 << bits
      val pts = for (x <- 0 until n; y <- 0 until n)
        yield (x.toLong, y.toLong)
      val got = pts.toDF("x", "y")
        .withColumn("h", graft.operators.ZOrder
          .hilbertIndex(col("x"), col("y"), bits))
        .collect().map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1)))
        .toMap
      got.keySet == (0L until n.toLong * n).toSet &&
        (0L until n.toLong * n - 1).forall { d =>
          val (ax, ay) = got(d); val (bx, by) = got(d + 1)
          math.abs(ax - bx) + math.abs(ay - by) == 1
        }
    }, n = 5)
  }

  test("luhn detects every single-digit corruption") {
    val pan = for {
      len <- Gen.choose(13, 19)
      ds <- Gen.listOfN(len - 1, Gen.choose(0, 9))
    } yield {
      // compute the valid check digit for ds
      val sum = ds.reverse.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 0) { val t = d * 2; if (t > 9) t - 9 else t } else d
      }.sum
      (ds :+ ((10 - sum % 10) % 10)).mkString
    }
    val scenario = for {
      p <- pan
      pos <- Gen.choose(0, p.length - 1)
      delta <- Gen.choose(1, 9)
    } yield (p, pos, delta)
    check("luhn", Prop.forAll(scenario) { case (p, pos, delta) =>
      val corrupted = p.updated(pos,
        (((p(pos) - '0') + delta) % 10 + '0').toChar)
      val out = Seq((1L, p), (2L, corrupted)).toDF("s", "t")
        .select(col("s"),
          graft.operators.Privacy.luhnValid(col("t")).as("v"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      out(1L) && !out(2L)
    }, n = 30)
  }

  test("modularity matches the brute-force Q on random graphs") {
    val scenario = for {
      nNodes <- Gen.choose(3, 9)
      edges <- Gen.nonEmptyListOf(for {
        a <- Gen.choose(0, nNodes - 1); b <- Gen.choose(0, nNodes - 1)
        if a != b
      } yield (a.toLong, b.toLong))
      labels <- Gen.listOfN(nNodes, Gen.choose(0L, 2L))
    } yield (edges, labels.zipWithIndex.map { case (l, i) =>
      (i.toLong, l) })
    check("modularity", Prop.forAll(scenario) { case (edges, labels) =>
      val out = graft.operators.LabelProp.modularity(
          edges.toDF("src", "dst"), labels.toDF("node", "label"))
        .collect().map(r => (r.getLong(4), r.getLong(5)))
      val ce = edges.flatMap { case (a, b) =>
        if (a == b) None
        else Some((math.min(a, b), math.max(a, b)))
      }.distinct
      val m = ce.size.toLong
      val labOf = labels.toMap
      val deg = ce.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val byC = labOf.values.toSeq.distinct.map { c =>
        val members = labOf.filter(_._2 == c).keySet
          .filter(deg.contains)
        val e = ce.count { case (a, b) =>
          members(a) && members(b) }.toLong
        val d = members.toSeq.map(deg).sum
        (4 * m * e - d * d, 4 * m * m)
      }.filter { case (_, _) => true }
      // compare the summed Q numerators (communities with no
      // edge-bearing members are absent from the operator output)
      val gotSum = out.map(_._1).sum
      val expSum = byC.filter { case (qn, _) => true }
        .map(_._1).sum
      gotSum == expSum && out.forall(_._2 == 4 * m * m)
    }, n = 12)
  }

  // --- round-9 session-3 operators -----------------------------------------

  test("exactKth equals the in-memory sort for random lists and ranks") {
    val lists = Gen.nonEmptyListOf(Gen.chooseNum(-100000L, 100000L))
    check("exactKth", Prop.forAll(lists) { xs =>
      val df = xs.toDF("v")
      val sorted = xs.sorted
      val k = 1 + (math.abs(xs.map(_.toInt).sum) % xs.size)
      graft.operators.Stats.exactKth(df, "v", k, fanout = 7) ==
        sorted(k - 1)
    }, n = 12)
  }

  test("featureHash conserves occurrence mass: sum of n_tokens = " +
      "token count, |val| <= n_tokens per bucket") {
    check("featureHash", Prop.forAll(phrase) { p =>
      val docs = Seq((1L, p)).toDF("doc_id", "text")
      val rows = graft.operators.Features
        .featureHash(docs, "doc_id", "text", 16)
        .collect().map(r => (r.getLong(2), r.getLong(3)))
      val nToks = p.split(" ").count(_.nonEmpty)
      rows.map(_._2).sum == nToks &&
        rows.forall { case (v, n) => math.abs(v) <= n }
    }, n = 10)
  }

  test("bleuPairs: identity pairs always score full precision") {
    check("bleu-identity", Prop.forAll(phrase) { p =>
      val pairs = Seq((1L, p, p)).toDF("pid", "hyp", "ref")
      val r = graft.operators.Metrics
        .bleuPairs(pairs, "pid", "hyp", "ref").head()
      r.getLong(3) == r.getLong(4) && // match1 = total1
        (r.getLong(4) == 0L || r.getLong(5) == 1000000L)
    }, n = 10)
  }

  test("sssp distances satisfy the relaxation inequality on every " +
      "kept edge: d(v) <= d(u) + cost within the hop bound") {
    val edges = Gen.nonEmptyListOf(for {
      s <- Gen.chooseNum(1L, 6L); d <- Gen.chooseNum(1L, 6L)
      c <- Gen.chooseNum(1L, 9L)
    } yield (s, d, c))
    check("sssp", Prop.forAll(edges) { es =>
      val df = es.toDF("src", "dst", "cost")
      val iters = 6
      val dist = graft.operators.ShortestPaths
        .sssp(df, Seq(1L).toDF("node"), iters)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // after |V| rounds the fixpoint holds: every edge relaxed
      es.forall { case (s, d, c) =>
        dist.get(s).forall(ds =>
          dist.get(d).exists(dd => dd <= ds + c))
      } && dist.get(1L).contains(0L)
    }, n = 12)
  }

  test("ksDrift is symmetric in the sample labels") {
    val vals = Gen.nonEmptyListOf(for {
      v <- Gen.chooseNum(0L, 20L); a <- Gen.oneOf(0, 1)
    } yield (v, a))
    check("ks-sym", Prop.forAll(vals) { xs =>
      // both labels must be present for the statistic to be defined
      val has = xs.map(_._2).toSet.size == 2
      !has || {
        val df = xs.map { case (v, a) => ("g", v, a) }.toDF("g", "v", "a")
        def ks(flag: Int) = graft.operators.Stats
          .ksDrift(df, "g", "v", col("a") === flag)
          .head().getLong(3)
        ks(1) == ks(0) // |ECDF_A - ECDF_B| is label-symmetric
      }
    }, n = 10)
  }
}
