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
}
