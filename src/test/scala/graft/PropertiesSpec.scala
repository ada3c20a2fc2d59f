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
}
