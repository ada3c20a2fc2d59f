package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Prefix-filtered set-similarity join (q147) and the ordered-fold /
  * interpolation analytics added alongside it (q148/q151). */
class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Exhaustive word-set Jaccard pairs — the oracle the prefix filter
    * must reproduce exactly (losslessness). */
  private def exhaustive(docs: Seq[(Long, String)], num: Int, den: Int)
      : Set[(Long, Long, Int)] = {
    val sets = docs.map { case (id, t) =>
      id -> t.toLowerCase.split(" ").toSet }.toMap
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      common = (sa & sb).size
      if common * den >= (sa.size + sb.size - common) * num
    } yield (a, b, common)).toSet
  }

  private def run(docs: Seq[(Long, String)], num: Int, den: Int)
      : Set[(Long, Long, Int)] =
    Dedup.prefixJaccardPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", 1, num, den)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("prefix filter is lossless vs the exhaustive join") {
    val docs = Seq(
      1L -> "a b c d e f g h i j",
      2L -> "a b c d e f g h i k",   // 9/11 with doc 1
      3L -> "a b c d e f g h i j",   // identical to doc 1
      4L -> "z y x w v u t s r q",   // disjoint
      5L -> "z y x w v u t s r j")   // 9/11 with doc 4, shares j with 1
    for ((num, den) <- Seq((1, 2), (3, 5), (4, 5), (9, 10)))
      assert(run(docs, num, den) == exhaustive(docs, num, den),
        s"threshold $num/$den")
  }

  test("sz divisible by den: the float-ceil trap case stays lossless") {
    // |set| = 5 and t = 3/5: ceil(0.6*5) in doubles is ceil(3.0000000000000004) = 4,
    // which would shorten the prefix below the lossless bound and drop
    // this qualifying pair (J = 4/6 >= 3/5). Integer arithmetic keeps it.
    val docs = Seq(
      1L -> "a b c d e",
      2L -> "a b c d x")
    assert(run(docs, 3, 5) == exhaustive(docs, 3, 5))
    assert(run(docs, 3, 5).contains((1L, 2L, 4)))
  }

  test("candidates come only from prefix tokens, yet hot-token pairs survive") {
    // every doc shares the hot token "the"; only 1-2 qualify overall
    val docs = (1L to 20L).map(i =>
      i -> s"the unique${i} filler${i} extra${i}") ++ Seq(
      21L -> "the shared alpha beta gamma",
      22L -> "the shared alpha beta delta")
    assert(run(docs, 1, 2) == exhaustive(docs, 1, 2))
  }

  test("ewma ordered fold matches the closed form") {
    // s_n = x_n*0.25 + s_{n-1}*0.75, s_1 = x_1
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 2.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), 4.0))
      .toDF("event_id", "ts", "value")
    val got = df.groupBy(lit(1).as("g"))
      .agg(array_sort(collect_list(struct($"ts", $"event_id", $"value")))
        .as("xs"))
      .select(aggregate(slice($"xs", lit(2), size($"xs")),
        element_at($"xs", 1).getField("value"),
        (acc, e) => acc * lit(0.75) + e.getField("value") * lit(0.25)))
      .head().getDouble(0)
    val expected = ((1.0 * 0.75 + 2.0 * 0.25) * 0.75) + 4.0 * 0.25
    assert(got == expected)
  }

  test("gap-fill lerp: interior gaps interpolate, endpoints observed") {
    // days 1,2,5 observed: v=10,4,13 -> day3 = 4 + 3*(1/3) = 7, day4 = 10
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 05:00:00"), 10.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-02 06:00:00"), 4.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-05 07:00:00"), 13.0))
      .toDF("user_id", "ts", "value")
    import org.apache.spark.sql.expressions.Window
    val daily = df.groupBy($"user_id", date_trunc("day", $"ts").as("day"))
      .agg(sum($"value".cast("decimal(18,6)")).cast("double").as("v"))
    val spine = daily.groupBy("user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
      .select($"user_id",
        explode(sequence($"d0", $"d1", expr("interval 1 day"))).as("day"))
    val wP = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wN = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(0, Window.unboundedFollowing)
    val vDay = when($"v".isNotNull, $"day")
    val out = spine.join(daily, Seq("user_id", "day"), "left")
      .withColumn("pv", last($"v", ignoreNulls = true).over(wP))
      .withColumn("pd", last(vDay, ignoreNulls = true).over(wP))
      .withColumn("nv", first($"v", ignoreNulls = true).over(wN))
      .withColumn("nd", first(vDay, ignoreNulls = true).over(wN))
      .select($"day", when($"v".isNotNull, $"v")
        .otherwise($"pv" + ($"nv" - $"pv") *
          (datediff($"day", $"pd") / datediff($"nd", $"pd"))).as("vf"))
      .orderBy("day").collect().map(_.getDouble(1)).toSeq
    assert(out == Seq(10.0, 4.0, 7.0, 10.0, 13.0))
  }
}
