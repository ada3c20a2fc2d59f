package graft

import org.apache.spark.sql.functions._

/** Sketch-family guarantees: approximate quantiles stay inside the
  * theoretical rank-error bound, and Bloom-filter join pruning never
  * drops a true match. Complements the HLL error-bound spec
  * (ScaleSpec): at 100 TB these mergeable sketches replace exact
  * sorts/joins wherever bounded error is acceptable. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_percentile rank error is within 1/accuracy of exact") {
    // q62 carries its own rank-error verify (count(x < v)/n vs the
    // published 1/accuracy bound, computed distributed in-query); the
    // spec asserts every verdict comes out true, and independently
    // re-checks one quantile end-to-end
    val rows = SparkEntry.queries("q62_approx_quantiles")(spark, sf)
      .select($"l_returnflag", $"n", $"p50",
        $"ok25", $"ok50", $"ok75", $"ok99")
      .as[(String, Long, Double, Boolean, Boolean, Boolean, Boolean)]
      .collect()
    assert(rows.nonEmpty)
    for ((flag, n, p50, a, b, c, d) <- rows) {
      assert(a && b && c && d, s"$flag: rank-error verdict false")
      // p50 is the EXACT interpolated median: half the mass below it
      val below = Tables.lineitem(spark, sf)
        .filter($"l_returnflag" === flag && $"l_extendedprice" < p50).count()
      assert(math.abs(below - 0.5 * n) <= 0.5 * n * 0.01 + 1,
        s"$flag exact median rank off: $below vs ${0.5 * n}")
    }
  }

  test("count-min estimate dominates exact count and respects eps*N") {
    val got = SparkEntry.queries("q103_cms_verify")(spark, sf)
      .as[(String, Long, Boolean)].collect()
    assert(got.length == 20)
    assert(got.forall(_._3), s"cms bound violated: ${got.filterNot(_._3).toSeq}")
    // independent exact recount for the top word
    val (word, cnt, _) = got.maxBy(_._2)
    val exact = Tables.documents(spark, sf)
      .select(explode(split(lower($"text"), " ")).as("w"))
      .filter($"w" === word).count()
    assert(exact == cnt)
  }

  test("bloom-filter pruning: zero false negatives, FPP near target") {
    // build a Bloom sketch of the user ids that actually clicked, then
    // pre-filter the orders side before the join — the cheap
    // shuffle-avoidance move when the join is selective
    val clickers = Tables.events(spark, sf)
      .filter($"event_type" === "click")
      .select($"user_id")
    val trueKeys = clickers.distinct().as[Long].collect().toSet
    val bloom = clickers.stat.bloomFilter("user_id", trueKeys.size.toLong, 0.03)
    assert(trueKeys.forall(bloom.mightContain), "false negative!")
    val universe = Tables.customer(spark, sf).select($"c_custkey").as[Long]
      .collect()
    val nonMembers = universe.filterNot(trueKeys)
    val fp = nonMembers.count(bloom.mightContain)
    // generous 4x headroom over the 3% target: tiny key sets wobble
    assert(nonMembers.isEmpty || fp.toDouble / nonMembers.size < 0.12,
      s"FPP ${fp.toDouble / nonMembers.size}")
    // and the pruned join equals the exact semi-join
    val bcBloom = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((k: Long) => bcBloom.value.mightContain(k))
    val pruned = Tables.customer(spark, sf)
      .filter(mightContain($"c_custkey"))
      .join(clickers.distinct(), $"c_custkey" === $"user_id", "left_semi")
      .count()
    val exact = Tables.customer(spark, sf)
      .join(clickers.distinct(), $"c_custkey" === $"user_id", "left_semi")
      .count()
    assert(pruned == exact,
      "bloom prefilter must not change the exact join result")
  }

  test("Misra-Gries: no false negatives above N/(k+1), bounded undercount") {
    // skewed stream: item i (1..20) appears 2^(21-i) times -> N = 2^21-2;
    // with k = 7 every item over N/8 must surface, estimates undercount
    // by at most N/8, and estimates never overcount
    val rows = (1 to 20).flatMap(i =>
      Seq.fill(1 << (21 - i))(s"item$i"))
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    val k = 7
    val sketch = rows.toDF("w").repartition(13)
      .agg(org.apache.spark.sql.graft.MisraGriesTopK.column($"w", k).as("sk"))
      .select(explode($"sk").as("e"))
      .select($"e.word", $"e.est").as[(String, Long)].collect().toMap
    assert(sketch.size <= k, "sketch never holds more than k counters")
    val bound = n.toDouble / (k + 1)
    for ((w, c) <- truth if c > bound)
      assert(sketch.contains(w), s"$w (count $c > $bound) must survive")
    for ((w, est) <- sketch) {
      assert(est <= truth(w), s"$w: estimate $est overcounts ${truth(w)}")
      assert(truth(w) - est <= bound + 1,
        s"$w: undercount ${truth(w) - est} beyond bound $bound")
    }
  }

  test("Misra-Gries merge: guarantee holds under any partitioning") {
    val rows = (1 to 40).flatMap(i => Seq.fill(i * i)(s"w$i"))
    val n = rows.size.toLong
    val k = 5
    val bound = n.toDouble / (k + 1)
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 4, 29)) {
      val got = rows.toDF("w").repartition(parts)
        .agg(org.apache.spark.sql.graft.MisraGriesTopK.column($"w", k).as("sk"))
        .select(explode($"sk").as("e"))
        .select($"e.word").as[String].collect().toSet
      for ((w, c) <- truth if c > bound)
        assert(got.contains(w),
          s"parts=$parts: $w (count $c > $bound) lost in merge")
    }
  }

  test("Misra-Gries sketch+verify equals the exact heavy-hitter set") {
    val got = SparkEntry.queries("q95_heavy_hitters")(spark, sf)
      .as[(String, Long)].collect().toMap
    val words = Tables.documents(spark, sf)
      .select(explode(split(lower($"text"), " ")).as("w"))
    val n = words.count()
    val exact = words.groupBy("w").count()
      .filter($"count" * 29 > n)
      .as[(String, Long)].collect().toMap
    assert(got == exact)
  }
}
