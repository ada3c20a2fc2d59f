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
    val li = Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_extendedprice").cache()
    val accuracy = 10000
    val approx = SparkEntry.queries("q62_approx_quantiles")(spark, sf)
      .select($"l_returnflag", array($"p25", $"p50", $"p75", $"p99"), $"n")
      .as[(String, Seq[Double], Long)].collect()
    for ((flag, qs, n) <- approx; (q, p) <- qs.zip(Seq(0.25, 0.5, 0.75, 0.99))) {
      // rank of the returned value among the group's values must be
      // within n/accuracy of the target rank p*n
      val below = li.filter($"l_returnflag" === flag &&
        $"l_extendedprice" <= q).count()
      val err = math.abs(below - p * n)
      assert(err <= n.toDouble / accuracy + 1,
        s"$flag p$p: rank err $err > ${n.toDouble / accuracy}")
    }
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
}
