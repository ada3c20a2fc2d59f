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
