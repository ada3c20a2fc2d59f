package graft

import org.apache.spark.sql.functions._

/** Scale-shape checks: bucketed co-located joins plan without a
  * shuffle, stateful streaming matches batch, broadcast thresholds. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables co-locate the join: no shuffle exchange in plan") {
    val o = Tables.orders(spark, sf)
    val l = Tables.lineitem(spark, sf)
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")
    // force a merge join (the data is small enough to broadcast, which
    // would sidestep bucketing entirely)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      joined.collect() // force planning + execution
      val planStr = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head // final AQE plan only
      assert(planStr.contains("SortMergeJoin"), s"no SMJ:\n$planStr")
      // bucketed scans feed the join directly: no exchange on the keys
      assert(!planStr.contains("Exchange hashpartitioning(o_orderkey")
        && !planStr.contains("Exchange hashpartitioning(l_orderkey"),
        s"join inputs were shuffled despite bucketing:\n$planStr")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("stateful streaming counts match batch counts") {
    val streaming = graft.streaming.StatefulCounts
      .runningUserCounts(spark, sf)
      .orderBy("user_id").as[(Long, Long)].collect()
    val batch = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy("user_id").as[(Long, Long)].collect()
    assert(streaming.toSeq == batch.toSeq)
  }

  test("partitioned parquet writes enable partition pruning at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.documents(spark, sf)
      .write.partitionBy("lang").mode("overwrite").parquet(dir)
    val pruned = spark.read.parquet(dir).filter($"lang" === "de")
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("lang#") && scan.contains("= de"),
      s"partition filter not pushed:\n$scan")
    // only the de partition directory is read
    val expected = Tables.documents(spark, sf).filter($"lang" === "de").count()
    assert(pruned.count() == expected)
  }

  test("shinglePostings (codegen path) equals the array-expression shingles") {
    val docs = Tables.documents(spark, sf).limit(50)
    val fast = operators.Dedup.shinglePostings(docs, "doc_id", "text", 3)
      .as[(Long, String)].collect().toSet
    val slow = docs
      .select($"doc_id", explode(operators.Dedup.shingles($"text", 3)).as("shingle"))
      .distinct().as[(Long, String)].collect().toSet
    assert(fast == slow)
  }

  test("similarity-pair paths plan as equi-joins: no cartesian, no nested loop") {
    // the two formerly-quadratic paths: banded-LSH embedding near-dup
    // (q32/q47) and the length-blocked name-similarity join (q44) —
    // both must meet through an equi-join key, never a cross product
    val lsh = operators.Similarity.lshNearDupPairs(
      Tables.embeddings(spark, sf), dims = 64, planesPerBand = 4,
      nBands = 8, threshold = 0.4)
    val q44 = SparkEntry.queries("q44_name_similarity")(spark, sf)
    Seq("lshNearDupPairs" -> lsh, "q44" -> q44).foreach { case (name, df) =>
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name plans a nested-loop join")
    }
  }

  test("small dimension joins broadcast under the default threshold") {
    val joined = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf),
        $"c_nationkey" === $"n_nationkey")
    joined.collect()
    assert(joined.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    // one hot key carrying ~90% of the left side: without AQE the
    // sort-merge join has one straggler partition; with skew-join
    // enabled the runtime splits it (plan marks the join skew=true).
    // Thresholds are lowered so test-sized data crosses them — the
    // mechanism, not the absolute sizes, is what 100 TB relies on.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "20KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val left = spark.range(0, 60000).select(
        when($"id" < 54000, lit(1L)).otherwise($"id").as("k"),
        concat(lit("payload_"), $"id").as("payload"))
      val right = spark.range(0, 2000).select(
        $"id".as("k"), ($"id" * 2).as("r"))
      val j = left.join(right, "k")
      // action on the SAME Dataset: a write would plan its own
      // execution and leave j's AdaptiveSparkPlan unexecuted
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split join in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  // Round 7: past the broadcast cap, mutualTopOne / knnOutliers route
  // through the join-based LSH kernel instead of require-failing. The
  // fixture is 30 well-separated near-identical pairs (deterministic
  // seed), where LSH top-1 = brute top-1 by construction, so the two
  // routes must agree exactly; maxRows=10 forces the scale route
  // without materializing 200k rows.
  private def pairedVectors(nPairs: Int, dims: Int) = {
    val rnd = new scala.util.Random(20260813L)
    (0 until nPairs).flatMap { p =>
      val base = Array.fill(dims)((rnd.nextDouble() * 2 - 1).toFloat)
      val twin = base.map(x => x + 1e-4f)
      Seq((2L * p, base), (2L * p + 1, twin))
    }.toDF("vec_id", "embedding")
  }

  test("mutualTopOne above the cap: LSH route equals brute force") {
    val vecs = pairedVectors(30, 8)
    def run(cap: Int) = graft.operators.Similarity
      .mutualTopOne(spark, vecs, "vec_id", "embedding",
        maxRows = cap, dims = 8, nPlanes = 8, nProbes = 4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val brute = run(1000)   // under cap: exact kernel
    val routed = run(10)    // over cap: LSH route, no error
    assert(brute == (0 until 30).map(p => (2L * p, 2L * p + 1)).toSet)
    assert(routed == brute)
  }

  test("knnOutliers above the cap: LSH route equals brute force") {
    val vecs = pairedVectors(30, 8)
    def run(cap: Int) = graft.operators.Similarity
      .knnOutliers(spark, vecs, "vec_id", "embedding", k = 1,
        maxSim = 0.999, maxRows = cap, dims = 8, nPlanes = 8, nProbes = 4)
      .as[(Long, Double, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val brute = run(1000)
    val routed = run(10)
    assert(brute.keySet == (0L until 60L).toSet)
    assert(brute.values.forall(!_._2))  // every twin sim ~1 -> no outliers
    assert(routed == brute)             // bit-identical sims, same flags
  }

  test("cosineNearDupPairs: bounded collect fails loudly past the cap") {
    val vecs = pairedVectors(30, 8)
    // round 9: the cap now throws a dedicated type, so the router can
    // never confuse it with an unrelated require failure
    val e = intercept[graft.operators.Similarity.BroadcastCapExceeded] {
      graft.operators.Similarity
        .cosineNearDupPairs(spark, vecs, 0.9, maxRows = 10).collect()
    }
    assert(e.getMessage.contains("exceeds 10 rows"))
    // ground-truth use unchanged under the default cap
    val ok = graft.operators.Similarity
      .cosineNearDupPairs(spark, vecs, 0.999999)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(ok == (0 until 30).map(p => (2L * p, 2L * p + 1)).toSet)
  }
}
