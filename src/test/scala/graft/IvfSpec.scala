package graft

import org.apache.spark.sql.functions._
import graft.operators.{DuplicateClusters, IvfIndex, Similarity, SkewAgg}

/** IVF ANN recall, duplicate-cluster resolution, salted-join
  * equivalence. */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("IVF search recall@1 vs brute force is high on real embeddings") {
    val emb = Tables.embeddings(spark, sf)
      .withColumn("vn", Similarity.l2normalize($"embedding"))
    val corpus = emb.select($"vec_id".as("cid"), $"vn".as("cvec"))
    val queries = emb.filter($"vec_id" % 20 === 0)
      .select($"vec_id".as("qid"), $"vn".as("qvec"))
    val vectors = emb.select($"vec_id".as("id"), $"vn".as("vec"))
    val centroids = IvfIndex.train(spark, vectors, k = 8, iters = 2, dims = 64)
    assert(centroids.count() == 8)
    val ivf = IvfIndex.search(spark, queries, corpus, centroids,
      nProbe = 3, k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val brute = Similarity.bruteForceTopKFast(spark, queries, corpus, 1)
      .filter($"rank" === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val hits = brute.keys.count(q => ivf.get(q).contains(brute(q)))
    // these synthetic embeddings are weakly clustered (max pairwise
    // cosine ~0.5), which bounds any quantizer's recall; the assertion
    // pins "clearly better than random-partition search": probing 3/8
    // lists at random would land the true neighbor ~37% of the time.
    assert(hits >= (brute.size * 0.48).toInt,
      s"IVF recall@1 not above random baseline: $hits/${brute.size}")
  }

  test("duplicate clusters: transitive closure with min-id canonical") {
    // components: {1,2,3} (chain), {10,11}, singleton edges absent
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val got = DuplicateClusters.resolve(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("approx_count_distinct is within the configured error bound") {
    val li = Tables.lineitem(spark, sf)
    val approx = li.agg(
      approx_count_distinct($"l_partkey", rsd = 0.02).as("a"))
      .as[Long].head()
    val exact = li.select($"l_partkey").distinct().count()
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx $approx vs exact $exact")
  }

  test("bucketed range join equals the theta join") {
    val bands = spark.range(0, 12).toDF("band_id")
      .select($"band_id", ($"band_id" * 50000.0).as("lo"),
        (($"band_id" + 1) * 50000.0).as("hi"))
    val orders = Tables.orders(spark, sf)
    val bucketed = operators.RangeJoin
      .byBucket(orders, "o_totalprice", bands, "lo", "hi", 25000.0)
      .select("o_orderkey", "band_id")
      .orderBy("o_orderkey").collect().toSeq
    val theta = orders.join(bands,
      $"o_totalprice" >= $"lo" && $"o_totalprice" < $"hi")
      .select("o_orderkey", "band_id")
      .orderBy("o_orderkey").collect().toSeq
    assert(bucketed == theta)
  }

  test("salted join equals plain join") {
    val ev = Tables.events(spark, sf)
    val dim = ev.select($"event_type").distinct()
      .withColumn("w", length($"event_type"))
    val salted = SkewAgg.saltedJoin(ev, dim, "event_type",
      saltSource = $"event_id", salts = 8)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type").collect().toSeq
    val plain = ev.join(dim, Seq("event_type"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type").collect().toSeq
    assert(salted == plain)
  }
}
