package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, VectorMean}

/** Native CosineSimilarity expression + typed vector-mean aggregator. */
class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 2.0f), 0),
    (2L, Array(0.5f, 1.5f, -1.0f), 0),
    (3L, Array(-1.0f, 2.0f, 0.25f), 1),
    (4L, Array(3.0f, -0.5f, 1.0f), 1))
    .toDF("vec_id", "embedding", "label")

  test("native cosine_sim is bit-identical to the interpreted HOF form") {
    val pairs = vecs.select($"vec_id".as("qid"), $"embedding".as("qvec"))
      .crossJoin(vecs.select($"vec_id".as("cid"), $"embedding".as("cvec")))
    val both = pairs.select(
      Similarity.cosine($"qvec", $"cvec").as("native"),
      Similarity.cosineHof($"qvec", $"cvec").as("hof"))
      .as[(Double, Double)].collect()
    both.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n)
        == java.lang.Double.doubleToLongBits(h), s"$n != $h")
    }
  }

  test("cosine_sim is usable from SQL via GraftExtensions") {
    // the shared test session isn't built with the extension; register
    // through the same injection the extension performs
    new org.apache.spark.sql.graft.GraftExtensions()
    // verify the expression works through the session's function registry
    vecs.createOrReplaceTempView("graft_vecs")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => org.apache.spark.sql.graft.CosineSimilarity(exprs(0), exprs(1)),
      "built-in")
    val self = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS s FROM graft_vecs")
      .as[Double].collect()
    self.foreach(s => assert(math.abs(s - 1.0) < 1e-12))
  }

  test("native l2_dist_sq is bit-identical to the interpreted HOF form") {
    val emb = Tables.embeddings(spark, sf).limit(50)
    val pairs = emb.select($"vec_id".as("qid"), $"embedding".as("qvec"))
      .crossJoin(emb.select($"vec_id".as("cid"), $"embedding".as("cvec")))
    val rows = pairs.select(
      org.apache.spark.sql.graft.GraftFunctions
        .l2DistSq($"qvec", $"cvec").as("native"),
      graft.operators.IvfIndex.dist2Hof($"qvec", $"cvec").as("hof"))
      .as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n)
        == java.lang.Double.doubleToLongBits(h), s"$n != $h")
    }
  }

  test("native int_dot is bit-identical to the interpreted HOF form") {
    import org.apache.spark.sql.functions._
    val q = graft.operators.Similarity.quantize16($"embedding")
    val emb = Tables.embeddings(spark, sf).limit(50).select(
      $"vec_id", q.as("q"))
    val pairs = emb.select($"vec_id".as("qid"), $"q".as("qa"))
      .crossJoin(emb.select($"vec_id".as("cid"), $"q".as("qb")))
    val rows = pairs.select(
      org.apache.spark.sql.graft.GraftFunctions
        .intDot($"qa", $"qb").as("native"),
      aggregate(zip_with($"qa", $"qb", (x, y) => x * y), lit(0L),
        _ + _).as("hof"))
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, h) => assert(n == h, s"$n != $h") }
  }

  test("native int_dist2 is bit-identical to the interpreted HOF form") {
    import org.apache.spark.sql.functions._
    val q = graft.operators.Similarity.quantize16($"embedding")
    val emb = Tables.embeddings(spark, sf).limit(50).select(
      $"vec_id", q.as("q"))
    val pairs = emb.select($"vec_id".as("qid"), $"q".as("qa"))
      .crossJoin(emb.select($"vec_id".as("cid"), $"q".as("qb")))
    val rows = pairs.select(
      org.apache.spark.sql.graft.GraftFunctions
        .intDist2($"qa", $"qb").as("native"),
      aggregate(zip_with($"qa", $"qb", (x, y) => (x - y) * (x - y)),
        lit(0L), _ + _).as("hof"))
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, h) => assert(n == h, s"$n != $h") }
  }

  test("native banded_lsh_buckets is bit-identical to the declarative form") {
    val emb = Tables.embeddings(spark, sf)
    val rows = emb.select(
      org.apache.spark.sql.graft.BandedLshBuckets
        .column($"embedding", 64, 4, 8).as("native"),
      Similarity.bandedBucketsDeclarative($"embedding", 64, 4, 8).as("decl"))
      .as[(Seq[Long], Seq[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, d) => assert(n == d, s"$n != $d") }
  }

  test("native content_chunk_starts is bit-identical to the declarative scan") {
    // real multilingual corpus text + adversarial edges (short docs,
    // exact-window docs, repeated tokens)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text")
      .unionByName(Seq(
        (100001L, "a"), (100002L, "a b c d"), (100003L, ""),
        (100004L, "x x x x x x x x x x x x")).toDF("doc_id", "text"))
    val toks = filter(split(lower($"text"), " "), w => w =!= "")
    val both = docs.select($"doc_id",
      org.apache.spark.sql.graft.ContentChunkStarts.column(toks, 4, 8)
        .as("native"),
      graft.operators.Dedup.contentChunkBoundariesDeclarative(toks, 4, 8)
        .as("ref"))
    val bad = both.filter(not($"native" <=> $"ref"))
    assert(bad.count() == 0,
      bad.take(3).mkString("; "))
  }

  test("typed mean-vector aggregator matches long-form centroids") {
    val typed = VectorMean
      .centroidsTyped(spark, vecs, "label", "embedding", dims = 3)
      .select($"label", posexplode($"centroid").as(Seq("pos", "v")))
      .as[(Int, Int, Double)].collect()
      .map { case (l, p, v) => (l, p) -> v }.toMap
    val long = VectorMean.centroidsLong(vecs, "label", "embedding")
      .select($"label", $"pos", $"avg_value")
      .as[(Int, Int, Double)].collect()
      .map { case (l, p, v) => (l, p) -> v }.toMap
    assert(typed.keySet == long.keySet)
    typed.foreach { case (k, v) =>
      assert(math.abs(v - long(k)) < 1e-12, s"$k: $v vs ${long(k)}")
    }
  }

  test("native char_fold_hash is bit-identical to the declarative " +
      "aggregate/split fold, multi-byte code points included") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val strs = (1 to 200).map { _ =>
      val n = rnd.nextInt(12)
      (1 to n).map { _ =>
        rnd.nextInt(4) match {
          case 0 => ('a' + rnd.nextInt(26)).toChar.toString
          case 1 => rnd.nextInt(10).toString
          case 2 => "é" // 2-byte UTF-8
          case _ => new String(Character.toChars(0x1F600)) // surrogate pair
        }
      }.mkString
    }.filter(_.nonEmpty) :+ "spark" :+ "a"
    val df = strs.toDF("s")
    val P = 1000000007L
    val declarative = df.select(
      aggregate(split(col("s"), ""), lit(0L),
        (acc, c) => pmod(acc * 31 + ascii(c), lit(P))).as("h"))
      .as[Long].collect().toSeq
    val native = df.select(
      org.apache.spark.sql.graft.CharFoldHash.column(col("s")).as("h"))
      .as[Long].collect().toSeq
    assert(native == declarative)
    // and via the SQL registration (the shared test session isn't
    // built with the extension — the cosine_sim test's convention)
    df.createOrReplaceTempView("cfh_strs")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_fold_hash",
      exprs => org.apache.spark.sql.graft.CharFoldHash(exprs(0)),
      "built-in")
    val viaSql = spark.sql("SELECT char_fold_hash(s) FROM cfh_strs")
      .as[Long].collect().toSeq
    assert(viaSql == declarative)
  }
}
