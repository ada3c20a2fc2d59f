package graft

import org.apache.spark.sql.functions._

/** FM-index local kernel ([[operators.FmIndex.countPatternsLocal]])
  * pinned bit-identical to the relational reference path
  * ([[operators.FmIndex.countPatterns]]) — fixtures exercising empty
  * intervals, overlapping self-repeats, single-token patterns, the
  * sentinel boundary, the adversarial-doc Manber–Myers branch, and a
  * real corpus slice with its actual top grams. */
class FmIndexSpec extends SparkSpec {
  import spark.implicits._

  private def both(docs: org.apache.spark.sql.DataFrame,
      pats: Seq[String]): (Map[String, (Long, Long)],
        Map[String, (Long, Long)]) = {
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    (m(operators.FmIndex.countPatterns(spark, docs, "doc_id", "text",
      pats)),
     m(operators.FmIndex.countPatternsLocal(spark, docs, "doc_id",
       "text", pats)))
  }

  test("local kernel == relational path on the mixed fixture") {
    val docs = Seq(
      (1L, "a b c a b c a b"),
      (2L, "b c a b"),
      (3L, "c c c a b c"),
      (4L, "a"),
      (5L, "b a b a b a b a b a b")).toDF("doc_id", "text")
    val pats = Seq("a b", "b c a", "a", "c c", "z z", "a b c")
    val (rel, loc) = both(docs, pats)
    assert(loc == rel)
    assert(loc("z z") == ((0L, 0L)))
  }

  test("local kernel == relational path across the adversarial " +
    "suffix-sort cutoff (all-equal tokens, Manber–Myers branch)") {
    val n = operators.SuffixArray.NaiveSuffixSortCutoff + 50
    val docs = Seq(
      (1L, Seq.fill(n)("x").mkString(" ")),
      (2L, "x y x y x")).toDF("doc_id", "text")
    val pats = Seq("x", "x x", "x x x", "x y x", "y y")
    val (rel, loc) = both(docs, pats)
    assert(loc == rel)
    // first principles: a k-gram in an n-token run occurs n-k+1
    // times, and doc 2 ("x y x y x") contributes no "x x" at all
    assert(loc("x x") == ((1L, (n - 1).toLong)))
  }

  test("property: local == relational on random small corpora and " +
    "random patterns (scalacheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val tok = Gen.oneOf("a", "b", "c", "ab", "Ω") // incl. multi-byte
    val doc = Gen.choose(1, 9).flatMap(n => Gen.listOfN(n, tok))
      .map(_.mkString(" "))
    val corpusGen = for {
      nd <- Gen.choose(1, 4)
      ds <- Gen.listOfN(nd, doc)
      np <- Gen.choose(1, 3)
      ps <- Gen.listOfN(np, Gen.choose(1, 3)
        .flatMap(m => Gen.listOfN(m, tok)).map(_.mkString(" ")))
    } yield (ds, ps.distinct)
    val prop = Prop.forAll(corpusGen) { case (ds, ps) =>
      val docs = ds.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val (rel, loc) = both(docs, ps)
      rel == loc
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, s"fm property: ${res.status}")
  }

  test("plan shape: the local FM kernel is one object island + one " +
    "aggregation exchange (plus the broadcast pattern join)") {
    val docs = Seq((1L, "a b a"), (2L, "b a b")).toDF("doc_id", "text")
    val p = operators.FmIndex
      .countPatternsLocal(spark, docs, "doc_id", "text", Seq("a b"))
      .queryExecution.executedPlan.toString
    assert(p.contains("SerializeFromObject"),
      s"expected the typed per-doc fold:\n$p")
    val exchanges = p.sliding("Exchange".length).count(_ == "Exchange")
    // one hash exchange for the |patterns|-row aggregation + the
    // broadcast exchange shipping the pattern-name table
    assert(exchanges <= 2, s"local FM path must not shuffle the corpus:\n$p")
  }

  test("local kernel == relational path on the sf corpus with its " +
    "real top grams") {
    val docs = Tables.documents(spark, sf)
    val toks = docs.select(col("doc_id"),
        filter(split(lower(col("text")), " "), w => w =!= "").as("ws"))
      .filter(size(col("ws")) >= 2)
    val top = toks
      .select(explode(expr("transform(sequence(0, size(ws)-2)," +
        " i -> concat_ws(' ', ws[i], ws[i+1]))")).as("pat"))
      .groupBy("pat").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("pat").asc).limit(3)
      .select("pat").as[String].collect().toSeq
    val pats = top ++ Seq("zzabsent zzabsent")
    val (rel, loc) = both(docs, pats)
    assert(loc == rel)
    assert(loc(top.head)._2 > 0L)
  }
}
