package graft

import org.apache.spark.sql.functions._
import graft.operators.{Stats, TextAnalysis}

/** Drift / LM-scoring operators (q152-q154): closed-form fixtures. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("psi is zero when current matches reference exactly") {
    val ref = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0)
      .toDF("value")
    val out = Stats.psi(ref, ref, "value", buckets = 5).collect()
    assert(out.length == 5)
    assert(out.forall(_.getAs[Double]("psi_total") == 0.0))
    assert(out.forall(_.getAs[Double]("psi_term") == 0.0))
  }

  test("psi detects a shifted distribution with positive score") {
    val ref = (1 to 100).map(_.toDouble).toDF("value")
    val cur = (151 to 250).map(_.toDouble).toDF("value")  // mass clamps high
    val out = Stats.psi(ref, cur, "value", buckets = 10).collect()
    val total = out.head.getAs[Double]("psi_total")
    assert(total > 0.25, s"expected action-level drift, got $total")
    // all current mass lands in the top clamp bin
    assert(out.filter(_.getAs[Int]("bin") == 10)
      .head.getAs[Long]("n_cur") == 100L)
  }

  test("stupid backoff: seen bigrams use conditional, unseen back off") {
    // LM = docs 1-3: unigrams a:3 b:2 c:1 (N=6, V=3); bigrams
    // (a,b):2 (a,c):1. Doc 4 "b c" scores the UNSEEN bigram path;
    // doc 5 "b oov" exercises the OOV add-one floor.
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "b c"),
      (5L, "b oov")).toDF("doc_id", "text")
    val lm = docs.filter($"doc_id" <= 3)
    val got = TextAnalysis.stupidBackoff(docs, lm, "doc_id", "text", -10.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def q9(x: Double) = BigDecimal(x).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == q9(math.log(2.0 / 3.0)))            // c(a,b)/c(a)
    assert(got(3L) == q9(math.log(1.0 / 3.0)))            // c(a,c)/c(a)
    assert(got(4L) == q9(math.log(0.4 * 2.0 / 10.0)))     // (c(c)+1)/(N+V+1)
    assert(got(5L) == q9(math.log(0.4 * 1.0 / 10.0)))     // OOV: (0+1)/(N+V+1)
  }

  test("kl drift is zero for a single-source corpus") {
    val docs = Seq((1L, "x y z"), (2L, "x y")).toDF("doc_id", "text")
      .withColumn("source", lit("only"))
    val out = TextAnalysis.sourceKlDrift(docs, "source", "text").collect()
    assert(out.length == 1 && out.head.getAs[Double]("kl") == 0.0)
  }

  test("kaplan-meier matches the hand-computed product-limit curve") {
    // subjects: events at t=1 (2 of 4 at risk), t=2 (1 of 2);
    // censored at t=1 (1) and t=3 (0 events -> no curve row)
    val subjects = Seq(
      (1, true), (1, true), (1, false), (2, true), (3, false))
      .toDF("dur", "converted")
    val got = operators.Temporal.kaplanMeier(subjects, "dur", "converted")
      .orderBy("t").collect()
    assert(got.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq((1, 5L, 2L), (2, 2L, 1L)))
    // the engine sums DECIMALS exactly, then casts once — mirror that
    def d9(x: Double) = BigDecimal(x).setScale(9,
      BigDecimal.RoundingMode.HALF_UP)
    val t1 = d9(math.log(1.0 - 2.0 / 5.0))
    val t2 = d9(math.log(1.0 - 1.0 / 2.0))
    assert(got.map(_.getDouble(3)).toSeq ==
      Seq(t1.toDouble, (t1 + t2).toDouble))
    // survival: S(1) = 3/5, S(2) = 3/10 (to 6 dp through exp∘ln)
    assert(got.map(_.getDouble(4)).toSeq == Seq(0.6, 0.3))
  }

  test("kaplan-meier reaches exact zero when the last cohort fully converts") {
    // t=1: n_risk=3, d=1 -> S=2/3; t=2: n_risk=1, d=1 -> factor 0,
    // ln undefined: ln_surv NULL, surv exactly 0.0 (not a NULL-skip)
    val subjects = Seq((1, true), (1, false), (2, true))
      .toDF("dur", "converted")
    val got = operators.Temporal.kaplanMeier(subjects, "dur", "converted")
      .orderBy("t").collect()
    assert(got.length == 2)
    val last = got(1)
    assert(last.getInt(0) == 2 && last.getLong(1) == 1L)
    assert(last.isNullAt(3) && last.getDouble(4) == 0.0)
    assert(!got(0).isNullAt(3) && got(0).getDouble(4) == 0.666667)
  }

  test("kl drift is positive for a skewed source") {
    val docs = Seq(
      ("s1", "a a a a b"), ("s2", "b b b b a")).toDF("source", "text")
    val out = TextAnalysis.sourceKlDrift(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("kl")).toMap
    // symmetric construction: both sources equally divergent, kl > 0
    assert(out("s1") > 0 && out("s1") == out("s2"))
  }
}
