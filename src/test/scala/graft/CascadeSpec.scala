package graft

import graft.operators.Cascade
import org.apache.spark.sql.Row

/** Quality-cascade pinning: hand-computed ppm dispositions on crafted
  * docs (gate pass/fail on each clause, scorer threshold both sides),
  * the survivors-only NULL contract for score_ppm, the kept ⊆
  * full-kept recall identity, and the cost model at both unit-cost
  * settings. */
class CascadeSpec extends SparkSpec {
  import spark.implicits._

  // gate: 8 ≤ n_words ≤ 80 AND div_ppm ≥ 300000
  // score = (4·len_ppm + 4·div_ppm + 2·stop4_ppm) div 10, kept ≥ 600000
  private val docs = Seq(
    // 8 distinct words, 1 stopword ("the"): div=1e6, len=8/64,
    // stop4 = min(4e6·1//8, 1e6) = 500000 →
    // score = (4·125000 + 4·1000000 + 2·500000)/10 = 550000 → gated in,
    // scored, NOT kept
    (1L, "the quick brown fox jumps over lazy dogs"),
    // 7 words < 8: gate fails on length (score never computed)
    (2L, "seven distinct words only right here now"),
    // 10 words, all "word": div = 1e6·1//10 = 100000 < 3e5: gate fails
    (3L, "word word word word word word word word word word"),
    // 64 words (50 distinct), 16 stopwords: len_ppm = 1e6, div_ppm =
    // 1e6·50//64 = 781250, stop4 = min(4e6·16//64, 1e6) = 1e6 →
    // score = (4e6 + 3125000 + 2e6)//10 = 912500 → kept
    (4L, ((1 to 48).map(i => s"w$i") ++ Seq.fill(8)("the")
      ++ Seq.fill(8)("of")).mkString(" ")))
    .toDF("doc_id", "text")

  test("cascadeFilter: per-doc gate, survivors-only score, kept flag") {
    val out = Cascade.cascadeFilter(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          r.getBoolean(5))).toMap
    assert(out(1L) == ((8L, true, Some(550000L), false)))
    assert(out(2L) == ((7L, false, None, false)))
    assert(out(3L) == ((10L, false, None, false)))
    val d4 = out(4L)
    assert(d4._2 && d4._4, "doc 4 passes gate and is kept")
    assert(d4._3.contains(912500L))
  }

  test("cascadeEconomics: counts, recall identity, cost model") {
    val r = Cascade.cascadeEconomics(docs, "doc_id", "text").head()
    assert(r.getLong(0) == 4) // n_docs
    assert(r.getLong(1) == 2) // n_s1_pass (docs 1, 4)
    assert(r.getLong(2) == 1) // n_kept (doc 4)
    // full scorer keeps doc 4 only (docs 2,3 score below 600000:
    // doc2 div=1e6,len=7/64·1e6=109375,stop4=0 → 443750; doc3
    // div=1e5,len=156250,stop4=0 → 102500)
    assert(r.getLong(3) == 1) // n_full_kept
    assert(r.getLong(4) == 1000000L) // recall: kept ⊆ full-kept, 1/1
    assert(r.getLong(5) == 80L) // cost_full = 20·4
    assert(r.getLong(6) == 44L) // cost_cascade = 4 + 20·2
    assert(r.getLong(7) == (1000000L * 36) / 80) // savings_ppm
  }

  test("cascadeEconomics: custom unit costs change the break-even") {
    val r = Cascade
      .cascadeEconomics(docs, "doc_id", "text",
        cheapCost = 5L, expensiveCost = 10L).head()
    assert(r.getLong(5) == 40L) // 10·4
    assert(r.getLong(6) == 40L) // 5·4 + 10·2 — gate exactly breaks even
    assert(r.getLong(7) == 0L)
  }

  test("plan shape: cascadeFilter is map-only — no Exchange at all; " +
      "cascadeEconomics shuffles exactly once (the final 1-group agg)") {
    val f = Cascade.cascadeFilter(docs, "doc_id", "text")
    val fPlan = f.queryExecution.executedPlan.toString
    assert(!fPlan.contains("Exchange"),
      s"gate+scorer must stay inside one map stage:\n$fPlan")
    val e = Cascade.cascadeEconomics(docs, "doc_id", "text")
    val ePlan = e.queryExecution.executedPlan.toString
    assert(ePlan.sliding("Exchange".length).count(_ == "Exchange") == 1,
      s"economics is one partial->final agg, one exchange:\n$ePlan")
  }

  test("gateScorerKappa: hand-computed agreement on the fixture") {
    // gate = [T,F,F,T], scorer(>=6e5) = [F,F,F,T] -> n_agree = 3,
    // po = 3e6//4 = 750000; marginal ppms gy=500000, sy=250000 ->
    // pe = (500000*250000 + 500000*750000)//1e6 = 500000;
    // kappa = 1e6*(750000-500000)//(1e6-500000) = 500000
    val r = Cascade.gateScorerKappa(docs, "doc_id", "text").head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 3)
    assert(r.getLong(2) == 2 && r.getLong(3) == 1)
    assert(r.getLong(4) == 750000L, "po_ppm")
    assert(r.getLong(5) == 500000L, "pe_ppm")
    assert(r.getLong(6) == 500000L, "kappa_ppm")
  }

  test("gateScorerKappa: constant annotators pin the pe=1e6 guard") {
    import spark.implicits._
    // every doc fails the gate AND the scorer: po = 1e6, pe = 1e6 ->
    // the kappa denominator is 0; the guard returns 0, not an error
    val flat = Seq((1L, "a a"), (2L, "b b")).toDF("doc_id", "text")
    val r = Cascade.gateScorerKappa(flat, "doc_id", "text").head()
    assert(r.getLong(4) == 1000000L && r.getLong(5) == 1000000L)
    assert(r.getLong(6) == 0L)
  }

  test("cascadeEconomics: empty corpus yields zeros, no div-by-zero") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val r = Cascade.cascadeEconomics(empty, "doc_id", "text").head()
    assert(r.getLong(0) == 0 && r.getLong(4) == 0 && r.getLong(7) == 0)
  }
}
