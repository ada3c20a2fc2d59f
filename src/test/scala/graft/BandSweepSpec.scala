package graft

import org.apache.spark.sql.functions._

/** MinHash band-geometry sweep ([[operators.MinHashLSH
  * .bandSweepAudit]]): the aligned-banding subset theorem (a pair
  * agreeing on an (m0..m_{r'-1}) band agrees on every sub-band, so
  * candidates shrink monotonically as rows-per-band grow), planted
  * exact duplicates, the empty-truth sentinel, and the no-cartesian
  * plan shape. */
class BandSweepSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq

  test("candidates and hits are monotone non-increasing down the " +
    "sweep (aligned-band subset theorem) on the sf corpus") {
    val out = rows(operators.MinHashLSH.bandSweepAudit(
      Tables.documents(spark, sf), "doc_id", "text"))
    assert(out.map(t => (t._1, t._2)) ==
      Seq((8L, 1L), (4L, 2L), (2L, 4L), (1L, 8L)))
    val nTrue = out.map(_._4).distinct
    assert(nTrue.size == 1) // same truth set on every row
    assert(out.map(_._3).sliding(2).forall(p => p.head >= p.last),
      s"candidates must shrink as rows/band grow: $out")
    assert(out.map(_._5).sliding(2).forall(p => p.head >= p.last),
      s"hits must shrink as rows/band grow: $out")
    // hits bounded by both candidates and truth
    out.foreach { t =>
      assert(t._5 <= t._3 && t._5 <= t._4)
    }
  }

  test("planted exact duplicates are candidates under EVERY banding " +
    "and counted as hits") {
    val dup = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, dup), (2L, dup),
      (3L, "one two three four five six seven"),
      (4L, "eight nine ten eleven twelve thirteen")).toDF(
      "doc_id", "text")
    val out = rows(operators.MinHashLSH.bandSweepAudit(
      docs, "doc_id", "text"))
    // identical token sets -> identical signatures -> in every banding
    out.foreach { t =>
      assert(t._3 >= 1L, s"config ${(t._1, t._2)} lost the dup pair")
      assert(t._5 >= 1L)
      assert(t._4 == 1L) // truth = exactly the planted pair
      assert(t._6 == 1000000L) // full recall everywhere
    }
  }

  test("truth boundary: a pair at EXACTLY J = 1/2 is in the truth " +
    "set (2·|∩| >= |∪| is inclusive)") {
    // doc 1 shingles: {a b c, b c d, c d e}; doc 2 shares exactly
    // {a b c, b c d} and adds {x y z, y z w}: inter=2, union=5 ->
    // J=2/5 < 1/2. Build an exact-1/2 pair instead: inter=2, na=3,
    // nb=3 -> union=4 -> J=1/2. Tokens: doc1 "a b c d e" (3 shingles),
    // doc2 "a b c d q" -> shingles {a b c, b c d, c d q}: inter=2,
    // union=4, J exactly 1/2.
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d q"),
      (3L, "u v w x y")).toDF("doc_id", "text")
    val out = operators.MinHashLSH.bandSweepAudit(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(out.values.toSet == Set(1L), s"J=1/2 pair must be truth: $out")
  }

  test("no near-dups: zero candidates rows survive with n_true = 0 " +
    "and the -1 recall sentinel") {
    val docs = Seq(
      (1L, "aa bb cc dd"), (2L, "ee ff gg hh"),
      (3L, "ii jj kk ll")).toDF("doc_id", "text")
    val out = rows(operators.MinHashLSH.bandSweepAudit(
      docs, "doc_id", "text"))
    assert(out.length == 4) // every config row present, even if empty
    out.foreach { t =>
      assert(t._4 == 0L && t._5 == 0L && t._6 == -1L)
      if (t._3 == 0L) assert(t._7 == -1L) // both sentinels line up
    }
  }

  test("plan shape: the sweep is band equi-joins — no cartesian, no " +
    "broadcast nested loop") {
    val docs = Seq((1L, "a b c d"), (2L, "b c d e")).toDF(
      "doc_id", "text")
    val p = operators.MinHashLSH.bandSweepAudit(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"pair joins must be equi:\n$p")
    // exactly one BroadcastNestedLoopJoin is sanctioned: the 1-row
    // n_true aggregate joined onto the 4 config rows (the repo's
    // broadcast one-row-lattice convention) — never a pair join
    val bnlj = p.sliding("BroadcastNestedLoopJoin".length)
      .count(_ == "BroadcastNestedLoopJoin")
    assert(bnlj <= 1, s"only the scalar n_true join may nest-loop:\n$p")
  }
}
