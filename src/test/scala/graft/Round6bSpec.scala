package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Metrics, TextAnalysis}

/** Round-6 additions: typed PII scrub, fixed-stride token chunking,
  * reciprocal-rank fusion, paragraph-level first-owner dedup, and
  * DSIR-style importance weights — hand-computed fixtures plus the
  * structural invariants that pin each operator's contract. */
class Round6bSpec extends SparkSpec {
  import spark.implicits._

  // --- typed PII scrub --------------------------------------------------
  test("piiScrub masks emails, phones, IPs in order with exact counts") {
    val docs = Seq(
      (1L, "write to bob.smith@mail7.example.org or call 555-123-4567"),
      (2L, "server 192.168.10.254 and 10.0.0.1 responded"),
      (3L, "no pii here at all"),
      (4L, "two mails a@b.io c@d.org one phone 555-000-1111")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4)))
    assert(out(0) == ((1L, 1, 1, 0,
      "write to <EMAIL> or call <PHONE>")))
    assert(out(1) == ((2L, 0, 0, 2, "server <IP> and <IP> responded")))
    assert(out(2) == ((3L, 0, 0, 0, "no pii here at all")))
    assert(out(3) == ((4L, 2, 1, 0,
      "two mails <EMAIL> <EMAIL> one phone <PHONE>")))
  }

  test("piiScrub: a digit-bearing mail domain is not re-counted as an IP") {
    // the email eats '1.2.3.4mail@x22.co' ... masking order is the contract:
    // after <EMAIL> replacement no digits survive for the IP pass.
    val docs = Seq((1L, "ping admin@10.2.3.4mail.example.com now"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.piiScrub(docs, "doc_id", "text").collect().head
    assert(r.getInt(1) == 1 && r.getInt(3) == 0)
    assert(r.getString(4) == "ping <EMAIL> now")
  }

  // --- fixed-stride token chunking --------------------------------------
  test("tokenChunks covers the tail and keeps the per-doc row contract") {
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 10 toks, width 4 stride 3
      (2L, "only two"),
      (3L, "")                                // empty -> one empty chunk
    ).toDF("doc_id", "text")
    val out = Curation.tokenChunks(docs, "doc_id", "text",
        width = 4, stride = 3)
      .orderBy("doc_id", "chunk_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4)))
    // starts 0,3,6,9 — last chunk is the 1-token tail
    assert(out.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0, 0, 4, "t0 t1 t2 t3"),
      (1L, 1, 3, 4, "t3 t4 t5 t6"),
      (1L, 2, 6, 4, "t6 t7 t8 t9"),
      (1L, 3, 9, 1, "t9")))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, 0, 2, "only two")))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0, 0, 0, "")))
    // every token index is covered by at least one chunk
    val covered = out.filter(_._1 == 1L)
      .flatMap(c => c._3 until (c._3 + c._4)).toSet
    assert(covered == (0 until 10).toSet)
  }

  // --- reciprocal-rank fusion -------------------------------------------
  test("rrfFusion fuses two total orders in exact integer fixed point") {
    // quality q desc (negated), length l asc; k = 60
    val df = Seq(
      (1L, 30L, 5L),   // rank_a 1, rank_b 2
      (2L, 20L, 1L),   // rank_a 2, rank_b 1
      (3L, 10L, 9L)    // rank_a 3, rank_b 3
    ).toDF("id", "q", "l")
    val out = Metrics.rrfFusion(df, "id", -col("q"), col("l"), k = 60)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    def rrf(a: Int, b: Int) =
      1000000000000L / (60 + a) + 1000000000000L / (60 + b)
    assert(out.toSeq == Seq(
      (1L, 1, 2, rrf(1, 2)),
      (2L, 2, 1, rrf(2, 1)),
      (3L, 3, 3, rrf(3, 3))))
  }

  test("rrfFusion breaks score ties by id, keeping both rankings total") {
    val df = Seq((5L, 7L, 7L), (2L, 7L, 7L), (9L, 7L, 7L))
      .toDF("id", "q", "l")
    val out = Metrics.rrfFusion(df, "id", -col("q"), col("l"), k = 60)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.toSeq == Seq((2L, 1, 1), (5L, 2, 2), (9L, 3, 3)))
  }

  // --- paragraph-level first-owner dedup --------------------------------
  test("paragraphDedup keeps the global first copy and rebuilds text") {
    // paraLen 2: doc 1 = [a b][c d], doc 2 = [c d][e f], doc 3 = [a b]
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "c d e f"),
      (3L, "a b")
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text", paraLen = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, "a b c d"),       // owns both paragraphs
      (2L, 2L, 1L, "e f"),           // 'c d' owned by doc 1
      (3L, 1L, 0L, "")))             // fully deduplicated, row survives
    // corpus-wide: every distinct paragraph survives exactly once
    val kept = out.map(_._3).sum
    assert(kept == 3) // 'a b', 'c d', 'e f'
  }

  test("paragraphDedup within-doc repeats: only the earliest survives") {
    val docs = Seq((7L, "x y x y z z")).toDF("doc_id", "text")
    val r = Dedup.paragraphDedup(docs, "doc_id", "text", paraLen = 2)
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getString(3)) ==
      ((3L, 2L, "x y z z")))
  }

  // --- DSIR importance weights ------------------------------------------
  test("dsirWeights: target == raw gives every token weight exactly 1e6") {
    // n_t(f) == n_raw(f) for every feature -> w = ((n+1)*1e6) DIV (n+1)
    // = 1e6, independent of hashing — score is exactly n_toks * 1e6.
    val docs = Seq(
      (1L, "alpha beta gamma", "tgt"),
      (2L, "delta alpha", "tgt")
    ).toDF("doc_id", "text", "src")
    val out = Curation.dsirWeights(docs, "doc_id", "text",
        col("src") === "tgt", buckets = 16)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 3, 3000000L, 1000000L),
      (2L, 2, 2000000L, 1000000L)))
  }

  test("dsirWeights scores target-like docs above off-domain docs") {
    // target vocabulary repeated in-domain; the off-domain doc shares no
    // tokens, so its features carry only the Laplace floor.
    val tgt = (1L to 6L).map(i => (i, "spark shuffle join agg", "tgt"))
    val raw = Seq((100L, "zebra quokka llama okapi", "raw"))
    val docs = (tgt ++ raw).toDF("doc_id", "text", "src")
    val out = Curation.dsirWeights(docs, "doc_id", "text",
        col("src") === "tgt", buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(out(1L) > out(100L))
  }
}
