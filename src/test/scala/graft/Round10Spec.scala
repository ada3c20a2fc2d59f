package graft

import org.apache.spark.sql.functions._

/** Round-10 session specs. */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  // --- Rabin–Karp window fingerprints (q240 rework) -------------------------

  test("windowFingerprints: emits every valid (pos, len) exactly once, " +
      "and fingerprint equality coincides with token-text equality") {
    val docs = Seq(
      (1L, "a b c d a b c x"),
      (2L, "b c d a b z"),
      (3L, "q w e r a b c d t"),
      (4L, "a")).toDF("doc_id", "text")
    val toks = operators.SuffixArray.tokenized(docs, "doc_id", "text")
    val wsMap = toks.collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val maxLen = wsMap.values.map(_.size).max
    val lens = Seq(1, 2, 3, 4)
    val wf = operators.SuffixArray.windowFingerprints(toks, lens, maxLen)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // coverage: exactly one row per (doc, 0-based pos, len) with
    // pos + len <= docLen
    val expected = for {
      (d, ws) <- wsMap.toSeq; len <- lens
      pos <- 0 to ws.size - len
    } yield (d, pos, len)
    assert(wf.map(t => (t._1, t._2, t._3)).toSeq.sorted == expected.sorted)
    // discrimination: equal hash <=> equal token text (per len)
    val byText = wf.groupBy { case (d, pos, len, _) =>
      (len, wsMap(d).slice(pos, pos + len).mkString(" "))
    }
    for ((_, rows) <- byText)
      assert(rows.map(_._4).distinct.size == 1,
        "same text must fingerprint identically")
    val textToH = byText.map { case (k, rows) => k -> rows.head._4 }
    assert(textToH.values.toSeq.distinct.size == textToH.size,
      "distinct texts must fingerprint distinctly on this fixture")
  }

  test("spanFingerprints: the mined-side fold equals the window-side " +
      "prefix-sum fingerprint at the span's own location") {
    val docs = Seq(
      (1L, "a b c d a b c x"),
      (2L, "b c d a b z")).toDF("doc_id", "text")
    val toks = operators.SuffixArray.tokenized(docs, "doc_id", "text")
    val maxLen = 8
    // spans: (doc 1, off 1, span 4) = "a b c d"; (doc 2, off 2, span 3)
    // = "c d a"; (doc 1, off 5, span 2) = "a b"
    val mined = Seq((1L, 1L, 4L), (2L, 2L, 3L), (1L, 5L, 2L))
      .toDF("doc_id", "off", "span")
    val sp = operators.SuffixArray.spanFingerprints(mined, toks, maxLen)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val wf = operators.SuffixArray
      .windowFingerprints(toks, Seq(2, 3, 4), maxLen)
      .collect()
      .map(r => ((r.getLong(0), r.getInt(1), r.getInt(2)), r.getLong(3)))
      .toMap
    assert(sp == Set(
      (wf((1L, 0, 4)), 4), (wf((2L, 1, 3)), 3), (wf((1L, 4, 2)), 2)))
    // and the repeat is matched cross-doc: "a b" at doc 2 off 4 too
    assert(wf((2L, 3, 2)) == wf((1L, 4, 2)))
  }

  test("minedSpanRemoval: end-to-end on a fixture with a planted " +
      "verbatim repeat — the repeated span is cut everywhere") {
    val boiler = "lorem ipsum dolor sit amet consectetur"
    val docs = Seq(
      (1L, s"alpha $boiler beta"),
      (2L, s"$boiler gamma delta"),
      (3L, "unique text with no repeats at all here")
    ).toDF("doc_id", "text")
    val out = operators.SuffixArray
      .minedSpanRemoval(docs, "doc_id", "text", minSpan = 6, topK = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(out(1L)._2 >= 6 && !out(1L)._3.contains("lorem"))
    assert(out(2L)._2 >= 6 && !out(2L)._3.contains("ipsum"))
    assert(out(3L) == ((8, 0, "unique text with no repeats at all here")))
  }

  // --- unigram-LM EM vocabulary (q293) --------------------------------------

  test("emVocab: prunes the bottom multi-char pieces by usage, keeps " +
      "every single char, and emSegment still segments every word") {
    // 10 words; 'abcd' dominates usage, rare pieces get pruned
    val docs = Seq((1L, "abcd abcd abcd abcd zq zq xv abcd abcd pppp"))
      .toDF("doc_id", "text")
    val vocab = operators.UnigramSegment
      .emVocab(docs, "text", emRounds = 1, prunePermille = 500)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every single char of the corpus survives
    for (c <- "abcdzqxvp")
      assert(vocab.contains(c.toString), s"single char $c pruned")
    // the dominant piece survives with usage-weighted score:
    // 'abcd' used 6 times, len 4 -> score 96
    assert(vocab.get("abcd").contains(96L))
    val seg = operators.UnigramSegment
      .emSegment(docs, "text", emRounds = 1, prunePermille = 500)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    // all four distinct words segment (singles guarantee coverage)
    assert(seg.keySet == Set("abcd", "zq", "xv", "pppp"))
    assert(seg("abcd") == "abcd")
  }

  test("emVocab: a piece the E-step never uses is dropped even when " +
      "the seed vocabulary contained it") {
    // seed vocab contains 'ab', 'bc', 'abc' (all count >= 2); Viterbi
    // prefers 'abc' (score 2*9=18 beats ab+c / a+bc), so 'ab'/'bc'
    // have usage 0 and must vanish from the refined vocabulary
    val docs = Seq((1L, "abc abc")).toDF("doc_id", "text")
    val vocab = operators.UnigramSegment
      .emVocab(docs, "text", emRounds = 1, prunePermille = 0)
      .collect().map(r => r.getString(0)).toSet
    assert(vocab.contains("abc"))
    assert(!vocab.contains("ab") && !vocab.contains("bc"),
      "unused multi-char pieces must drop out of the EM vocabulary")
  }

  test("minedSpanRemoval: nothing mined (minSpan above any repeat) " +
      "returns every document unchanged") {
    val docs = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    val out = operators.SuffixArray
      .minedSpanRemoval(docs, "doc_id", "text", minSpan = 50, topK = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3))).toSet
    assert(out == Set((1L, 3, 0, "a b c"), (2L, 3, 0, "d e f")))
  }
}
