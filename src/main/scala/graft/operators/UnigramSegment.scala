package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Subword segmentation by Viterbi over an in-corpus piece vocabulary
  * — the unigram-LM tokenizer shape (Kudo 2018, SentencePiece): learn
  * piece statistics from the corpus, then segment every word into the
  * highest-scoring piece sequence by dynamic programming. Completes
  * the tokenizer family: BPE learns merges bottom-up (q129) and
  * encodes greedily (q131); the unigram model scores WHOLE
  * SEGMENTATIONS and picks the global optimum per word.
  *
  * Log-free convention (the q239 EM stance): Kudo's Σ log p(piece)
  * objective is replaced by an exact integer score — score(piece) =
  * count(piece) · len(piece)² (frequent long pieces win), so Viterbi
  * argmaxes are integer-exact and every segmentation is
  * oracle-replayable. Ties break to the lexicographically smallest
  * path string — fully deterministic.
  *
  * Scale shape (round-12 rework): a tokenizer VOCABULARY is bounded
  * by construction — |alphabet|^maxPieceLen at the absolute worst,
  * 32k–250k entries in every production tokenizer — so it BROADCASTS
  * (the sanctioned bounded collect, guarded at 5M entries), and the
  * per-word Viterbi/greedy DP runs LOCALLY inside one map over
  * DISTINCT words: O(len · maxPieceLen) hash probes per word, zero
  * joins, zero rounds. That is exactly how production tokenizers
  * deploy (every worker holds the vocab). The previous shape — cap
  * relational rounds, each a vocabulary join + a per-cell window +
  * a checkpoint barrier — paid 12 global barriers for work that
  * never crosses a word boundary (the q321 per-doc-BWT lesson).
  * Tie-breaks replicate the SQL engine exactly: argmax by
  * (score desc, path UTF-8-binary asc), code-point character
  * semantics for length/substring. Words longer than `cap` produce
  * no row (the honest boundary; raise cap for long-word corpora).
  */
object UnigramSegment {

  /** Piece vocabulary from the corpus token stream: every substring
    * of length 1..maxPieceLen of every token OCCURRENCE, counted
    * (overlaps and all), thresholded for length > 1 — single chars
    * always stay so every word remains segmentable. Output:
    * (piece, cnt, score = cnt·len²). */
  def pieceVocab(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
                 minCount: Long = 2L): DataFrame = {
    // Round-16 (guide §2.3, aggregate before you shuffle): words
    // repeat Zipf-style, so count OCCURRENCES per distinct word first
    // (one narrow aggregation with map-side partials), then explode
    // the ~len·maxPieceLen substrings of each DISTINCT word once and
    // weight by its occurrence count. Counts are bit-identical —
    // Σ_occurrences substrings(w) == Σ_distinct w cnt(w)·substrings(w)
    // — but the rows entering the piece aggregation drop from
    // |occurrences|·len·4 to |distinct words|·len·4.
    val wordCnt = docs.select(
        explode(filter(split(lower(col(textCol)), " "), t => t =!= ""))
          .as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("wc"))
    wordCnt
      .select(col("wc"), explode(expr(
        s"""flatten(transform(sequence(1, length(tok)), s ->
           |  filter(transform(sequence(1, $maxPieceLen), l ->
           |    CASE WHEN s + l - 1 <= length(tok)
           |         THEN substring(tok, s, l) END),
           |    x -> x IS NOT NULL)))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum(col("wc")).as("cnt"))
      .filter(length(col("piece")) === 1 || col("cnt") >= minCount)
      .withColumn("score",
        col("cnt") * length(col("piece")) * length(col("piece")))
  }

  /** Viterbi-segment every distinct token of the corpus against
    * `vocab` (from [[pieceVocab]]: (piece, score)). Output per word:
    * (word, best_score, n_pieces, segments) where segments is the
    * '|'-joined optimal piece sequence. */
  /** Spark string/char semantics replicated for the local DP:
    * code-point characters (substring/length count code points) and
    * unsigned UTF-8 byte order for tie-breaks (UTF8String order). */
  private def codePointChars(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      val cc = Character.charCount(s.codePointAt(i))
      out += s.substring(i, i + cc)
      i += cc
    }
    out.toArray
  }

  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val m = math.min(x.length, y.length)
    var i = 0
    while (i < m) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** Collect + broadcast the piece vocabulary (bounded by
    * construction: |alphabet|^maxPieceLen worst case, 32k-250k in any
    * production tokenizer; guarded so a degenerate corpus fails loud
    * instead of OOMing the driver). */
  private def broadcastScores(vocab: DataFrame)
      : org.apache.spark.broadcast.Broadcast[Map[String, Long]] = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val rows = vocab.select(col("piece"), col("score").cast("long"))
      .as[(String, Long)].collect()
    require(rows.length <= 5000000,
      s"piece vocabulary has ${rows.length} entries — a tokenizer " +
        "vocab is bounded (<= 5M); shrink maxPieceLen/minCount")
    // duplicate pieces in a caller-supplied vocab keep the MAX score
    // (round-13 advisory: rows.toMap silently kept the last row in
    // collect order — nondeterministic; the pre-broadcast join DP
    // considered every duplicate and the higher score dominates any
    // path through a lower-scored copy of the same piece, so max is
    // exactly the old argmax)
    val dedup = rows.groupBy(_._1).map { case (p, vs) =>
      p -> vs.iterator.map(_._2).max
    }
    spark.sparkContext.broadcast(dedup)
  }

  def viterbiSegment(docs: DataFrame, textCol: String, vocab: DataFrame,
                     maxPieceLen: Int = 4, cap: Int = 12): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select(
        explode(filter(split(lower(col(textCol)), " "), t => t =!= ""))
          .as("word"))
      .distinct()
      .filter(length(col("word")) <= cap)
    val bc = broadcastScores(vocab)
    val mpl = maxPieceLen
    words.as[String].flatMap { w =>
      val voc = bc.value
      val cps = codePointChars(w)
      val n = cps.length
      // best(-1) = unreachable; ties keep the UTF-8-smallest path
      val best = Array.fill[Long](n + 1)(-1L)
      val path = new Array[String](n + 1)
      best(0) = 0L; path(0) = ""
      var p = 0
      while (p < n) {
        if (best(p) >= 0) {
          var l = 1
          while (l <= mpl && p + l <= n) {
            val piece = cps.slice(p, p + l).mkString
            val sc = voc.get(piece)
            if (sc.isDefined) {
              val nb = best(p) + sc.get
              val np = path(p) + "|" + piece
              val q = p + l
              if (nb > best(q) ||
                  (nb == best(q) && utf8Less(np, path(q)))) {
                best(q) = nb; path(q) = np
              }
            }
            l += 1
          }
        }
        p += 1
      }
      if (best(n) < 0) None
      else Some((w, best(n),
        path(n).split("\\|", -1).length - 1, path(n).drop(1)))
    }.toDF("word", "best_score", "n_pieces", "segments")
  }

  /** GREEDY longest-match-first segmentation (MaxMatch — the
    * WordPiece/BERT INFERENCE rule, Devlin et al. 2019 §4.1 /
    * Song et al. 2021's LinMaxMatch baseline) against the same piece
    * vocabulary [[viterbiSegment]] optimizes over: at each position
    * take the LONGEST vocabulary piece and advance — no lookahead, no
    * scores. The deliberate contrast with q269: greedy is what
    * production tokenizers ship for O(n) inference, Viterbi is the
    * training-time global optimum, and the two disagree exactly where
    * the unigram objective says greedy is suboptimal (pinned by
    * spec). Single-char pieces are always in [[pieceVocab]], so every
    * word segments — no UNK path needed here.
    *
    * Scale shape: the same broadcast-vocab local scan as
    * [[viterbiSegment]] — O(len · maxPieceLen) hash probes per
    * distinct word inside one map, zero joins. A word with no
    * matching piece at some position produces no row (only possible
    * with a caller-supplied vocab missing single chars). */
  def greedySegment(docs: DataFrame, textCol: String, vocab: DataFrame,
                    maxPieceLen: Int = 4, cap: Int = 12): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select(
        explode(filter(split(lower(col(textCol)), " "), t => t =!= ""))
          .as("word"))
      .distinct()
      .filter(length(col("word")) <= cap)
    val pieces = {
      val rows = vocab.select(col("piece")).as[String].collect()
      require(rows.length <= 5000000,
        s"piece vocabulary has ${rows.length} entries — bounded by " +
          "contract (<= 5M)")
      spark.sparkContext.broadcast(rows.toSet)
    }
    val mpl = maxPieceLen
    words.as[String].flatMap { w =>
      val voc = pieces.value
      val cps = codePointChars(w)
      val n = cps.length
      val sb = new StringBuilder
      var pos = 0
      var stuck = false
      while (pos < n && !stuck) {
        var l = math.min(mpl, n - pos)
        var found = 0
        while (l >= 1 && found == 0) {
          if (voc.contains(cps.slice(pos, pos + l).mkString)) found = l
          l -= 1
        }
        if (found == 0) stuck = true
        else {
          sb.append('|').append(cps.slice(pos, pos + found).mkString)
          pos += found
        }
      }
      if (stuck) None
      else {
        val p = sb.toString
        Some((w, p.split("\\|", -1).length - 1, p.drop(1)))
      }
    }.toDF("word", "n_pieces", "segments")
  }

  /** Kudo-2018-style EM vocabulary refinement WITH PRUNING — the
    * other half of the unigram-LM tokenizer ([[pieceVocab]] seeds,
    * this loop re-estimates and shrinks). Per EM round:
    *
    *  - E-step (HARD/Viterbi, the log-free q239 stance: Kudo's
    *    forward–backward expectations become argmax-path usage
    *    counts, keeping every quantity integer-exact and
    *    oracle-replayable): segment every distinct word with the
    *    current scores and weight each used piece by the word's
    *    corpus occurrence count;
    *  - M-step: re-score pieces as usage·len(piece)² (the q269
    *    objective family, counts now model-consistent instead of raw
    *    substring frequencies) and PRUNE the bottom prunePermille‰
    *    of multi-char pieces by (usage asc, piece asc) — Kudo's
    *    drop-bottom-p% step. Unused multi-char pieces drop
    *    implicitly; single-char pieces are NEVER pruned, so every
    *    word stays segmentable.
    *
    * `emRounds` deterministic rounds (unrolled — the PageRank/q239
    * convention, no convergence test). Scale shape: each E-step is
    * the [[viterbiSegment]] bounded-round DP over DISTINCT words,
    * and the usage table it feeds is one groupBy over path pieces.
    * The M-step (prune rank + rescore) then runs ON THE DRIVER over
    * the collected usage table: usage's pieces are a subset of the
    * current vocabulary, so the collect is bounded by exactly the
    * ≤ 5M guard [[broadcastScores]] imposes one step later anyway —
    * no new driver residency, and the per-round count job, global
    * rank, union, and lineage checkpoint all collapse into local
    * code (round-13 session 2: q293 the last vocab-sized distributed
    * tail; the sort uses unsigned UTF-8 byte order and code-point
    * lengths, matching the relational globalRowIds/length semantics
    * it replaces).
    *
    * Output: the refined vocabulary (piece, score). */
  def emVocab(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
              minCount: Long = 2L, cap: Int = 12, emRounds: Int = 1,
              prunePermille: Int = 200): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select(
        explode(filter(split(lower(col(textCol)), " "), t => t =!= ""))
          .as("word"))
      .filter(length(col("word")) <= cap)
      .groupBy("word").agg(count(lit(1)).as("w_cnt"))
      .localCheckpoint()
    var vocab = pieceVocab(docs, textCol, maxPieceLen, minCount)
      .select("piece", "score").localCheckpoint()
    // the seed alphabet (single code-point pieces) — never pruned;
    // SQL length = code points, so collect through it
    val singles: Array[String] = vocab
      .filter(length(col("piece")) === 1)
      .select("piece").as[String].collect()
    for (_ <- 0 until emRounds) {
      val seg = viterbiSegment(words.select(col("word").as("text")),
        "text", vocab, maxPieceLen, cap)
      val usage: Array[(String, Long)] = seg.join(words, "word")
        .select(explode(split(col("segments"), "\\|")).as("piece"),
          col("w_cnt"))
        .groupBy("piece").agg(sum(col("w_cnt")).as("usage"))
        .as[(String, Long)].collect()
      require(usage.length <= 5000000,
        s"piece usage has ${usage.length} entries — a tokenizer " +
          "vocab is bounded (<= 5M); shrink maxPieceLen/minCount")
      val usageMap = usage.toMap // pieces are groupBy keys: unique
      def cpLen(p: String): Long = p.codePointCount(0, p.length).toLong
      val multi = usage.filter(p => cpLen(p._1) > 1)
      val nPrune = (multi.length.toLong * prunePermille / 1000).toInt
      // (usage asc, piece asc in unsigned UTF-8 order) — the exact
      // total order globalRowIds ranked by; drop the bottom nPrune
      val keptMulti = multi.sortWith { (a, b) =>
        if (a._2 != b._2) a._2 < b._2
        else SuffixArray.utf8Compare(
          a._1.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          b._1.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
      }.drop(nPrune)
      val next = keptMulti ++
        singles.map(p => (p, usageMap.getOrElse(p, 0L)))
      vocab = spark.createDataFrame(next.toSeq.map { case (p, u) =>
          (p, u * cpLen(p) * cpLen(p))
        }).toDF("piece", "score")
    }
    vocab
  }

  /** [[viterbiSegment]] against the [[emVocab]]-refined vocabulary —
    * the end-to-end unigram-LM tokenizer (seed → EM-with-pruning →
    * segment). */
  def emSegment(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
                minCount: Long = 2L, cap: Int = 12, emRounds: Int = 1,
                prunePermille: Int = 200): DataFrame =
    viterbiSegment(docs, textCol,
      emVocab(docs, textCol, maxPieceLen, minCount, cap, emRounds,
        prunePermille),
      maxPieceLen, cap)
}
