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
  * Scale shape: the DP runs as BOUNDED ROUNDS over a relational
  * state frame (word, pos, best, path) — round p extends the entries
  * at pos = p by the ≤ maxPieceLen pieces starting there (one join
  * against the vocabulary) and re-argmaxes per (word, pos) with a
  * window over that BOUNDED partition; `cap` rounds total (the
  * PageRank / suffix-array convention — a deterministic unrollable
  * prefix, no convergence loop). State is O(|distinct words| · cap)
  * rows; nothing token-stream-sized ever enters the DP. Words longer
  * than `cap` simply produce no row (the honest boundary; raise cap
  * for long-word corpora).
  */
object UnigramSegment {

  /** Piece vocabulary from the corpus token stream: every substring
    * of length 1..maxPieceLen of every token OCCURRENCE, counted
    * (overlaps and all), thresholded for length > 1 — single chars
    * always stay so every word remains segmentable. Output:
    * (piece, cnt, score = cnt·len²). */
  def pieceVocab(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
                 minCount: Long = 2L): DataFrame = {
    val toks = docs.select(
      explode(filter(split(lower(col(textCol)), " "), t => t =!= ""))
        .as("tok"))
    toks
      .select(explode(expr(
        s"""flatten(transform(sequence(1, length(tok)), s ->
           |  filter(transform(sequence(1, $maxPieceLen), l ->
           |    CASE WHEN s + l - 1 <= length(tok)
           |         THEN substring(tok, s, l) END),
           |    x -> x IS NOT NULL)))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(count(lit(1)).as("cnt"))
      .filter(length(col("piece")) === 1 || col("cnt") >= minCount)
      .withColumn("score",
        col("cnt") * length(col("piece")) * length(col("piece")))
  }

  /** Viterbi-segment every distinct token of the corpus against
    * `vocab` (from [[pieceVocab]]: (piece, score)). Output per word:
    * (word, best_score, n_pieces, segments) where segments is the
    * '|'-joined optimal piece sequence. */
  def viterbiSegment(docs: DataFrame, textCol: String, vocab: DataFrame,
                     maxPieceLen: Int = 4, cap: Int = 12): DataFrame = {
    val words = docs.select(
        explode(filter(split(lower(col(textCol)), " "), t => t =!= ""))
          .as("word"))
      .distinct()
      .filter(length(col("word")) <= cap)
    // materialize once: the vocabulary derivation is a full corpus
    // substring explode — without the lineage cut every DP round's
    // join would replay it (12× the dominant cost, bench-measured)
    val voc = vocab.select(col("piece"), col("score")).localCheckpoint()
    var state = words.select(col("word"), lit(0).as("pos"),
      lit(0L).as("best"), lit("").as("path"))
    val byCell = Window.partitionBy("word", "pos")
      .orderBy(col("best").desc, col("path").asc)
    for (p <- 0 until cap) {
      val cands = (1 to maxPieceLen).map(l =>
        struct(lit(l).as("l"),
          substring(col("word"), p + 1, l).as("piece")))
      val ext = state.filter(col("pos") === p)
        .filter(length(col("word")) > p)
        .select(col("word"), col("best"), col("path"),
          explode(array(cands: _*)).as("c"))
        .filter(length(col("c.piece")) === col("c.l"))
        .select(col("word"), (col("c.l") + p).as("pos"),
          col("best"), col("path"), col("c.piece").as("piece"))
        .join(voc, Seq("piece"))
        .select(col("word"), col("pos"),
          (col("best") + col("score")).as("best"),
          concat(col("path"), lit("|"), col("piece")).as("path"))
      state = state.unionByName(ext)
        .withColumn("rn", row_number().over(byCell))
        .filter(col("rn") === 1).drop("rn")
        .localCheckpoint()
    }
    state.filter(col("pos") === length(col("word")))
      .select(col("word"), col("best").as("best_score"),
        (size(split(col("path"), "\\|")) - 1).as("n_pieces"),
        substring(col("path"), 2, 10000).as("segments"))
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
    * Scale shape: the same bounded-round relational loop as
    * [[viterbiSegment]], but the state is ONE row per word (greedy
    * keeps no frontier): each of the `cap` rounds extends unfinished
    * words by their longest matching piece (one vocabulary join, one
    * row_number over the per-word candidate set — bounded partitions)
    * and carries finished words through. */
  def greedySegment(docs: DataFrame, textCol: String, vocab: DataFrame,
                    maxPieceLen: Int = 4, cap: Int = 12): DataFrame = {
    val words = docs.select(
        explode(filter(split(lower(col(textCol)), " "), t => t =!= ""))
          .as("word"))
      .distinct()
      .filter(length(col("word")) <= cap)
    val voc = vocab.select(col("piece")).localCheckpoint()
    val byWord = Window.partitionBy("word")
      .orderBy(length(col("piece")).desc)
    var state = words.select(col("word"), lit(0).as("pos"),
      lit("").as("path"))
    for (_ <- 0 until cap) {
      val fin = state.filter(col("pos") === length(col("word")))
      val cands = (1 to maxPieceLen).map(l =>
        struct(lit(l).as("l"),
          expr(s"substring(word, pos + 1, $l)").as("piece")))
      val ext = state.filter(col("pos") < length(col("word")))
        .select(col("word"), col("pos"), col("path"),
          explode(array(cands: _*)).as("c"))
        .filter(length(col("c.piece")) === col("c.l"))
        .select(col("word"), col("pos"), col("path"),
          col("c.piece").as("piece"))
        .join(voc, Seq("piece"))
        .withColumn("rn", row_number().over(byWord))
        .filter(col("rn") === 1)
        .select(col("word"),
          (col("pos") + length(col("piece"))).as("pos"),
          concat(col("path"), lit("|"), col("piece")).as("path"))
      state = fin.unionByName(ext).localCheckpoint()
    }
    state.filter(col("pos") === length(col("word")))
      .select(col("word"),
        (size(split(col("path"), "\\|")) - 1).as("n_pieces"),
        substring(col("path"), 2, 10000).as("segments"))
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
    * the [[viterbiSegment]] bounded-round DP over DISTINCT words; the
    * M-step is one groupBy over path pieces plus a
    * [[Curation.globalRowIds]] rank over the (vocabulary-sized,
    * corpus-independent) candidate set — no single-partition window;
    * the only driver scalar per round is the candidate count that
    * fixes the prune cutoff.
    *
    * Output: the refined vocabulary (piece, score). */
  def emVocab(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
              minCount: Long = 2L, cap: Int = 12, emRounds: Int = 1,
              prunePermille: Int = 200): DataFrame = {
    val words = docs.select(
        explode(filter(split(lower(col(textCol)), " "), t => t =!= ""))
          .as("word"))
      .filter(length(col("word")) <= cap)
      .groupBy("word").agg(count(lit(1)).as("w_cnt"))
      .localCheckpoint()
    var vocab = pieceVocab(docs, textCol, maxPieceLen, minCount)
      .select("piece", "score").localCheckpoint()
    val singles = vocab.filter(length(col("piece")) === 1)
      .select("piece").localCheckpoint()
    for (_ <- 0 until emRounds) {
      val seg = viterbiSegment(words.select(col("word").as("text")),
        "text", vocab, maxPieceLen, cap)
      val usage = seg.join(words, "word")
        .select(explode(split(col("segments"), "\\|")).as("piece"),
          col("w_cnt"))
        .groupBy("piece").agg(sum(col("w_cnt")).as("usage"))
        .localCheckpoint()
      val multi = usage.filter(length(col("piece")) > 1)
      val nPrune = multi.count() * prunePermille / 1000
      val kept = Curation.globalRowIds(multi, Seq("usage", "piece"))
        .filter(col("global_id") > nPrune)
        .select("piece", "usage")
      val singleUsage = singles.join(usage, Seq("piece"), "left")
        .select(col("piece"), coalesce(col("usage"), lit(0L)).as("usage"))
      vocab = kept.unionByName(singleUsage)
        .select(col("piece"),
          (col("usage") * length(col("piece")) * length(col("piece")))
            .as("score"))
        .localCheckpoint()
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
