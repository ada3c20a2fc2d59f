package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed suffix array over token sequences by prefix doubling —
  * the real infrastructure behind suffix-based training-data dedup
  * (Lee et al. 2022 build a suffix array to find verbatim repeats;
  * [[Dedup.exactSubstrSpans]] is the q100 span REMOVER, this is the
  * corpus-scale span FINDER). Distributed prefix doubling is the
  * classic formulation (Flick & Aluru, SC'15): rank every suffix by
  * its first token, then repeatedly re-rank by the pair
  * (rank_k(p), rank_k(p+k)) so the sorted prefix length doubles per
  * round — O(log maxDocLen) rounds of pure relational algebra, no
  * single machine ever holds the corpus.
  *
  * Granularity is TOKENS, not characters: the dedup family (q19/q100/
  * q147/q213) is token-shingle based, token suffixes are ~5× fewer
  * positions than characters, and "longest repeated token span" is
  * the signal a text pipeline acts on.
  *
  * Suffixes are PER-DOCUMENT (suffix = tokens from offset to the
  * document's end, 1-based offsets, no cross-doc concatenation) —
  * identical to the concatenated-with-sentinels formulation for
  * finding repeats, without the artificial cross-doc spans. Equal
  * suffixes in different documents KEEP EQUAL RANKS (dense ranks,
  * ties preserved): a tie group of size ≥ 2 is precisely a verbatim
  * whole-suffix repeat.
  *
  * Scale shape, per round: one equi-join on (doc_id, off) to fetch
  * the k-shifted partner rank, one distinct over rank pairs, one
  * [[Curation.globalRowIds]] ordinal over the distinct pairs (the
  * range-partition + zipWithIndex dense rank — NO single-partition
  * `dense_rank() OVER (ORDER BY ...)`), one join back. Lineage is
  * truncated every round with localCheckpoint (the PageRank
  * convention); the one driver scalar per round is the early-exit
  * count (all ranks unique ⇒ done before maxLen).
  */
object SuffixArray {

  /** Tokenize + drop empties, lineage-truncated — the ONE corpus scan
    * both [[tokenSuffixRanks]] and [[repeatedSpans]] iterate from.
    * Output: (doc_id long, ws array<string>), every ws non-empty. */
  private[graft] def tokenized(docs: DataFrame, idCol: String,
                               textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        filter(Dedup.words(col(textCol)), w => w =!= "").as("ws"))
      .filter(size(col("ws")) > 0)
      .localCheckpoint()

  /** Dense lexicographic rank of every token suffix.
    *
    * Output: (doc_id, off, sa_rank) — off is the 1-based token
    * offset; sa_rank is the dense rank of the suffix among ALL
    * suffixes of ALL documents (ties = identical suffixes). Empty
    * documents contribute no rows. */
  def tokenSuffixRanks(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame =
    tokenSuffixRanks(tokenized(docs, idCol, textCol))

  /** Pre-tokenized entry point (round-9 advice: [[repeatedSpans]] was
    * re-running the tokenize + checkpoint pass [[tokenSuffixRanks]]
    * had already paid — at sf0.1 a full redundant corpus scan inside
    * the most expensive bench query). `toks` must be
    * (doc_id long, ws array<string>) with every ws non-empty, and is
    * iterated over O(log maxLen) rounds — pass a checkpointed/cached
    * frame ([[tokenized]] does this). */
  def tokenSuffixRanks(toks: DataFrame): DataFrame = {
    // one fused job for both driver scalars (they were two separate
    // aggregation jobs over the same checkpointed frame)
    val dims = toks
      .agg(sum(size(col("ws"))).as("n"), max(size(col("ws"))).as("m"))
      .head
    // zero-row aggregates come back NULL: an all-empty corpus must
    // fall through to the (empty) initial ranking, not NPE here
    val n = if (dims.isNullAt(0)) 0L else dims.getLong(0)
    val maxLen = if (dims.isNullAt(1)) 0 else dims.getInt(1)

    // Round shape (round-9 rework — from ~6 exchanges per round to 2):
    // the partner rank is a per-document lead(rank, k) window (offsets
    // are contiguous 1..L per doc, so lead ≡ the (doc_id, off+k)
    // self-join it replaces, at one exchange instead of two), and the
    // dense re-rank runs DIRECTLY on the position rows via
    // globalDenseRanksWithCount — no pairs-distinct, no globalRowIds
    // over the distinct pairs, no corpus-sized join-back, and the
    // early-exit distinct count comes back as a free by-product
    // instead of a per-round count job.
    val pos = toks.select(col("doc_id"),
      posexplode(col("ws")).as(Seq("off0", "tok")))
      .select(col("doc_id"), (col("off0") + 1).cast("long").as("off"),
        col("tok"))
    val (r0, _) = Curation.globalDenseRanksWithCount(pos, Seq("tok"))
    var cur = r0.select(col("doc_id"), col("off"),
      col("global_rank").as("rank"))

    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("off"))
    // Adaptive-radix prefix extension (Manber–Myers generalized beyond
    // doubling): with coverage k, the tuple (rank, rank@+k, …,
    // rank@+(r−1)k) orders prefixes of length r·k — all r−1 leads
    // share ONE window spec (a single WindowExec/exchange) and the
    // dense re-rank just sorts a wider key, so a round costs the same
    // 2 exchanges at ANY radix. Rounds are the scale bottleneck (each
    // is a global barrier: straggler-bound, plan+job overhead), so the
    // radix is chosen to hit the MINIMUM round count reachable at key
    // width ≤ 16 longs (128 B/row bounds the re-rank exchange volume):
    // R = ⌈log₁₆ maxLen⌉ rounds via r = ⌈maxLen^(1/R)⌉ — the smallest
    // radix that still finishes in R rounds, keeping keys as narrow as
    // the round budget allows. ~100-token docs: r = 10, 2 rounds
    // (radix-4 took 4). A bytes-bound cluster would pin r = 4 (r/ln r
    // minimizes total shuffled key bytes near e); rounds dominate well
    // past sf0.1, so latency wins the default. The missing-partner
    // sentinel 0 sorts before every real rank, which is exactly the
    // shorter-suffix-is-a-prefix case, at any radix.
    val rounds = math.max(1,
      math.ceil(math.log(maxLen.toDouble) / math.log(16.0) - 1e-9).toInt)
    val radix = math.max(4,
      math.ceil(math.pow(maxLen.toDouble, 1.0 / rounds) - 1e-9).toInt)
    var k = 1L
    var done = false
    while (k < maxLen && !done) {
      val leadCols = (1 until radix).map { j =>
        coalesce(
          lead(col("rank"),
            math.min(j.toLong * k, Int.MaxValue.toLong).toInt).over(wDoc),
          lit(0L)).as(s"rk${j + 1}")
      }
      val paired = cur.select(
        col("doc_id") +: col("off") +: col("rank") +: leadCols: _*)
      val (ranked, distinct) = Curation.globalDenseRanksWithCount(
        paired, "rank" +: (2 to radix).map(j => s"rk$j"))
      cur = ranked.select(col("doc_id"), col("off"),
        col("global_rank").as("rank"))
      k *= radix
      done = distinct == n // all tuples distinct ⇒ every rank unique
    }
    cur.select(col("doc_id"), col("off"), col("rank").as("sa_rank"))
  }

  /** Per-document Burrows–Wheeler transform (Burrows & Wheeler 1994)
    * at token granularity (BWT[j] = the token preceding the j-th
    * suffix in suffix order; a sentinel token (U+0001) — binary-
    * smallest in both UTF-8 orders — closes the rotation, so off = 1
    * wraps to it). Output: (doc_id, j, btok), j the 1-based per-doc
    * suffix-order position over the sentinel-extended sequence.
    *
    * Scale shape (round-12 rework): the BWT is PER-DOCUMENT — unlike
    * the global-rank SA that [[repeatedSpans]] needs (cross-doc rank
    * ties ARE its repeat signal), suffix order here never crosses a
    * document boundary. So it computes as ONE map over bounded docs
    * (a local suffix sort per row, O(L log L) comparisons), zero
    * shuffles, zero rounds — embarrassingly corpus-parallel, which is
    * exactly the 100 TB shape. The previous derivation through the
    * distributed prefix-doubling SA paid R global-barrier rounds ×
    * 2 exchanges each to agree on cross-doc ranks the per-doc
    * row_number then threw away (~9 s of q321's 14 at sf0.1).
    * Pathologically long docs are the documented hazard (worst-case
    * O(L² log L) token compares on adversarial repetition) — the cap
    * convention applies upstream, and the global SA path remains for
    * genuinely cross-document work. */
  def bwt(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    bwt(sentinelToks(docs, idCol, textCol))

  /** Sentinel-extended tokenization shared by [[bwt]] and [[bwtRuns]]
    * — ONE corpus scan (the q224 lesson). */
  private def sentinelToks(docs: DataFrame, idCol: String,
                           textCol: String): DataFrame =
    tokenized(docs, idCol, textCol)
      .select(col("doc_id"),
        concat(col("ws"), array(lit("\u0001"))).as("ws"))
      .localCheckpoint()

  /** Token order must match the engine's SQL string order (UTF8String
    * = unsigned byte-wise over UTF-8), NOT Java's UTF-16
    * String.compareTo - they disagree between supplementary characters
    * and code points >= U+E000. */
  private[graft] def utf8Compare(a: Array[Byte], b: Array[Byte]): Int = {
    val m = math.min(a.length, b.length)
    var i = 0
    while (i < m) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** Docs longer than this switch from the naive comparison suffix
    * sort to [[localSuffixOrder]] — see the guard note in [[bwt]]. */
  private[graft] val NaiveSuffixSortCutoff = 4096

  private def bwt(toks: DataFrame): DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    toks.select(col("doc_id"), col("ws")).as[(Long, Seq[String])]
      .flatMap { case (docId, ws) =>
        val arr = ws.toArray
        val n = arr.length
        val bytes =
          arr.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val order = guardedSuffixOrder(bytes)
        order.iterator.zipWithIndex.map { case (off0, j0) =>
          // off = 1 wraps the rotation to the sentinel = last token
          (docId, (j0 + 1).toLong,
            if (off0 == 0) arr(n - 1) else arr(off0 - 1))
        }
      }
      .toDF("doc_id", "j", "btok")
  }

  /** One document's suffix order, adversarial-doc-guarded (the
    * [[bwt]] kernel, shared with [[FmIndex.countPatternsLocal]]).
    *
    * Round-13 guard (promoted from the upstream cap CONVENTION to
    * kernel enforcement): the naive comparison sort is fastest on
    * ordinary docs but worst-case O(L²·logL) token compares on
    * adversarial repetition ("a a a …" × 100k would straggle one
    * task for hours at 100 TB). Above the cutoff the kernel
    * switches to a local Manber–Myers prefix doubling —
    * O(L·log²L) GUARANTEED, bit-identical order — so no document
    * can blow up a partition. Truncation was rejected: it would
    * silently alter the BWT of long docs; bounding the kernel's
    * complexity keeps exact semantics at any length
    * (Round13Spec pins naive ≡ doubling across the cutoff and
    * runs the adversarial all-equal-token fixture). */
  private[graft] def guardedSuffixOrder(
      bytes: Array[Array[Byte]]): IndexedSeq[Int] = {
    val n = bytes.length
    if (n <= NaiveSuffixSortCutoff) {
      // suffix i < suffix k, token-wise; the sentinel terminator
      // makes every within-doc suffix pair differ before either
      // runs out, but guard the overrun anyway (totality)
      def less(i: Int, k: Int): Boolean = {
        var p = i; var q = k
        while (p < n && q < n) {
          val d = utf8Compare(bytes(p), bytes(q))
          if (d != 0) return d < 0
          p += 1; q += 1
        }
        p == n && q < n
      }
      (0 until n).sortWith(less)
    } else localSuffixOrder(bytes)
  }

  /** Local Manber–Myers suffix ordering over one token array —
    * O(L·log²L) worst case regardless of content (the adversarial-doc
    * guard for [[bwt]]). Rank by single token, then double the
    * compared prefix per round via (rank, partner-rank) keys; a
    * missing partner (shorter suffix) keys 0, which sorts before any
    * real rank + 1 — exactly the shorter-suffix-is-a-prefix rule the
    * naive comparator applies. Returns suffix start offsets in
    * lexicographic suffix order. */
  private[graft] def localSuffixOrder(
      bytes: Array[Array[Byte]]): IndexedSeq[Int] = {
    val n = bytes.length
    if (n == 0) return IndexedSeq.empty
    var order = (0 until n).sortWith((i, k) =>
      utf8Compare(bytes(i), bytes(k)) < 0).toArray
    val rank = new Array[Long](n)
    var r = 0L
    var j = 1
    rank(order(0)) = 0L
    while (j < n) {
      if (utf8Compare(bytes(order(j)), bytes(order(j - 1))) != 0) r += 1
      rank(order(j)) = r
      j += 1
    }
    var k = 1
    while (k < n && r + 1 < n) {
      val key = new Array[Long](n)
      var i = 0
      while (i < n) {
        val partner = if (i + k < n) rank(i + k) + 1L else 0L
        key(i) = rank(i) * (n + 1L) + partner // ranks < n ⇒ no overflow
        i += 1
      }
      order = order.sortBy(key(_))
      r = 0L
      rank(order(0)) = 0L
      j = 1
      while (j < n) {
        if (key(order(j)) != key(order(j - 1))) r += 1
        rank(order(j)) = r
        j += 1
      }
      k *= 2
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(order)
  }

  /** Run-length profile of the [[bwt]] against the raw token order —
    * the classic bzip2-family compressibility probe: BWT groups equal
    * contexts, so repetitive text collapses into long runs (fewer
    * runs = more compressible). Output per doc: (doc_id, n_pos,
    * bwt_runs, raw_runs), runs counted over the sentinel-extended
    * sequence in suffix order vs text order. One per-doc lag each —
    * bounded windows, no extra corpus shuffle. */
  def bwtRuns(docs: DataFrame, idCol: String,
              textCol: String): DataFrame = {
    val toks = sentinelToks(docs, idCol, textCol)
    val wj = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("j")
    val bwtRunFlags = bwt(toks)
      .withColumn("prev", lag(col("btok"), 1).over(wj))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pos"),
        sum(when(col("prev").isNull || col("prev") =!= col("btok"),
          1L).otherwise(0L)).as("bwt_runs"))
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("off")
    val rawRuns = toks
      .select(col("doc_id"),
        posexplode(col("ws")).as(Seq("off", "tok")))
      .withColumn("prev", lag(col("tok"), 1).over(wOff))
      .groupBy("doc_id")
      .agg(sum(when(col("prev").isNull || col("prev") =!= col("tok"),
        1L).otherwise(0L)).as("raw_runs"))
    bwtRunFlags.join(rawRuns, Seq("doc_id"))
  }

  /** Longest repeated token spans from the suffix ranks — the output
    * an ExactSubstr-style dedup pass consumes. Two candidate kinds:
    *
    *  - `dup`: a rank tie group of size ≥ 2 is a verbatim WHOLE-
    *    SUFFIX repeat; span length = the suffix length, occurrence
    *    count = group size.
    *  - `adj`: adjacent ranks r, r+1 in suffix order share their
    *    longest common prefix — the classic LCP-array entry,
    *    computed between each group's representative (min
    *    (doc_id, off)) with a stopped fold over the token arrays.
    *
    * Scale contract: the adj compare window is CAPPED at `maxSpan`
    * tokens — only `slice(ws, off, maxSpan)` is ever materialized per
    * rank, so total state is O(#ranks · maxSpan), never the O(Σ L²)
    * of full suffix copies (a 1k-token doc would otherwise
    * materialize ~1M tokens of slices). Adjacent LCPs ≥ maxSpan
    * report exactly maxSpan; `dup` spans are exact at any length
    * (pure arithmetic, no materialization). Downstream dedup
    * thresholds ("remove spans ≥ 50 tokens") only need the capped
    * comparison, which is why the cap is semantics-free in practice.
    *
    * Top-`topK` rows by (span desc, sa_rank asc, kind asc), span ≥
    * `minSpan`. Representatives bound the adjacent-join fan-out to
    * one row per rank (tie groups never cross-product).
    *
    * Output: (sa_rank, kind, span, n_occurrences, doc_id, off). */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                    minSpan: Int, topK: Int,
                    maxSpan: Int = 64): DataFrame =
    repeatedSpans(tokenized(docs, idCol, textCol), minSpan, topK, maxSpan)

  /** Pre-tokenized entry point (the [[tokenSuffixRanks]] convention):
    * `toks` = (doc_id, ws) from [[tokenized]], shared with any other
    * consumer of the same corpus scan.
    *
    * Round-13 rework: mining the top-K spans does not need full
    * suffix ranks. [[repeatedSpansPruned]] ranks only the positions
    * whose ℓ-token window repeats (the a-priori observation: every
    * output row with span ≥ ℓ lives entirely inside that set) and
    * reconstructs the EXACT global dense ranks of the K output rows
    * with one counting pass — bit-identical output at a fraction of
    * the global-barrier rounds. When the corpus cannot certify ≥ topK
    * rows at span ≥ ℓ (sparse repeats, tiny fixtures), it falls back
    * to [[repeatedSpansExact]], the full prefix-doubling path. */
  def repeatedSpans(toks: DataFrame, minSpan: Int, topK: Int,
                    maxSpan: Int): DataFrame = {
    require(minSpan >= 1 && maxSpan >= minSpan && topK >= 1)
    val ell = math.min(math.max(8, minSpan), maxSpan)
    repeatedSpansPruned(toks, minSpan, topK, maxSpan, ell)
      .getOrElse(repeatedSpansExact(toks, minSpan, topK, maxSpan))
  }

  /** The exact full-suffix-array mining path (pre-round-13 body):
    * rank EVERY suffix by distributed prefix doubling, then derive
    * dup tie groups and adjacent-rank LCPs. Kept as the fallback for
    * corpora whose top-K is not certified by the pruned path, and as
    * the spec ground truth the pruned path is pinned against. */
  private[graft] def repeatedSpansExact(toks: DataFrame, minSpan: Int,
                                        topK: Int,
                                        maxSpan: Int): DataFrame = {
    val ranks = tokenSuffixRanks(toks)

    // representative (min doc, then min off) + group size per rank
    val grp = ranks.groupBy("sa_rank")
      .agg(count(lit(1)).as("n_occurrences"),
        min(struct(col("doc_id"), col("off"))).as("rep"))
      .select(col("sa_rank"), col("n_occurrences"),
        col("rep.doc_id").as("doc_id"), col("rep.off").as("off"))
    val withSuf = grp.join(toks, "doc_id")
      .select(col("sa_rank"), col("n_occurrences"), col("doc_id"),
        col("off"),
        (size(col("ws")).cast("long") - col("off") + 1L).as("suf_len"),
        slice(col("ws"), col("off").cast("int"), lit(maxSpan)).as("suf"))
      .localCheckpoint()

    val dup = withSuf.filter(col("n_occurrences") >= 2)
      .select(col("sa_rank"), lit("dup").as("kind"),
        col("suf_len").as("span"),
        col("n_occurrences"), col("doc_id"), col("off"))

    // adjacent-rank LCP via a stopped fold: acc advances only while
    // every previous token matched, so the fold is exact-prefix
    val nxt = withSuf.select((col("sa_rank") - 1).as("sa_rank"),
      col("suf").as("suf_b"))
    val lcp = aggregate(
      sequence(lit(1), least(size(col("suf")), size(col("suf_b")))),
      lit(0),
      (acc, j) => when(acc === j - 1 &&
        element_at(col("suf"), j) === element_at(col("suf_b"), j), j)
        .otherwise(acc))
    val adj = withSuf.join(nxt, "sa_rank")
      .select(col("sa_rank"), lit("adj").as("kind"),
        lcp.cast("long").as("span"),
        lit(2L).as("n_occurrences"), col("doc_id"), col("off"))

    dup.unionByName(adj)
      .filter(col("span") >= minSpan)
      .orderBy(col("span").desc, col("sa_rank").asc, col("kind").asc)
      .limit(topK)
  }

  /** Candidate-pruned span mining (round 13). Let S be the set of
    * suffixes of length ≥ ℓ whose leading ℓ-token window occurs ≥ 2
    * times in the corpus. Three facts make mining on S alone exact:
    *
    *  1. COMPLETENESS — every output row with span ≥ ℓ involves only
    *     S-suffixes: a dup tie group of span ≥ ℓ is ≥ 2 positions
    *     sharing their (length ≥ ℓ) prefix, and both sides of an adj
    *     pair with LCP ≥ ℓ share an ℓ-window. Any suffix c strictly
    *     between two suffixes a < b with LCP(a,b) ≥ ℓ satisfies
    *     LCP(a,c) ≥ LCP(a,b) ≥ ℓ (the LCP-interval minimum property),
    *     so c ∈ S too — hence adjacency WITHIN S at LCP ≥ ℓ is
    *     exactly global adjacency, and tie groups of length ≥ ℓ sit
    *     entirely inside S (equal suffixes share the window).
    *  2. UNIQUENESS OUTSIDE S — a non-S suffix of length ≥ ℓ has a
    *     corpus-unique ℓ-window, so the whole suffix is corpus-unique
    *     (an equal pair would repeat the window), and it differs from
    *     every S-suffix within the first ℓ tokens (its window is
    *     unique, an S-window is not — they cannot be equal).
    *  3. RANK RECONSTRUCTION — global dense rank = rank within S +
    *     #(distinct non-S suffixes below). By (2) the non-S part
    *     counts (a) length ≥ ℓ non-S positions, each its own distinct
    *     suffix, ordered against a candidate by comparing ℓ-windows,
    *     plus (b) distinct short suffixes (< ℓ tokens), ordered by
    *     prefix rule. Both compare within ℓ tokens, so ONE pass over
    *     the windowed corpus with the ≤ topK candidate prefixes
    *     broadcast recovers the exact dense ranks.
    *
    * Ordering is preserved: within-S rank and global rank are order-
    * isomorphic on S, so the top-K by (span desc, rank asc, kind asc)
    * can be taken BEFORE correcting ranks — only K rows ever need the
    * correction. Rows the pruning drops all have span < ℓ, so when
    * ≥ topK candidates survive at span ≥ ℓ the result is bit-
    * identical to [[repeatedSpansExact]]; otherwise returns None and
    * the caller falls back.
    *
    * Scale shape: one corpus scan + ONE hash exchange (window
    * counts), suffix ranking only over S (the repeat-involved
    * fraction), one map-side counting pass for the correction, and a
    * K-bounded driver collect — vs 3 full-corpus dense-rank sorts on
    * the exact path. S materializes full (doc-length-bounded)
    * suffixes, so the exact path remains the route for corpora where
    * the duplicated fraction × doc length outweighs rank rounds. */
  private[graft] def repeatedSpansPruned(toks: DataFrame, minSpan: Int,
                                         topK: Int, maxSpan: Int,
                                         ell: Int): Option[DataFrame] = {
    require(ell >= minSpan && ell <= maxSpan)
    val spark = toks.sparkSession
    import spark.implicits._
    val W = org.apache.spark.sql.expressions.Window

    // every position with its ℓ-token window and the window's corpus
    // count — the one corpus-sized exchange of the pruned path;
    // checkpointed because both the S branch and the rank-correction
    // branch read it
    val counted = toks
      .select(col("doc_id"), col("ws"),
        posexplode(col("ws")).as(Seq("off0", "w0")))
      .select(col("doc_id"), (col("off0") + 1).cast("long").as("off"),
        slice(col("ws"), (col("off0") + 1).cast("int"), lit(ell))
          .as("w"))
      .withColumn("n_w", count(lit(1)).over(W.partitionBy("w")))
      .localCheckpoint()

    // S: repeat-involved positions, with their FULL (doc-bounded)
    // suffix for exact within-S ranking; the pruned set is small by
    // construction, so it broadcasts to the corpus side
    val sPos = counted
      .filter(col("n_w") >= 2 && size(col("w")) === ell)
      .select(col("doc_id"), col("off"))
    val sFull = toks.join(broadcast(sPos), "doc_id")
      .select(col("doc_id"), col("off"),
        (size(col("ws")).cast("long") - col("off") + 1L).as("suf_len"),
        slice(col("ws"), col("off").cast("int"), size(col("ws")))
          .as("suf"))
    val (ranked, _) = Curation.globalDenseRanksWithCount(sFull, Seq("suf"))

    // tie groups: size + min-(doc,off) representative, carrying the
    // maxSpan-capped representative suffix for the adj LCP fold
    val grp = ranked
      .select(col("global_rank").as("srank"),
        struct(col("doc_id"), col("off"), col("suf_len"),
          slice(col("suf"), 1, maxSpan).as("csuf")).as("rec"))
      .groupBy("srank")
      .agg(count(lit(1)).as("n_occurrences"), min(col("rec")).as("rep"))
      .select(col("srank"), col("n_occurrences"),
        col("rep.doc_id").as("doc_id"), col("rep.off").as("off"),
        col("rep.suf_len").as("suf_len"), col("rep.csuf").as("csuf"))
      .localCheckpoint()

    val dup = grp.filter(col("n_occurrences") >= 2)
      .select(col("srank"), lit("dup").as("kind"),
        col("suf_len").as("span"), col("n_occurrences"),
        col("doc_id"), col("off"), col("csuf"))
    val nxt = grp.select((col("srank") - 1).as("srank"),
      col("csuf").as("csuf_b"))
    val lcp = aggregate(
      sequence(lit(1), least(size(col("csuf")), size(col("csuf_b")))),
      lit(0),
      (acc, j) => when(acc === j - 1 &&
        element_at(col("csuf"), j) === element_at(col("csuf_b"), j), j)
        .otherwise(acc))
    val adj = grp.join(nxt, "srank")
      .select(col("srank"), lit("adj").as("kind"),
        lcp.cast("long").as("span"), lit(2L).as("n_occurrences"),
        col("doc_id"), col("off"), col("csuf"))

    // everything the pruning drops has span < ℓ, so ≥ topK survivors
    // at span ≥ ℓ certify the global top-K is exactly these rows
    val collected = dup.unionByName(adj)
      .filter(col("span") >= ell)
      .orderBy(col("span").desc, col("srank").asc, col("kind").asc)
      .limit(topK)
      .collect() // K-bounded by construction
    if (collected.length < topK) return None

    // exact global ranks for the K output rows: count distinct non-S
    // suffixes below each candidate's ℓ-prefix in one map-side pass
    val prefixes = collected
      .map(_.getSeq[String](6).take(ell).toArray).distinct
      .sortWith(lessTokens(_, _))
    val prefB = spark.sparkContext.broadcast(
      prefixes.map(_.map(_.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))))
    val corrInput = counted
      .filter(size(col("w")) === ell && col("n_w") === 1).select("w")
      .unionByName(
        counted.filter(size(col("w")) < ell).select("w").distinct())
    val buckets = corrInput.as[Seq[String]].mapPartitions { it =>
      val prefs = prefB.value
      val cnt = new Array[Long](prefs.length + 1)
      it.foreach { ws =>
        val w = ws.iterator.map(_.getBytes(
          java.nio.charset.StandardCharsets.UTF_8)).toArray
        // lower bound: first candidate prefix with w below it
        var lo = 0; var hi = prefs.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (lessBytes(w, prefs(mid))) hi = mid else lo = mid + 1
        }
        cnt(lo) += 1
      }
      Iterator.single(cnt)
    }.reduce { (a, b) =>
      val r = new Array[Long](a.length)
      var i = 0
      while (i < r.length) { r(i) = a(i) + b(i); i += 1 }
      r
    }
    // candidates sorted ascending: #below(prefix_i) = Σ_{j ≤ i} cnt(j)
    val below = new Array[Long](prefixes.length)
    var run = 0L
    for (i <- prefixes.indices) { run += buckets(i); below(i) = run }
    val corrByPrefix: Map[Seq[String], Long] =
      prefixes.zipWithIndex.map { case (p, i) =>
        (p.toSeq: Seq[String]) -> below(i)
      }.toMap

    val outRows = collected.map { r =>
      val corr = corrByPrefix(r.getSeq[String](6).take(ell))
      org.apache.spark.sql.Row(r.getLong(0) + corr, r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("sa_rank",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("kind",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("span",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_occurrences",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("off",
        org.apache.spark.sql.types.LongType)))
    Some(spark.createDataFrame(
      java.util.Arrays.asList(outRows: _*), schema))
  }

  /** Token-sequence compare in the engine's order (element-wise
    * UTF8 binary, shorter-is-prefix-is-less) — MUST agree with
    * Spark's array<string> ordering for the pruned path's binary
    * search to be monotone. */
  private def lessBytes(a: Array[Array[Byte]],
                        b: Array[Array[Byte]]): Boolean = {
    val m = math.min(a.length, b.length)
    var i = 0
    while (i < m) {
      val d = utf8Compare(a(i), b(i))
      if (d != 0) return d < 0
      i += 1
    }
    a.length < b.length
  }

  private def lessTokens(a: Array[String], b: Array[String]): Boolean =
    lessBytes(
      a.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
      b.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  /** The Lee et al. 2022 end-to-end: mine the corpus-wide repeated
    * spans from the suffix array ([[repeatedSpans]]), then CUT every
    * occurrence of every mined span from every document and reassemble
    * — find globally, remove locally, in one pipeline
    * ([[Dedup.removeDuplicateSpans]] is the fixed-window cousin; this
    * one removes exactly the spans the suffix array surfaced, at their
    * exact lengths).
    *
    * Scale shape: ONE tokenized corpus scan feeds mining and removal
    * (the round-9 shared-scan convention). The mined span set is
    * topK-bounded by construction, so its fingerprints and distinct
    * length set BROADCAST to the removal side; flagged starts come
    * back as one per-doc collect_list and a single index-aware filter
    * lambda cuts covered tokens map-side (the
    * [[Dedup.removeDuplicateSpans]] kernel, generalized to per-span
    * lengths). Nothing corpus-sized ever shuffles except the token
    * rows of the one fingerprint pass and the flagged-window starts.
    *
    * Span matching (round-12 rework): the mined set is topK-bounded
    * by construction, so the spans' TOKEN SEQUENCES broadcast and
    * every occurrence is found by exact per-length set lookup inside
    * one map over the corpus — no fingerprint pass, no per-doc
    * flagged-start aggregation, no removal join, no collision caveat.
    * For a span set too large to broadcast, the round-10 Rabin–Karp
    * prefix-sum formulation ([[windowFingerprints]] /
    * [[spanFingerprints]], still spec-pinned) is the scalable path:
    * O(1) per (position, len) from one cumulative pass, two packed
    * (B, M) residues as the join key.
    *
    * Output: (doc_id, n_tokens, n_removed, clean_text) for every
    * document with ≥ 1 token after the [[tokenized]] empty-token
    * filter. */
  def minedSpanRemoval(docs: DataFrame, idCol: String, textCol: String,
                       minSpan: Int, topK: Int,
                       maxSpan: Int = 64): DataFrame = {
    val toks = tokenized(docs, idCol, textCol)
    // topK rows; checkpointed so the span-collect below does not
    // re-derive the mining tail (the heavy prefix is already
    // checkpoint-cut inside repeatedSpans)
    val mined = repeatedSpans(toks, minSpan, topK, maxSpan)
      .localCheckpoint()
    // Round-12: the mined span set is topK-BOUNDED by construction,
    // so the spans themselves (not just their fingerprints) broadcast
    // — matching becomes EXACT token-sequence lookup inside one map
    // over the corpus (no fingerprint pass, no per-doc flagged-start
    // aggregation, no join; and no Rabin-Karp collision caveat). The
    // RK prefix-sum formulation ([[windowFingerprints]] /
    // [[spanFingerprints]], spec-pinned) remains the scalable path
    // for a span set too large to broadcast.
    val spark = toks.sparkSession
    import spark.implicits._
    val spanRows = broadcast(
        mined.select(col("doc_id"), col("off"), col("span")))
      .join(toks, "doc_id")
      .select(slice(col("ws"), col("off").cast("int"),
        col("span").cast("int")).as("sp"))
      .distinct()
      .collect().map(_.getSeq[String](0).toArray)
    // span keys are the token SEQUENCES themselves (round-13 advisory:
    // a NUL-joined string key let tokens containing U+0000 alias
    // across boundaries); Seq equality is structural, so the lookup
    // is collision-free by construction
    val byLen: Map[Int, Set[Seq[String]]] = spanRows.groupBy(_.length)
      .map { case (l, as) => l -> as.map(_.toSeq: Seq[String]).toSet }
    val bc = spark.sparkContext.broadcast(byLen)
    toks.select(col("doc_id"), col("ws")).as[(Long, Seq[String])]
      .map { case (docId, ws) =>
        val arr = ws.toArray
        val n = arr.length
        val covered = new Array[Boolean](n)
        bc.value.foreach { case (len, set) =>
          var p = 0
          while (p + len <= n) {
            if (set.contains(arr.slice(p, p + len).toSeq)) {
              var q = p
              while (q < p + len) { covered(q) = true; q += 1 }
            }
            p += 1
          }
        }
        val kept = new StringBuilder
        var removed = 0
        var i = 0
        while (i < n) {
          if (covered(i)) removed += 1
          else {
            if (kept.nonEmpty) kept.append(' ')
            kept.append(arr(i))
          }
          i += 1
        }
        (docId, n, removed, kept.toString)
      }
      .toDF("doc_id", "n_tokens", "n_removed", "clean_text")
  }

  // Rabin–Karp double-modulus parameters: M < 2^31 keeps every
  // product below 2^62 (Spark 4 ANSI overflow-safe); the two packed
  // residues give ~62-bit fingerprints
  private val M1 = 2147483629L; private val B1 = 1000003L
  private val M2 = 2147483587L; private val B2 = 4000037L

  private def powTable(b: Long, m: Long, maxLen: Int): Array[Long] = {
    val a = new Array[Long](maxLen + 1)
    a(0) = 1L
    var i = 1
    while (i <= maxLen) { a(i) = a(i - 1) * b % m; i += 1 }
    a
  }

  /** Canonical fingerprint B^maxLen·polyhash(span) for each mined
    * span, folded over the (topK-bounded) representative slice.
    * Output: (h, len) distinct. */
  private[graft] def spanFingerprints(mined: DataFrame, toks: DataFrame,
                                      maxLen: Int): DataFrame = {
    val pw1 = typedlit(powTable(B1, M1, maxLen).toSeq)
    val pw2 = typedlit(powTable(B2, M2, maxLen).toSeq)
    def fold(b: Long, m: Long) = aggregate(
      slice(col("ws"), col("off").cast("int"), col("span").cast("int")),
      lit(0L),
      (acc, t) => pmod(acc * b + pmod(xxhash64(t), lit(m)), lit(m)))
    broadcast(mined).join(toks, "doc_id")
      .select(
        (pmod(fold(B1, M1) * element_at(pw1, lit(maxLen + 1)), lit(M1))
          * M2 +
         pmod(fold(B2, M2) * element_at(pw2, lit(maxLen + 1)), lit(M2)))
          .as("h"),
        col("span").cast("int").as("len"))
      .distinct()
  }

  /** All candidate-window fingerprints for every mined length, from
    * ONE prefix-sum pass over per-doc token rows (one exchange on
    * doc_id; every lead/lag/cumsum shares that sort). Output:
    * (doc_id, pos [0-based start], len, h) with h the same canonical
    * B^maxLen·polyhash as [[spanFingerprints]]. When `keep` supplies
    * a per-length literal hash set (topK-bounded by construction),
    * membership is tested inside the fingerprint expression and only
    * MATCHING windows are emitted — the whole candidate stream
    * collapses map-side. */
  private[graft] def windowFingerprints(toks: DataFrame, lensArr: Seq[Int],
                                        maxLen: Int,
                                        keep: Map[Int, Array[Long]] =
                                          Map.empty): DataFrame = {
    val pw1 = typedlit(powTable(B1, M1, maxLen).toSeq)
    val pw2 = typedlit(powTable(B2, M2, maxLen).toSeq)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("j")
    val wCum = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    // u_j = t_j · B^(maxLen − j); the cumulative sum stays < 2^31·maxLen
    val tokRows = toks
      .select(col("doc_id"), size(col("ws")).as("n"),
        posexplode(col("ws")).as(Seq("j0", "tok")))
      .select(col("doc_id"), col("n"), (col("j0") + 1).as("j"),
        pmod(pmod(xxhash64(col("tok")), lit(M1)) *
          element_at(pw1, lit(maxLen) - col("j0")), lit(M1))
          .as("u1"),
        pmod(pmod(xxhash64(col("tok")), lit(M2)) *
          element_at(pw2, lit(maxLen) - col("j0")), lit(M2))
          .as("u2"))
    var withV = tokRows
      .withColumn("V1", pmod(sum(col("u1")).over(wCum), lit(M1)))
      .withColumn("V2", pmod(sum(col("u2")).over(wCum), lit(M2)))
      .withColumn("vp1", lag(col("V1"), 1, 0L).over(w))
      .withColumn("vp2", lag(col("V2"), 1, 0L).over(w))
    for (len <- lensArr) {
      val (ve1, ve2) =
        if (len == 1) (col("V1"), col("V2"))
        else (lead(col("V1"), len - 1).over(w),
              lead(col("V2"), len - 1).over(w))
      withV = withV.withColumn(s"ve1_$len", ve1)
        .withColumn(s"ve2_$len", ve2)
    }
    val cands = array(lensArr.map { len =>
      val e = col("j") + lit(len - 1) // 1-based window end
      val c1 = pmod(pmod(col(s"ve1_$len") - col("vp1"), lit(M1)) *
        element_at(pw1, e + 1), lit(M1))
      val c2 = pmod(pmod(col(s"ve2_$len") - col("vp2"), lit(M2)) *
        element_at(pw2, e + 1), lit(M2))
      val h = c1 * M2 + c2
      val valid = keep.get(len) match {
        case Some(hs) =>
          e <= col("n") && array_contains(typedlit(hs.toSeq), h)
        case None => e <= col("n")
      }
      struct(lit(len).as("len"), when(valid, h).as("h"))
    }: _*)
    withV.select(col("doc_id"), (col("j") - 1).as("pos"),
        explode(cands).as("wd"))
      .filter(col("wd.h").isNotNull)
      .select(col("doc_id"), col("pos").cast("int").as("pos"),
        col("wd.len").as("len"), col("wd.h").as("h"))
  }
}
