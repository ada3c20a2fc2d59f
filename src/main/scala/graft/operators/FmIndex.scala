package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** FM-index backward search (Ferragina & Manzini 2000) at token
  * granularity over the SAME per-document Burrows–Wheeler transform
  * the compression profile (q307) derives from the distributed suffix
  * array — the "compressed full-text search" half of the SA family:
  * counting every occurrence of a token pattern P = p₁…p_m takes m
  * rank lookups on the BWT, never a scan of the text.
  *
  * The classic recurrence, per document: with C[c] = #tokens < c in
  * the sentinel-extended text and Occ(c, i) = #occurrences of c in
  * BWT[1..i], the suffix-order interval [lo, hi] of suffixes starting
  * with the current pattern suffix updates per symbol (processed LAST
  * symbol first):
  *
  *   lo' = C[c] + Occ(c, lo−1) + 1,   hi' = C[c] + Occ(c, hi)
  *
  * and the final interval width hi − lo + 1 IS the occurrence count.
  *
  * Relational shape, all bounded unrolls:
  *  - Occ is the per-(doc, token) running occurrence number (a
  *    window over doc-bounded partitions), and each Occ(c, i) lookup
  *    is an AS-OF join (last occurrence number at position ≤ i) —
  *    the house q70 operator, keyed by (doc, token), probed at lo−1
  *    and hi in ONE pass per step via a 2-row explode;
  *  - the occurrence table is semi-joined down to the pattern
  *    alphabet first, so each step ships only positions of symbols
  *    the patterns actually use — at 100 TB the as-of right side is
  *    alphabet-bounded, not corpus-bounded;
  *  - C[c] is a per-doc running count over token order (same binary
  *    string order the suffix array sorts by);
  *  - patterns are a k-bounded driver list (the max-coverage
  *    convention): the top frequent bigrams/trigram plus a known-
  *    absent literal exercising the empty-interval path; m ≤ 3 steps.
  *
  * The oracle is a THEOREM, not a replay: the FM count per pattern
  * must equal the naive positional occurrence count over the
  * tokenized text (which DuckDB computes by self-joining unnested
  * token positions) — a wrong suffix rank, BWT symbol, C table,
  * rank lookup, or interval update breaks the equality on real data.
  */
object FmIndex {

  /** Count corpus occurrences of `patterns` (space-separated token
    * literals, each 1..3 tokens) via per-doc FM backward search.
    * Output: (pattern, n_docs, n_occ) — docs containing it and total
    * occurrences, 0-rows kept. */
  def countPatterns(spark: SparkSession, docs: DataFrame,
                    idCol: String, textCol: String,
                    patterns: Seq[String]): DataFrame = {
    import spark.implicits._
    require(patterns.nonEmpty && patterns.forall(p =>
      { val m = p.split(" ").length; m >= 1 && m <= 3 }),
      "patterns must be 1..3 space-separated tokens")

    val bwt = SuffixArray.bwt(docs, idCol, textCol)
      .localCheckpoint()

    // C[c]: running count of strictly-smaller tokens, per doc; the
    // BWT is a permutation of the sentinel-extended text, so its
    // symbol counts ARE the text's
    val cnts = bwt.groupBy(col("doc_id"), col("btok"))
      .agg(count(lit(1)).as("cnt"))
    val ctab = cnts.withColumn("cless",
        sum(col("cnt")).over(Window.partitionBy("doc_id")
          .orderBy("btok").rowsBetween(Window.unboundedPreceding,
            Window.currentRow)) - col("cnt"))
      .select(col("doc_id"), col("btok").as("sym"), col("cless"))
      .localCheckpoint()

    // doc lengths (sentinel-extended) = BWT row count per doc
    val lens = bwt.groupBy("doc_id").agg(count(lit(1)).as("len"))

    // per-(doc, sym) occurrence numbers, alphabet-restricted
    val alphabet = patterns.flatMap(_.split(" ")).distinct
      .toDF("sym")
    val occ = bwt
      .join(broadcast(alphabet), col("btok") === col("sym"))
      .withColumn("r", row_number().over(
        Window.partitionBy("doc_id", "sym").orderBy("j")).cast("long"))
      .select(concat_ws("\u0002", col("doc_id"), col("sym")).as("k"),
        col("j").as("i"), col("r"))
      .localCheckpoint()

    // (pattern_id, step s, symbol) — backward order: step 1 = p_m
    val pats = patterns.zipWithIndex.map { case (p, id) =>
      (id.toLong, p)
    }
    val steps = pats.flatMap { case (id, p) =>
      p.split(" ").reverse.zipWithIndex.map { case (c, s) =>
        (id, (s + 1).toLong, c)
      }
    }.toDF("pattern_id", "s", "sym")
    val maxM = pats.map(_._2.split(" ").length).max

    // state: one (doc, pattern) interval, initialized to all suffixes
    var state = lens.crossJoin(broadcast(
        pats.toDF("pattern_id", "pattern").select("pattern_id")))
      .select(col("doc_id"), col("pattern_id"), lit(1L).as("lo"),
        col("len").as("hi"))
      .localCheckpoint()

    var s = 1
    while (s <= maxM) {
      val stepSym = steps.filter(col("s") === s)
        .select(col("pattern_id"), col("sym"))
      // patterns shorter than s pass through untouched
      val advancing = state.join(broadcast(stepSym), Seq("pattern_id"))
      val resting = state.join(broadcast(stepSym), Seq("pattern_id"),
        "left_anti")
      // C[c] present in this doc? absent symbol ⇒ zero occurrences
      val withC = advancing
        .join(ctab, Seq("doc_id", "sym"))
      // one as-of pass answers both Occ(c, lo−1) and Occ(c, hi)
      val probes = withC.select(col("doc_id"), col("pattern_id"),
          col("sym"), col("cless"), col("lo"), col("hi"),
          explode(array(
            struct((col("lo") - 1).as("i"), lit("lo").as("which")),
            struct(col("hi").as("i"), lit("hi").as("which"))))
            .as("pr"))
        .select(concat_ws("\u0002", col("doc_id"), col("sym")).as("k"),
          col("pr.i").as("i"), col("pr.which").as("which"),
          col("doc_id"), col("pattern_id"), col("cless"), col("lo"),
          col("hi"))
      val looked = AsOfJoin.asOf(probes, occ, "k", "i", Seq("r"))
        .withColumn("occv", coalesce(col("asof_r"), lit(0L)))
      val stepped = looked.groupBy("doc_id", "pattern_id")
        .agg(first(col("cless")).as("cless"),
          max(when(col("which") === "lo", col("occv"))).as("olo"),
          max(when(col("which") === "hi", col("occv"))).as("ohi"))
        .select(col("doc_id"), col("pattern_id"),
          (col("cless") + col("olo") + 1L).as("lo"),
          (col("cless") + col("ohi")).as("hi"))
        .filter(col("lo") <= col("hi"))
      state = stepped.unionByName(
          resting.select("doc_id", "pattern_id", "lo", "hi"))
        .localCheckpoint()
      s += 1
    }

    val perPattern = state
      .groupBy("pattern_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("hi") - col("lo") + 1L).as("n_occ"))
    broadcast(pats.toDF("pattern_id", "pattern"))
      .join(perPattern, Seq("pattern_id"), "left")
      .select(col("pattern"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_occ"), lit(0L)).as("n_occ"))
  }

  /** As [[countPatterns]], with the whole per-document FM stack —
    * suffix order (the [[SuffixArray.guardedSuffixOrder]] kernel the
    * BWT itself uses), BWT symbols, C table, Occ ranks, and the m ≤ 3
    * backward interval steps — run INSIDE one typed map per document,
    * the q307 object-island shape. Suffix order, C, and Occ never
    * cross a document boundary, so the relational formulation's
    * per-step corpus exchanges (C-table window + alphabet Occ window +
    * as-of probe rounds, ~4 s of q321's 5.3 at sf0.1) buy nothing the
    * local fold doesn't: this is ONE zero-shuffle pass emitting one
    * row per surviving (doc, pattern) interval, then a
    * |patterns|-row aggregation. Bit-identical to [[countPatterns]]
    * (FmIndexSpec pins both paths on fixtures and a corpus slice);
    * the relational path remains the reference and the route for
    * engines where the doc-bounded kernel assumption fails. */
  def countPatternsLocal(spark: SparkSession, docs: DataFrame,
                         idCol: String, textCol: String,
                         patterns: Seq[String]): DataFrame =
    countPatternsLocalToks(spark,
      SuffixArray.tokenized(docs, idCol, textCol), patterns)

  /** Pre-tokenized entry point (toks = (doc_id, ws array<string>),
    * every ws non-empty — [[SuffixArray.tokenized]]'s contract);
    * callers that already paid the tokenize pass (q321's top-gram
    * selection) reuse it. */
  private[graft] def countPatternsLocalToks(spark: SparkSession,
      toks: DataFrame, patterns: Seq[String]): DataFrame = {
    import spark.implicits._
    require(patterns.nonEmpty && patterns.forall(p =>
      { val m = p.split(" ").length; m >= 1 && m <= 3 }),
      "patterns must be 1..3 space-separated tokens")
    val pats = patterns.zipWithIndex.map { case (p, id) =>
      (id.toLong, p)
    }
    // backward-order steps per pattern; alphabet for the Occ lists
    val steps: Array[(Long, Array[String])] =
      pats.map { case (id, p) => (id, p.split(" ").reverse) }.toArray
    val alpha: Array[String] =
      patterns.flatMap(_.split(" ")).distinct.toArray

    val hits = toks
      .select(col("doc_id"),
        concat(col("ws"), array(lit("\u0001"))).as("ws"))
      .as[(Long, Seq[String])]
      .flatMap { case (_, ws) =>
        val arr = ws.toArray
        val n = arr.length
        val bytes = arr.map(
          _.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val order = SuffixArray.guardedSuffixOrder(bytes)
        // Occ position lists: 1-based BWT positions per alphabet sym
        val posBy = new java.util.HashMap[String,
          scala.collection.mutable.ArrayBuffer[Long]]()
        val alphaSet = alpha.toSet
        var j = 0
        while (j < n) {
          val b = if (order(j) == 0) arr(n - 1) else arr(order(j) - 1)
          if (alphaSet(b)) {
            var l = posBy.get(b)
            if (l == null) {
              l = new scala.collection.mutable.ArrayBuffer[Long]()
              posBy.put(b, l)
            }
            l += (j + 1).toLong
          }
          j += 1
        }
        // C[sym] = #tokens (incl. the sentinel) strictly smaller, by
        // the same binary UTF-8 order the suffix sort and the
        // relational window's ORDER BY btok use
        val cBy = new java.util.HashMap[String, java.lang.Long]()
        def cOf(sym: String): Long = {
          val got = cBy.get(sym)
          if (got != null) got.longValue()
          else {
            val sb = sym.getBytes(
              java.nio.charset.StandardCharsets.UTF_8)
            var c = 0L; var i = 0
            while (i < n) {
              if (SuffixArray.utf8Compare(bytes(i), sb) < 0) c += 1
              i += 1
            }
            cBy.put(sym, java.lang.Long.valueOf(c)); c
          }
        }
        // Occ(sym, i) = #entries ≤ i in the sorted position list
        def occ(ps: scala.collection.mutable.ArrayBuffer[Long],
                i: Long): Long = {
          var lo = 0; var hi = ps.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (ps(mid) <= i) lo = mid + 1 else hi = mid
          }
          lo.toLong
        }
        steps.iterator.flatMap { case (id, rev) =>
          var lo = 1L
          var hi = n.toLong
          var dead = false
          var si = 0
          while (si < rev.length && !dead) {
            val ps = posBy.get(rev(si))
            if (ps == null) dead = true // symbol absent ⇒ empty interval
            else {
              val cless = cOf(rev(si))
              val nl = cless + occ(ps, lo - 1) + 1
              val nh = cless + occ(ps, hi)
              lo = nl; hi = nh
              if (lo > hi) dead = true
            }
            si += 1
          }
          if (dead) None else Some((id, hi - lo + 1))
        }
      }
      .toDF("pattern_id", "width")

    val perPattern = hits.groupBy("pattern_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("width")).as("n_occ"))
    broadcast(pats.toDF("pattern_id", "pattern"))
      .join(perPattern, Seq("pattern_id"), "left")
      .select(col("pattern"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_occ"), lit(0L)).as("n_occ"))
  }
}
