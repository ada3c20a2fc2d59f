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
}
