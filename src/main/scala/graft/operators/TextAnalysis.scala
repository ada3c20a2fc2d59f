package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for document pipelines: token statistics,
  * quality scoring, language-ID heuristic, fingerprinting.
  *
  * These generalize the reference's emotion-scoring enrichment (S4,
  * Scraper.py:244/323 — POST text to ParallelDots, get a score vector):
  * same shape (text in, deterministic feature vector out), but computed
  * in-engine with codegen'd builtins instead of a remote API. All
  * integer/ratio arithmetic — deterministic and oracle-checkable.
  */
object TextAnalysis {

  private def words(text: Column): Column = split(lower(text), " ")

  /** Stopword lists for the language-ID heuristic (tiny on purpose —
    * a real pipeline plugs in full lists; the OPERATOR is the point). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "es" -> Seq("el", "la", "los", "y", "es", "un"),
    "zh" -> Seq("的", "了", "是", "在", "我"))

  private def countIn(ws: Column, list: Seq[String]): Column =
    size(filter(ws, w => w.isin(list.map(_.asInstanceOf[Any]): _*)))

  /** Σ length(word) over the single-space split, computed WITHOUT the
    * interpreted `aggregate` HOF: every non-space char belongs to
    * exactly one split word, so the sum is length(text minus spaces) —
    * a codegen'd one-liner, 10-50× faster in the hot path. */
  private def sumWordLengths(text: Column): Column =
    length(translate(lower(text), " ", ""))

  /** GPT2-style pre-tokenizer pattern, simplified to the lookahead-free
    * subset so Java (Spark) and RE2 (DuckDB and most tokenizer libs)
    * agree: an optional leading space then a letter run, digit run, or
    * punctuation run. Counting its matches approximates BPE
    * pre-tokenization cost — the "how many tokens is this corpus"
    * estimator a training pipeline budgets with. */
  val bpeIshPattern = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  /** Token/char statistics per document:
    * (id, n_words, n_chars_obs, n_distinct_words, avg_word_len,
    * stopword_ratio, n_bpe_tokens). */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    docs.select(
      col(idCol),
      size(ws).as("n_words"),
      length(col(textCol)).as("n_chars_obs"),
      size(array_distinct(ws)).as("n_distinct_words"),
      (sumWordLengths(col(textCol)).cast("double")
        / size(ws)).as("avg_word_len"),
      (countIn(ws, stopwords("en")).cast("double") / size(ws))
        .as("stopword_ratio"),
      size(regexp_extract_all(lower(col(textCol)), lit(bpeIshPattern), lit(0)))
        .as("n_bpe_tokens"))
  }

  /** Heuristic quality score in [0,1]: rewards mid-length documents,
    * lexical diversity, and a sane stopword rate. The formula is a
    * deterministic stand-in for a learned quality model (same role as
    * Gopher/C4 quality rules). */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    val nWords = size(ws)
    val diversity = size(array_distinct(ws)).cast("double") / nWords
    val stopRatio = countIn(ws, stopwords("en")).cast("double") / nWords
    val lengthScore = least(nWords.cast("double") / 64.0, lit(1.0))
    docs.select(
      col(idCol),
      nWords.as("n_words"),
      round(diversity, 6).as("diversity"),
      round(stopRatio, 6).as("stopword_ratio"),
      round((lengthScore * 0.4 + diversity * 0.4
        + least(stopRatio * 4.0, lit(1.0)) * 0.2), 6).as("quality"))
  }

  /** Language-ID by stopword voting: score per language = matching
    * stopword count / n_words; predicted = argmax (ties → language name
    * asc). Output: (id, en_score, de_score, fr_score, es_score,
    * zh_score, predicted_lang). */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    val langs = stopwords.keys.toSeq.sorted
    val scored = langs.foldLeft(
      docs.select(col(idCol), ws.as("ws"))) { (d, l) =>
      d.withColumn(s"${l}_score",
        countIn(col("ws"), stopwords(l)).cast("double") / size(col("ws")))
    }
    // argmax via array_max over (score, lang) structs; ties: lang asc
    // (struct comparison is lexicographic, so negate nothing — compare
    // (score, reversed-lang) would be wrong; instead sort desc by score
    // then asc by lang via array_sort comparator-free trick: max of
    // (score, lang) picks the LAST lang on ties, so store (score, -ord).
    val best = array_sort(array(langs.zipWithIndex.map { case (l, i) =>
      struct(col(s"${l}_score").as("s"), lit(langs.size - i).as("ord"),
        lit(l).as("lang"))
    }: _*))
    scored
      .withColumn("predicted_lang",
        element_at(best, langs.size).getField("lang"))
      .drop("ws")
  }

  /** Gopher-style document-quality FILTERS (Rae et al. '21 rules,
    * simplified to this corpus's features): keep documents whose word
    * count, mean word length, stopword presence, and lexical diversity
    * fall in sane bands. Returns per-rule booleans plus the conjunction
    * — the standard pre-training corpus gate. */
  def qualityFilter(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    val nWords = size(ws)
    val meanLen = sumWordLengths(col(textCol)).cast("double") / nWords
    val diversity = size(array_distinct(ws)).cast("double") / nWords
    val stopHits = countIn(ws, stopwords("en"))
    docs.select(
      col(idCol),
      nWords.as("n_words"),
      (nWords >= 10 && nWords <= 1000).as("ok_length"),
      (meanLen >= 2.0 && meanLen <= 12.0).as("ok_word_len"),
      (stopHits >= 1).as("ok_stopwords"),
      (diversity >= 0.1).as("ok_diversity"))
      .withColumn("keep",
        col("ok_length") && col("ok_word_len")
          && col("ok_stopwords") && col("ok_diversity"))
  }

  /** PII-style pattern redaction: replace every match of `pattern`
    * with `token` and report how many were hit — the scrubbing pass a
    * training pipeline runs before anything else (emails, phone
    * numbers, long digit runs). Pure codegen'd regex ops, one
    * map-only stage: no shuffle, scales linearly with corpus bytes.
    * The pattern must avoid lookaround so Java regex (Spark) and RE2
    * (DuckDB et al.) agree. */
  def redact(df: DataFrame, textCol: String, pattern: String,
             token: String): DataFrame =
    df.withColumn("n_redacted",
        size(regexp_extract_all(col(textCol), lit(pattern), lit(0))))
      .withColumn("redacted",
        regexp_replace(col(textCol), pattern, token))

  /** Rolling polynomial fingerprint over word-level codes — the
    * document-fingerprinting primitive (content-defined hashing).
    * code(w) = ascii(first char)·37 + len(w); h = fold (h·31 + code) mod 2^20.
    * Integer-only → bit-exact in any engine. */
  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1): the
    * fraction of a document's word/bigram/trigram occurrences taken by
    * its single most frequent gram. High values flag boilerplate and
    * degenerate generations; training pipelines gate on them alongside
    * the quality heuristics.
    *
    * Shape: ONE explode of per-doc tagged gram arrays, then
    * (doc, n, gram) counts and a conditional-aggregate rollup — two
    * hash aggregations with map-side partials, no window, no join;
    * scales linearly with corpus token count. Output per doc:
    * (id, n_words, top_word_frac, top_bigram_frac, top_trigram_frac);
    * the n-gram fracs are null for docs shorter than n words. */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = words(col(textCol))
    // n-grams as a tagged struct array; sequence() would flip to a
    // DESCENDING range when size < n, so short docs get an empty array
    def ngrams(n: Int): Column =
      when(size(col("w")) >= n,
        transform(sequence(lit(0), size(col("w")) - n),
          i => struct(lit(n).as("n"),
            concat_ws(" ", (0 until n).map(k =>
              element_at(col("w"), i + k + 1)): _*).as("gram"))))
        .otherwise(array().cast("array<struct<n:int,gram:string>>"))
    val grams = docs.select(col(idCol), w.as("w"))
      .select(col(idCol),
        explode(concat(ngrams(1), ngrams(2), ngrams(3))).as("g"))
      .select(col(idCol), col("g.n").as("n"), col("g.gram").as("gram"))
    def frac(n: Int) =
      (max(when(col("n") === n, col("cnt"))).cast("double") /
        sum(when(col("n") === n, col("cnt"))))
    grams.groupBy(col(idCol), col("n"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(
        sum(when(col("n") === 1, col("cnt"))).cast("int").as("n_words"),
        frac(1).as("top_word_frac"),
        frac(2).as("top_bigram_frac"),
        frac(3).as("top_trigram_frac"))
  }

  /** Lexical diversity per document via the Simpson (collision) index
    * over the token distribution: `collision_prob = Σ cnt²/ n²` — the
    * probability two independently drawn tokens coincide, i.e. the
    * exponential of minus the Rényi-2 entropy. Same repetition-quality
    * family as [[repetitionSignals]], but the statistic is a RATIO OF
    * INTEGERS (one correctly-rounded double division at the end), so —
    * unlike a Shannon entropy whose `log` differs across libm
    * implementations — a SQL oracle reproduces it bit-for-bit.
    * Map-side: one groupBy (id, token) + one groupBy id, both with
    * partial aggregation; linear in corpus token count. */
  def lexicalDiversity(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(words(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(
        sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("cnt") * col("cnt")).as("sum_sq"))
      .withColumn("collision_prob",
        col("sum_sq").cast("double") / (col("n_tokens") * col("n_tokens")))

  /** Corpus-level top word n-grams per group (e.g. per language) — the
    * "what does this slice of the corpus look like" profiling query a
    * curation run issues before choosing filters. Two shuffles: the
    * (group, gram) count with map-side partials, then the per-group
    * top-k window, which InferWindowGroupLimit prunes to a per-
    * partition top-k BEFORE the exchange — no full sort of the gram
    * vocabulary. Ties broken lexicographically so results are total-
    * ordered and oracle-exact. */
  def topNgramsPerGroup(docs: DataFrame, groupCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = words(col(textCol))
    val grams = docs
      .select(col(groupCol), w.as("w"))
      .filter(size(col("w")) >= n)
      .select(col(groupCol),
        explode(transform(sequence(lit(0), size(col("w")) - n),
          i => concat_ws(" ", (0 until n).map(j =>
            element_at(col("w"), i + j + 1)): _*))).as("gram"))
    val win = Window.partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col("gram").asc)
    grams.groupBy(col(groupCol), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
  }

  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    val codes = transform(ws, w => ascii(w) * 37 + length(w))
    docs.select(
      col(idCol),
      aggregate(codes, lit(0L),
        (acc, c) => (acc * 31 + c) % 1048576).as("fingerprint"))
  }

  /** CCNet-style unigram language-model quality score: fit the unigram
    * LM on the corpus itself (token frequency / corpus size), then
    * score each document by its mean and minimum token log-probability.
    * Low mean => unusual token distribution; low min => contains the
    * corpus's rarest tokens. Output: (doc_id, n_tokens, mean_logprob,
    * min_logprob).
    *
    * Scale shape: one token-frequency groupBy (map-side partials), the
    * vocabulary joins back BROADCAST (a real-corpus unigram vocab is
    * millions of rows — still broadcastable; beyond that it degrades to
    * a shuffle join on the token), and the per-doc reduce is a single
    * partial-aggregated groupBy. No driver collect.
    *
    * Oracle exactness: log-probs are summed as DECIMAL(18,9) — exact
    * and order-independent, unlike a double sum — and the mean is one
    * double division at the end. The 1e-9 quantization also absorbs
    * JVM-vs-DuckDB `ln` last-ulp differences (measured: 13 per 200k
    * random inputs differ by 1 ulp; 0 of the corpus's values differ).
    */
  /** Bigram language-model score per document under STUPID BACKOFF
    * (Brants et al. 2007, "Large Language Models in Machine
    * Translation" — the non-normalized backoff built for exactly this
    * setting: corpus-scale counts, no held-out tuning), with the LM
    * trained on a REFERENCE corpus `lm` and scored over `docs` — the
    * CCNet shape (LM from a trusted corpus, score the crawl; scoring
    * a corpus against itself makes every bigram "seen" and the
    * backoff dead code). Each transition scores ln(c(w1,w2)/c(w1))
    * when the LM saw the bigram, else backs off to the add-one
    * unigram: ln(0.4·(c(w2)+1)/(N+V+1)) — add-one keeps OOV tokens
    * finite with no epsilon constants (c = 0 for OOV), and V+1 is
    * the vocab plus the OOV type.
    *
    * Output: (doc_id, n_trans, mean_lp, flagged) for every doc with
    * ≥ 1 transition; flagged = mean_lp < `flagBelow`.
    *
    * Scale shape: transitions assemble map-side (the shingleRows
    * kernel at n=2, words kept separate); bigram and unigram count
    * tables shuffle on fixed-width token keys with map-side partials;
    * the scoring joins are token-keyed equi-joins (broadcast at test
    * SF, shuffle joins at corpus scale — never a cross join). Per-term
    * scores quantize to DECIMAL(18,9) before the per-doc sum
    * ([[unigramLogProb]]'s oracle-exactness convention: the sum is
    * exact and order-free, and the quantization absorbs JVM-vs-DuckDB
    * ln() last-ulp differences). */
  def stupidBackoff(docs: DataFrame, lm: DataFrame, idCol: String,
                    textCol: String, flagBelow: Double): DataFrame = {
    def transitions(d: DataFrame): DataFrame = {
      val base = d.select(col(idCol).as("doc_id"),
        words(col(textCol)).as("w"))
      base.filter(size(col("w")) >= 2)
        .select(col("doc_id"),
          explode(transform(sequence(lit(0), size(col("w")) - 2),
            i => struct(element_at(col("w"), i + 1).as("w1"),
              element_at(col("w"), i + 2).as("w2")))).as("t"))
        .select(col("doc_id"), col("t.w1").as("w1"), col("t.w2").as("w2"))
    }
    val uni = lm.select(explode(words(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val bi = transitions(lm).groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val lmStats = uni.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("vocab"))
    // identical double expression order in the DuckDB twin:
    // seen:    ln(cb / c1)
    // unseen:  ln(0.4 * (c2+1) / (total+vocab+1))
    val lnp = when(col("cb").isNotNull,
        log(col("cb").cast("double") / col("c1")))
      .otherwise(log(lit(0.4) * (coalesce(col("c2"), lit(0L)) + 1) /
        (col("total") + col("vocab") + 1)))
    transitions(docs)
      .join(uni.select(col("tok").as("w1"), col("cnt").as("c1")),
        Seq("w1"), "left")
      .join(uni.select(col("tok").as("w2"), col("cnt").as("c2")),
        Seq("w2"), "left")
      .join(bi, Seq("w1", "w2"), "left")
      .crossJoin(lmStats)
      .select(col("doc_id"), lnp.cast("decimal(18,9)").as("lp9"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trans"),
        (sum(col("lp9")).cast("double") / count(lit(1))).as("mean_lp"))
      .withColumn("flagged", col("mean_lp") < flagBelow)
  }

  /** Trigram-backoff SUPPORT histogram per document — the
    * integer-exact face of n-gram LM familiarity ([[stupidBackoff]]
    * publishes smoothed log-probs; this publishes the backoff LEVEL
    * each position resolves at, the quantity Katz backoff actually
    * branches on): position i resolves at the highest order
    * o ≤ min(i, 3) whose corpus-wide gram count ≥ `minCount`
    * (every gram occurs once in its own document, so minCount = 2
    * means "seen elsewhere too"); positions resolving nowhere are
    * `unk` (singleton words). support_milli =
    * (3000·n_tri + 2000·n_bi + 1000·n_uni) div n_pos — a bounded
    * [0, 3000] familiarity score, fully integer.
    *
    * Scale shape: one explode to position rows carrying their
    * (uni, bi, tri) gram keys, three grouped counts over the same
    * frame, three equi-joins back (map-side combined counts; the
    * classic LM-scoring join topology), one per-doc rollup. */
  def backoffSupport(docs: DataFrame, idCol: String, textCol: String,
                     minCount: Long = 2L): DataFrame = {
    val pos = docs.select(col(idCol).cast("long").as("doc_id"),
        filter(words(col(textCol)), w => w =!= "").as("w"))
      .filter(size(col("w")) >= 1)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("w"))),
        i => struct(
          element_at(col("w"), i).as("uni"),
          when(i >= 2, concat_ws(" ",
            element_at(col("w"), i - 1),
            element_at(col("w"), i))).as("bi"),
          when(i >= 3, concat_ws(" ",
            element_at(col("w"), i - 2),
            element_at(col("w"), i - 1),
            element_at(col("w"), i))).as("tri")))).as("g"))
      .select(col("doc_id"), col("g.uni").as("uni"),
        col("g.bi").as("bi"), col("g.tri").as("tri"))
      .localCheckpoint() // one corpus scan feeds counts AND scoring
    val c1 = pos.groupBy("uni").agg(count(lit(1)).as("c1"))
    val c2 = pos.filter(col("bi").isNotNull)
      .groupBy("bi").agg(count(lit(1)).as("c2"))
    val c3 = pos.filter(col("tri").isNotNull)
      .groupBy("tri").agg(count(lit(1)).as("c3"))
    val lvl = when(coalesce(col("c3"), lit(0L)) >= minCount, 3)
      .when(coalesce(col("c2"), lit(0L)) >= minCount, 2)
      .when(col("c1") >= minCount, 1)
      .otherwise(0)
    pos.join(c3, Seq("tri"), "left")
      .join(c2, Seq("bi"), "left")
      .join(c1, Seq("uni"))
      .select(col("doc_id"), lvl.as("lvl"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pos"),
        sum(when(col("lvl") === 3, 1L).otherwise(0L)).as("n_tri"),
        sum(when(col("lvl") === 2, 1L).otherwise(0L)).as("n_bi"),
        sum(when(col("lvl") === 1, 1L).otherwise(0L)).as("n_uni"),
        sum(when(col("lvl") === 0, 1L).otherwise(0L)).as("n_unk"))
      .withColumn("support_milli", expr(
        "(3000 * n_tri + 2000 * n_bi + 1000 * n_uni) div n_pos"))
  }

  /** Interpolated Kneser–Ney bigram scores (Kneser & Ney 1995;
    * Chen & Goodman 1999's interpolated form) in the engine's log-free
    * fixed-point convention, discount D = 3/4 exact:
    *
    *   P_KN(w2|w1) = max(c(w1w2) − D, 0)/c(w1·)
    *               + D·N1+(w1·)/c(w1·) · N1+(·w2)/N1+(··)
    *
    * where c(w1·) is w1's left-context token total, N1+(w1·) its
    * distinct-successor count, N1+(·w2) the CONTINUATION count (how
    * many distinct lefts precede w2 — KN's defining quantity: "York"
    * is frequent but follows almost nothing except "New"), and
    * N1+(··) the distinct-bigram-type total. Published as the
    * composed-floor fixed point
    *
    *   cont_ppm = (10^6·N1+(·w2)) div N1+(··)
    *   kn_ppm   = (10^6·max(4c−3, 0)) div (4·c(w1·))
    *            + (3·N1+(w1·)·cont_ppm) div (4·c(w1·))
    *
    * — the continuation probability quantized FIRST, then each addend
    * floor-divided separately, so every intermediate stays well under
    * 2^63 at any corpus size (a single joint floor would need
    * c·N1+·10^6-scale products that overflow on a 100 TB corpus).
    * DuckDB replays the same two floors, so the match is exact, not
    * tolerance-based.
    *
    * Scale shape: ONE bigram-type shuffle (groupBy (w1, w2)), then
    * three re-aggregations of that type table (by w1, by w2, global
    * — all far smaller than the corpus), two equi-joins back on the
    * type table, one broadcast of the one-row total. No corpus²
    * anywhere; the output is capped by `minCb`. */
  def knBigrams(docs: DataFrame, textCol: String,
                minCb: Long = 5L): DataFrame = {
    val cb = docs
      .select(filter(words(col(textCol)), w => w =!= "").as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("w")) - 2),
        i => struct(element_at(col("w"), i + 1).as("w1"),
          element_at(col("w"), i + 2).as("w2")))).as("t"))
      .select(col("t.w1").as("w1"), col("t.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .localCheckpoint() // one corpus shuffle feeds all four marginals
    val left = cb.groupBy("w1")
      .agg(sum(col("cb")).as("c1"), count(lit(1)).as("n1l"))
    val cont = cb.groupBy("w2").agg(count(lit(1)).as("contc"))
    val ntot = cb.agg(count(lit(1)).as("ntot"))
    cb.filter(col("cb") >= minCb)
      .join(left, Seq("w1"))
      .join(cont, Seq("w2"))
      .crossJoin(broadcast(ntot))
      .withColumn("cont_ppm",
        expr("(1000000 * contc) div ntot"))
      .withColumn("kn_ppm",
        expr("(1000000 * greatest(4 * cb - 3, 0)) div (4 * c1)" +
          " + (3 * n1l * cont_ppm) div (4 * c1)"))
      .select(col("w1"), col("w2"), col("cb"), col("c1"),
        col("n1l"), col("cont_ppm"), col("kn_ppm"))
      .orderBy("w1", "w2")
  }

  /** Per-source unigram KL divergence from the corpus-wide
    * distribution: KL(p_source ‖ p_corpus) = Σ_w p_s(w)·ln(p_s(w)/p_c(w))
    * over the source's own support (support(s) ⊆ support(c) by
    * construction, so no smoothing is needed and every term is
    * finite). The standard "which feed drifted away from the mixture"
    * report a corpus-composition dashboard runs per ingest.
    *
    * Output: (source, n_tokens, vocab, kl), kl ≥ 0.
    *
    * Scale shape: one (source, token) count shuffle with map-side
    * partials, one corpus-token count shuffle, an equi-join on token,
    * and a per-source sum of DECIMAL(18,9)-quantized terms (the
    * [[unigramLogProb]] convention — order-free exact sums, ln ulp
    * absorbed). Sources × vocab bounds the join, never corpus². */
  def sourceKlDrift(docs: DataFrame, srcCol: String, textCol: String)
      : DataFrame = {
    val toks = docs.select(col(srcCol).as("source"),
        explode(words(col(textCol))).as("tok"))
    val bySrc = toks.groupBy("source", "tok").agg(count(lit(1)).as("cs"))
    val srcTot = bySrc.groupBy("source").agg(sum(col("cs")).as("ns"),
      count(lit(1)).as("vocab"))
    val corpus = toks.groupBy("tok").agg(count(lit(1)).as("cc"))
    val corpTot = corpus.agg(sum(col("cc")).as("nc"))
    // term = (cs/ns) * ln( (cs/ns) / (cc/nc) ) — identical shape in SQL
    val ps = col("cs").cast("double") / col("ns")
    val pc = col("cc").cast("double") / col("nc")
    bySrc
      .join(broadcast(srcTot), Seq("source"))
      .join(corpus, Seq("tok"))
      .crossJoin(corpTot)
      .select(col("source"), col("ns"), col("vocab"),
        (ps * log(ps / pc)).cast("decimal(18,9)").as("term9"))
      .groupBy("source", "ns", "vocab")
      .agg(sum(col("term9")).cast("double").as("kl"))
      .select(col("source"), col("ns").as("n_tokens"), col("vocab"),
        col("kl"))
  }

  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(words(col(textCol))).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("total"))
    val lnp = log(col("cnt").cast("double") / col("total"))
    toks
      .join(broadcast(freq), Seq("tok"))
      .crossJoin(broadcast(total))
      .select(col(idCol), lnp.as("lnp"),
        lnp.cast("decimal(18,9)").as("lnp9"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("lnp9")).cast("double") / count(lit(1))).as("mean_logprob"),
        min(col("lnp")).as("min_logprob"))
  }

  /** Vocabulary coverage cut: the smallest frequency-ranked token
    * prefix covering `covNum`/`covDen` of the corpus token mass — the
    * "what vocabulary do I need for 90% coverage" question every
    * tokenizer-training run asks. Returns (tok, cnt, rank, cum_frac)
    * for the kept prefix, rank ascending.
    *
    * The keep predicate is pure integer math ((cum − cnt)·covDen <
    * total·covNum — "mass BEFORE this token is under target"), so the
    * boundary token is unambiguous in any engine; cum_frac is ONE
    * double division for reporting.
    *
    * Scale shape: one explode + map-side-combined token count (the only
    * corpus-sized shuffle), then ranking over the DISTINCT-TOKEN table —
    * orders of magnitude smaller than the corpus (vocabulary grows
    * ~sub-linearly in corpus size), so the single-partition global
    * window is bounded by vocabulary, not data. For a trillion-token
    * corpus with a 100M-type vocabulary you'd range-partition the sort
    * and two-pass the cumulative sum; at any practical vocab the window
    * holds.
    */
  def vocabCoverage(docs: DataFrame, idCol: String, textCol: String,
                    covNum: Int, covDen: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("tok").asc)
    val cum = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("tok").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val freq = docs
      .select(explode(words(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("total"))
    freq.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_cnt", sum(col("cnt")).over(cum))
      .filter((col("cum_cnt") - col("cnt")) * lit(covDen.toLong)
        < col("total") * lit(covNum.toLong))
      .select(col("tok"), col("cnt"), col("rank"),
        (col("cum_cnt").cast("double") / col("total")).as("cum_frac"))
  }

  /** Per-document compression-ratio stats. */
  case class CompressionStats(doc_id: Long, n_bytes: Int,
                              n_compressed: Int, ratio: Double)

  /** Compression-ratio quality signal (the Gopher/RefinedWeb "does
    * this page deflate suspiciously well" filter): zlib-compress each
    * document's UTF-8 bytes and report compressed/raw. Highly
    * repetitive machine-generated text compresses far below prose;
    * a low ratio is a strong cheap junk signal, computed without any
    * language model.
    *
    * Genuine per-partition imperative work, so `mapPartitions`: ONE
    * `Deflater` per partition, `reset()` per row — never an allocation
    * per document, no UDF serialization overhead. zlib output for a
    * fixed level is deterministic, so reruns agree; the ratio is
    * engine-specific (DuckDB has no DEFLATE, so no SQL twin exists at
    * any quantization), which keeps this an ENGINE API rather than a
    * driver-hashed registration (round 8: q96 now publishes the
    * all-integer [[compressibilityBySource]] rollup; the per-doc
    * proxy is q211; this operator stays Deflater-pinned in ScalaTest).
    * Map-only: no shuffle at any scale. */
  def compressionRatio(docs: DataFrame, idCol: String, textCol: String)
      : org.apache.spark.sql.Dataset[CompressionStats] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, false)
        val buf = new Array[Byte](1 << 16)
        it.map { case (id, text) =>
          val in = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(in)
          deflater.finish()
          var total = 0
          while (!deflater.finished()) total += deflater.deflate(buf)
          CompressionStats(id, in.length, total,
            if (in.length == 0) 0.0 else total.toDouble / in.length)
        }
      }
  }

  /** DuckDB-replayable compressibility PROXY (round 7, the q96
    * companion): the zlib ratio itself is engine-specific (no SQL
    * twin, documented in [[compressionRatio]]), but the signal DEFLATE
    * exploits — repeated substrings — has an exactly-replayable
    * surrogate: the share of token 4-grams that duplicate an earlier
    * 4-gram of the same document (LZ77 matches are, to first order,
    * repeated shingles). High dup4_ppm ⇔ low zlib ratio; the
    * association is pinned against the real Deflater in ScalaTest, and
    * every published column is integer-exact so the oracle replays the
    * row bit-for-bit.
    *
    * Scale shape: map-only per-row HOFs (shingle transform + distinct
    * count), no shuffle, no UDF — same cost class as the other per-doc
    * text signals.
    *
    * Output: (doc_id, n_bytes, n_grams, n_distinct_grams, dup4_ppm). */
  def compressibilityProxy(docs: DataFrame, idCol: String, textCol: String,
                           n: Int = 4): DataFrame =
    proxyPerDoc(docs, idCol, textCol, n, Nil)

  /** Shared per-doc kernel for [[compressibilityProxy]] /
    * [[compressibilityBySource]]: the duplicate-n-gram integer columns
    * plus caller-supplied carried columns (kept out of the heavy
    * select so CollapseProject has nothing expensive to duplicate). */
  private def proxyPerDoc(docs: DataFrame, idCol: String, textCol: String,
                          n: Int, extra: Seq[(String, Column)]): DataFrame = {
    val toks = filter(words(col(textCol)), w => w =!= "")
    docs.select(Seq(col(idCol).cast("long").as("doc_id"),
        octet_length(col(textCol)).cast("long").as("n_bytes"),
        toks.as("toks")) ++ extra.map { case (a, c) => c.as(a) }: _*)
      .withColumn("grams",
        when(size(col("toks")) >= n,
          transform(sequence(lit(0), size(col("toks")) - n),
            i => concat_ws(" ", slice(col("toks"), i + 1, lit(n)))))
          .otherwise(array().cast("array<string>")))
      .select(Seq(col("doc_id"), col("n_bytes"),
        size(col("grams")).cast("long").as("n_grams"),
        size(array_distinct(col("grams"))).cast("long")
          .as("n_distinct_grams")) ++ extra.map(e => col(e._1)): _*)
      .withColumn("dup4_ppm",
        when(col("n_grams") > 0,
          expr("CAST(1000000 * (n_grams - n_distinct_grams) " +
            "DIV n_grams AS BIGINT)")).otherwise(0L))
  }

  /** Per-SOURCE compressibility rollup (round 8 — the q96
    * registration's oracle-hashable surface): corpus-level
    * duplicate-4-gram mass per source, the "which feed is sending us
    * machine-generated sludge" triage view that the per-doc q211 rows
    * roll up into. The real zlib number ([[compressionRatio]]) is
    * engine-specific — DuckDB has no DEFLATE, so it can never be
    * oracle-hashed at ANY quantization; it remains the engine API,
    * association-pinned against `java.util.zip.Deflater` in ScalaTest,
    * while the driver-checked registration publishes this all-integer
    * twin (decision recorded in COVERAGE.md).
    *
    * `dup4_ppm` here is mass-weighted (Σdup DIV Σgrams, NOT the mean
    * of per-doc ratios — big docs count for their size), and
    * `high_dup_docs` counts docs whose per-doc dup share clears
    * `flagPpm` (default 25% — the "suspiciously compressible" bar).
    *
    * Scale shape: the per-doc kernel is map-only; the rollup is one
    * map-side-combined aggregation keyed by source (source cardinality
    * ≪ corpus). No join — the source rides through the kernel select.
    *
    * Output: (source, n_docs, sum_bytes, sum_grams, sum_dup_grams,
    * dup4_ppm, high_dup_docs) — all BIGINT. */
  def compressibilityBySource(docs: DataFrame, idCol: String,
                              textCol: String, srcCol: String,
                              n: Int = 4, flagPpm: Long = 250000L)
      : DataFrame =
    proxyPerDoc(docs, idCol, textCol, n, Seq("src" -> col(srcCol)))
      .groupBy(col("src").as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("sum_bytes"),
        sum(col("n_grams")).as("sum_grams"),
        sum(col("n_grams") - col("n_distinct_grams")).as("sum_dup_grams"),
        sum(when(col("dup4_ppm") >= flagPpm, 1L).otherwise(0L))
          .as("high_dup_docs"))
      .withColumn("dup4_ppm", expr(
        """CAST(CASE WHEN sum_grams > 0
           THEN 1000000 * sum_dup_grams DIV sum_grams
           ELSE CAST(0 AS BIGINT) END AS BIGINT)"""))
      .select(col("source"), col("n_docs"), col("sum_bytes"),
        col("sum_grams"), col("sum_dup_grams"), col("dup4_ppm"),
        col("high_dup_docs"))

  /** FastText-shaped linear text classifier INFERENCE at corpus scale:
    * each word hashes to one of `buckets` feature slots (the portable
    * polynomial char fold), every slot carries a fixed integer weight
    * from a keyed PRF, and the document logit is the plain sum of its
    * words' weights. This is the inference half of the quality-
    * classifier gate every production corpus runs (fastText / logreg
    * over hashed n-grams); training happens offline, the corpus-wide
    * pass is exactly this map-side fold. Weights here are PRF-derived
    * stand-ins (zero-egress — no model artifact), which keeps every
    * arithmetic step integer and the DuckDB oracle bit-exact; swapping
    * in learned weights is a literal-array change.
    *
    * Scale shape: ZERO shuffles — tokenize, hash, weight, and sum are
    * one nested higher-order expression per row; the gate is a
    * map-side filter, the cheapest possible full-corpus pass.
    *
    * Output: (doc_id, n_toks, logit, keep = logit >= 0). */
  def linearScore(docs: DataFrame, idCol: String, textCol: String,
                  buckets: Int): DataFrame = {
    val P = 1000000007L
    def weight(w: Column): Column = {
      val h = org.apache.spark.sql.graft.CharFoldHash.column(w) // native fold, bit-pinned (NativeExprSpec)
      pmod(pmod(h, lit(buckets.toLong)) * 1000003L + 12345L, lit(P)) % 17L - 8L
    }
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        filter(split(lower(col(textCol)), " "), w => w =!= "").as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n_toks"),
        aggregate(transform(col("toks"), weight _), lit(0L), _ + _)
          .as("logit"))
      .withColumn("keep", col("logit") >= 0)
  }

  /** PII scrubbing (the Dolma/CCNet release step): replace emails,
    * NANP-style phone numbers, and IPv4 addresses with typed mask
    * tokens and count what was cut, so downstream stages can gate on
    * residual-PII density. Patterns are deliberately RE2-simple (no
    * lookaround, no backreferences) so Java regex and an RE2-based
    * SQL engine match identical spans; emails are masked FIRST so a
    * digit-bearing mail domain can never be re-matched as a phone or
    * IP fragment, then phones before IPs (disjoint anyway — dashes vs
    * dots — but the order is part of the contract).
    *
    * Output: (doc_id, n_emails, n_phones, n_ips, clean_text) — counts
    * are taken against the text each pattern actually scans (original
    * for emails, email-masked for phones, phone-masked for IPs), i.e.
    * exactly what the replace pass saw.
    *
    * Scale shape: map-only — three codegen'd regexp passes per row,
    * no shuffle, no UDF. */
  def piiScrub(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phone = "\\d{3}-\\d{3}-\\d{4}"
    val ip = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, email, "<EMAIL>")
    val t2 = regexp_replace(t1, phone, "<PHONE>")
    docs.select(col(idCol).as("doc_id"),
      regexp_count(t0, lit(email)).as("n_emails"),
      regexp_count(t1, lit(phone)).as("n_phones"),
      regexp_count(t2, lit(ip)).as("n_ips"),
      regexp_replace(t2, ip, "<IP>").as("clean_text"))
  }

  /** Per-document unigram Shannon entropy (nats) — the low-entropy
    * side catches repetitive junk (keyword stuffing, template spam,
    * "buy buy buy"), complementing [[repetitionSignals]]'s n-gram
    * view with a distribution-level scalar. H = Σ_w −(c_w/N)·ln(c_w/N)
    * over the document's distinct tokens.
    *
    * Exactness: the terms fold left-to-right over the SORTED
    * distinct-token list (both engines fold the identical sequence)
    * and the sum quantizes to DECIMAL(18,6) at publication (ent6).
    * DRIVER-PORTABILITY WARNING (round-8 post-mortem): this column is
    * ENGINE-LOCAL, not oracle-hashable. Rounds 6 and 7 published it
    * quantized at (18,9) then (18,6) and the driver's DuckDB
    * hash-missed BOTH, while local DuckDB matched bit-for-bit — a
    * 1000× coarser guard failing kills the "last-ulp ln" theory; the
    * divergence is the double→DECIMAL cast path itself (engines
    * differ in double→decimal rounding semantics), so NO decimal
    * guard width is provably safe. Do not re-try guard widening.
    * The oracle-hashed registration (q191) publishes the all-integer
    * [[tokenDiversity]] surface instead; this operator remains the
    * engine API for callers who want the entropy value in nats.
    *
    * Scale shape: map-only — per-row HOFs (distinct, sort, counted
    * fold), no shuffle, no UDF. The fold is O(distinct × n) per doc;
    * for pathological vocabulary-heavy docs cap upstream by length
    * (the Gopher gates), not here.
    *
    * Output: (doc_id, n_toks, n_distinct, ent6, low_entropy). */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String,
                   lowBelow: Double): DataFrame = {
    val toks = filter(words(col(textCol)), w => w =!= "")
    docs.select(col(idCol).as("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        array_sort(array_distinct(col("toks"))).as("dts"))
      .select(col("doc_id"),
        size(col("toks")).as("n_toks"),
        size(col("dts")).as("n_distinct"),
        aggregate(
          transform(col("dts"), d => {
            val c = size(filter(col("toks"), t => t === d)).cast("double")
            val n = size(col("toks")).cast("double")
            -(c / n) * log(c / n)
          }),
          lit(0.0), (acc, x) => acc + x)
          .cast("decimal(18,6)").as("ent6"))
      .withColumn("low_entropy", col("ent6") < lowBelow)
  }

  /** All-integer lexical-diversity surface — the oracle-hashable twin
    * of [[tokenEntropy]] (round 8, the q201 convention: zero doubles
    * anywhere in the published row, so the driver hash cannot be
    * perturbed by cross-engine libm or double→DECIMAL cast
    * semantics). Same junk signal, exact arithmetic:
    *
    *  - `ttr_ppm`  = 10⁶·n_distinct DIV n_toks — type/token ratio in
    *    ppm (truncating integer division, identical on HUGEINT).
    *  - `simpson_c2` = Σ_w c_w² — the Simpson-concentration numerator;
    *    λ = Σc²/N² is the probability two random tokens coincide, and
    *    1/λ is the "effective vocabulary". Exact BIGINT.
    *  - `low_diversity` = N > 0 ∧ maxEffVocab·Σc² ≥ N² — i.e.
    *    effective vocabulary ≤ `maxEffVocab` (default 12 ≈ e^2.5, the
    *    same cut the entropy flag drew at 2.5 nats) — an integer
    *    comparison of exact integers, bit-stable everywhere. Empty
    *    docs flag false here (length gates own that regime).
    *
    * Scale shape: identical to [[tokenEntropy]] — map-only per-row
    * HOFs (distinct, counted fold), no shuffle, no UDF; O(distinct×n)
    * per doc, capped upstream by the Gopher length gates.
    *
    * Output: (doc_id, n_toks, n_distinct, ttr_ppm, simpson_c2,
    * low_diversity) — BIGINTs + one boolean. */
  def tokenDiversity(docs: DataFrame, idCol: String, textCol: String,
                     maxEffVocab: Int = 12): DataFrame = {
    val toks = filter(words(col(textCol)), w => w =!= "")
    docs.select(col(idCol).as("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        array_sort(array_distinct(col("toks"))).as("dts"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        size(col("dts")).cast("long").as("n_distinct"),
        aggregate(
          transform(col("dts"),
            d => size(filter(col("toks"), t => t === d)).cast("long")),
          lit(0L), (acc, c) => acc + c * c).as("simpson_c2"))
      .withColumn("ttr_ppm", expr(
        """CAST(CASE WHEN n_toks > 0
           THEN 1000000 * n_distinct DIV n_toks
           ELSE CAST(0 AS BIGINT) END AS BIGINT)"""))
      .withColumn("low_diversity",
        col("n_toks") > 0 &&
          col("simpson_c2") * maxEffVocab >= col("n_toks") * col("n_toks"))
      .select(col("doc_id"), col("n_toks"), col("n_distinct"),
        col("ttr_ppm"), col("simpson_c2"), col("low_diversity"))
  }

  /** Pointwise-mutual-information collocations (Church & Hanks 1990):
    * adjacent word pairs whose joint frequency beats the independence
    * expectation, PMI = ln(c₁₂·T / (c₁·c₂)) — the corpus-level
    * multi-word-expression miner ("new york", "machine learning")
    * that feeds tokenizer vocab decisions and phrase-aware dedup.
    * `minCount` kills the low-count PMI explosion (a hapax pair has
    * spuriously maximal PMI); output is the global top-`topK` by
    * (ratio_ppm DESC, w1, w2).
    *
    * Exactness (round 8, the q201 all-integer convention): ln is
    * MONOTONE, so ranking by PMI = ln(c₁₂·T/(c₁·c₂)) is ranking by
    * the exact rational c₁₂·T/(c₁·c₂) — no logarithm needs to exist
    * anywhere in the published row. We publish
    * `ratio_ppm = (c₁₂·T·10⁶) DIV (c₁·c₂)` — truncating integer
    * division of exact integers staged in DECIMAL(38,0) (the oracle
    * mirrors in HUGEINT, whose `//` truncates identically) — and the
    * top-k orders on (ratio_ppm DESC, w1, w2). Rounds 6–7 published
    * an ln quantized at (18,9) then (18,6) and the driver's DuckDB
    * hash-missed BOTH while local DuckDB was bit-green: the failure
    * is double→DECIMAL cast semantics, not an ln ulp, so no guard
    * width fixes it — only removing the double does. Callers who
    * want nats take ln(ratio_ppm)−ln(10⁶) themselves. Range
    * contract: c₁₂·T·10⁶ must fit DECIMAL(38,0) (T ≤ 10¹⁵ is safe)
    * and ratio_ppm ≤ Long.MaxValue (ratio ≤ T/minCount, so any
    * minCount ≥ 1 at T ≤ 10¹² is safe; e^PMI rarely exceeds 10⁹).
    *
    * Scale shape: bigram assembly is map-only; both count
    * aggregations are map-side combined and bounded by vocab/bigram
    * cardinality, not corpus rows; T is a one-row broadcast; the two
    * unigram-count joins hash on the word; the final top-k is
    * TakeOrderedAndProject (per-partition heaps), never a global
    * sort. */
  def pmiCollocations(docs: DataFrame, idCol: String, textCol: String,
                      minCount: Int, topK: Int): DataFrame = {
    val toks = filter(words(col(textCol)), w => w =!= "")
    val base = docs.select(col(idCol).as("doc_id"), toks.as("w"))
    val biAll = base.filter(size(col("w")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("w")) - 2),
        i => struct(element_at(col("w"), i + 1).as("w1"),
          element_at(col("w"), i + 2).as("w2")))).as("t"))
      .groupBy(col("t.w1").as("w1"), col("t.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))
    // T counts ALL bigrams — the independence model normalizes over
    // the corpus, not over the pairs that survive the count floor
    val total = biAll.agg(sum(col("c12")).as("t_bi"))
    val bi = biAll.filter(col("c12") >= minCount)
    val uni = base.select(explode(col("w")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    bi
      .join(uni.select(col("tok").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("c12"),
        expr("""CAST((CAST(c12 AS DECIMAL(38,0)) * t_bi * 1000000)
               DIV (CAST(c1 AS DECIMAL(38,0)) * c2) AS BIGINT)""")
          .as("ratio_ppm"))
      .orderBy(col("ratio_ppm").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Vocabulary-growth (Heaps-law) curve: cumulative distinct types
    * vs cumulative tokens in corpus (doc_id) order — the diagnostic
    * that says whether a crawl is still discovering vocabulary or has
    * saturated (flattening curve ⇒ more of the same; the classic
    * basis for "how much more data is worth collecting").
    *
    * The naive form (cumulative COUNT DISTINCT) is intractable at
    * scale; this restates it exactly: a type enters the vocabulary at
    * its FIRST document, so cum_vocab(d) = #tokens whose min(doc_id)
    * ≤ d — one vocab-bounded aggregation for the first-occurrence
    * histogram, then ONE two-phase prefix scan ([[Curation
    * .globalCumsums]]) carrying token mass and new-type counts
    * together. All integer exact.
    *
    * Output per document, in id order: (doc_id, n_toks, new_types,
    * cum_tokens, cum_vocab). */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = filter(words(col(textCol)), w => w =!= "")
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      toks.as("toks"))
    val firsts = base
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("tok").agg(min(col("doc_id")).as("first_doc"))
      .groupBy(col("first_doc").as("doc_id"))
      .agg(count(lit(1)).as("new_types"))
    val perDoc = base
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_toks"))
      .join(firsts, Seq("doc_id"), "left")
      .na.fill(0L, Seq("new_types"))
    Curation.globalCumsums(perDoc, "doc_id",
      Seq("n_toks" -> "cum_tokens", "new_types" -> "cum_vocab"))
  }

  /** Token burstiness (Church & Gale 1995): exact variance-to-mean
    * ratio of a token's per-document counts over the WHOLE corpus
    * (zeros included) — VMR ≈ 1 is Poisson scatter (function words),
    * VMR ≫ 1 means the token clumps into few documents (topical/
    * template terms). The signal separates content-bearing vocabulary
    * from glue without any model.
    *
    * Exact integer fixed point: with N docs, C total occurrences, S =
    * Σ_d c_d², VMR = var/mean = (N·S − C²)/(N·C), published as
    * vmr_ppm = 10⁶·(N·S − C²) DIV (N·C) — numerator ≥ 0 by
    * Cauchy-Schwarz, so floor division agrees across engines. Bounds:
    * N·S and 10⁶·(N·S − C²) must stay < 2⁶³ — shard or rescale past
    * ~10⁹ doc-occurrences per token.
    *
    * Shape: one (token, doc) count aggregation, one vocab-bounded
    * rollup, a one-row N broadcast, and a TakeOrderedAndProject
    * top-k. Output: top-`topK` by (vmr_ppm DESC, tok) among tokens
    * in ≥ `minDf` docs: (tok, df, total, max_in_doc, vmr_ppm). */
  def burstiness(docs: DataFrame, idCol: String, textCol: String,
                 minDf: Int, topK: Int): DataFrame = {
    val toks = filter(words(col(textCol)), w => w =!= "")
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      toks.as("toks"))
    val nDocs = base.agg(count(lit(1)).as("n_docs"))
    val perDoc = base
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("tok", "doc_id").agg(count(lit(1)).as("c"))
    perDoc.groupBy("tok")
      .agg(count(lit(1)).as("df"), sum(col("c")).as("total"),
        sum(col("c") * col("c")).as("s2"), max(col("c")).as("max_in_doc"))
      .filter(col("df") >= minDf)
      .crossJoin(broadcast(nDocs))
      .select(col("tok"), col("df"), col("total"), col("max_in_doc"),
        expr("CAST(1000000 * (n_docs * s2 - total * total) " +
          "DIV (n_docs * total) AS BIGINT)").as("vmr_ppm"))
      .orderBy(col("vmr_ppm").desc, col("tok"))
      .limit(topK)
  }

  /** Trending tokens: the largest relative-rate shifts between the
    * old half and the recent half of the corpus (split at the exact
    * integer midpoint of the id range) — the drift monitor that names
    * WHICH vocabulary moved when q154's KL score says something did.
    * Laplace-smoothed exact integer odds: trend_ppm = 10⁶·(c_new+1)·
    * T_old DIV ((c_old+1)·T_new), where T_old/T_new are the halves'
    * token masses — >10⁶ means over-represented recently. A `minNew`
    * floor keeps noise tokens out. Exact while 10⁶·(c_new+1)·T_old <
    * 2⁶³ — shard by token range or drop to ‰ scaling past ~10¹²
    * token-mass products.
    *
    * Shape: one token aggregation with the half flag fused (so old
    * and new counts come out of a single vocab-bounded pass), scalar
    * totals broadcast, TakeOrderedAndProject top-k.
    *
    * Output: top-`topK` by (trend_ppm DESC, tok): (tok, c_old, c_new,
    * trend_ppm). */
  def trendingTokens(docs: DataFrame, idCol: String, textCol: String,
                     minNew: Int, topK: Int): DataFrame = {
    val toks = filter(words(col(textCol)), w => w =!= "")
    val ids = docs.agg(min(col(idCol)).as("lo"), max(col(idCol)).as("hi"))
      .select(expr("CAST((lo + hi) DIV 2 AS BIGINT)").as("mid"))
    val tagged = docs.crossJoin(broadcast(ids))
      .select((col(idCol) > col("mid")).as("recent"),
        explode(toks).as("tok"))
    val counts = tagged.groupBy("tok")
      .agg(sum(when(!col("recent"), 1L).otherwise(0L)).as("c_old"),
        sum(when(col("recent"), 1L).otherwise(0L)).as("c_new"))
    val totals = counts.agg(sum(col("c_old")).as("t_old"),
      sum(col("c_new")).as("t_new"))
    counts.filter(col("c_new") >= minNew)
      .crossJoin(broadcast(totals))
      .select(col("tok"), col("c_old"), col("c_new"),
        expr("CAST(1000000 * (c_new + 1) * t_old " +
          "DIV ((c_old + 1) * t_new) AS BIGINT)").as("trend_ppm"))
      .orderBy(col("trend_ppm").desc, col("tok"))
      .limit(topK)
  }

  /** Hapax-legomena mass per group — the Good–Turing estimate of
    * UNSEEN vocabulary probability (p₀ ≈ n₁/N, Gale & Sampson 1995):
    * how much of a source's token stream is words seen exactly once,
    * i.e. how open its vocabulary still is. High hapax share ⇒ the
    * corpus slice keeps producing novel types (diverse, or noisy);
    * near zero ⇒ closed/templated vocabulary. Published as exact ppm
    * integer fixed point.
    *
    * Output per group: (group, n_tokens, vocab, n_hapax,
    * unseen_mass_ppm = 10⁶·n₁ DIV N, hapax_share_ppm = 10⁶·n₁ DIV
    * vocab).
    *
    * Scale shape: one (group, token) aggregation (map-side combined,
    * bounded by group-vocab cardinality) then a per-group rollup —
    * two shuffles end to end, nothing corpus-sized after the first. */
  def hapaxMass(docs: DataFrame, idCol: String, textCol: String,
                groupCol: String): DataFrame =
    docs.select(col(groupCol).as("grp"),
        explode(filter(words(col(textCol)), w => w =!= "")).as("tok"))
      .groupBy("grp", "tok").agg(count(lit(1)).as("c"))
      .groupBy("grp")
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("grp"), col("n_tokens"), col("vocab"), col("n_hapax"),
        expr("CAST(1000000 * n_hapax DIV n_tokens AS BIGINT)")
          .as("unseen_mass_ppm"),
        expr("CAST(1000000 * n_hapax DIV vocab AS BIGINT)")
          .as("hapax_share_ppm"))

  /** Cyrillic/Greek → Latin homoglyph map (a curated core of UTS #39's
    * confusables table: the letters that render identically to Latin
    * in most fonts). Order is paired: confusables(i) folds to
    * latinFor(i). */
  private[graft] val confusables =
    "аеорсхуіѕԁοασνΑΒΕΖΗΙΚΜΝΟΡΤΥΧ"
  private[graft] val latinFor =
    "aeopcxyisdoasvabezhikmnoptyx"

  /** Confusable-skeleton fold (UTS #39 spoof detection, the working
    * core): map Cyrillic/Greek homoglyphs onto their Latin twins and
    * flag documents whose text CHANGES under the fold while also
    * containing real Latin letters — the "pаypаl" attack shape
    * (Cyrillic а inside a Latin word), which [[scriptProfile]] sees
    * only as "document has two scripts" and legitimate bilingual text
    * triggers constantly; the skeleton test is per-character and
    * catches the splice exactly. The skeleton is also the right
    * JOIN KEY for spoof-aware dedup: spoofed and clean variants
    * collide after folding.
    *
    * Scale shape: map-only — one translate (codegen'd char map), one
    * per-char membership count, no shuffle, no UDF.
    *
    * Output: (doc_id, n_confusables, skeleton, suspicious). */
  def confusableSkeleton(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val confSet = confusables.map(_.toString)
    val t = col(textCol)
    docs.select(col(idCol).as("doc_id"),
        size(filter(split(t, ""), c => c.isInCollection(confSet)))
          .cast("long").as("n_confusables"),
        translate(t, confusables, latinFor).as("skeleton"),
        (t.rlike("[A-Za-z]")).as("has_latin"))
      .withColumn("suspicious",
        col("n_confusables") > 0 && col("has_latin"))
      .select("doc_id", "n_confusables", "skeleton", "suspicious")
  }

  /** Unicode-script classes for [[scriptProfile]], in canonical
    * (tie-break) order: a dominant-script tie resolves to the EARLIER
    * entry. BMP ranges only — see the astral-plane note below. */
  private val scriptClasses: Seq[(String, Int, Int)] = Seq(
    // (name, lo, hi) inclusive codepoint ranges; latin checks two
    // ranges (handled specially), the rest are single blocks
    ("greek",      0x0370, 0x03FF),
    ("cyrillic",   0x0400, 0x04FF),
    ("arabic",     0x0600, 0x06FF),
    ("devanagari", 0x0900, 0x097F),
    ("kana",       0x3040, 0x30FF),
    ("cjk",        0x4E00, 0x9FFF),
    ("hangul",     0xAC00, 0xD7A3))

  /** Per-document Unicode-script profile — the script-level companion
    * to the stopword [[langId]]: character counts per script block
    * (Latin, Greek, Cyrillic, Arabic, Devanagari, Kana, CJK, Hangul)
    * plus digits/whitespace/other, the dominant letter script, and
    * its ppm share of all letter characters. The standard multilingual
    * curation signal: routing docs to per-script tokenizers, flagging
    * mixed-script spam (Cyrillic lookalikes in Latin text), and
    * auditing a corpus's claimed language mix against its bytes —
    * n-gram langid (q18) sees words, this sees writing systems, and
    * disagreement between the two is itself a quality signal.
    *
    * Exactness: all-integer (counts, truncating ppm division); the
    * dominant-script argmax tie-breaks to the canonical class order
    * via a single array_sort over (−count, order) structs (the q18
    * argmax pattern). `dominant_script = 'none'` when a document has
    * no letter characters at all.
    *
    * Astral-plane contract: classification is per UTF-16 unit on the
    * Spark side (split("") yields surrogate halves) and per codepoint
    * in engines with real codepoint iteration — both land astral
    * chars in `other`, but with multiplicity 2 vs 1. BMP text (all
    * the listed scripts) is engine-exact; corpora with substantial
    * astral content (emoji walls) should gate on `other` share, not
    * its exact count.
    *
    * Scale shape: map-only — one split + one codepoint transform per
    * row, counters folded in ONE aggregate pass over an int-array
    * accumulator (the class histogram), so the char array appears
    * once in the plan and CollapseProject cannot re-evaluate the
    * per-char lambda per class (the q202 lesson). No shuffle, no UDF.
    *
    * Output: (doc_id, n_chars, latin, digit, greek, cyrillic, arabic,
    * devanagari, kana, cjk, hangul, space, other, dominant_script,
    * dominant_ppm). */
  def scriptProfile(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val nClasses = 11 // latin, digit, 7 blocks, space, other
    // class index per codepoint: 0 latin, 1 digit, 2..8 blocks in
    // scriptClasses order, 9 space, 10 other
    def classOf(cp: Column): Column = {
      val blocks = scriptClasses.zipWithIndex.foldRight(lit(10): Column) {
        case (((_, lo, hi), i), rest) =>
          when(cp >= lo && cp <= hi, lit(i + 2)).otherwise(rest)
      }
      when((cp >= 65 && cp <= 90) || (cp >= 97 && cp <= 122), 0)
        .when(cp >= 48 && cp <= 57, 1)
        .when(cp === 32 || (cp >= 9 && cp <= 13), 9)
        .otherwise(blocks)
    }
    val chars = filter(split(col(textCol), ""), c => c =!= "")
    val zero = array((0 until nClasses).map(_ => lit(0L)): _*)
    val hist = aggregate(
      transform(chars, c => classOf(ascii(c))),
      zero,
      (acc, cls) => transform(acc,
        (v, i) => when(i === cls, v + 1L).otherwise(v)))
    val letterNames = "latin" +: scriptClasses.map(_._1)
    val counted = docs.select(col(idCol).as("doc_id"), hist.as("h"))
      .select(col("doc_id"),
        aggregate(col("h"), lit(0L), (a, x) => a + x).as("n_chars"),
        element_at(col("h"), 1).as("latin"),
        element_at(col("h"), 2).as("digit"),
        element_at(col("h"), 3).as("greek"),
        element_at(col("h"), 4).as("cyrillic"),
        element_at(col("h"), 5).as("arabic"),
        element_at(col("h"), 6).as("devanagari"),
        element_at(col("h"), 7).as("kana"),
        element_at(col("h"), 8).as("cjk"),
        element_at(col("h"), 9).as("hangul"),
        element_at(col("h"), 10).as("space"),
        element_at(col("h"), 11).as("other"))
    // dominant letter script: max count, ties to canonical order
    val best = array_sort(array(letterNames.zipWithIndex.map {
      case (n, i) => struct((-col(n)).as("neg"), lit(i).as("ord"),
        lit(n).as("name"))
    }: _*))
    val top = element_at(best, 1)
    val letters = letterNames.map(col).reduce(_ + _)
    counted
      .withColumn("dominant_script",
        when(letters === 0, "none").otherwise(top.getField("name")))
      .withColumn("_top", -top.getField("neg"))
      .withColumn("_letters", letters)
      .withColumn("dominant_ppm",
        when(col("_letters") === 0, 0L).otherwise(
          expr("CAST(1000000 * _top DIV _letters AS BIGINT)")))
      .drop("_top", "_letters")
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004) — unsupervised
    * corpus-level keyword ranking: build the word co-occurrence graph
    * (adjacent CANDIDATE tokens, window 2 — the paper's default after
    * its POS filter, stated here as the portable `^[a-z]{4,}$` gate),
    * symmetrize it, and run the repo's integer-exact [[PageRank]] power
    * iteration over it. Words that many distinct well-connected words
    * sit next to rank highest — the curation-side keyword/topic signal
    * that needs no labels and no model.
    *
    * Determinism: candidate filtering, adjacency, and edge weights are
    * exact counts; ranks are [[PageRank.run]]'s bigint recurrence, so
    * the oracle unrolls the iterations as CTEs (the q102 convention)
    * and matches every bit. Ties in the final top-k break on the word.
    *
    * Scale shape: adjacency extraction is MAP-ONLY (one zip of each
    * doc's filtered token array with its own tail, exploded); the edge
    * aggregation is one map-side-combined groupBy over (src, dst) —
    * vocabulary-sized, tiny next to the corpus; each PageRank round is
    * the fixed two-exchange pattern over that edge list; the top-k is
    * TakeOrderedAndProject (per-partition heads + k-row driver merge),
    * never a global sort.
    *
    * Output: (word, pagerank_scaled, kw_rank), top `topK` by rank desc
    * then word asc. */
  def textRankKeywords(docs: DataFrame, idCol: String, textCol: String,
                       iters: Int = 3, topK: Int = 25): DataFrame = {
    val cand = filter(words(col(textCol)),
      t => t.rlike("^[a-z]{4,}$"))
    val adj = docs
      .select(cand.as("f"))
      .filter(size(col("f")) >= 2)
      .select(explode(arrays_zip(
        slice(col("f"), lit(1), size(col("f")) - 1).as("x"),
        slice(col("f"), lit(2), size(col("f")) - 1).as("y"))).as("p"))
      .select(col("p.x").as("a"), col("p.y").as("b"))
      .filter(col("a") =!= col("b"))
    val edges = adj
      .union(adj.select(col("b").as("a"), col("a").as("b")))
      .groupBy(col("a").as("src"), col("b").as("dst"))
      .agg(count(lit(1)).as("w"))
    PageRank.run(edges, iters)
      .select(col("node").as("word"), col("pagerank_scaled"))
      .orderBy(col("pagerank_scaled").desc, col("word").asc)
      .limit(topK)
      .withColumn("kw_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("pagerank_scaled").desc, col("word").asc)))
  }
}
