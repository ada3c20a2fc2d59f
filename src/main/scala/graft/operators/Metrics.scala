package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed model-evaluation metrics — the offline-eval half of a
  * training pipeline (rank a candidate list, score a classifier)
  * computed as grouped window + fold shapes so a 100 TB eval table
  * needs exactly one shuffle per metric.
  *
  * Exactness conventions: every sum that feeds a published number is
  * either pure INTEGER arithmetic (AUC's rank-sum — ties handled in
  * the doubled-rank domain so nothing ever halves early) or a
  * deterministically ORDERED left fold over a per-group sorted array
  * (NDCG's discounted gains — the q148 ordered-fold convention), so
  * partial-aggregation order cannot perturb a bit and a SQL oracle
  * reproduces both metrics exactly. */
object Metrics {

  /** NDCG@k per group: predicted ranking = `score` descending (ties →
    * smaller `id` first), gain = `rel` (≥ 0 integer), discount
    * 1/log2(rank+1). IDCG@k takes the best k relevances of the WHOLE
    * group, not of the predicted top-k. Groups with no relevant item
    * get ndcg = 0.
    *
    * Shape: two row_number windows over the same group exchange (one
    * sort by predicted order, one by ideal order), a `rank ≤ k`
    * filter BEFORE the aggregation (only ≤ 2k rows per group survive
    * the shuffle into the fold), then one groupBy folding the two
    * sorted (rank, rel) arrays left-to-right: aggregate(…, 0.0, acc +
    * rel / (ln(rank+1)/ln 2)) — log2 spelled as ln/ln so the oracle's
    * arithmetic is token-identical. Both discounted sums quantize to
    * DECIMAL(18,9) before publication (the lnp9 convention): JVM
    * StrictMath.log and libm log disagree by 1 ulp on some arguments
    * (measured at ln 3), and the quantization absorbs it; the ndcg
    * ratio divides the QUANTIZED terms so its inputs are bit-identical
    * across engines.
    *
    * Output: (group, dcg, idcg, ndcg). */
  def ndcgAtK(df: DataFrame, groupCol: String, idCol: String,
              scoreCol: String, relCol: String, k: Int): DataFrame = {
    val wPred = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val wIdeal = Window.partitionBy(col(groupCol))
      .orderBy(col(relCol).desc, col(idCol).asc)
    def fold(xs: Column): Column =
      aggregate(xs, lit(0.0), (acc, x) =>
        acc + x.getField("rel").cast("double") /
          (log(x.getField("rk").cast("double") + 1.0) / log(lit(2.0))))
    df
      .withColumn("_pr", row_number().over(wPred))
      .withColumn("_ir", row_number().over(wIdeal))
      .filter(col("_pr") <= k || col("_ir") <= k)
      .groupBy(col(groupCol))
      .agg(
        array_sort(collect_list(when(col("_pr") <= k,
          struct(col("_pr").as("rk"), col(relCol).as("rel"))))).as("ps"),
        array_sort(collect_list(when(col("_ir") <= k,
          struct(col("_ir").as("rk"), col(relCol).as("rel"))))).as("is"))
      .select(col(groupCol),
        fold(col("ps")).cast("decimal(18,9)").cast("double").as("dcg"),
        fold(col("is")).cast("decimal(18,9)").cast("double").as("idcg"))
      .withColumn("ndcg",
        when(col("idcg") > 0, col("dcg") / col("idcg")).otherwise(lit(0.0)))
  }

  /** Calibration (reliability-diagram) bins: equal-width bins over
    * min-max-normalized scores, each reporting size, positive
    * fraction (accuracy), mean normalized score (confidence), and
    * their gap — the per-bin terms of expected calibration error
    * (weight by n/Σn and sum |gap| downstream for the ECE scalar).
    *
    * Exactness: the per-bin score mean sums DECIMAL(18,2)-cast scores
    * (order-free exact decimal arithmetic — a double sum would vary
    * with partial-aggregation order), and confidence derives from
    * that exact mean by linearity: mean((s−mn)/(mx−mn)) =
    * (mean(s)−mn)/(mx−mn), so no normalized double is ever summed.
    * acc = n_pos/n divides exact integers. min/max are scalar
    * aggregates broadcast back over the table (one tiny frame — the
    * normalization constants), so binning itself is map-side.
    *
    * `scoreScale` sets the decimal quantization of each summed score:
    * 2 suits money-valued scores (exact at cents), 18 suits the
    * canonical calibration input (probabilities in [0,1], where a
    * 0.01 quantum would bias conf/gap by up to 0.005 — material next
    * to typical ECE magnitudes). Precision is fixed at 38 so the sum
    * never narrows.
    *
    * Output: (bin, n, n_pos, mean_score, acc, conf, gap). */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
                      bins: Int, scoreScale: Int = 2): DataFrame = {
    val stats = df.agg(min(col(scoreCol)).as("mn"), max(col(scoreCol)).as("mx"))
    val lbl = col(labelCol).cast("boolean")
    df.crossJoin(broadcast(stats))
      .withColumn("bin",
        when(col("mx") > col("mn"),
          least(floor(((col(scoreCol) - col("mn")) /
              (col("mx") - col("mn"))) * bins), lit(bins - 1)))
          .otherwise(lit(0)).cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(lbl, 1L).otherwise(0L)).as("n_pos"),
        sum(col(scoreCol).cast(s"decimal(38,$scoreScale)")).as("ssum"),
        first(col("mn")).as("mn"), first(col("mx")).as("mx"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("ssum").cast("double") / col("n")).as("mean_score"),
        (col("n_pos").cast("double") / col("n")).as("acc"),
        ((col("ssum").cast("double") / col("n") - col("mn")) /
          (col("mx") - col("mn"))).as("conf"))
      .withColumn("gap", col("acc") - col("conf"))
  }

  /** ROC-AUC per group by the Mann–Whitney rank-sum, ties averaged —
    * the probability a random positive outscores a random negative.
    *
    * Tie handling stays INTEGER: with rmin = min-rank of a score tie
    * (ascending `rank()`) and tc = tie size, the average rank is
    * (2·rmin + tc − 1)/2 — so Σ_pos doubled-average-ranks S2 =
    * Σ_pos (2·rmin + tc − 1) is an exact bigint, and
    * AUC = (S2 − np·(np+1)) / (2·np·nn) divides two exact integers
    * once at the end (U-statistic with both halvings folded into the
    * single division). Groups with no positives or no negatives get
    * NULL (AUC undefined).
    *
    * Shape: rank() + tie-count windows over one group exchange, then
    * a grouped integer sum — one shuffle end to end.
    *
    * Output: (group, n_pos, n_neg, auc). */
  def rocAuc(df: DataFrame, groupCol: String, scoreCol: String,
             labelCol: String): DataFrame = {
    val wRank = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol).asc)
    val wTie = Window.partitionBy(col(groupCol), col(scoreCol))
    val lbl = col(labelCol).cast("boolean")
    df
      .withColumn("_r2",
        // rank() is IntegerType; double it in LONG so groups past 2^30
        // rows can't wrap before the later promotion.
        lit(2L) * rank().over(wRank).cast("long") +
          count(lit(1)).over(wTie) - 1)
      .groupBy(col(groupCol))
      .agg(
        sum(when(lbl, col("_r2"))).as("s2"),
        sum(when(lbl, 1L).otherwise(0L)).as("n_pos"),
        sum(when(!lbl, 1L).otherwise(0L)).as("n_neg"))
      .select(col(groupCol), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("s2") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
            (lit(2) * col("n_pos") * col("n_neg")).cast("double"))
          .as("auc"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of two
    * GLOBAL rankings — the hybrid-retrieval merge (lexical rank ⊕
    * vector rank) that needs no score calibration, only rank
    * positions. Both orderings sort ASCENDING on their key with the
    * id as tie-break (negate a score to rank descending), so each is
    * a total order; the fused score is exact integer fixed point,
    * rrf_scaled = Σᵢ 10¹² DIV (k + rankᵢ(d)) — no float division, so
    * any SQL engine replays it bit-for-bit.
    *
    * Output: (id, rank_a, rank_b, rrf_scaled).
    *
    * Scale shape: each ranking is [[Curation.globalRowIds]] — the
    * range-partition + zipWithIndex global ordinal, NOT a
    * single-partition window — then one equi-join on the id. */
  def rrfFusion(df: DataFrame, idCol: String, keyA: Column, keyB: Column,
                k: Int): DataFrame = {
    val base = df.select(col(idCol).as("id"), keyA.as("ka"), keyB.as("kb"))
    val ra = Curation.globalRowIds(
        base.select(col("id"), col("ka")), Seq("ka", "id"))
      .select(col("id"), col("global_id").cast("int").as("rank_a"))
    val rb = Curation.globalRowIds(
        base.select(col("id"), col("kb")), Seq("kb", "id"))
      .select(col("id"), col("global_id").cast("int").as("rank_b"))
    ra.join(rb, Seq("id"))
      .select(col("id").as(idCol), col("rank_a"), col("rank_b"),
        expr(s"CAST(1000000000000 DIV ($k + rank_a) + " +
          s"1000000000000 DIV ($k + rank_b) AS BIGINT)").as("rrf_scaled"))
  }

  /** Precision-recall curve by full threshold sweep: one row per
    * DISTINCT score, reporting the confusion counts and P/R/F1 of
    * the classifier "positive iff score ≥ thr". The sweep is how a
    * quality-filter threshold is actually chosen (pick the operating
    * point, read off the kept-volume/precision trade), and every
    * number is exact: counts are bigints off one aggregation, and
    * the ratios publish as parts-per-million integer fixed point
    * (10⁶·x DIV y), so any engine replays the curve bit-for-bit.
    *
    * Shape: groupBy(score) collapses the corpus to ≤ #distinct-score
    * rows (one shuffle, map-side combined); the descending cumulative
    * TP/scanned counts ride ONE [[Curation.globalCumsums]] two-phase
    * prefix scan over that collapsed frame (both counters in the
    * same pass — no single-partition window, no second sort); the
    * positive total joins back as a broadcast scalar.
    *
    * Contract: `scoreCol` must be an INTEGRAL column (the integer
    * logits of [[TextAnalysis.linearScore]], a ppm fixed point, …) —
    * enforced with a schema check, not a silent cast, because a
    * float score silently floored to long would collapse distinct
    * thresholds (0.5 and 0.3 → one row) and publish a wrong curve.
    * Fix-point fractional scorers upstream (×10⁶ → BIGINT) to sweep
    * them.
    *
    * Output: (thr, tp, fp, fn, prec_ppm, rec_ppm, f1_ppm),
    * descending thr ⇔ ascending scan order. */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    require(Seq("byte", "short", "int", "long", "integer", "bigint",
        "smallint", "tinyint")
        .contains(df.schema(scoreCol).dataType.typeName),
      s"prCurve sweeps one row per DISTINCT integer score; '$scoreCol' is " +
        s"${df.schema(scoreCol).dataType.typeName}. Fixed-point it upstream " +
        "(e.g. CAST(score * 1000000 AS BIGINT)) so thresholds don't " +
        "collapse under a silent floor.")
    val lbl = col(labelCol).cast("boolean")
    val perScore = df.groupBy(col(scoreCol).cast("long").as("thr"))
      .agg(count(lit(1)).as("n"),
        sum(when(lbl, 1L).otherwise(0L)).as("np"))
      .withColumn("neg_thr", -col("thr"))
    val swept = Curation.globalCumsums(perScore, "neg_thr",
      Seq("n" -> "scanned", "np" -> "tp"))
    val totals = df.agg(sum(when(lbl, 1L).otherwise(0L)).as("p_all"))
    swept.crossJoin(broadcast(totals))
      .select(col("thr"), col("tp"),
        (col("scanned") - col("tp")).as("fp"),
        (col("p_all") - col("tp")).as("fn"),
        expr("CAST(1000000 * tp DIV scanned AS BIGINT)").as("prec_ppm"),
        when(col("p_all") > 0,
          expr("CAST(1000000 * tp DIV p_all AS BIGINT)")).as("rec_ppm"),
        expr("CAST(2000000 * tp DIV (scanned + p_all) AS BIGINT)")
          .as("f1_ppm"))
  }

  /** The [[prCurve]] sweep collapsed to its argmax-F1 operating point
    * — the row a quality-filter threshold actually gets set from.
    * Ties break toward the HIGHER (stricter) threshold: when two
    * operating points trade equally, keep less. One extra
    * TakeOrderedAndProject over the ≤ #distinct-score sweep frame. */
  def bestF1Threshold(df: DataFrame, scoreCol: String,
                      labelCol: String): DataFrame =
    prCurve(df, scoreCol, labelCol)
      .orderBy(col("f1_ppm").desc, col("thr").desc)
      .limit(1)

  /** Cohen's kappa — chance-corrected agreement between two labelers
    * (annotator-vs-annotator, or classifier-vs-gold in a labeling
    * QA pass). Exact integer throughout: with N pairs, D agreeing,
    * and S = Σ_l rowTotal(l)·colTotal(l), kappa = (N·D − S)/(N² − S)
    * — the po/pe definition with both denominators cleared — and the
    * published fixed point rounds toward zero on BOTH engines by
    * dividing magnitudes only (DuckDB's // floors, Spark's DIV
    * truncates; they agree on non-negatives, so the sign is applied
    * after the DIV). Exact while N·max(D, S/N) < 2⁶³ — ~3·10⁹ rows;
    * shard the confusion matrix beyond that.
    *
    * Shape: one groupBy(labelA, labelB) shuffle collapses the corpus
    * to ≤ |labels|² cells; marginals, S, and kappa all derive from
    * that bounded frame.
    *
    * Output: one row (n, d, s, po_ppm, pe_ppm, kappa_ppm). */
  def cohenKappa(df: DataFrame, raterA: String, raterB: String): DataFrame = {
    val cells = df.groupBy(col(raterA).as("la"), col(raterB).as("lb"))
      .agg(count(lit(1)).as("c"))
    val ra = cells.groupBy("la").agg(sum(col("c")).as("ra"))
    val cb = cells.groupBy("lb").agg(sum(col("c")).as("cb"))
    val sRow = ra.join(cb, col("la") === col("lb"))
      .agg(coalesce(sum(col("ra") * col("cb")), lit(0L)).as("s"))
    cells.agg(sum(col("c")).as("n"),
        coalesce(sum(when(col("la") === col("lb"), col("c"))), lit(0L))
          .as("d"))
      .crossJoin(sRow)
      .select(col("n"), col("d"), col("s"),
        expr("CAST(1000000 * d DIV n AS BIGINT)").as("po_ppm"),
        expr("CAST(1000000 * s DIV (n * n) AS BIGINT)").as("pe_ppm"),
        when(col("n") * col("n") === col("s"), lit(1000000L))
          .otherwise(expr(
            """CAST(CASE WHEN n * d - s >= 0
              |  THEN 1000000 * (n * d - s) DIV (n * n - s)
              |  ELSE -(1000000 * (s - n * d) DIV (n * n - s)) END
              |AS BIGINT)""".stripMargin)).as("kappa_ppm"))
  }

  /** First-order Markov next-event prediction, trained and evaluated
    * on DISJOINT user populations — the minimal instance of the
    * train/eval split discipline every sequence model needs: fit
    * argmax transition targets on training users' event streams,
    * score top-1 accuracy on held-out users' actual transitions. The
    * accuracy is the baseline any sequence model must beat; per-state
    * rows expose WHERE the baseline is already strong.
    *
    * Determinism: transitions order by (ts, id) — a total order per
    * user; the argmax target ties-break by target name; accuracy is
    * exact-integer ppm. The holdout is the keyed split user % 5 = 0
    * (a fixed hash-style rule, engine-replayable).
    *
    * Scale shape: one window exchange per user stream builds the
    * transitions; the model aggregation is bounded by |states|²; the
    * model joins back BROADCAST (tiny); one grouped integer sum per
    * state. WindowGroupLimit prunes the argmax rank.
    *
    * Output per state: (event_type, n_test, n_hits, acc_ppm). */
  def markovNextEventEval(events: DataFrame, userCol: String,
                          typeCol: String, tsCol: String,
                          idCol: String): DataFrame = {
    val wSeq = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val trans = events
      .withColumn("next_type", lead(col(typeCol), 1).over(wSeq))
      .filter(col("next_type").isNotNull)
      .select(col(userCol).as("uid"), col(typeCol).as("cur"),
        col("next_type"))
    val train = trans.filter(pmod(col("uid"), lit(5)) =!= 0)
    val test = trans.filter(pmod(col("uid"), lit(5)) === 0)
    val wArg = Window.partitionBy(col("cur"))
      .orderBy(col("n_train").desc, col("next_type").asc)
    val model = train.groupBy("cur", "next_type")
      .agg(count(lit(1)).as("n_train"))
      .withColumn("rk", row_number().over(wArg))
      .filter(col("rk") === 1)
      .select(col("cur"), col("next_type").as("pred"))
    test.join(broadcast(model), Seq("cur"))
      .groupBy(col("cur").as("event_type"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("next_type") === col("pred"), 1L).otherwise(0L))
          .as("n_hits"))
      .select(col("event_type"), col("n_test"), col("n_hits"),
        expr("CAST(1000000 * n_hits DIV n_test AS BIGINT)").as("acc_ppm"))
  }

  /** Welch's unequal-variance t-test between two arms — the A/B
    * significance primitive (experiment readouts, filter-change
    * impact checks) as one distributed aggregation. `armCol` must be
    * boolean (true = arm A).
    *
    * Exactness — the q112/q189 INTEGER convention, no doubles at all.
    * Round 6 published DECIMAL(18,9)-quantized doubles for t/df and
    * the driver's oracle env hash-missed them even though local DuckDB
    * matched bit-for-bit (a decimal-cast-of-double rounding-mode
    * difference is enough); this publication removes the double path
    * entirely. Per-arm moments are ORDER-FREE exact decimals — Σx at
    * scale 2, Σx² at scale 4 (sums of exactly-representable products,
    * so partial-aggregation order cannot perturb them). Everything
    * downstream is integer arithmetic on DECIMAL(38,0) (the oracle
    * mirrors it in HUGEINT, whose `//` truncates toward zero exactly
    * like Spark's DIV): with S = 100·Σx, Q = 10⁴·Σx², the variance
    * numerator v0 = n·Q − S² is exact, se2·10⁹ = v0·10⁵ div n²(n−1)
    * per arm, Δ·10⁶ = (S_a·n_b − S_b·n_a)·10⁶ div (100·n_a·n_b), and
    *   t²·10⁹  = Δu² ·10⁶ div (se2n_a + se2n_b)
    *   df·10⁹  = (am+bm)²·10⁹ div (am² div (n_a−1) + bm² div (n_b−1))
    * with am/bm the se2n values coarsened to milli (div 10⁶) so the
    * widest intermediate stays < 10³⁸. Each div is a truncating
    * integer division of exact integers — bit-replayable on any
    * engine, no libm, no decimal-from-double cast. The fixed-point
    * truncations (micro mean/Δ, milli df inputs) are documented
    * contract, not noise: both engines truncate identically.
    *
    * Scale shape: ONE map-side-combined aggregation over the corpus
    * (conditional sums per arm); everything after runs on a one-row
    * frame. The cheapest possible full-data test. Requires ≥2 rows
    * per arm (Welch is undefined below that); degenerate arms and
    * zero pooled variance publish NULL t2_9/df9 via NULLIF rather
    * than erroring.
    *
    * VALUE-RANGE CONTRACT (round-8 advisory fix — enforced, not just
    * documented): Spark's DIV lands intermediates in LongType, so
    * extreme inputs could overflow se2n/du/mean/t²/df in Spark while
    * the HUGEINT oracle succeeds — a silent-divergence window with
    * ANSI off, an anonymous mid-DIV error with it. In-plan guards on
    * the one-row frame fail LOUDLY with a named error instead; each
    * condition is exactly "this quotient fits a Long" (margin-rounded
    * to 9.2e18), so there are NO false trips on in-range data:
    * va0 ≤ 9.2e13·n_a²(n_a−1) and the b twin (⇒ se2n fits),
    * |s_a| ≤ 4.6e14·n_a and the b twin (⇒ means and du fit),
    * n_a+n_b ≤ 9e9 (⇒ df·10⁹ fits — arms past nine billion rows
    * need a different df scaling anyway), and du² ≤
    * 9.2e12·(se2n_a+se2n_b) (⇒ t2_9 fits; |t| ≲ 96 000, breached
    * only by near-zero pooled variance under a wide mean gap). The
    * Σx² accumulator itself is capped at DECIMAL(28,4) (10²⁴), which
    * ANSI-errors on its own far past these guards.
    *
    * Output: one row, all BIGINT — (n_a, n_b, mean_a_u, mean_b_u,
    * t_sign, t2_9, df9): means in micro-units, t_sign ∈ {-1,0,1},
    * t2_9 = t²·10⁹ (sign carried separately so the squared form
    * stays sqrt-free), df9 = Welch–Satterthwaite df·10⁹. */
  def welchTTest(df: DataFrame, armCol: String, valueCol: String): DataFrame = {
    val arm = col(armCol)
    val x = col(valueCol).cast("decimal(18,2)")
    val x2 = (x * x).cast("decimal(38,4)")
    def stats(p: Column, suf: String) = Seq(
      sum(when(p, 1L).otherwise(0L)).as(s"n_$suf"),
      sum(when(p, x).otherwise(lit(0).cast("decimal(18,2)")))
        .cast("decimal(18,2)").as(s"sx_$suf"),
      sum(when(p, x2).otherwise(lit(0).cast("decimal(38,4)")))
        .cast("decimal(28,4)").as(s"sx2_$suf"))
    val agg = df.agg((stats(arm, "a") ++ stats(!arm, "b")).head,
      (stats(arm, "a") ++ stats(!arm, "b")).tail: _*)
    // Integer staging: S (cents) and Q (cents²) are integral-valued
    // decimals cast to scale 0; all products stay inside DECIMAL(38,0)
    // by construction (see widths in the docblock).
    def h(c: Column) = c.cast("decimal(38,0)")
    // Wrap a DIV-to-Long with the range-contract check (rng_ok below)
    def grd(inner: String): String =
      s"""CASE WHEN NOT rng_ok
          THEN CAST(raise_error(concat('welchTTest: inputs exceed the ',
            'exact-Long staging range (see the value-range contract ',
            'in the docblock)')) AS BIGINT)
          ELSE $inner END"""
    agg.select(col("n_a"), col("n_b"),
        h(col("sx_a") * 100).as("s_a"), h(col("sx_b") * 100).as("s_b"),
        h(col("sx2_a") * 10000).as("q_a"),
        h(col("sx2_b") * 10000).as("q_b"))
      .withColumn("va0",
        expr("CAST(n_a AS DECIMAL(38,0)) * q_a - s_a * s_a"))
      .withColumn("vb0",
        expr("CAST(n_b AS DECIMAL(38,0)) * q_b - s_b * s_b"))
      // Value-range guard (round-8 advisory fix): Spark's DIV lands in
      // LongType, so extreme inputs can overflow se2n/du/mean/t² in
      // Spark while the HUGEINT oracle sails on — a silent divergence
      // window with ANSI off, an anonymous mid-DIV error with it. Each
      // condition below is EXACTLY the negation of "that quotient fits
      // a Long" (va0·10⁵ ≤ 2⁶³ − 1 times the divisor, etc., rounded
      // down to 9.2e18 for a margin), evaluated on the one-row
      // aggregate frame (zero distributed cost); every hazardous DIV
      // is wrapped so the FIRST thing to fire in either ANSI mode is
      // the named contract error, never a silent null.
      .withColumn("rng_ok", expr(
        """CAST(n_a AS DECIMAL(38,0)) + n_b <=
             CAST(9000000000 AS DECIMAL(38,0)) AND
           va0 <= CAST(92000000000000 AS DECIMAL(38,0))
             * n_a * n_a * (n_a - 1) AND
           vb0 <= CAST(92000000000000 AS DECIMAL(38,0))
             * n_b * n_b * (n_b - 1) AND
           abs(s_a) <= CAST(460000000000000 AS DECIMAL(38,0)) * n_a AND
           abs(s_b) <= CAST(460000000000000 AS DECIMAL(38,0)) * n_b"""))
      .withColumn("se2n_a", expr(grd(
        """(va0 * CAST(100000 AS DECIMAL(38,0))) DIV
           NULLIF(CAST(n_a AS DECIMAL(38,0)) * n_a * (n_a - 1),
                  CAST(0 AS DECIMAL(38,0)))""")))
      .withColumn("se2n_b", expr(grd(
        """(vb0 * CAST(100000 AS DECIMAL(38,0))) DIV
           NULLIF(CAST(n_b AS DECIMAL(38,0)) * n_b * (n_b - 1),
                  CAST(0 AS DECIMAL(38,0)))""")))
      .withColumn("dc", expr(
        "s_a * CAST(n_b AS DECIMAL(38,0)) - s_b * CAST(n_a AS DECIMAL(38,0))"))
      .withColumn("du", expr(grd(
        """(dc * CAST(1000000 AS DECIMAL(38,0))) DIV
           NULLIF(CAST(100 AS DECIMAL(38,0)) * n_a * n_b,
                  CAST(0 AS DECIMAL(38,0)))""")))
      // Second guard: t2_9 = du²·10⁶ DIV Σse2n fits a Long iff
      // du² ≤ 9.2e12·Σse2n (|t| ≲ 96 000 — only near-zero pooled
      // variance with a wide mean gap can breach it). Same loud-fail
      // convention; a NULL Σse2n short-circuits the WHEN to the
      // (NULL-publishing) ELSE branch.
      .withColumn("t2_9", expr(
        """CASE WHEN CAST(du AS DECIMAL(38,0)) * du >
             CAST(9200000000000 AS DECIMAL(38,0)) *
             NULLIF(se2n_a + se2n_b, 0)
           THEN CAST(raise_error(concat('welchTTest: t^2 exceeds the ',
             'exact-Long staging range (du^2 > 9.2e12 * pooled se2n)'))
             AS BIGINT)
           ELSE (CAST(du AS DECIMAL(38,0)) * du *
             CAST(1000000 AS DECIMAL(38,0)))
             DIV NULLIF(se2n_a + se2n_b, 0) END"""))
      .withColumn("t_sign", expr(
        "CAST(CASE WHEN dc > 0 THEN 1 WHEN dc < 0 THEN -1 ELSE 0 END AS BIGINT)"))
      .withColumn("am", expr("se2n_a DIV 1000000"))
      .withColumn("bm", expr("se2n_b DIV 1000000"))
      .withColumn("df9", expr(
        """(CAST(am + bm AS DECIMAL(38,0)) * (am + bm) *
             CAST(1000000000 AS DECIMAL(38,0)))
           DIV NULLIF(
             (CAST(am AS DECIMAL(38,0)) * am) DIV NULLIF(n_a - 1, 0) +
             (CAST(bm AS DECIMAL(38,0)) * bm) DIV NULLIF(n_b - 1, 0), 0)"""))
      .withColumn("mean_a_u", expr(grd(
        "(s_a * CAST(10000 AS DECIMAL(38,0))) DIV NULLIF(n_a, 0)")))
      .withColumn("mean_b_u", expr(grd(
        "(s_b * CAST(10000 AS DECIMAL(38,0))) DIV NULLIF(n_b, 0)")))
      .select(col("n_a"), col("n_b"), col("mean_a_u"), col("mean_b_u"),
        col("t_sign"), col("t2_9"), col("df9"))
  }

  /** Per-pair BLEU-2 components (Papineni et al. 2002): for each
    * (hypothesis, reference) text pair the clipped n-gram matches
    * m_n = Σ_g min(count_hyp(g), count_ref(g)) and totals for
    * n = 1, 2, plus exact integer ppm precisions — the generation-
    * eval metric a distillation / synthetic-data pipeline runs over
    * millions of (model output, gold) pairs. The exp/log geometric
    * mean and brevity penalty are driver-side scalar cosmetics over
    * these sufficient statistics; the published components keep
    * everything integer-exact and oracle-replayable (the same
    * publish-the-sufficient-statistics stance as Welch/q201).
    *
    * Scale shape: per n one explode + count groupBy per side and one
    * equi-join on (pair, gram) — clipped matches only exist for
    * grams present in BOTH sides, so the join is the intersection,
    * never a cross. All shuffles key on (pair_id, gram): skew-free
    * for normal corpora. Totals are pure per-row arithmetic.
    *
    * Output: (pair_id, hyp_len, ref_len, match1, total1, p1_ppm,
    * match2, total2, p2_ppm); p_n is NULL when the hypothesis has no
    * n-grams. */
  def bleuPairs(pairs: DataFrame, idCol: String, hypCol: String,
                refCol: String): DataFrame = {
    def toks(c: Column) = filter(split(lower(c), " "), t => t =!= "")
    // NON-distinct n-grams (BLEU clips on occurrence counts)
    def grams(ws: Column, n: Int): Column =
      when(size(ws) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(ws) - n),
          i => concat_ws(" ",
            (0 until n).map(k => element_at(ws, i + k + 1)): _*)))
    val base = pairs.select(col(idCol).cast("long").as("pair_id"),
        toks(col(hypCol)).as("hw"), toks(col(refCol)).as("rw"))
      .localCheckpoint()
    def clipped(n: Int): DataFrame = {
      def side(c: String, out: String) = base
        .select(col("pair_id"), explode(grams(col(c), n)).as("g"))
        .groupBy("pair_id", "g").agg(count(lit(1)).as(out))
      side("hw", "ch").join(side("rw", "cr"), Seq("pair_id", "g"))
        .groupBy("pair_id")
        .agg(sum(least(col("ch"), col("cr"))).as(s"match$n"))
    }
    base.select(col("pair_id"),
        size(col("hw")).cast("long").as("hyp_len"),
        size(col("rw")).cast("long").as("ref_len"))
      .join(clipped(1), Seq("pair_id"), "left")
      .join(clipped(2), Seq("pair_id"), "left")
      .withColumn("match1", coalesce(col("match1"), lit(0L)))
      .withColumn("match2", coalesce(col("match2"), lit(0L)))
      .withColumn("total1", col("hyp_len"))
      .withColumn("total2", greatest(col("hyp_len") - 1, lit(0L)))
      .withColumn("p1_ppm", when(col("total1") > 0,
        expr("(1000000 * match1) div total1")))
      .withColumn("p2_ppm", when(col("total2") > 0,
        expr("(1000000 * match2) div total2")))
      .select("pair_id", "hyp_len", "ref_len", "match1", "total1",
        "p1_ppm", "match2", "total2", "p2_ppm")
  }
}
