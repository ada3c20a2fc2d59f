package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based filtering economics: the two-stage quality-classifier
  * CASCADE every large-scale curation pipeline runs — a cheap rule
  * gate first, the expensive scorer only on the survivors — with the
  * per-stage recall/cost accounting that justifies (or kills) the
  * gate. The scorer here is the engine's own q17 quality blend
  * re-expressed in exact ppm integers so the DuckDB oracle replays it
  * bit-for-bit; in production the "expensive" stage is a model call,
  * and the accounting below is exactly how its budget is sized.
  *
  * Scale shape: stage 1 and the features are map-only over the corpus
  * (one scan, no shuffle); stage 2 touches only gate survivors — the
  * whole point of a cascade at 100 TB — and the economics roll up in
  * ONE aggregation. Nothing here keys on a hot value, so no skew
  * risk. */
object Cascade {
  import TextAnalysis.stopwords

  private def countIn(ws: Column, list: Seq[String]): Column =
    size(filter(ws, w => w.isin(list.map(_.asInstanceOf[Any]): _*)))

  /** ppm-exact per-document cascade disposition.
    *
    * Features (all integer, `//` = truncating div):
    *  - len_ppm  = 1e6·min(n_words, 64) // 64
    *  - div_ppm  = 1e6·n_distinct // n_words
    *  - stop4_ppm = min(4e6·n_stop // n_words, 1e6)
    * Stage 1 (rule gate): 8 ≤ n_words ≤ 80 AND div_ppm ≥ 300 000.
    * Stage 2 (scorer, survivors only — `score_ppm` is NULL for gated
    * docs, pinning that the expensive stage never ran for them):
    * score_ppm = (4·len_ppm + 4·div_ppm + 2·stop4_ppm) // 10,
    * kept = gate AND score_ppm ≥ 600 000. */
  def cascadeFilter(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame =
    withDisposition(docs, idCol, textCol)
      .select(col(idCol), col("n_words"), col("div_ppm"), col("s1_pass"),
        when(col("s1_pass"), col("score_ppm")).as("score_ppm"),
        col("kept"))

  /** One-row cascade economics vs the no-gate baseline that runs the
    * expensive scorer on EVERY document: kept-set recall (the cascade
    * only loses docs the gate dropped — kept ⊆ full-kept by
    * construction, so recall = n_kept/n_full_kept) and the cost model
    * cost = n·c_cheap + survivors·c_expensive against n·c_expensive.
    * Unit costs are parameters so the break-even is visible in the
    * output, not baked in. */
  def cascadeEconomics(docs: DataFrame, idCol: String, textCol: String,
                       cheapCost: Long = 1L,
                       expensiveCost: Long = 20L): DataFrame = {
    val d = withDisposition(docs, idCol, textCol)
    d.agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("s1_pass"), 1L).otherwise(0L)).as("n_s1_pass"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("score_ppm") >= 600000L, 1L).otherwise(0L))
          .as("n_full_kept"))
      .select(col("n_docs"), col("n_s1_pass"), col("n_kept"),
        col("n_full_kept"),
        expr("CASE WHEN n_full_kept > 0" +
          " THEN 1000000 * n_kept div n_full_kept ELSE 0 END")
          .as("recall_ppm"),
        (lit(expensiveCost) * col("n_docs")).as("cost_full"),
        (lit(cheapCost) * col("n_docs")
          + lit(expensiveCost) * col("n_s1_pass")).as("cost_cascade"),
        expr(s"CASE WHEN n_docs > 0 THEN 1000000 *" +
          s" (${expensiveCost} * n_docs" +
          s" - (${cheapCost} * n_docs + ${expensiveCost} * n_s1_pass))" +
          s" div (${expensiveCost} * n_docs) ELSE 0 END")
          .as("savings_ppm"))
  }

  /** Gate-vs-scorer agreement (Cohen's kappa, 1960) — the calibration
    * audit behind every cascade design decision: treat the cheap rule
    * gate and the full scorer (threshold 600 000 ppm, no gate) as two
    * binary annotators over the corpus and measure chance-corrected
    * agreement. κ ≈ 1 ⇒ the gate is a faithful cheap proxy (raise its
    * share of the budget); κ ≈ 0 ⇒ the gate is noise (drop it).
    *
    * The binary, quantized-marginal sibling of the generic
    * [[Metrics.cohenKappa]] (multi-label, exact N·D−S form, exact to
    * ~3·10⁹ rows): this form quantizes the marginals to ppm FIRST, so
    * it stays overflow-free at any corpus size — the right trade for
    * a 100 TB calibration audit where ±1 ppm is noise.
    *
    * Exact integer form, scale-safe: observed agreement
    * po_ppm = 1e6·n_agree // n; chance agreement from the QUANTIZED
    * marginals pe_ppm = (gy_ppm·sy_ppm + gn_ppm·sn_ppm) // 1e6 with
    * x_ppm = 1e6·x // n — marginal ppms first, so no n² product
    * anywhere (at 10¹⁰ docs n² overflows longs; marginal ppms never
    * do). kappa_ppm = 1e6·(po_ppm − pe_ppm) // (1e6 − pe_ppm), 0 when
    * the denominator is 0 (both annotators constant). One map-only
    * scan + one aggregation, the q341 shape. */
  def gateScorerKappa(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val d = withDisposition(docs, idCol, textCol)
    d.agg(
        count(lit(1)).as("n"),
        sum(when(col("s1_pass") === (col("score_ppm") >= 600000L), 1L)
          .otherwise(0L)).as("n_agree"),
        sum(when(col("s1_pass"), 1L).otherwise(0L)).as("gate_yes"),
        sum(when(col("score_ppm") >= 600000L, 1L).otherwise(0L))
          .as("scorer_yes"))
      .select(col("n"), col("n_agree"), col("gate_yes"),
        col("scorer_yes"),
        expr("CASE WHEN n > 0 THEN 1000000 * n_agree div n" +
          " ELSE 0 END").as("po_ppm"),
        expr("CASE WHEN n > 0 THEN" +
          " ((1000000 * gate_yes div n) * (1000000 * scorer_yes div n)" +
          "  + (1000000 * (n - gate_yes) div n)" +
          "    * (1000000 * (n - scorer_yes) div n)) div 1000000" +
          " ELSE 0 END").as("pe_ppm"))
      .select(col("n"), col("n_agree"), col("gate_yes"),
        col("scorer_yes"), col("po_ppm"), col("pe_ppm"),
        expr("CASE WHEN pe_ppm < 1000000 THEN" +
          " 1000000 * (po_ppm - pe_ppm) div (1000000 - pe_ppm)" +
          " ELSE 0 END").as("kappa_ppm"))
  }

  /** Shared feature + disposition frame; `score_ppm` is computed for
    * ALL docs here so the economics can compare against the full
    * scorer — [[cascadeFilter]] masks it to survivors on output. */
  private def withDisposition(docs: DataFrame, idCol: String,
                              textCol: String): DataFrame = {
    val ws = Dedup.words(col(textCol))
    docs
      .select(col(idCol),
        size(ws).cast("long").as("n_words"),
        size(array_distinct(ws)).cast("long").as("n_distinct"),
        countIn(ws, stopwords("en")).cast("long").as("n_stop"))
      .withColumn("len_ppm",
        expr("1000000 * least(n_words, 64L) div 64"))
      .withColumn("div_ppm", expr("1000000 * n_distinct div n_words"))
      .withColumn("stop4_ppm",
        expr("least(4000000 * n_stop div n_words, 1000000L)"))
      .withColumn("s1_pass",
        col("n_words") >= 8L && col("n_words") <= 80L &&
          col("div_ppm") >= 300000L)
      .withColumn("score_ppm",
        expr("(4 * len_ppm + 4 * div_ppm + 2 * stop4_ppm) div 10"))
      .withColumn("kept", col("s1_pass") && col("score_ppm") >= 600000L)
  }
}
