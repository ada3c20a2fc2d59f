package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal versioning operators — the warehouse moves layered on the
  * reference's append-only upsert (Scraper.py keeps first-seen rows
  * forever; a real pipeline needs to know WHEN each version was true).
  */
object Temporal {

  /** SCD-2 interval assembly: turn a change stream (key, ts, attrs…)
    * into validity intervals — each version valid from its own ts
    * until the next change of the same key (null = still current).
    * `seqCol` breaks same-instant ties deterministically.
    *
    * One hash shuffle on the key; the window is per-key (bounded), so
    * no global sort and no skew beyond the key histogram — the
    * standard changes-table → dimension-table step run at any scale.
    */
  def scd2Intervals(changes: DataFrame, keyCol: String, tsCol: String,
                    seqCol: String,
                    openEnd: String = "2100-01-01 00:00:00"): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(seqCol).asc)
    changes
      .withColumn("valid_from", col(tsCol))
      // the conventional SCD-2 open-end sentinel instead of NULL, so
      // range predicates (`ts < valid_to`) need no null branch; a
      // far-future-but-datetime64[ns]-safe default (9999-12-31 would
      // overflow pandas/Arrow nanosecond readers downstream)
      .withColumn("valid_to",
        coalesce(lead(col(tsCol), 1).over(w), lit(openEnd).cast("timestamp")))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current",
        col("valid_to") === lit(openEnd).cast("timestamp"))
  }

  /** Date-spine gap fill: for each key, generate its full month
    * calendar between first and last activity (`sequence` + explode —
    * a generator, no join against a global spine table) and left-join
    * the observed per-month aggregates back, zero-filling the silent
    * months. The regularized series every time-series consumer
    * (forecasting, retention, training-mixture drift) wants.
    *
    * Scale shape: the aggregate side is one hash shuffle on
    * (key, month); the spine explodes AFTER a per-key min/max agg, so
    * generated rows = Σ active-months-per-key, never |keys| × global
    * calendar. The spine-to-agg join is on the same (key, month) key —
    * co-partitioned by the previous exchange, and AQE broadcasts it
    * when one side is small. */
  def monthSpine(df: DataFrame, keyCol: String, tsCol: String,
      aggs: Map[String, Column]): DataFrame = {
    val month = date_trunc("month", col(tsCol))
    val observed = df.groupBy(col(keyCol), month.as("month"))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }.toSeq: _*)
    val spine = df.groupBy(col(keyCol))
      .agg(min(month).as("lo"), max(month).as("hi"))
      .select(col(keyCol),
        explode(sequence(col("lo"), col("hi"),
          expr("interval 1 month"))).as("month"))
    val zeroed = aggs.keys.foldLeft(
        spine.join(observed, Seq(keyCol, "month"), "left")) {
      (d, n) => d.withColumn(n, coalesce(col(n), lit(0)))
    }
    zeroed
  }

  /** Trailing time-window aggregate via a RANGE frame over the epoch-
    * second axis: for every event, the mean of `valueCol` over the
    * same key's events in the preceding `windowSec` (inclusive).
    * Decimal-exact sum ÷ count — one correctly-rounded double
    * division, so a SQL window oracle matches bit-for-bit.
    *
    * One hash shuffle on the key + per-key sort; the frame is
    * evaluated by Spark's sliding window-frame executor in O(rows)
    * per key (two moving pointers), not O(rows × frame). */
  def trailingAvg(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, windowSec: Long): DataFrame = {
    // microsecond axis (unix_micros ⇄ the oracle's epoch_us): the
    // event timestamps carry sub-second parts, so a seconds axis would
    // quantize frame membership
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowSec * 1000000L, 0)
    df.withColumn("win_n", count(lit(1)).over(w))
      .withColumn("win_avg",
        sum(col(valueCol).cast("decimal(18,4)")).over(w).cast("double") /
          col("win_n"))
  }

  /** Kaplan-Meier product-limit estimator over right-censored
    * durations: one row per event time t with the number at risk,
    * events at t, and the survival curve. Input: `subjects` with an
    * integer duration column and a boolean event column (false =
    * censored). Convention: subjects censored AT t still count as at
    * risk at t (n_risk(t) = #{dur ≥ t}); curve rows exist only at
    * event times, the standard product-limit support.
    *
    * Exactness: d(t) and n(t) are exact counts; each factor
    * ln(1 − d/n) quantizes to DECIMAL(18,9) and the RUNNING SUM of
    * quantized logs is exact and order-free (the lnp9 convention
    * lifted from per-group sums to a cumulative window), so ln_surv
    * is hash-gradable. `surv` re-exponentiates and rounds to
    * DECIMAL(9,6) — the same quantize-absorbs-ulp argument, applied
    * to exp's last ulp.
    *
    * The curve CAN reach exactly zero: at the last event time every
    * remaining subject may convert (d = n_risk), where the factor is
    * 0 and its log undefined — a silent correctness trap, since SQL
    * SUM skips the NULL that ln(0) paths produce (and DuckDB throws).
    * Zero is handled explicitly: from the first d = n_risk time on,
    * ln_surv is NULL and surv is 0.0 in both engines.
    *
    * Scale shape: two aggregations over the subjects table (per-dur
    * counts; event-time counts), a cumulative window over the
    * DISTINCT-duration axis (bounded by the time domain, not the
    * subject count), and one sorted curve window. Nothing
    * subject × time ever materializes. */
  def kaplanMeier(subjects: DataFrame, durCol: String, eventCol: String)
      : DataFrame = {
    val byDur = subjects.groupBy(col(durCol).as("t"))
      .agg(count(lit(1)).as("n_at"),
        count(when(col(eventCol), 1)).as("d"))
    // n_risk(t) = Σ n_at over dur ≥ t: cumulative sum descending the
    // duration axis — |distinct durations| rows, not |subjects|
    val wRisk = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCurve = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lnTerm = when(col("d") < col("n_risk"),
      log(lit(1.0) - col("d").cast("double") / col("n_risk"))
        .cast("decimal(18,9)"))
    byDur
      .withColumn("n_risk", sum(col("n_at")).over(wRisk))
      .filter(col("d") > 0)
      .withColumn("hit_zero",
        max(when(col("d") === col("n_risk"), 1).otherwise(0)).over(wCurve))
      .withColumn("ln_surv", when(col("hit_zero") === 0,
        sum(lnTerm).over(wCurve).cast("double")))
      .select(col("t"), col("n_risk"), col("d").as("n_events"),
        col("ln_surv"),
        when(col("hit_zero") === 1, lit(0.0))
          .otherwise(exp(col("ln_surv")).cast("decimal(9,6)")
            .cast("double")).as("surv"))
  }

  // --- corpus-drift monitoring (round 9) --------------------------------
  //
  // A continuously-crawled training corpus needs the same health
  // telemetry a metrics pipeline has: is today's volume per source in
  // line with its weekly rhythm (seasonal-naive MASE, Hyndman &
  // Koehler 2006), and has the level drifted persistently (two-sided
  // CUSUM, Page 1954)? Both are all-integer on the count axis — days
  // are integer epoch-day ordinals (unix_micros DIV 86400000000, the
  // microsecond-axis convention), errors are |count − count| longs,
  // and ratios publish as ppm DIVs — so DuckDB replays them exactly.
  //
  // Scale shape: one map-side-combined groupBy to (group, day)
  // counts; everything after runs on per-group day series whose
  // length is CALENDAR-bounded (365 rows/group/year), not corpus-
  // bounded — per-group windows are the right tool and no global
  // sort exists. At 100 TB the daily rollup is the only pass that
  // touches raw events.

  /** Seasonal-naive forecast audit per group: for every day with a
    * same-group day exactly `period` back, |x_t − x_{t−period}|;
    * for every day with a previous day, |x_t − x_{t−1}| (the naive
    * scale term). MASE in ppm = 1e6 · (seasonal mean) / (naive mean),
    * integer-floored; NULL when a denominator is empty. Missing days
    * drop out of both sums (join-on-existence, not row-lag, so
    * calendar gaps can't misalign the season).
    *
    * Output: (group, n_days, n_seasonal, n_naive, seasonal_abs_err,
    * naive_abs_err, mase_ppm). */
  def seasonalNaiveAudit(events: DataFrame, groupCol: String,
                         tsCol: String, period: Int): DataFrame = {
    require(period >= 2, s"period must be >= 2: $period")
    val daily = events.select(col(groupCol).as("grp"),
        expr(s"unix_micros($tsCol) DIV 86400000000").as("day"))
      .groupBy("grp", "day").agg(count(lit(1)).as("x"))
    val lagS = daily.select(col("grp"), (col("day") + period).as("day"),
      col("x").as("x_season"))
    val lagN = daily.select(col("grp"), (col("day") + 1).as("day"),
      col("x").as("x_prev"))
    daily
      .join(lagS, Seq("grp", "day"), "left")
      .join(lagN, Seq("grp", "day"), "left")
      .groupBy(col("grp").as("group"))
      .agg(count(lit(1)).as("n_days"),
        count(col("x_season")).as("n_seasonal"),
        count(col("x_prev")).as("n_naive"),
        sum(abs(col("x") - col("x_season"))).as("seasonal_abs_err"),
        sum(abs(col("x") - col("x_prev"))).as("naive_abs_err"))
      .withColumn("mase_ppm", expr(
        """CASE WHEN naive_abs_err > 0 AND n_seasonal > 0
             THEN 1000000 * seasonal_abs_err * n_naive
                  DIV (n_seasonal * naive_abs_err)
             ELSE CAST(NULL AS BIGINT) END"""))
  }

  /** Two-sided CUSUM drift statistic per group over daily counts:
    * target k = floor(total/n_days) per group, P_t = Σ(x−k) in day
    * order, S⁺ = P − min_{≤t}P (upward drift), S⁻ = max_{≤t}P − P
    * (downward), alarms at h = hFactor·max(k,1). Day gaps simply
    * contribute no row (the statistic carries across them — CUSUM on
    * the observed sequence). Per-group windows only; series length is
    * calendar-bounded.
    *
    * Output: (group, day, x, cusum_pos, cusum_neg, alarm_pos,
    * alarm_neg). */
  def cusumDrift(events: DataFrame, groupCol: String, tsCol: String,
                 hFactor: Int = 4): DataFrame = {
    require(hFactor >= 1)
    val daily = events.select(col(groupCol).as("grp"),
        expr(s"unix_micros($tsCol) DIV 86400000000").as("day"))
      .groupBy("grp", "day").agg(count(lit(1)).as("x"))
    val kTbl = daily.groupBy("grp")
      .agg(expr("sum(x) DIV count(1)").as("k")) // exact integer mean floor
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    daily.join(broadcast(kTbl), "grp")
      .withColumn("p", sum(col("x") - col("k")).over(w))
      .withColumn("cusum_pos", col("p") - min(col("p")).over(w))
      .withColumn("cusum_neg", max(col("p")).over(w) - col("p"))
      .withColumn("h", lit(hFactor) * greatest(col("k"), lit(1L)))
      .select(col("grp").as("group"), col("day"), col("x"),
        col("cusum_pos"), col("cusum_neg"),
        (col("cusum_pos") > col("h")).as("alarm_pos"),
        (col("cusum_neg") > col("h")).as("alarm_neg"))
  }

  /** Exact single least-squares changepoint per series — one binary-
    * segmentation step (Scott & Knott 1974; the primitive PELT/BinSeg
    * iterate): over each group's daily-count series, the split k that
    * minimizes SSE_left + SSE_right. Minimizing total SSE is
    * equivalent to MAXIMIZING S1l²/nl + S1r²/nr (the S2 term is
    * split-invariant), so the engine ranks candidates by the exact
    * integer score
    *
    *   score(k) = S1l²·nr + S1r²·nl          (common denominator nl·nr)
    *
    * computed in DECIMAL(38,0) — squares of count prefix sums pass
    * 2^63 on a 100 TB event stream; Spark decimal and DuckDB HUGEINT
    * both carry the arithmetic exactly, so the argmax (score desc,
    * k asc on ties) replays bit-for-bit. Published score is the
    * floor-div by 10⁶ back into BIGINT.
    *
    * Scale shape: one daily rollup (map-side combined), per-group
    * prefix sums + candidate ranking over |days|-bounded windows —
    * never event volume. Series with < 2 days yield no row.
    *
    * Output: (group, n_days, best_k, split_day, score_m) — best_k =
    * size of the left segment, split_day = first day of the right. */
  def changepoint(events: DataFrame, groupCol: String,
                  tsCol: String): DataFrame = {
    val daily = events.select(col(groupCol).as("grp"),
        expr(s"unix_micros($tsCol) DIV 86400000000").as("day"))
      .groupBy("grp", "day").agg(count(lit(1)).as("x"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("day")
    val tot = daily.groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val cand = daily
      .withColumn("k", row_number().over(wOrd).cast("long"))
      .withColumn("s1l", sum(col("x")).over(wOrd))
      .join(broadcast(tot), "grp")
      .filter(col("k") < col("n"))
      .withColumn("lead_day", lead(col("day"), 1).over(wOrd))
      .withColumn("score",
        expr("""CAST(s1l AS DECIMAL(38,0)) * CAST(s1l AS DECIMAL(38,0))
              |  * CAST(n - k AS DECIMAL(38,0))
              |+ CAST(s - s1l AS DECIMAL(38,0))
              |  * CAST(s - s1l AS DECIMAL(38,0))
              |  * CAST(k AS DECIMAL(38,0))""".stripMargin))
    val wBest = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("score").desc, col("k").asc)
    cand.withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("grp").as("group"), col("n").as("n_days"),
        col("k").as("best_k"), col("lead_day").as("split_day"),
        expr("CAST(score DIV 1000000 AS BIGINT)").as("score_m"))
  }

  /** Lagged cross-correlation SUFFICIENT STATISTICS between the daily
    * count series of every series pair — the lead/lag screen behind
    * "does activity in a precede activity in b?" telemetry questions:
    * for each (a, b, lag k) the join-on-existence overlap of x_t
    * (series a) with y_{t+k} (series b) and the exact integer sums
    * (n, Σx, Σy, Σxy, Σx², Σy²) from which Pearson r at that lag is
    * one division downstream — the publish-the-sufficient-statistics
    * stance of Welch/q201 (r itself needs a square root, the one
    * operation the engines may round apart). Calendar gaps drop out
    * of both series symmetrically (the q244 join-on-existence
    * convention).
    *
    * Scale shape: ONE daily rollup (map-side combined), then per lag
    * an equi-join of the tiny (group, day) frame against its shifted
    * self — |groups|·|days| rows throughout, never event volume.
    *
    * Output: (type_a, type_b, lag, n, sum_x, sum_y, sum_xy, sum_x2,
    * sum_y2). */
  def laggedCrossStats(events: DataFrame, groupCol: String,
                       tsCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 0, s"maxLag must be >= 0: $maxLag")
    val daily = events.select(col(groupCol).as("grp"),
        expr(s"unix_micros($tsCol) DIV 86400000000").as("day"))
      .groupBy("grp", "day").agg(count(lit(1)).as("x"))
      .localCheckpoint()
    val lagged = daily.select(col("grp").as("grp_b"),
        explode(array((0 to maxLag).map(lit): _*)).as("lag"),
        col("day"), col("x").as("y"))
      .select(col("grp_b"), col("lag"),
        (col("day") - col("lag")).as("day"), col("y"))
    daily.join(lagged, Seq("day"))
      .groupBy(col("grp").as("type_a"), col("grp_b").as("type_b"),
        col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sum_x"), sum(col("y")).as("sum_y"),
        sum(col("x") * col("y")).as("sum_xy"),
        sum(col("x") * col("x")).as("sum_x2"),
        sum(col("y") * col("y")).as("sum_y2"))
  }

  /** Cumulative distinct-entity counts per group over days — "unique
    * users seen so far" growth curves, computed WITHOUT carrying a
    * running distinct set: an entity contributes to the cumulative
    * count from its FIRST day onward, so the curve is the cumulative
    * sum of per-day first-appearance counts — one groupBy-min per
    * (group, entity), one daily rollup, one bounded-partition window.
    * The same first-occurrence trick as vocab growth (q204), lifted
    * to entities per group.
    *
    * Output: (grp, day, n_new, cum_distinct). */
  def cumulativeDistinct(events: DataFrame, groupCol: String,
                         entityCol: String, tsCol: String): DataFrame = {
    val first = events.select(col(groupCol).as("grp"),
        col(entityCol).as("ent"),
        expr(s"unix_micros($tsCol) DIV 86400000000").as("day"))
      .groupBy("grp", "ent").agg(min("day").as("first_day"))
    val perDay = first.groupBy(col("grp"), col("first_day").as("day"))
      .agg(count(lit(1)).as("n_new"))
    perDay.withColumn("cum_distinct",
      sum(col("n_new")).over(Window.partitionBy("grp")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Seasonal-residual anomaly flags — the composed detector ops
    * teams actually run: per (group, day) the residual against the
    * group's WEEKDAY profile (floor-mean, integer DIV), then a
    * robust threshold from the residual distribution's MAD (median
    * absolute deviation around the residual median — both lower
    * medians over bounded per-group frames), flagging
    * |resid − med| > k·MAD. Exact integer end to end: profile means
    * are DIV floors, medians come from cumulative-count windows
    * (the [[graft.operators.Stats.weightedMedian]] shape), and the
    * flag compares integers — bit-stable across engines.
    *
    * Scale shape: one daily rollup, one 7-row profile join, two
    * bounded-partition windows for the medians — |groups|·|days|
    * rows throughout.
    *
    * Output: (grp, day, x, expected, resid, resid_med, mad,
    * is_anomaly). */
  def seasonalAnomalies(events: DataFrame, groupCol: String,
                        tsCol: String, k: Int = 3): DataFrame = {
    val daily = events.select(col(groupCol).as("grp"),
        expr(s"unix_micros($tsCol) DIV 86400000000").as("day"))
      .groupBy("grp", "day").agg(count(lit(1)).as("x"))
      .withColumn("dow", pmod(col("day") + 4, lit(7))) // epoch day 0 = Thu
    val profile = daily.groupBy("grp", "dow")
      .agg(expr("sum(x) div count(1)").as("expected"))
    val resid = daily.join(profile, Seq("grp", "dow"))
      .withColumn("resid", col("x") - col("expected"))
    def lowerMedian(df: DataFrame, valCol: String,
                    out: String): DataFrame = {
      val wCum = Window.partitionBy("grp").orderBy(col(valCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("grp")
      // 2·rank ≥ n selects ranks ≥ ceil(n/2); min over them = the
      // LOWER median (rank floor((n+1)/2)) for both parities
      df.withColumn("_rn", count(lit(1)).over(wCum))
        .withColumn("_n", count(lit(1)).over(wAll))
        .filter(col("_rn") * 2 >= col("_n"))
        .groupBy("grp").agg(min(col(valCol)).as(out))
    }
    val med = lowerMedian(resid, "resid", "resid_med")
    val withMed = resid.join(med, Seq("grp"))
      .withColumn("absdev", abs(col("resid") - col("resid_med")))
    val mad = lowerMedian(withMed, "absdev", "mad")
    withMed.join(mad, Seq("grp"))
      .withColumn("is_anomaly",
        col("absdev") > lit(k.toLong) * col("mad"))
      .select("grp", "day", "x", "expected", "resid", "resid_med",
        "mad", "is_anomaly")
  }

  /** Sequential co-occurrence pairs — the length-2 core of sequential
    * pattern mining (the "a happens before b" support table behind
    * PrefixSpan-style funnels and Markov priors): for every ordered
    * type pair (a, b), how many subjects have SOME a-occurrence
    * strictly before SOME b-occurrence. Existence is decidable from
    * per-(subject, type) extrema alone — min_ts(a) < max_ts(b) — so
    * the full event stream reduces to one tiny per-subject frame
    * before any pairing happens.
    *
    * Scale shape: one groupBy to per-(subject, type) extrema (≤
    * |subjects|·|types| rows regardless of event volume), a
    * per-subject self-join bounded by |types|² per subject, then one
    * count per pair. Self-pairs (a, a) count subjects with ≥ 2
    * occurrences at distinct timestamps.
    *
    * Output: (type_a, type_b, n_subjects, support_ppm) with
    * support = n_subjects / total subjects. */
  def seqPairs(events: DataFrame, subjectCol: String, typeCol: String,
               tsCol: String): DataFrame = {
    val ext = events.groupBy(col(subjectCol).as("subj"),
        col(typeCol).as("t"))
      .agg(min(col(tsCol)).as("min_ts"), max(col(tsCol)).as("max_ts"))
      .localCheckpoint()
    val nSubj = ext.select("subj").distinct().count()
    ext.as("a").join(ext.as("b"), col("a.subj") === col("b.subj"))
      .filter(col("a.min_ts") < col("b.max_ts"))
      .groupBy(col("a.t").as("type_a"), col("b.t").as("type_b"))
      .agg(count(lit(1)).as("n_subjects"))
      .withColumn("support_ppm",
        expr(s"(1000000 * n_subjects) div $nSubj"))
  }

  /** Group-fairness rate audit (the demographic-parity numbers of a
    * model/data audit): per segment the positive rate in exact ppm,
    * plus the gap to the OVERALL rate — the first-order
    * disparate-impact screen a training-data pipeline runs per
    * release (alongside the k-anonymity/l-diversity privacy gates).
    * All-integer: rates are ppm DIV floors, gaps are signed
    * differences of those floors.
    *
    * Output: (segment, n, n_pos, rate_ppm, overall_ppm, gap_ppm). */
  def fairnessRates(df: DataFrame, segmentCol: String,
                    positive: Column): DataFrame = {
    val seg = df.groupBy(col(segmentCol).as("segment"))
      .agg(count(lit(1)).as("n"),
        sum(positive.cast("long")).as("n_pos"))
    val tot = seg.agg(sum("n").as("nt"), sum("n_pos").as("npt")).head()
    val overall = 1000000L * tot.getLong(1) / tot.getLong(0)
    seg
      .withColumn("rate_ppm", expr("(1000000 * n_pos) div n"))
      .withColumn("overall_ppm", lit(overall))
      .withColumn("gap_ppm", col("rate_ppm") - col("overall_ppm"))
  }

  /** Holt double exponential smoothing (Holt 1957) — level + linear
    * trend, the forecasting step up from the memoryless EWMA (q148):
    *
    *   s_t = α·y_t + (1−α)·(s_{t−1} + b_{t−1})
    *   b_t = β·(s_t − s_{t−1}) + (1−β)·b_{t−1}
    *
    * with α = β = 1/4 so every update is integer-exact in milli
    * fixed point: s' = (1000·y + 3·(s+b)) div 4,
    * b' = ((s'−s) + 3·b) div 4 — one floor per component per step,
    * `div` truncation identical on both engines (the q310
    * composed-floor stance; negative trends truncate toward zero on
    * both sides).
    *
    * Scale contract = theilSen/mannKendall's: the caller's series is
    * a bounded per-group daily rollup, folded in ONE `aggregate` HOF
    * over the group's sorted array (the q148 ordered-fold shape,
    * codegen'd, no UDF) — per-group state is two longs, nothing
    * corpus-wide orders. The oracle replays the recursion with a
    * recursive CTE over the same rollup.
    *
    * Output: (grp, n_days, level_milli, trend_milli, forecast_milli)
    * with forecast = s + b (one step ahead); init s₁ = 1000·y₁,
    * b₁ = 0. */
  def holtTrend(df: DataFrame, groupCol: String, xCol: String,
                yCol: String): DataFrame = {
    // ÷4 with truncation toward zero, exactly: /4 is a power-of-two
    // double division (exact below 2^53 — milli levels stay ≪ that),
    // and the long cast truncates toward zero like SQL div / DuckDB //
    def idiv4(c: Column): Column = (c / lit(4)).cast("long")
    val series = df.select(col(groupCol).as("grp"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .groupBy("grp")
      .agg(array_sort(collect_list(struct(col("x"), col("y"))))
        .as("xs"))
    series.select(col("grp"), size(col("xs")).as("n_days"),
        aggregate(
          slice(col("xs"), lit(2), size(col("xs"))),
          struct(
            (element_at(col("xs"), 1).getField("y") * 1000L).as("s"),
            lit(0L).as("b")),
          (acc, e) => {
            val sPrev = acc.getField("s")
            val bPrev = acc.getField("b")
            val sNew = idiv4(e.getField("y") * 1000L
              + (sPrev + bPrev) * 3L)
            val bNew = idiv4((sNew - sPrev) + bPrev * 3L)
            struct(sNew.as("s"), bNew.as("b"))
          }).as("st"))
      .select(col("grp"), col("n_days"),
        col("st").getField("s").as("level_milli"),
        col("st").getField("b").as("trend_milli"),
        (col("st").getField("s") + col("st").getField("b"))
          .as("forecast_milli"))
  }
}
