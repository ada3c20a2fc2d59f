package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-statistics operators — the ANALYZE-side of an engine: column
  * profiles for cost-based decisions and equi-depth histograms for
  * range-selectivity estimation. The reference has no stats surface at
  * all (SQLite defaults); at 100 TB, stats collection is itself a big
  * query and must scale like one.
  */
object Stats {

  /** ANALYZE-style profile of numeric columns: one output row per
    * column — (col_name, n, n_null, ndv, min_v, max_v, sum_v). The sum
    * goes through DECIMAL(18,2) so it is exact and engine-identical
    * (house money-math rule); min/max/ndv are exact by construction.
    *
    * Scale shape: one unpivot (map-side row fan-out ×|columns|) + one
    * aggregation keyed on col_name. The count-distinct expands to
    * Spark's standard two-phase (col_name, v) partial — shuffle volume
    * is O(distinct values), map-side combined. No per-column table
    * scans: ONE pass over the data regardless of column count.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val long = df.unpivot(
      Array.empty[Column], cols.map(col(_)).toArray, "col_name", "v")
    long.groupBy("col_name")
      .agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - count(col("v"))).as("n_null"),
        count_distinct(col("v")).as("ndv"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"),
        sum(col("v").cast("decimal(18,2)")).cast("double").as("sum_v"))
  }

  /** MAD-based robust outlier flags per group: deviation from the
    * group median, scaled by the median absolute deviation — the
    * outlier rule that, unlike the z-score (q76), a single extreme
    * value cannot poison, since both center and scale are order
    * statistics. Used on metric streams before aggregation and on
    * quality scores before threshold fitting.
    *
    * Both medians are the exact LOWER median — the element at rank
    * `(n+1) div 2` under a total order (value, then id) — NOT an
    * interpolated quantile: interpolation arithmetic can differ across
    * engines by a ULP, order statistics cannot, so a SQL oracle
    * matches bit-for-bit.
    *
    * Scale shape: two window passes + two broadcast-sized joins, all
    * partitioned by the group key; per-group medians are one row each,
    * so the join sides AQE-broadcast. No global sort. */
  def madOutliers(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, k: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = col(groupCol)
    def lowerMedian(in: DataFrame, v: String, as: String): DataFrame = {
      val w = Window.partitionBy(g).orderBy(col(v).asc, col(idCol).asc)
      val wAll = Window.partitionBy(g)
      in.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wAll))
        // (n+1) div 2: the / is Spark's fractional Divide, exact on
        // counts < 2^52, so floor() is integer division
        .filter(col("rn") === floor((col("n") + 1) / 2))
        .select(g, col(v).as(as))
    }
    val base = df.select(g, col(idCol), col(valueCol))
    val med = lowerMedian(base, valueCol, "med")
    val dev = base.join(med, groupCol)
      .withColumn("dev", abs(col(valueCol) - col("med")))
    val mad = lowerMedian(dev, "dev", "mad")
    dev.join(mad, groupCol)
      .withColumn("is_outlier",
        when(col("dev") > lit(k) * col("mad"), 1).otherwise(0))
      .select(col(idCol), g, col(valueCol), col("med"), col("mad"),
        col("is_outlier"))
  }

  /** Equi-depth histogram WITHOUT a global sort: exact interpolated
    * decile boundaries (percentile(), bit-identical to DuckDB's
    * quantile_cont — the q41-verified equivalence) are computed in one
    * aggregation, broadcast as a single row, and each value's bin is
    * 1 + Σ (v > boundary_i) — a map-side comparison fan, then one
    * groupBy(bin). A value tied with a boundary goes to the lower bin
    * on both engines (strict >), so ties never split across engines.
    *
    * The classic ntile() formulation needs a single-partition global
    * sort — the thing to never do at corpus scale; this shape is two
    * aggregations and a 9-double broadcast. The boundaries come from
    * ONE `percentile(col, array(...))` call: round-7 fix — as nine
    * separate aggregate expressions, each percentile buffered and
    * merged the full value multiset independently (9× the aggregation
    * state; 17.6 s at sf0.1 in the full-surface timing sweep, 4.6 s
    * warm as a single array-percentile — identical boundaries, one
    * sorted buffer read at nine ranks; the remaining cost IS the
    * exact-percentile multiset, the price of quantile_cont
    * bit-equality with the oracle). Output: (bin, n, lo, hi).
    */
  def equiDepthHistogram(df: DataFrame, valueCol: String,
                         buckets: Int): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    val pcts = (1 until buckets).map(_.toDouble / buckets)
    val bounds = df.agg(
      expr(s"percentile($valueCol, array(${pcts.mkString(", ")}))")
        .as("bs"))
    val bin = (1 until buckets).map(i =>
        when(col(valueCol) > col("bs").getItem(i - 1), 1).otherwise(0))
      .reduce(_ + _) + lit(1)
    df.select(col(valueCol)).crossJoin(broadcast(bounds))
      .select(col(valueCol), bin.as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("lo"),
        max(col(valueCol)).as("hi"))
  }

  /** Empirical-CDF transform (probability integral transform): maps
    * every row's `valueCol` to F(v) = #{values ≤ v} / N over the WHOLE
    * table — the quantile-normalization primitive (two tables pushed
    * through their own ECDFs become comparable rank-space features).
    * Values must be exact (integers / decimal cents), so grouping is
    * collision-free and F is an exact count ratio — one double
    * division per DISTINCT value.
    *
    * Output: input columns + ecdf.
    *
    * Scale shape: one distinct-value aggregation (map-side combine),
    * a cumulative window over the DISTINCT-VALUE axis — bounded by
    * the value domain, not the row count (the [[equiDepthHistogram]]
    * / vocabCoverage argument; range-partition the axis beyond ~10⁸
    * distinct values) — and an equi-join back on the value. The raw
    * table is never globally sorted. */
  def ecdfTransform(df: DataFrame, valueCol: String): DataFrame = {
    val wCum = Window.orderBy(col(valueCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val counts = df.groupBy(col(valueCol)).agg(count(lit(1)).as("n_at"))
    val cum = counts
      .withColumn("cum", sum(col("n_at")).over(wCum))
      .crossJoin(broadcast(df.agg(count(lit(1)).as("n_total"))))
      .select(col(valueCol), (col("cum").cast("double") / col("n_total"))
        .as("ecdf"))
    df.join(cum, Seq(valueCol))
  }

  /** Per-group WEIGHTED median: the smallest value whose cumulative
    * weight reaches half the group's total — exact integer weights,
    * integer 2·cum ≥ total test (no floating-point boundary), lower
    * median convention. The robust-center statistic when rows carry
    * mass (revenue-weighted balance, token-weighted score).
    *
    * Output: (group, n, total_w, wmedian).
    *
    * Scale shape: one (group, value) pre-aggregation, a per-group
    * cumulative window over the group's distinct values, and a
    * min-over-qualifying aggregation — never a global sort, never a
    * collect. */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
                     weightCol: String): DataFrame = {
    val wCum = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byVal = df.groupBy(col(groupCol), col(valueCol))
      .agg(sum(col(weightCol)).as("w_at"), count(lit(1)).as("n_at"))
    byVal
      .withColumn("cum_w", sum(col("w_at")).over(wCum))
      .withColumn("total_w",
        sum(col("w_at")).over(Window.partitionBy(col(groupCol))))
      .withColumn("n",
        sum(col("n_at")).over(Window.partitionBy(col(groupCol))))
      .filter(col("cum_w") * 2 >= col("total_w"))
      .groupBy(col(groupCol), col("n"), col("total_w"))
      .agg(min(col(valueCol)).as("wmedian"))
      .select(col(groupCol), col("n"), col("total_w"), col("wmedian"))
  }

  /** Population Stability Index between a REFERENCE and a CURRENT
    * sample of `valueCol` — the standard model-monitoring drift score
    * (PSI = Σ_bins (p_ref − p_cur)·ln(p_ref/p_cur); < 0.1 stable,
    * > 0.25 action). Bins are `buckets` equal-width cells over the
    * REFERENCE min..max (current values clamp into the edge bins, the
    * convention that makes out-of-range drift visible in the tails);
    * both shares are Laplace-smoothed ((n_b + 1)/(n + buckets)) so
    * empty bins stay finite deterministically — no epsilon constants.
    *
    * Output: one row per bin — (bin, n_ref, n_cur, p_ref, p_cur,
    * psi_term, psi_total), psi_total repeated per row (the window sum
    * of DECIMAL(18,9)-quantized terms — exact, order-free, and
    * ln-ulp-proof, the lnp9 convention).
    *
    * Scale shape: one min/max aggregate over the reference, a 1-row
    * broadcast, one map-side bin assignment + count per side — the
    * whole score costs two scans and two `buckets`-row aggregations;
    * nothing corpus-sized shuffles. */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
          buckets: Int): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(lit(1)).rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
    val bounds = ref.agg(min(col(valueCol)).as("lo"),
      max(col(valueCol)).as("hi"))
    // identical double expression in the DuckDB twin; clamp via
    // least/greatest keeps every value in [1, buckets]
    def binOf(v: Column): Column = least(lit(buckets),
      greatest(lit(1),
        (floor((v - col("lo")) / (col("hi") - col("lo")) * buckets)
          .cast("int") + 1)))
    def binned(df: DataFrame, as: String): DataFrame =
      df.select(col(valueCol)).crossJoin(broadcast(bounds))
        .groupBy(binOf(col(valueCol)).as("bin"))
        .agg(count(lit(1)).as(as))
    val spine = ref.sparkSession.range(1, buckets + 1)
      .select(col("id").cast("int").as("bin"))
    val joined = spine
      .join(binned(ref, "n_ref"), Seq("bin"), "left")
      .join(binned(cur, "n_cur"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = joined.agg(sum(col("n_ref")).as("tr"),
      sum(col("n_cur")).as("tc"))
    val p = (col("n_ref") + 1).cast("double") / (col("tr") + buckets)
    val q = (col("n_cur") + 1).cast("double") / (col("tc") + buckets)
    joined.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        p.as("p_ref"), q.as("p_cur"),
        ((p - q) * log(p / q)).cast("decimal(18,9)").as("term9"))
      .withColumn("psi_total", sum(col("term9")).over(w).cast("double"))
      .select(col("bin"), col("n_ref"), col("n_cur"), col("p_ref"),
        col("p_cur"), col("term9").cast("double").as("psi_term"),
        col("psi_total"))
  }

  /** Benford's-law audit: observed vs expected first-significant-digit
    * distribution of a positive numeric column, with the chi-square
    * statistic — the classic fabricated-data / unit-mixup screen for
    * financial-shaped columns (a price feed that fails Benford hard
    * usually means duplicated rows, capped values, or a synthetic
    * source; the per-digit gaps say which).
    *
    * The first digit comes from the INTEGER-STRING of floor(value) —
    * never from log10 (whose 1-ulp engine differences flip the digit
    * at powers of ten) and never from decimal string formatting of
    * doubles (engine-dependent). Expected shares log10(1 + 1/d) and
    * the per-digit chi-square terms quantize to DECIMAL(18,9) (the
    * lnp9 convention), so the window total is exact and order-free.
    * Rows with value < 1 are excluded (no first significant digit in
    * the integer domain).
    *
    * Output: (digit, n_obs, exp_share, obs_share, chi2_term,
    * chi2_total) — chi2_total repeated per row, the PSI convention. */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(lit(1)).rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
    val digit = substring(
      floor(col(valueCol)).cast("long").cast("string"), 1, 1).cast("int")
    val counts = df.filter(col(valueCol) >= 1)
      .groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("n_obs"))
    val spine = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    val joined = spine.join(counts, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"))
    val tot = joined.agg(sum(col("n_obs")).as("n"))
    val expShare = (log(lit(1.0) + lit(1.0) / col("digit")) /
      log(lit(10.0))).cast("decimal(18,9)").cast("double")
    joined.crossJoin(broadcast(tot))
      .select(col("digit"), col("n_obs"),
        expShare.as("exp_share"),
        (col("n_obs").cast("double") / col("n")).as("obs_share"),
        col("n"))
      .withColumn("chi2_term",
        (((col("n_obs") - col("n") * col("exp_share")) *
          (col("n_obs") - col("n") * col("exp_share"))) /
          (col("n") * col("exp_share"))).cast("decimal(18,9)"))
      .withColumn("chi2_total",
        sum(col("chi2_term")).over(w).cast("double"))
      .select(col("digit"), col("n_obs"), col("exp_share"),
        col("obs_share"), col("chi2_term").cast("double").as("chi2_term"),
        col("chi2_total"))
  }

  /** Quantile normalization across groups: each row's value maps to
    * the POOLED distribution's value at the same within-group
    * quantile position — the batch-effect remover (microarray
    * heritage, now the standard cross-source feature equalizer: after
    * it, every source's feature distribution IS the pooled one, so no
    * source dominates a scale-sensitive model input).
    *
    * Position matching is EXACT INTEGER arithmetic end to end: with
    * within-group rank r of n_g and pooled size N, the target pooled
    * index is 1 + round((r−1)·(N−1)/(n_g−1)) computed as
    * ⌊(2·(r−1)·(N−1) + (n_g−1)) / (2·(n_g−1))⌋ (round-half-up without
    * ever leaving bigints; singleton groups take the pooled median
    * 1 + ⌊N/2⌋). Values are never interpolated — the normalized value
    * is an actual pooled observation, so no float arithmetic exists
    * to drift. Bound: (r−1)·(N−1) < 2^63 ⇒ N ≲ 3·10^9 rows; shard
    * the normalization by feature beyond that.
    *
    * Shape: one within-group rank window (shuffle by group), the
    * pooled order via [[Curation.globalRowIds]] (range partition +
    * zipWithIndex — never a single-partition window), and one
    * equi-join on the computed index. Ranks tie-break on `id`, so
    * the map is deterministic under any partitioning.
    *
    * Output: input columns + norm_value. */
  def quantileNormalize(df: DataFrame, groupCol: String, idCol: String,
                        valueCol: String): DataFrame = {
    val wg = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol).asc, col(idCol).asc)
    val ranked = df
      .withColumn("_rg", row_number().over(wg).cast("long"))
      .withColumn("_ng", count(lit(1)).over(
        Window.partitionBy(col(groupCol))))
    val pooled = Curation.globalRowIds(
        df.select(col(valueCol), col(idCol)), Seq(valueCol, idCol))
      .select(col("global_id").as("_gid"),
        col(valueCol).as("norm_value"))
    val n = pooled.count() // materialized by globalRowIds; cheap scalar
    // `div`, not `/`: Spark's `/` on bigints is DOUBLE division, and
    // doubles lose rank arithmetic exactness past 2^53
    val idx = when(col("_ng") > 1,
      lit(1) + expr(s"(2 * (_rg - 1) * ${n - 1}L + (_ng - 1)) " +
        s"div (2 * (_ng - 1))"))
      .otherwise(lit(1 + n / 2))
    ranked.withColumn("_gid", idx.cast("long"))
      .join(pooled, Seq("_gid"))
      .drop("_gid", "_rg", "_ng")
  }

  /** Poisson bootstrap of a mean (Chamandy et al. 2012, "Estimating
    * uncertainty for massive data streams" — the Google reformulation
    * of the bootstrap that works on one pass of distributed data):
    * instead of resampling n rows B times, every row draws an
    * independent Poisson(1) weight per replicate; replicate b's mean
    * is Σw·x / Σw. The replicate-mean spread IS the sampling
    * distribution of the estimator — percentile it downstream for
    * the CI.
    *
    * Engine-exact determinism: the per-(row, replicate) weight comes
    * from the house PRF (two affine rounds mod 1e9+7, the
    * Privacy.uniform construction with the replicate folded into the
    * key) pushed through the Poisson(1) inverse CDF as a fixed CASE
    * ladder of full-precision double literals — both engines parse
    * the identical literals, compare the identical uniform, and get
    * the identical integer weight. Sums are decimal(18,2)-exact
    * (order-free), so every replicate mean replays bit-for-bit.
    *
    * Scale shape: one map-side explode of B replicate ids per row
    * (output bounded at B rows after the map-side-combined
    * aggregation — the ×B work is the bootstrap's inherent cost, but
    * it is one pass, no resampled copies of the data ever
    * materialize). B is a small constant (32–200 in practice).
    *
    * Contract: `idCol` must be UNIQUE per row — the weight is a PRF
    * of (id, replicate), so duplicate ids would draw fully correlated
    * weights and bias the replicate spread narrow. Any Long seed is
    * safe: it is reduced into [0, P) before entering the affine round
    * (round-7 fix — a raw near-Long.Max seed previously overflowed
    * the ANSI multiply-add).
    *
    * Output: (b, n_eff, mean) — one row per replicate. */
  def bootstrapMeans(df: DataFrame, idCol: String, valueCol: String,
                     b: Int, seed: Long): DataFrame = {
    require(b >= 2, s"bootstrapMeans needs b >= 2 replicates, got $b")
    val P = 1000000007L
    val seed0 = ((seed % P) + P) % P
    val rep = df.select(col(idCol).cast("long").as("id"),
        col(valueCol).cast("decimal(18,2)").as("x"),
        explode(sequence(lit(0), lit(b - 1))).as("b"))
    val key = pmod(pmod(col("id"), lit(P)) * 1009L + col("b"), lit(P))
    val h1 = pmod(key * 48271L + seed0, lit(P))
    val h2 = pmod(h1 * 16807L + 12345L, lit(P))
    val u = (h2.cast("double") + 0.5) / P
    // Poisson(1) CDF: P(X<=k) for k = 0..5; >5 truncates to 6 (mass 6e-5)
    val w = when(u < 0.36787944117144233, 0L)
      .when(u < 0.7357588823428847, 1L)
      .when(u < 0.9196986029286058, 2L)
      .when(u < 0.9810118431238462, 3L)
      .when(u < 0.9963401531726563, 4L)
      .when(u < 0.9994058151824183, 5L)
      .otherwise(6L)
    rep.withColumn("w", w)
      .groupBy(col("b"))
      .agg(sum(col("w")).as("n_eff"),
        sum(col("w") * col("x")).as("wsum"))
      .select(col("b"), col("n_eff"),
        (col("wsum").cast("double") / col("n_eff").cast("double"))
          .as("mean"))
  }

  /** EXACT k-th order statistic of a LONG column without a global
    * sort — bounded histogram bisection (the classic two-phase exact
    * quantile at scale): each round buckets the current value range
    * into ≤ `fanout` equal-width cells with ONE aggregation, collects
    * the (≤ fanout-row) histogram, and descends into the cell
    * containing rank k; when the range has ≤ fanout distinct values
    * the exact per-value histogram resolves the answer. O(log_fanout
    * range) full scans — 2–3 passes for any practical domain — and
    * driver state is one fanout-row histogram per round (the
    * sanctioned bounded collect). Lower-rank convention: k = 1 is the
    * minimum; median is k = (n+1)/2.
    *
    * Complements [[weightedMedian]], which is exact per GROUP via a
    * bounded-partition window — this one is the GLOBAL statistic,
    * where a window would mean a single-partition sort of everything. */
  def exactKth(df: DataFrame, valueCol: String, k: Long,
               fanout: Int = 4096): Long = {
    require(k >= 1, s"exactKth: k must be >= 1, got $k")
    val vals = df.select(col(valueCol).cast("long").as("v"))
      .localCheckpoint()
    val mm = vals.agg(min("v"), max("v"), count(lit(1))).head()
    require(!mm.isNullAt(0), "exactKth: empty input")
    require(k <= mm.getLong(2), s"exactKth: k=$k > n=${mm.getLong(2)}")
    var lo = mm.getLong(0)
    var hi = mm.getLong(1)
    var kk = k
    // when min/max span more than half the 64-bit domain (sentinels
    // mixed with real data), hi - lo itself overflows; one extra pass
    // bisecting on the sign bit makes every later range fit: within
    // negatives hi - lo <= -1 - Long.Min = Long.Max, within
    // non-negatives lo >= 0 so hi - lo <= hi
    if (lo < 0 && hi > Long.MaxValue + lo) {
      val neg = vals.filter(col("v") < 0).count()
      if (kk <= neg) hi = -1L else { kk -= neg; lo = 0L }
    }
    while (lo < hi) {
      // ceil width so fanout cells always cover [lo, hi]; written as
      // div-then-+1 (same value for any hi - lo >= 0) so the addition
      // cannot overflow near Long.MaxValue
      val width = (hi - lo) / fanout + 1
      val hist = vals.filter(col("v") >= lo && col("v") <= hi)
        // integer div (`/` on Columns is floating-point)
        .groupBy(expr(s"(v - $lo) div $width").as("cell"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      var acc = 0L
      var i = 0
      var found = false
      while (i < hist.length && !found) {
        if (acc + hist(i)._2 >= kk) {
          kk -= acc
          lo = lo + hist(i)._1 * width
          hi = math.min(hi, lo + width - 1)
          found = true
        } else { acc += hist(i)._2; i += 1 }
      }
      assert(found, "exactKth: rank fell outside the histogram")
    }
    lo
  }

  /** Exact global lower median via [[exactKth]]. */
  def exactMedian(df: DataFrame, valueCol: String): (Long, Long) = {
    val n = df.count()
    (n, exactKth(df, valueCol, (n + 1) / 2))
  }

  /** EXACT two-sample Kolmogorov-Smirnov statistic per group — the
    * distribution-drift test beside PSI (q153): for samples A and B
    * of an integer-valued column, KS = max over values of
    * |ECDF_A − ECDF_B|, computed EXACTLY as max |cumA·nB − cumB·nA|
    * over the per-value rollup (evaluating after all ties of a value,
    * the correct ECDF convention) and published as the integer
    * numerator with ks_milli = 1000·num DIV (nA·nB). No doubles
    * anywhere — the drift number is bit-stable across engines.
    *
    * Scale shape: one groupBy (group, value) rollup, then a
    * cumulative window over the group's DISTINCT VALUES (bounded by
    * value cardinality, not row count) and one max aggregate.
    *
    * Output: (grp, n_a, n_b, ks_num, ks_milli). */
  def ksDrift(df: DataFrame, groupCol: String, valueCol: String,
              inA: Column): DataFrame = {
    val byVal = df.select(col(groupCol).as("grp"),
        col(valueCol).cast("long").as("v"),
        inA.cast("long").as("a"))
      .groupBy("grp", "v")
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
    val wCum = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("grp")
    byVal
      .withColumn("cum_a", sum(col("ca")).over(wCum))
      .withColumn("cum_b", sum(col("cb")).over(wCum))
      .withColumn("n_a", sum(col("ca")).over(wAll))
      .withColumn("n_b", sum(col("cb")).over(wAll))
      .groupBy(col("grp"), col("n_a"), col("n_b"))
      .agg(max(abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
        .as("ks_num"))
      .withColumn("ks_milli", expr(
        """CAST(CASE WHEN n_a > 0 AND n_b > 0
          |THEN (1000 * ks_num) div (n_a * n_b)
          |ELSE -1 END AS BIGINT)""".stripMargin))
      .select("grp", "n_a", "n_b", "ks_num", "ks_milli")
  }

  /** EXACT Mann–Whitney U per group — the rank-sum drift test beside
    * [[ksDrift]] (KS sees shape shifts, U sees stochastic dominance;
    * a drift screen wants both). From the same per-value (ca, cb)
    * rollup: U_A = Σ_v ca(v)·#{B < v} + ca(v)·cb(v)/2 (ties count
    * half). The tie term halves, so the PUBLISHED statistic is
    * doubled — u2_a = 2·U_A stays integer-exact — with the identity
    * u2_a + u2_b = 2·n_a·n_b as the built-in invariant. The effect
    * size ships as auc_ppm = 10⁶·U_A/(n_a·n_b) (the probability a
    * random A exceeds a random B — the AUC), floor-divided; −1
    * sentinel on a degenerate side (the q74 convention).
    *
    * Scale shape identical to [[ksDrift]]: one groupBy (grp, value)
    * rollup, a cumulative window over the group's DISTINCT VALUES
    * (bounded by value cardinality), one sum.
    *
    * Output: (grp, n_a, n_b, u2_a, u2_b, auc_ppm). */
  def mannWhitneyU(df: DataFrame, groupCol: String, valueCol: String,
                   inA: Column): DataFrame = {
    val byVal = df.select(col(groupCol).as("grp"),
        col(valueCol).cast("long").as("v"),
        inA.cast("long").as("a"))
      .groupBy("grp", "v")
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
    val wPrev = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy("grp")
    byVal
      .withColumn("cbp", coalesce(sum(col("cb")).over(wPrev), lit(0L)))
      .withColumn("n_a", sum(col("ca")).over(wAll))
      .withColumn("n_b", sum(col("cb")).over(wAll))
      .groupBy(col("grp"), col("n_a"), col("n_b"))
      .agg(sum(col("ca") * (lit(2L) * col("cbp") + col("cb")))
        .as("u2_a"))
      .withColumn("u2_b",
        lit(2L) * col("n_a") * col("n_b") - col("u2_a"))
      .withColumn("auc_ppm", expr(
        """CAST(CASE WHEN n_a > 0 AND n_b > 0
          |THEN (1000000 * u2_a) div (2 * n_a * n_b)
          |ELSE -1 END AS BIGINT)""".stripMargin))
      .select("grp", "n_a", "n_b", "u2_a", "u2_b", "auc_ppm")
  }

  /** Theil-Sen robust slope per group (the median of all pairwise
    * slopes — 29% breakdown vs OLS's zero, Sen 1968): for bounded
    * per-group series (daily rollups), every pair x_i < x_j yields
    * slope (y_j − y_i)/(x_j − x_i); the LOWER MEDIAN pair under the
    * (double-valued slope, num, den) ordering is published as the
    * exact rational (num, den) plus slope_milli = 1000·num DIV den.
    * The double key only ORDERS (IEEE division is engine-identical);
    * every published number is integer.
    *
    * Scale shape: the pair join is per-group O(n²) — the bounded-
    * series contract (daily/weekly rollups, not raw events; the
    * caller rolls up first, exactly like [[ksDrift]]'s value-
    * cardinality bound). One self-join + one per-group window.
    *
    * Output: (grp, n_pairs, slope_num, slope_den, slope_milli). */
  def theilSen(df: DataFrame, groupCol: String, xCol: String,
               yCol: String): DataFrame = {
    val pts = df.select(col(groupCol).as("grp"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val pairs = pts.as("i").join(pts.as("j"),
        col("i.grp") === col("j.grp") && col("i.x") < col("j.x"))
      .select(col("i.grp").as("grp"),
        (col("j.y") - col("i.y")).as("num"),
        (col("j.x") - col("i.x")).as("den"))
    val w = Window.partitionBy("grp")
      .orderBy((col("num").cast("double") / col("den").cast("double")).asc,
        col("num").asc, col("den").asc)
    val wAll = Window.partitionBy("grp")
    pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("n_pairs", count(lit(1)).over(wAll))
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(col("grp"), col("n_pairs"),
        col("num").as("slope_num"), col("den").as("slope_den"),
        expr("(1000 * num) div den").as("slope_milli"))
  }

  /** Mann–Kendall trend test (Mann 1945, Kendall 1975) per group —
    * the nonparametric monotone-trend twin of [[theilSen]] (same
    * bounded daily-rollup series, same O(n²) pair shape): S =
    * Σ_{x_i<x_j} sign(y_j − y_i), with the tie-corrected variance
    * 18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) over the y-tie
    * groups — kept as the exact integer var18 (never divided by 18,
    * so no rounding enters). Significance at α = 0.05 two-sided uses
    * the normal approximation with continuity correction,
    * z = (|S|−1)/√Var > 1.96, evaluated by integer cross-multiply:
    * 10⁴·18·(|S|−1)² > 38416·var18 (1.96² = 3.8416 exactly), so the
    * published trend ∈ {−1, 0, 1} is deterministic.
    *
    * Scale contract = theilSen's: the caller rolls up to a bounded
    * per-group series first; n(n−1)(2n+5) fits a long to n ~ 2·10⁶
    * points per group, far past any daily series.
    *
    * Output: (grp, n, s_stat, var18, trend). */
  def mannKendall(df: DataFrame, groupCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val pts = df.select(col(groupCol).as("grp"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val s = pts.as("i").join(pts.as("j"),
        col("i.grp") === col("j.grp") && col("i.x") < col("j.x"))
      .groupBy(col("i.grp").as("grp"))
      .agg(sum(signum(col("j.y") - col("i.y")).cast("long"))
        .as("s_stat"))
    val ties = pts.groupBy(col("grp"), col("y"))
      .agg(count(lit(1)).as("t"))
      .groupBy("grp")
      .agg(count(lit(1)).cast("long").as("n_distinct"),
        sum(col("t")).as("n"),
        sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
          .as("tie_term"))
    ties.join(s, Seq("grp"), "left")
      .select(col("grp"), col("n"),
        coalesce(col("s_stat"), lit(0L)).as("s_stat"),
        (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5)
          - col("tie_term")).as("var18"))
      .withColumn("trend", expr(
        """CASE WHEN abs(s_stat) > 1
          |  AND 180000 * (abs(s_stat) - 1) * (abs(s_stat) - 1)
          |      > 38416 * var18
          |  THEN CAST(sign(s_stat) AS BIGINT) ELSE 0L END""".stripMargin))
  }

  /** Chi-square term–class association (the classic feature-selection
    * statistic, e.g. Yang & Pedersen 1997): for every (token, class)
    * the 2×2 presence table (a = class docs containing the token,
    * b/c/d the complements) and the χ² score
    * N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)), published as exact
    * integer micro units through DECIMAL(38,0) arithmetic. Overflow
    * contract (the HITS convention): N⁵ must fit DECIMAL(38) — exact
    * up to ~4·10⁷ documents; beyond that run the double-precision
    * twin (the ranking is insensitive to last-ulp error at that N).
    *
    * Scale shape: one distinct-presence explode + two tiny aggregates
    * (per-class doc counts, per-token doc counts) joined back —
    * broadcast dims, no window. Degenerate tokens (in every doc or
    * only one class's universe edge) keep their row with NULL score
    * when a margin is 0.
    *
    * Output: (token, cls, a, n_cls, n_tok, n_docs, chi2_micro). */
  def chi2Terms(docs: DataFrame, idCol: String, textCol: String,
                classCol: String): DataFrame = {
    val pres = docs.select(col(idCol).as("doc"), col(classCol).as("cls"),
        explode(array_distinct(
          filter(split(lower(col(textCol)), " "), t => t =!= "")))
          .as("token"))
      .localCheckpoint()
    val nDocs = docs.select(col(idCol)).distinct().count()
    val byCls = pres.select(col("doc"), col("cls")).distinct()
      .groupBy("cls").agg(count(lit(1)).as("n_cls"))
    val byTok = pres.select(col("doc"), col("token")).distinct()
      .groupBy("token").agg(count(lit(1)).as("n_tok"))
    pres.groupBy(col("token"), col("cls")).agg(count(lit(1)).as("a"))
      .join(broadcast(byCls), Seq("cls"))
      .join(byTok, Seq("token"))
      .withColumn("n_docs", lit(nDocs))
      .withColumn("chi2_micro", expr(
        """CAST(CASE WHEN n_tok > 0 AND n_tok < n_docs
          |  AND n_cls > 0 AND n_cls < n_docs THEN
          |  (CAST(n_docs AS DECIMAL(38,0))
          |    * (CAST(a AS DECIMAL(38,0)) * (n_docs - n_tok - n_cls + a)
          |       - CAST(n_tok - a AS DECIMAL(38,0)) * (n_cls - a))
          |    * (CAST(a AS DECIMAL(38,0)) * (n_docs - n_tok - n_cls + a)
          |       - CAST(n_tok - a AS DECIMAL(38,0)) * (n_cls - a))
          |    * 1000000)
          |  DIV (CAST(n_tok AS DECIMAL(38,0)) * (n_docs - n_tok)
          |       * n_cls * (n_docs - n_cls))
          |END AS BIGINT)""".stripMargin))
  }
}
