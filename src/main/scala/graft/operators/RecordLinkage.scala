package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter
  * 1969) — the decision-theoretic framework behind every serious
  * entity-resolution system: candidate pairs from BLOCKING, per-field
  * agreement/disagreement LOG-ODDS WEIGHTS (w_a = ln(m/u) for
  * agreement, ln((1−m)/(1−u)) for disagreement, fitted by EM out of
  * band), a summed match score, and a two-threshold decision into
  * match / possible (clerical review) / non-match.
  *
  * This operator takes the weights as INTEGER MILLI-UNITS (score =
  * Σ weights in thousandths of a ban/nat — whichever base the fit
  * used; the decision only needs ordering and thresholds, so the
  * base never matters). All-integer end to end: no doubles anywhere
  * in scoring, so the scoreboard is bit-stable across engines (the
  * q201 convention).
  *
  * Comparison-vector convention: both inputs must be pre-projected to
  * carry the SAME field-column names; a field agrees iff the two
  * values are equal and non-null — a NULL on either side scores the
  * disagreement weight (treat "missing ⇒ no information" by giving
  * that field wDisagree = 0 in the caller's weight table, the
  * standard FS practice).
  *
  * Scale shape: ONE equi-join on the blocking key(s) — candidate
  * count is Σ_b |A_b|·|B_b|, never |A|·|B|; a hot block is the skew
  * risk and takes the standard salting/AQE treatment, not a code
  * change here. Scoring is map-side arithmetic on the joined row;
  * the top-k publication is the ordered-limit the optimizer already
  * turns into per-partition limits.
  */
object RecordLinkage {

  /** One comparison field: the shared column name and its
    * agreement/disagreement weights in milli-units. */
  final case class Field(name: String, wAgree: Long, wDisagree: Long)

  /** Score blocked candidate pairs.
    *
    * `a`/`b` must carry `aId`/`bId`, every `blockCols` column, and
    * every `fields(_).name` column. Decision: score ≥ upperMilli ⇒
    * 'match'; ≥ lowerMilli ⇒ 'possible'; else 'non_match'.
    *
    * Output: (a_id, b_id, agree_<field>… , score_milli, decision). */
  /** Blocked comparison vectors — the shared front half of
    * [[fellegiSunter]] and [[emFit]]: one equi-join on the blocking
    * key(s), one boolean agreement column per field (NULL on either
    * side ⇒ disagree). Output: (a_id, b_id, agree_<field>…). */
  private def comparisons(a: DataFrame, aId: String,
                          b: DataFrame, bId: String,
                          blockCols: Seq[String],
                          fieldNames: Seq[String]): DataFrame = {
    val aSide = a.select((col(aId).as("a_id") +:
      blockCols.map(col)) ++
      fieldNames.map(f => col(f).as(s"a_$f")): _*)
    val bSide = b.select((col(bId).as("b_id") +:
      blockCols.map(col)) ++
      fieldNames.map(f => col(f).as(s"b_$f")): _*)
    val joined = aSide.join(bSide, blockCols)
    fieldNames.foldLeft(joined) { (d, f) =>
      d.withColumn(s"agree_$f",
        coalesce(col(s"a_$f") === col(s"b_$f"), lit(false)))
    }
  }

  def fellegiSunter(a: DataFrame, aId: String,
                    b: DataFrame, bId: String,
                    blockCols: Seq[String], fields: Seq[Field],
                    upperMilli: Long, lowerMilli: Long): DataFrame = {
    require(fields.nonEmpty && upperMilli >= lowerMilli)
    val withAgree = comparisons(a, aId, b, bId, blockCols,
      fields.map(_.name))
    val score = fields.map(f =>
      when(col(s"agree_${f.name}"), f.wAgree).otherwise(f.wDisagree))
      .reduce(_ + _)
    withAgree
      .withColumn("score_milli", score.cast("long"))
      .withColumn("decision",
        when(col("score_milli") >= upperMilli, "match")
          .when(col("score_milli") >= lowerMilli, "possible")
          .otherwise("non_match"))
      .select(col("a_id") +: col("b_id") +:
        fields.map(f => col(s"agree_${f.name}")) :+
        col("score_milli") :+ col("decision"): _*)
  }

  // --- EM weight fitting (Winkler 1988) ---------------------------------
  //
  // The missing half of a self-contained linkage pipeline: estimate
  // (m_f, u_f, λ) from the blocked comparison vectors themselves under
  // the conditional-independence FS model, by bounded-iteration EM —
  // the Lloyd/BPE per-round convention.
  //
  //   E: w_γ = λ·Π_f m_f^{γ_f}(1−m_f)^{1−γ_f} / (that + (1−λ)·Π u …)
  //   M: m_f = Σ_γ n_γ w_γ γ_f / Σ_γ n_γ w_γ   (u_f with 1−w_γ),
  //      λ   = Σ_γ n_γ w_γ / Σ_γ n_γ
  //
  // Engine-exactness: EM runs on the PATTERN-COUNT table (≤ 2^F rows),
  // so every per-pattern double (the products, w_γ) is a fixed-order
  // expression both engines evaluate identically, and every cross-
  // pattern sum goes through the house DECIMAL(38,15) quantization
  // (cast each term, sum exactly, ONE double division at the end) —
  // order-free, bit-stable. No logarithms anywhere: the published
  // weights are ppm floors of m, u and the m/u likelihood RATIOS
  // (callers wanting log-weights take ln offline; ln is the one
  // transcendental DuckDB and the JVM may round differently, so it
  // never enters the scoreboard).
  //
  // Scale shape: ONE distributed shuffle — candidate pairs to the 2^F
  // pattern counts (map-side-combined groupBy). The EM loop then
  // touches only the checkpointed pattern table crossed with a 1-row
  // params frame: per-iteration cost is independent of corpus size,
  // and nothing is ever collected. DECIMAL(38,15) term bound: 23
  // integer digits ≫ any n_γ·w product (n_γ ≤ total candidate pairs,
  // w ≤ 1).

  /** Bounded-iteration EM over a pattern-count table.
    * patterns: one row per agreement pattern with boolean columns
    * `agree_<f>` for every `fieldNames` entry and a `n` count.
    * Returns ONE row: (m_0…m_{F−1}, u_0…, lam) as doubles, clamped to
    * [1e-6, 1−1e-6] (degenerate fixed points stay invertible).
    * Init: m=0.9, u=0.1, λ=0.1 — the standard textbook start. */
  private[graft] def emIterate(patterns: DataFrame,
                               fieldNames: Seq[String],
                               iters: Int): DataFrame = {
    require(fieldNames.nonEmpty && iters >= 1)
    val F = fieldNames.size
    val eps = 1e-6
    def clamp(c: Column): Column =
      least(lit(1.0d - eps), greatest(lit(eps), c))
    def dec(c: Column): Column = c.cast("decimal(38,15)")
    var params = patterns.sparkSession.range(1).select(
      (0 until F).map(i => lit(0.9d).as(s"m_$i")) ++
        (0 until F).map(i => lit(0.1d).as(s"u_$i")) :+
        lit(0.1d).as("lam"): _*)
    (0 until iters).foreach { _ =>
      // E-step: fixed-order left fold over fields for both products
      val pm = fieldNames.zipWithIndex.foldLeft(lit(1.0d)) {
        case (acc, (f, i)) =>
          acc * when(col(s"agree_$f"), col(s"m_$i"))
            .otherwise(lit(1.0d) - col(s"m_$i"))
      }
      val pu = fieldNames.zipWithIndex.foldLeft(lit(1.0d)) {
        case (acc, (f, i)) =>
          acc * when(col(s"agree_$f"), col(s"u_$i"))
            .otherwise(lit(1.0d) - col(s"u_$i"))
      }
      val e = patterns.crossJoin(broadcast(params))
        .withColumn("nd", col("n").cast("double"))
        .withColumn("w",
          (col("lam") * pm) /
            (col("lam") * pm + (lit(1.0d) - col("lam")) * pu))
      // M-step: one aggregation job, every sum DECIMAL-exact
      val mExprs = fieldNames.zipWithIndex.map { case (f, i) =>
        clamp(sum(dec(when(col(s"agree_$f"), col("nd") * col("w"))
            .otherwise(lit(0.0d)))).cast("double") /
          sum(dec(col("nd") * col("w"))).cast("double")).as(s"m_$i")
      }
      val uExprs = fieldNames.zipWithIndex.map { case (f, i) =>
        clamp(sum(dec(when(col(s"agree_$f"),
              col("nd") * (lit(1.0d) - col("w")))
            .otherwise(lit(0.0d)))).cast("double") /
          sum(dec(col("nd") * (lit(1.0d) - col("w"))))
            .cast("double")).as(s"u_$i")
      }
      val lamExpr = clamp(
        sum(dec(col("nd") * col("w"))).cast("double") /
          sum(dec(col("nd"))).cast("double")).as("lam")
      val all = mExprs ++ uExprs :+ lamExpr
      params = e.agg(all.head, all.tail: _*).localCheckpoint()
    }
    params
  }

  /** EM-fit FS parameters over blocked candidate pairs and publish
    * them integer-exact: one row per field,
    * (field, m_ppm, u_ppm, agree_ratio_ppm, disagree_ratio_ppm,
    * lambda_ppm) — ratios are floor(1e6·m/u) and
    * floor(1e6·(1−m)/(1−u)), the FS likelihood-ratio weights without
    * the log. Inputs as [[fellegiSunter]]: both sides pre-projected to
    * shared `fieldNames` columns plus the blocking key(s). */
  def emFit(a: DataFrame, aId: String, b: DataFrame, bId: String,
            blockCols: Seq[String], fieldNames: Seq[String],
            iters: Int): DataFrame = {
    val patterns = comparisons(a, aId, b, bId, blockCols, fieldNames)
      .groupBy(fieldNames.map(f => col(s"agree_$f")): _*)
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val params = emIterate(patterns, fieldNames, iters)
    def ppm(c: Column): Column =
      floor(c * lit(1000000.0d)).cast("long")
    val rows = fieldNames.zipWithIndex.map { case (f, i) =>
      struct(lit(f).as("field"),
        ppm(col(s"m_$i")).as("m_ppm"),
        ppm(col(s"u_$i")).as("u_ppm"),
        ppm(col(s"m_$i") / col(s"u_$i")).as("agree_ratio_ppm"),
        ppm((lit(1.0d) - col(s"m_$i")) / (lit(1.0d) - col(s"u_$i")))
          .as("disagree_ratio_ppm"),
        ppm(col("lam")).as("lambda_ppm"))
    }
    params.select(explode(array(rows: _*)).as("r")).select("r.*")
  }
}
