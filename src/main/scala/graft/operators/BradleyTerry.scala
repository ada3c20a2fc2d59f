package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bradley–Terry preference-strength fitting — the model behind
  * pairwise-comparison data (RLHF preference sets, A/B ranking,
  * "which response is better" labels): P(i beats j) = π_i/(π_i+π_j),
  * fit by the classic minorization–maximization iteration
  * π_i ← W_i / Σ_j n_ij/(π_i + π_j) (Hunter 2004, "MM algorithms for
  * generalized Bradley-Terry models").
  *
  * Restated in exact integer fixed point so any SQL engine replays
  * every iteration bit-for-bit (the q102 PageRank convention):
  * strengths live as micro-units p = ⌊π·10⁶⌋, each pair contributes
  * ⌊n_ij·10¹² / (p_i+p_j)⌋ to the denominator sum d_i, and the update
  * is p_i ← ⌊W_i·10¹² / d_i⌋. Zero-win players collapse to p = 0 (the
  * MLE boundary); both divisions clamp their denominator to ≥ 1 so
  * the all-zero pair never divides by zero — deterministically, in
  * both engines. Exact while n_ij and W_i stay < ~9·10⁶ (the 10¹²
  * scale's headroom); pre-aggregate or drop to 10⁹ scaling beyond.
  *
  * The reference has nothing comparable; this is the preference-data
  * half of a training pipeline (reward-model data prep: turn raw
  * pairwise judgments into per-item strengths and flag inconsistent
  * annotators against them).
  *
  * Scale shape: one aggregation builds the directed pair-stat edge
  * list (two rows per unordered pair — fixed width, no text); each
  * iteration is two hash equi-joins p⋈edges plus one grouped sum —
  * the PageRank power-iteration shape, shuffling O(edges) per round
  * with map-side partial sums. No driver state, no collect; `iters`
  * is a small constant fixed up front.
  */
object BradleyTerry {

  /** Fit strengths from a contest log (one row per decided contest).
    * Output: (player, w, n, p) — total wins, total contests, and the
    * 10⁶-scaled strength after `iters` MM rounds from the uniform
    * start p = 10⁶. */
  def strengths(contests: DataFrame, winnerCol: String, loserCol: String,
                iters: Int): DataFrame = {
    require(iters >= 1, s"BradleyTerry needs iters >= 1, got $iters")
    val edges = contests
      .select(col(winnerCol).as("u"), col(loserCol).as("v"))
      .unionByName(contests.select(col(loserCol).as("u"),
        col(winnerCol).as("v")))
      .groupBy("u", "v").agg(count(lit(1)).as("n"))
      .localCheckpoint() // reused every iteration: pin it once
    val wins = contests.groupBy(col(winnerCol).as("u"))
      .agg(count(lit(1)).as("w"))
    val totals = edges.groupBy("u").agg(sum(col("n")).as("n_all"))
    var p = totals.join(wins, Seq("u"), "left")
      .select(col("u"), coalesce(col("w"), lit(0L)).as("w"),
        col("n_all").as("n"), lit(1000000L).as("p"))
    for (_ <- 1 to iters) {
      val cur = p.select(col("u"), col("p"))
      val d = edges
        .join(cur.select(col("u"), col("p").as("pu")), Seq("u"))
        .join(cur.select(col("u").as("v"), col("p").as("pv")), Seq("v"))
        .groupBy("u")
        .agg(sum(expr(
          "CAST(n * 1000000000000 DIV GREATEST(pu + pv, 1) AS BIGINT)"))
          .as("d"))
      p = p.drop("p").join(d, Seq("u"))
        .select(col("u"), col("w"), col("n"),
          expr("CAST(w * 1000000000000 DIV GREATEST(d, 1) AS BIGINT)")
            .as("p"))
    }
    p.select(col("u").as("player"), col("w"), col("n"), col("p"))
  }
}
