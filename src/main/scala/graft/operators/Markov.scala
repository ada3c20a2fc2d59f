package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stationary distribution of the empirical Markov chain over event
  * types — π = πP by fixed-point power iteration (the PageRank
  * machinery on the per-entity transition graph; Kemeny & Snell's
  * classic regular-chain limit): transition probabilities are exact
  * floors p_ij = 10⁶·c_ij div c_i from the per-entity (ts, tie)-lag
  * pair counts, and each of the 12 unrolled rounds computes
  * π'_j = (Σ_i π_i·p_ij) div 10⁶ — one floor per state per round,
  * replayed verbatim (the q102/q308 integer-ppm iteration stance; the
  * floor drains ≤ |states| ppm of mass per round, which is the
  * documented fixed-point semantics, not drift — and also why there
  * is no EXACT fixed point to early-exit on: the 12-round unroll is
  * the contract on both engines; well-mixed small-alphabet chains
  * stationarize in far fewer).
  *
  * Scale shape: ONE bounded per-entity window builds the lag pairs
  * (the q14/q155 sessionization contract), a hash groupBy collapses
  * them to the |states|² matrix, and the iteration joins |states|-row
  * frames — the corpus is touched exactly once. */
object Markov {

  def stationaryPpm(events: DataFrame, entityCol: String,
                    typeCol: String, tsCol: String, tieCol: String,
                    rounds: Int = 12): DataFrame = {
    val w = Window.partitionBy("u").orderBy(col("ts"), col("tie"))
    val lagged = events.select(col(entityCol).as("u"),
        col(typeCol).as("t"), col(tsCol).as("ts"),
        col(tieCol).as("tie"))
      .withColumn("prev", lag(col("t"), 1).over(w))
      .filter(col("prev").isNotNull)
    val trans = lagged.groupBy(col("prev").as("i"), col("t").as("j"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val outDeg = trans.groupBy("i").agg(sum(col("c")).as("ci"))
    val p = trans.join(outDeg, Seq("i"))
      .select(col("i"), col("j"),
        expr("(1000000 * c) div ci").as("p_ppm"))
      .localCheckpoint()
    val states = p.select(col("i").as("s")).distinct()
      .unionByName(p.select(col("j").as("s")).distinct())
      .distinct()
      .localCheckpoint()
    val nStates = states.count()
    var pi = states.select(col("s"),
        lit(1000000L / nStates).as("pi_ppm"))
      .localCheckpoint()
    var r = 0
    while (r < rounds) {
      val next = p
        .join(pi.select(col("s").as("i"), col("pi_ppm")), Seq("i"))
        .groupBy(col("j").as("s"))
        .agg(sum(col("pi_ppm") * col("p_ppm")).as("num"))
        .select(col("s"), expr("num div 1000000").as("pi_ppm"))
        // absorbing-free chains keep every state reachable; states
        // with no inbound mass this round drop and rejoin as zero
        .join(states, Seq("s"), "right")
        .select(col("s"),
          coalesce(col("pi_ppm"), lit(0L)).as("pi_ppm"))
        .localCheckpoint()
      pi = next
      r += 1
    }
    pi.select(col("s").as("state"), col("pi_ppm"))
  }
}
