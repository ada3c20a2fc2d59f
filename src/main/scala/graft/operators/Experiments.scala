package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CUPED — Controlled-experiment Using Pre-Experiment Data (Deng, Xu,
  * Kohavi & Walker 2013, WSDM; the industry-standard variance-
  * reduction for online A/B metrics): regress the experiment metric y
  * on a pre-experiment covariate x and analyze the residualized
  * metric ŷᵢ = yᵢ − θ(xᵢ − x̄) with θ = cov(x,y)/var(x) fitted on the
  * POOLED population (arm-independent, so the adjustment is unbiased
  * for the treatment effect); the variance shrinks by the factor
  * 1 − ρ²(x,y), often 40-60 % for pre/post activity metrics, i.e. the
  * same experiment sensitivity from half the traffic.
  *
  * Integer contract (the q310 composed-floor fixed-point stance):
  * x and y are whole-dollar sums (floor of the order totals), all
  * moment sums are exact longs, the big cross products run in
  * decimal(38,0) (DuckDB replays them in HUGEINT), and every published
  * ratio is a single `div` chain evaluated in the SAME order by engine
  * and oracle — θ as thousandths, means as hundredths, ρ² as ppm via
  * the composed floor ((10⁶·num) div den) · num div den_y (one
  * intermediate floor, identically placed on both sides, keeps every
  * intermediate under 10³⁸).
  *
  * Adjusted mean as ONE exact rational: with num = n·Σxy − Σx·Σy,
  * den = n·Σx² − (Σx)² (so θ = num/den),
  *
  *   mean_adj_a = Σy_a/n_a − (num/den)·(Σx_a/n_a − Σx/n)
  *              = [Σy_a·den·n − num·(Σx_a·n − Σx·n_a)] / (den·n_a·n)
  *
  * — numerator and denominator exact in decimal(38,0) (≤ ~10³⁷ at
  * sf0.1 in dollars), floored once at the end into hundredths.
  *
  * Scale shape: one groupBy(unit) rollup of the fact table (map-side
  * partial sums), one global agg of 5 moments, one 2-row arm agg — no
  * windows, no driver math beyond the final 2-row join of broadcast
  * scalars. The unit universe comes from the dimension table (left
  * join + zero-fill) so units with no activity still dilute the arm
  * means, exactly as a real experiment population would. */
object Experiments {

  private val P = 1000000007L

  /** Two-proportion z-test (the classic conversion-rate A/B gate) on
    * a PRF arm split — exact integer decision: with conversions c_a
    * of n_a vs c_b of n_b, pooled C = c_a + c_b over N = n_a + n_b,
    * the pooled z² = (c_a·n_b − c_b·n_a)²·N / (n_a·n_b·C·(N−C)) and
    * significance at α = 0.05 two-sided is the cross-multiplied
    * compare 10⁴·(c_a·n_b − c_b·n_a)²·N > 38416·n_a·n_b·C·(N−C)
    * (1.96² = 3.8416 exactly) — decimal(38,0) keeps every product
    * exact (DuckDB replays in HUGEINT). Output: ONE row
    * (n_a, conv_a, rate_a_ppm, n_b, conv_b, rate_b_ppm, diff_ppm,
    * significant). */
  def twoProportion(units: DataFrame, unitCol: String,
                    convCol: String): DataFrame = {
    val pop = units.select(col(unitCol).cast("long").as("u"),
        col(convCol).cast("long").as("conv"))
      .select(col("u"),
        pmod(pmod(col("u") * 1000003L + 12345L, lit(P)), lit(2L))
          .as("arm"), col("conv"))
    pop.agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 0, col("conv")).otherwise(0L))
          .as("conv_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 1, col("conv")).otherwise(0L))
          .as("conv_b"))
      .select(col("n_a"), col("conv_a"),
        expr("(1000000 * conv_a) div n_a").as("rate_a_ppm"),
        col("n_b"), col("conv_b"),
        expr("(1000000 * conv_b) div n_b").as("rate_b_ppm"),
        expr("(1000000 * conv_a) div n_a - (1000000 * conv_b) div n_b")
          .as("diff_ppm"),
        expr("""10000 * (CAST(conv_a AS DECIMAL(38,0)) * n_b
                  - CAST(conv_b AS DECIMAL(38,0)) * n_a)
                * (CAST(conv_a AS DECIMAL(38,0)) * n_b
                  - CAST(conv_b AS DECIMAL(38,0)) * n_a)
                * (n_a + n_b)
              > 38416 * CAST(n_a AS DECIMAL(38,0)) * n_b
                * (conv_a + conv_b)
                * (n_a + n_b - conv_a - conv_b)""")
          .as("significant"))
  }

  /** units: (unitCol) dimension frame — the experiment population.
    * facts: (unitCol, tsCol, valueCol) — metric events.
    * Pre-period = ts < splitTs; post = ts >= splitTs.
    * Arm assignment is the PRF ((unit·1000003 + 12345) mod P) mod 2.
    * Output: one row per arm,
    * (arm, n_units, sum_x, sum_y, mean_y_centi, mean_adj_centi,
    *  theta_milli, rho2_ppm). */
  def cuped(units: DataFrame, facts: DataFrame, unitCol: String,
            tsCol: String, valueCol: String,
            splitTs: String): DataFrame = {
    val perUnit = facts
      .select(col(unitCol).as("u"),
        when(col(tsCol) < lit(splitTs).cast("timestamp"),
          floor(col(valueCol)).cast("long")).otherwise(0L).as("xv"),
        when(col(tsCol) >= lit(splitTs).cast("timestamp"),
          floor(col(valueCol)).cast("long")).otherwise(0L).as("yv"))
      .groupBy("u")
      .agg(sum(col("xv")).as("x"), sum(col("yv")).as("y"))
    val pop = units.select(col(unitCol).as("u")).distinct()
      .join(perUnit, Seq("u"), "left")
      .select(col("u"),
        pmod(pmod(col("u") * 1000003L + 12345L, lit(P)), lit(2L))
          .as("arm"),
        coalesce(col("x"), lit(0L)).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
    // pooled moments, exact longs (x,y ≤ ~10⁷ dollars per unit)
    val g = pop.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val arms = pop.groupBy("arm")
      .agg(count(lit(1)).as("na"), sum(col("x")).as("sxa"),
        sum(col("y")).as("sya"))
    arms.crossJoin(broadcast(g))
      .select(col("arm"), col("na").as("n_units"),
        col("sxa").as("sum_x"), col("sya").as("sum_y"),
        expr("(100 * sya) div na").as("mean_y_centi"),
        expr("""(100 * (CAST(sya AS DECIMAL(38,0))
                  * (CAST(n AS DECIMAL(38,0)) * sxx
                     - CAST(sx AS DECIMAL(38,0)) * sx)
                  * n
                - (CAST(n AS DECIMAL(38,0)) * sxy
                   - CAST(sx AS DECIMAL(38,0)) * sy)
                  * (CAST(sxa AS DECIMAL(38,0)) * n
                     - CAST(sx AS DECIMAL(38,0)) * na)))
               div ((CAST(n AS DECIMAL(38,0)) * sxx
                     - CAST(sx AS DECIMAL(38,0)) * sx)
                    * na * n)""").as("mean_adj_centi"),
        expr("""(1000 * (CAST(n AS DECIMAL(38,0)) * sxy
                  - CAST(sx AS DECIMAL(38,0)) * sy))
               div (CAST(n AS DECIMAL(38,0)) * sxx
                    - CAST(sx AS DECIMAL(38,0)) * sx)""")
          .as("theta_milli"),
        // ρ²·10⁶ by composed floor: one intermediate floor keeps the
        // squared covariance inside decimal(38,0)
        expr("""((1000000 * (CAST(n AS DECIMAL(38,0)) * sxy
                   - CAST(sx AS DECIMAL(38,0)) * sy))
                div (CAST(n AS DECIMAL(38,0)) * sxx
                     - CAST(sx AS DECIMAL(38,0)) * sx)
                * (CAST(n AS DECIMAL(38,0)) * sxy
                   - CAST(sx AS DECIMAL(38,0)) * sy))
               div (CAST(n AS DECIMAL(38,0)) * syy
                    - CAST(sy AS DECIMAL(38,0)) * sy)""")
          .as("rho2_ppm"))
  }
}
