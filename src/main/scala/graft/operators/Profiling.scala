package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate functional-dependency audit — the data-profiling
  * primitive behind FD discovery (TANE, Huhtala et al. 1999; the
  * error measure is Kivinen & Mannila's g₃): for a candidate X → Y,
  * publish how far the table is from satisfying it.
  *
  *   n_groups     distinct X values
  *   n_violating  X groups seeing more than one Y
  *   excess       Σ_groups (distinct Y − 1)  — extra RHS values
  *   g3           Σ_groups (rows − max single-Y rows) — the minimum
  *                number of row deletions that would make X → Y hold
  *                (the canonical approximate-FD error)
  *   g3_ppm       10⁶·g3 div n_rows
  *
  * Scale shape: ONE two-level aggregation per candidate —
  * groupBy(X, Y).count (map-side combine collapses the fact table to
  * the distinct-pair frame), then groupBy(X) for the per-group
  * max/sum/count, then one global rollup. No windows, no joins, no
  * driver state; a 100 TB fact table reduces at the first exchange
  * to |X×Y| rows. Candidates are a bounded audit list (the checks a
  * warehouse runs nightly), evaluated independently and unioned. */
object Profiling {

  /** One candidate: (name, frame, lhs col, rhs col). */
  def fdAudit(cands: Seq[(String, DataFrame, String, String)])
      : DataFrame = {
    require(cands.nonEmpty)
    cands.map { case (name, df, lhs, rhs) =>
      val pairs = df.select(col(lhs).as("x"), col(rhs).as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("c"))
      val perGroup = pairs.groupBy("x")
        .agg(count(lit(1)).as("n_y"), sum(col("c")).as("rows"),
          max(col("c")).as("maxc"))
      perGroup.agg(
          sum(col("rows")).as("n_rows"),
          count(lit(1)).as("n_groups"),
          sum(when(col("n_y") > 1, 1L).otherwise(0L))
            .as("n_violating"),
          sum(col("n_y") - 1).as("excess"),
          sum(col("rows") - col("maxc")).as("g3"))
        .select(lit(name).as("fd"), col("n_rows"), col("n_groups"),
          col("n_violating"), col("excess"), col("g3"),
          expr("(1000000 * g3) div n_rows").as("g3_ppm"))
    }.reduce(_ unionByName _)
  }
}
