package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): rows not dominated under
  * (minimize `minCol`, maximize `maxCol`) — the multi-objective
  * shortlist query (cheapest-vs-largest parts, quality-vs-length
  * documents) that naive SQL writes as a quadratic NOT EXISTS
  * self-join.
  *
  * Sort-based linear formulation: reduce to one row per distinct
  * `minCol` value (keep the group's best `maxCol`), then a running
  * strict-prefix max over the sorted distinct values. A row is
  * dominated iff a strictly-cheaper value already achieved ≥ its
  * `maxCol`, or its own value group contains a strictly larger
  * `maxCol`. O(n) comparisons after one sort vs O(n²) for the
  * self-join — and the oracle IS that self-join, so the test proves
  * the rewrite.
  *
  * Scale shape: the groupBy reduces to distinct `minCol` values with
  * map-side partials; only that reduced set passes through the
  * global-order window (single partition of DISTINCT VALUES, not
  * rows — the standard skyline concession; range-partition +
  * per-partition frontier + boundary merge is the same algorithm
  * sharded, which this operator's per-group reduction already set up).
  */
object Skyline {

  /** @return input rows on the (min minCol, max maxCol) frontier */
  def frontier2d(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val perValue = df.groupBy(col(minCol))
      .agg(max(col(maxCol)).as("_grp_best"))
    val w = Window.orderBy(col(minCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontierVals = perValue
      .withColumn("_prefix_best", max(col("_grp_best")).over(w))
      // dominated by a strictly-cheaper value achieving >= our best
      .filter(col("_prefix_best").isNull
        || col("_prefix_best") < col("_grp_best"))
      .select(col(minCol), col("_grp_best"))
    df.join(frontierVals, Seq(minCol))
      // within the value group, only the best maxCol survives
      .filter(col(maxCol) === col("_grp_best"))
      .drop("_grp_best")
  }
}
