package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware aggregation: two-phase "salted" groupBy.
  *
  * A plain `groupBy(key)` over a low-cardinality / skewed key column
  * shuffles every row of a hot key to one reducer. Salting splits each
  * key into `salts` sub-groups (deterministic hash of a row id — NOT
  * rand(), which would break retry determinism), partially aggregates
  * per (key, salt), then merges the partials — the hot key's work fans
  * out over `salts` reducers. For algebraic aggregates (sum/count/min/
  * max) the result is identical to the unsalted groupBy, so the DuckDB
  * oracle is just the plain GROUP BY.
  *
  * (Spark's map-side partial aggregation already handles most of this
  * for algebraic functions; salting is the explicit fix when the
  * partial-agg hash table overflows on high-cardinality compound keys,
  * or for operations with large per-key state — collect_list, exact
  * percentiles, distinct counts.)
  */
object SkewAgg {

  /** Two-phase sum/count per key, salted by a deterministic row hash. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     saltSource: Column, salts: Int): DataFrame = {
    val salted = df.select(
      key.as("k"),
      value.as("v"),
      pmod(xxhash64(saltSource), lit(salts)).as("salt"))
    val partial = salted
      .groupBy(col("k"), col("salt"))
      .agg(sum(col("v")).as("ps"), count(lit(1)).as("pc"))
    partial
      .groupBy(col("k"))
      .agg(sum(col("ps")).as("sum_value"), sum(col("pc")).as("n"))
  }
}
