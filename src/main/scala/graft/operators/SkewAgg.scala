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

  /** Skew-aware join: replicate the SMALL side across `salts` copies
    * and salt the big side's key by a deterministic row hash, so one
    * hot key's rows spread over `salts` reducers. Result-identical to
    * the plain equi join. (AQE's skew-join split handles sort-merge
    * cases at runtime; explicit salting is the portable form and works
    * for any join type.) */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltSource: Column, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(saltSource), lit(salts)).cast("int"))
    val replicated = small
      .withColumn("_salt", explode(lit((0 until salts).toArray)))
    saltedBig.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

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
