package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition-key skew telemetry — the diagnostic every shuffle-heavy
  * pipeline runs before picking join/bucket keys: per candidate key
  * column, the cardinality, the heaviest key's share, and the Gini
  * coefficient of the key-count distribution (0 = perfectly uniform,
  * → 1 = one key owns everything). With counts c₁ ≤ … ≤ c_n ranked
  * ascending (ties broken by key value for determinism),
  *
  *   Gini = (2·Σ i·c_i) / (n·Σ c) − (n + 1)/n
  *
  * published as ONE exact floor over the common denominator n·Σc:
  * gini_ppm = 10⁶·(2·Σ i·c_i − (n+1)·Σc) div (n·Σc).
  *
  * Scale shape: one hash groupBy per candidate collapses the fact
  * table to its key histogram; the rank over counts uses
  * `globalRowIds`-style range partitioning via a window over the
  * (bounded: |keys|-sized) histogram — at 100 TB the histogram, not
  * the table, is what sorts. Σ i·c_i for i ≤ n ≤ 2·10⁹ and counts
  * ≤ 2⁶³/n stays exact in longs for every real histogram. */
object SkewProfile {

  /** One candidate: (name, frame, key col). */
  def keySkew(cands: Seq[(String, DataFrame, String)]): DataFrame = {
    require(cands.nonEmpty)
    cands.map { case (name, df, key) =>
      val hist = df.select(col(key).cast("string").as("k"))
        .groupBy("k").agg(count(lit(1)).as("c"))
      // ascending-count rank via range partitioning (globalRowIds) —
      // the histogram can itself be huge (user-id keys), so no
      // single-partition window
      val ranked = Curation.globalRowIds(hist, Seq("c", "k"))
        .withColumnRenamed("global_id", "i")
      ranked.agg(
          count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
          max(col("c")).as("max_count"),
          sum(col("i") * col("c")).as("wsum"))
        .select(lit(name).as("key"), col("n_keys"), col("n_rows"),
          col("max_count"),
          expr("(1000000 * max_count) div n_rows")
            .as("top1_share_ppm"),
          expr("""(1000000 * (2 * wsum - (n_keys + 1) * n_rows))
                 div (n_keys * n_rows)""").as("gini_ppm"))
    }.reduce(_ unionByName _)
  }
}
