package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deequ-style data-quality expectations: declarative per-row
  * constraints plus referential checks, reported as one row per check
  * with its violation count — the validation gate a pipeline runs
  * before promoting a 100 TB batch (the reference's only analog is the
  * ad-hoc existence probe before insert, Scraper.py:409-412).
  *
  * Scale shape: ALL per-row constraints are fused into a single scan —
  * one aggregate computes every violation count via conditional sums
  * (map-side partials, no shuffle of row data), then `stack` unpivots
  * the one result row into (check, violations). Referential integrity
  * is the one check that genuinely needs a second table: a left-anti
  * join (broadcast when the dimension is small) counted the same way.
  * No per-check scans, no driver-side row inspection.
  */
object Expectations {

  /** One row per check: (check, violations, passed). `checks` are
    * (name, per-row VIOLATION predicate) pairs evaluated in one pass. */
  def report(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    val aggs = checks.map { case (name, bad) =>
      sum(when(bad, 1L).otherwise(0L)).as(name)
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = checks.map { case (name, _) => s"'$name', $name" }
      .mkString(", ")
    one.select(expr(
        s"stack(${checks.size}, $stackArgs) AS (check, violations)"))
      .withColumn("passed", col("violations") === 0L)
  }

  /** Referential-integrity check as a report row: rows of `fact` whose
    * `key` has no match in `dim.dimKey` (null keys are their own
    * not-null check — excluded here). */
  def referential(fact: DataFrame, key: String, dim: DataFrame,
                  dimKey: String, name: String): DataFrame =
    fact.filter(col(key).isNotNull)
      .join(dim.select(col(dimKey).as(key)), Seq(key), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("check"), col("violations"),
        (col("violations") === 0L).as("passed"))
}
