package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (band) join: match left rows whose value falls in a right
  * row's [lo, hi) interval.
  *
  * The naive form is a theta join — O(|L|·|R|) comparisons, a
  * BroadcastNestedLoopJoin at best. The scalable form buckets the
  * value domain: each interval is expanded to the buckets it covers,
  * the left side is bucketed by value, and an EQUI join on bucket id
  * meets only candidates, refined by the exact predicate. One shuffle
  * on the bucket key; work scales with overlap density, not |L|·|R|.
  * (Same technique Spark's own range-join hints and interval-join
  * implementations use.)
  */
object RangeJoin {

  /** left: must contain `valueCol`; right: intervals with loCol/hiCol
    * (hi exclusive). bucketWidth trades replication (wide intervals →
    * many buckets) against candidate density. */
  def byBucket(left: DataFrame, valueCol: String,
               right: DataFrame, loCol: String, hiCol: String,
               bucketWidth: Double): DataFrame = {
    val lb = left.withColumn("_bucket",
      floor(col(valueCol) / bucketWidth).cast("long"))
    val rb = right
      .withColumn("_bucket",
        explode(sequence(
          floor(col(loCol) / bucketWidth).cast("long"),
          // hi is exclusive: a hi exactly on a bucket edge does not
          // reach into the next bucket
          floor((col(hiCol) - lit(1e-9)) / bucketWidth).cast("long"))))
    lb.join(rb, Seq("_bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("_bucket")
  }

  /** Interval-overlap join (inclusive ends): pairs (a, b) with
    * `a.lo <= b.hi AND b.lo <= a.hi`. Same bucketing idea as
    * [[byBucket]], but both sides are intervals: each expands to the
    * bucket range it covers, candidates meet on bucket equality, and
    * the pair is kept ONLY in the bucket containing max(a.lo, b.lo) —
    * the first bucket where both are live — so no distinct pass is
    * needed to dedup multi-bucket pairs. Lo/hi are LONGS (e.g. epoch
    * micros); `bucketWidth` trades interval replication against
    * candidate density — set it near the typical interval length.
    *
    * Callers rename columns to avoid collisions; both inputs must
    * carry `loCol`/`hiCol` under the given names prefixed a_/b_. */
  def intervalOverlapPairs(a: DataFrame, b: DataFrame,
      loA: String, hiA: String, loB: String, hiB: String,
      bucketWidth: Long): DataFrame = {
    def buckets(lo: Column, hi: Column): Column =
      explode(sequence(floor(lo / bucketWidth).cast("long"),
        floor(hi / bucketWidth).cast("long")))
    val ab = a.withColumn("_bucket", buckets(col(loA), col(hiA)))
    val bb = b.withColumn("_bucket", buckets(col(loB), col(hiB)))
    ab.join(bb, Seq("_bucket"))
      .filter(col(loA) <= col(hiB) && col(loB) <= col(hiA))
      .filter(col("_bucket") ===
        floor(greatest(col(loA), col(loB)) / bucketWidth).cast("long"))
      .drop("_bucket")
  }
}
