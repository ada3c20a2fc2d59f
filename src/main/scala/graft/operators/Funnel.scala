package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort analytics over the event stream — the
  * product-analytics counterpart of the reference's interactive lookup
  * queries (Project_Overview.ipynb cells 16-17 slice one entity; these
  * slice the population). Both are pure relational compositions: no
  * UDFs, no driver loops.
  *
  * Scale shape: every stage is a groupBy or equi-join keyed on
  * user_id, so all shuffles share one partitioning — Catalyst reuses
  * the exchange across consecutive stages. Step frames shrink
  * monotonically (each step is a subset of the previous), so the
  * per-step joins get cheaper as the funnel deepens; with AQE the
  * later sides broadcast automatically once they fit.
  */
object Funnel {

  /** Strictly-ordered funnel reach: a user reaches step k when their
    * earliest qualifying step-k event is strictly later than their
    * earliest qualifying step-(k-1) event (the classic "first view →
    * first click after it → …" chain).
    *
    * Returns one row per step: (step, event_type, n_users,
    * frac_of_first) ordered by step. frac_of_first is computed as ONE
    * double division so it hash-matches any engine.
    */
  /** Per-user earliest qualifying timestamp of each funnel step, built
    * sequentially (step k's frame filters on "after step k−1's
    * time"). */
  private def stepFrames(events: DataFrame,
                         steps: Seq[String]): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select(col("user_id"), col("event_type"), col("ts"))
    steps.tail.scanLeft(
      e.filter(col("event_type") === steps.head)
        .groupBy("user_id").agg(min(col("ts")).as("t"))
    ) { (prev, step) =>
      e.filter(col("event_type") === step)
        .join(prev.withColumnRenamed("t", "t_prev"), Seq("user_id"))
        .filter(col("ts") > col("t_prev"))
        .groupBy("user_id").agg(min(col("ts")).as("t"))
    }
  }

  def reach(events: DataFrame, steps: Seq[String]): DataFrame = {
    val frames = stepFrames(events, steps)
    val counted = frames.zip(steps).zipWithIndex.map {
      case ((df, step), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step"), lit(step).as("event_type"),
            col("n_users"))
    }
    val all = counted.reduce(_ unionAll _)
    val first = all.filter(col("step") === 1)
      .select(col("n_users").as("n_first"))
    all.crossJoin(broadcast(first))
      .select(col("step"), col("event_type"), col("n_users"),
        (col("n_users").cast("double") / col("n_first"))
          .as("frac_of_first"))
      .orderBy("step")
  }

  /** Conversion latency for funnel completers: microseconds from the
    * first step-1 event to the earliest qualifying final-step event,
    * summarized as ONE row (n_converted, p50_us, p90_us, max_us).
    * Latencies stay integer microseconds until the exact interpolated
    * percentile (the q41-verified percentile ≡ quantile_cont
    * equivalence), so nothing is float-order-sensitive.
    *
    * Scale shape: the same user_id-keyed step chain as [[reach]], then
    * one single-row aggregation over the (narrow) completer set.
    */
  def timeToConvert(events: DataFrame, steps: Seq[String]): DataFrame = {
    val frames = stepFrames(events, steps)
    val first = frames.head
      .select(col("user_id"), unix_micros(col("t")).as("t0"))
    val last = frames.last
      .select(col("user_id"), unix_micros(col("t")).as("t1"))
    last.join(first, Seq("user_id"))
      .select((col("t1") - col("t0")).as("lat_us"))
      .agg(count(lit(1)).as("n_converted"),
        expr("percentile(lat_us, 0.5)").as("p50_us"),
        expr("percentile(lat_us, 0.9)").as("p90_us"),
        max(col("lat_us")).as("max_us"))
  }

  /** Weekly cohort retention: users grouped by the ISO week of their
    * first event (cohort_week, a Monday-truncated date); for each
    * cohort × whole-week offset since first event, the number of
    * distinct active users.
    *
    * week_offset = floor(days_between / 7) as an exact integer: the
    * double division n/7.0 is exact-enough for floor on any day count
    * (nearest double to k is k for multiples of 7; non-multiples sit
    * ≥ 1/7 from an integer, far beyond one ulp), and writing it as
    * floor(x/7.0) mirrors one engine-neutral op order.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val first = events.groupBy("user_id")
      .agg(min(col("ts")).as("first_ts"))
    events.select(col("user_id"), col("ts"))
      .join(first, Seq("user_id"))
      .select(col("user_id"),
        // TIMESTAMP, not DATE: date-typed columns round-trip as python
        // objects in pandas and defeat value comparators; the Monday
        // midnight instant carries the same information.
        date_trunc("week", col("first_ts")).as("cohort_week"),
        floor(
          datediff(col("ts").cast("date"), col("first_ts").cast("date"))
            / lit(7.0d)).cast("long").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }
}
