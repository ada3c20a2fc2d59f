package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization: split each user's event stream into sessions
  * separated by inactivity gaps > `gapSeconds`.
  *
  * Classic two-window formulation: lag() marks session starts, a
  * running sum assigns session ids — ONE shuffle (partition by user),
  * both windows share the same partitioning so Catalyst plans a single
  * exchange + sort. Survives scale: state is per-user and streaming-
  * friendly (the Structured Streaming twin is session_window()).
  */
object Sessions {

  /** Adds session_id (1-based per user) to events.
    * Events table: (event_id, ts, user_id, event_type, value, props). */
  def sessionize(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val prevTs = lag(col("ts"), 1).over(byUser)
    val isStart = when(prevTs.isNull
      || unix_micros(col("ts")) - unix_micros(prevTs) > gapSeconds * 1000000L,
      1L).otherwise(0L)
    events
      .withColumn("is_start", isStart)
      .withColumn("session_id",
        sum(col("is_start")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("is_start")
  }

  /** Session windows via Spark's built-in session_window — the same
    * semantics as `sessionize` expressed as a native windowed groupBy
    * (and the form that runs unchanged under Structured Streaming).
    * Output: (user_id, session_start, session_end, n_events) where
    * session_end = last event + gap. */
  def sessionWindows(events: DataFrame, gapSeconds: Long): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapSeconds seconds").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Per-user session stats: (user_id, n_sessions, n_events,
    * max_session_events). */
  def userSessionStats(events: DataFrame, gapSeconds: Long): DataFrame =
    sessionize(events, gapSeconds)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("session_events"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("session_events")).as("n_events"),
        max(col("session_events")).as("max_session_events"))
}
