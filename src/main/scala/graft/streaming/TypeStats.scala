package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Arbitrary keyed streaming state via `transformWithState` — Spark 4's
  * StatefulProcessor API, the successor to flatMapGroupsWithState
  * ([[StatefulCounts]] keeps the legacy form so both surfaces are
  * covered). Per user, a [[MapState]] keyed by event type holds
  * (count, min event id, max value); every state primitive the new API
  * offers (typed composite state, per-entry point updates, TTL hooks)
  * is exercised against the RocksDB state store provider the API
  * requires — the store that makes per-key state spill-safe at
  * 100 TB key cardinality instead of heap-bound.
  *
  * All maintained aggregates are order-independent (count, min, max),
  * so the final snapshot is exact and a plain batch GROUP BY is the
  * oracle regardless of stream arrival order.
  */
object TypeStats {

  case class Ev(user_id: Long, event_type: String, event_id: Long,
                value: Double)
  case class TypeAgg(n: Long, min_id: Long, max_v: Double)
  case class TypeSnapshot(user_id: Long, event_type: String,
                          n_events: Long, min_event_id: Long,
                          max_value: Double)

  /** Per-user processor: one MapState entry per event type seen. */
  class StatsProcessor extends StatefulProcessor[Long, Ev, TypeSnapshot] {
    @transient private var stats: MapState[String, TypeAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stats = getHandle.getMapState[String, TypeAgg]("typeStats",
        Encoders.STRING, Encoders.product[TypeAgg], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Ev],
        timers: TimerValues): Iterator[TypeSnapshot] = {
      val touched = scala.collection.mutable.LinkedHashSet[String]()
      rows.foreach { e =>
        val cur =
          if (stats.containsKey(e.event_type)) stats.getValue(e.event_type)
          else TypeAgg(0L, Long.MaxValue, Double.NegativeInfinity)
        stats.updateValue(e.event_type, TypeAgg(
          cur.n + 1L,
          math.min(cur.min_id, e.event_id),
          math.max(cur.max_v, e.value)))
        touched += e.event_type
      }
      touched.iterator.map { t =>
        val a = stats.getValue(t)
        TypeSnapshot(user, t, a.n, a.min_id, a.max_v)
      }
    }
  }

  /** Drive the stream synchronously over `<dir>/events.parquet` and
    * return the final per-(user, type) snapshot. Update-mode memory
    * sink emits one snapshot per touched key per trigger; the final
    * state per key is the emission with the highest running count. */
  def perTypeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // transformWithState requires the RocksDB state store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val snapshots = spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_type"), col("event_id").cast("long").as("event_id"),
        col("value").cast("double").as("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new StatsProcessor,
        TimeMode.None(), OutputMode.Update())

    val sink = StreamRun.toMemory(spark, snapshots.toDF(),
      "graft_type_stats", "update")
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("n_events").desc)
    sink
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
