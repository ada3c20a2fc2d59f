package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared synchronous micro-batch driver for the fixture-scale
  * streaming queries: run to a memory sink, drain, return the sink
  * table. Stateful operators allocate state stores PER shuffle
  * partition (a stream-stream join keeps 4 per partition) and every
  * micro-batch pays a commit + snapshot walk per store — at the
  * session default of 32 partitions that bookkeeping dominated the
  * q292 join (round-10 plan audit; 6.5 → 2.9 s at 8). The conf is
  * cloned into the query's own session AT START, so scoping it here
  * never touches surrounding batch plans, and results are
  * partition-count independent (only placement moves). A real
  * deployment sizes the knob to state volume —
  * SPARK_GRAFT_STREAM_PARTS overrides without a code change. */
object StreamRun {
  def toMemory(spark: SparkSession, df: DataFrame, name: String,
               mode: String): DataFrame = {
    spark.streams.active.filter(_.name == name).foreach(_.stop())
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key,
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "8"))
    val q =
      try df.writeStream.outputMode(mode).format("memory")
        .queryName(name).start()
      finally spark.conf.set(key, prev)
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
