package graft

/** Ad-hoc profiler: time one or more registered queries at a given SF dir.
  * Usage: runMain graft.TimeOne <sfDir> <query...> [-explain]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val explain = args.contains("-explain")
    val names = args.drop(1).filterNot(_ == "-explain")
    // mirror Bench's session config exactly — in particular the
    // InferFiltersFromGenerate exclusion (25× on posting builders);
    // timings under any other config are not comparable to BENCH_r*.
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("timeone")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      if (explain)
        SparkEntry.queries(n)(spark, dir).explain("formatted")
      // Bench starts its timer BEFORE query construction — eager
      // localCheckpoints inside the builders do real cluster work, so
      // timing only the final write undercounts (q321's SA build lives
      // entirely in construction). Mirror Bench exactly.
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"TIMEONE $n%s sec=$sec%.3f")
    }
    spark.stop()
  }
}
