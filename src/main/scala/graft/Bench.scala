package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times the headline queries on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Each query is fully
  * materialized via the noop sink (no driver collect, no disk write),
  * so the measured time is the whole distributed plan. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // InferFiltersFromGenerate turns every explode into a redundant
      // size(...)>0 filter that predicate pushdown then inlines BELOW
      // the token-binding projections, re-evaluating the per-row
      // shingle/span lambdas per element — measured 25× on the posting
      // builders (8.5 s → 0.34 s at sf0.1). The filter only skips rows
      // explode would drop anyway; excluding the rule is semantics-free.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      // Scan-parallelism floor (guide §6): the sf parquet files are
      // far below maxPartitionBytes, so every scan otherwise opens as
      // ONE partition and every map-side pass (tokenize, quantize,
      // shingle) serializes on a single core until the first
      // exchange. Scale-adaptive (derived from the worker count, not
      // a tuned constant); at real scale inputs split on size and the
      // floor is a no-op. Overridable for A/B (SPARK_GRAFT_MIN_SPLITS).
      .config("spark.sql.files.minPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_MIN_SPLITS", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // optional subset for local A/B loops, e.g.
    // SPARK_GRAFT_BENCH_QUERIES=q24_minhash_near_dups,q19_ngram_sim_pairs
    val benchNames = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").toSeq.filter(SparkEntry.queries.contains))
      .getOrElse(SparkEntry.benchQueries)

    // JVM/class-loading warmup: run every headline query once at the
    // smallest SF so timed runs measure steady-state execution (Spark
    // machinery JIT'd), not first-touch initialization.
    val warmDir = "/root/testdata/sf0.001"
    benchNames.foreach { name =>
      try SparkEntry.queries(name)(spark, warmDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    // best-of-3 per query, attempts INTERLEAVED round-robin: the shared
    // host stalls in bursts of seconds-to-tens-of-seconds (observed in
    // two recorded runs), so three consecutive attempts of one query
    // can all land inside one stall window — spreading each query's
    // attempts across the whole run makes the per-query min robust to
    // bursty contention.
    // SPARK_GRAFT_BENCH_RUNS=1 for the once-per-round FULL-BOARD tail
    // sweep (367 queries × 3 would dominate the round); the driver
    // never sets it, so the contract default stays best-of-3.
    // toIntOption (not toInt) so a malformed value degrades to the
    // contract default instead of killing the whole bench run
    val nRuns = sys.env.get("SPARK_GRAFT_BENCH_RUNS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(3)
    val best = scala.collection.mutable.Map.empty[String, Double]
    (1 to nRuns).foreach { _ =>
      benchNames.foreach { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
        if (ok) {
          val t = (System.nanoTime() - t0) / 1e9
          best(name) = math.min(best.getOrElse(name, Double.MaxValue), t)
        } else best.getOrElseUpdate(name, -1.0)
      }
    }
    val results = benchNames.map(n => n -> best.getOrElse(n, -1.0))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // stdout under sbt carries [info] decoration that defeats line
    // parsers — also drop the bare JSON at a well-known file path.
    // The FILE variant carries run metadata (runs/cpus/n_queries) so
    // the committed artifact is self-contained even when the driver's
    // stdout capture truncates; extra keys are harmless to JSON
    // consumers and the stdout line above keeps the exact contract.
    val fileJson = json.dropRight(1) +
      f""","runs":$nRuns,"cpus":"$cpus","n_queries":${results.size}}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (fileJson + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    spark.stop()
  }
}
