package graft

import org.apache.spark.sql.SparkSession

/** Throwaway A/B harness: times resolve vs resolveContracted on the
  * same LSH pair input, interleaved best-of-3, one JVM. */
object AbCluster {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def pairs = operators.Similarity.lshNearDupPairs(
      Tables.embeddings(spark, dir), dims = 64,
      planesPerBand = 4, nBands = 8, threshold = 0.4).select("a", "b")
    def run(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f(pairs).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val variants: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
      "iterative" -> (e => operators.DuplicateClusters.resolve(e)),
      "contracted" -> (e => operators.DuplicateClusters.resolveContracted(e)),
      "pairs_only" -> (e => e))
    variants.foreach { case (n, f) => run(f) } // warm
    val best = scala.collection.mutable.Map.empty[String, Double]
    (1 to 3).foreach { _ =>
      variants.foreach { case (n, f) =>
        val t = run(f)
        best(n) = math.min(best.getOrElse(n, Double.MaxValue), t)
      }
    }
    println("ABRESULT " + best.toSeq.sortBy(_._1).map { case (n, t) => f"$n=$t%.2f" }.mkString(" "))
    spark.stop()
  }
}
