package graft

import org.apache.spark.sql.SparkSession

/** A/B harness: dense vs sparse MinHash-LSH shapes after the map-side
  * shingling change (the round-1 tradeoff may have moved). */
object AbMinhash {
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
    val docs = Tables.documents(spark, dir)
    def run(f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val variants = Seq(
      "dense" -> (() => operators.MinHashLSH.nearDuplicates(
        docs, "doc_id", "text", shingleN = 3, k = 32, bands = 8, threshold = 0.1)),
      "sparse" -> (() => operators.MinHashLSH.nearDuplicatesSparse(
        docs, "doc_id", "text", shingleN = 3, k = 32, bands = 8, threshold = 0.1)))
    variants.foreach { case (_, f) => run(f) } // warm
    val best = scala.collection.mutable.Map.empty[String, Double]
    (1 to 3).foreach { _ =>
      variants.foreach { case (n, f) =>
        best(n) = math.min(best.getOrElse(n, Double.MaxValue), run(f))
      }
    }
    println("ABMINHASH " + best.toSeq.sortBy(_._1)
      .map { case (n, t) => f"$n=$t%.2f" }.mkString(" "))
    spark.stop()
  }
}
