package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** A/B harness: q19 pair-generation stage timings (packed-long path). */
object AbQ19 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)

    def time(label: String, f: () => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"ABQ19 $label best=${ts.min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    def post = Dedup.hashedPostingsPacked(docs, "doc_id", "text", 3)
    time("packed_postings", () => post)
    def buckets = post.groupBy("shingle").agg(collect_list(col("packed")).as("ds"))
      .filter(size(col("ds")) >= 2 && size(col("ds")) <= 50)
    time("buckets", () => buckets)
    def expanded = buckets.select(explode(flatten(
        transform(col("ds"), (x, i) =>
          transform(slice(col("ds"), i + 2, size(col("ds"))),
            y => struct(least(x, y).as("a"), greatest(x, y).as("b")))))).as("p"))
    time("expanded", () => expanded)
    def counted = expanded.groupBy(col("p.a").as("pa"), col("p.b").as("pb"))
      .agg(count(lit(1)).as("common"))
    time("counted", () => counted)
    time("full_q19", () => SparkEntry.queries("q19_ngram_sim_pairs")(spark, dir))
    spark.stop()
  }
}
