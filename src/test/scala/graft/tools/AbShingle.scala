package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness: window-lead shingling vs map-side transform/sequence
  * shingling, and their effect on the full q19 pair pipeline. */
object AbShingle {
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

    // map-side shingle rows: no shuffle, interpreted transform lambda
    def mapSideShingles(n: Int): DataFrame = {
      val toks = split(lower(col("text")), " ")
      docs.select(col("doc_id"), toks.as("w"))
        .select(col("doc_id"), explode(
          when(size(col("w")) >= n,
            transform(sequence(lit(0), size(col("w")) - n),
              i => concat_ws(" ", (0 until n).map(k =>
                element_at(col("w"), i + k + 1)): _*)))
            .otherwise(array().cast("array<string>"))).as("shingle"))
    }

    def time(label: String, f: () => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"ABSHINGLE $label best=${ts.min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    time("window_rows", () => operators.Dedup.shingleRows(docs, "doc_id", "text", 3))
    time("mapside_rows", () => mapSideShingles(3))
    time("window_distinct", () => operators.Dedup.shinglePostings(docs, "doc_id", "text", 3))
    time("mapside_distinct", () => mapSideShingles(3).distinct())
    time("q19_full", () => operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 50))
    spark.stop()
  }
}
