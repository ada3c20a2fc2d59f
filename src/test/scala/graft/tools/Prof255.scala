package graft

import org.apache.spark.sql.functions._

/** Throwaway stage profiler for q255_max_coverage (round 13). */
object Prof255 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("prof255")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"PROF $label ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    docs.count()
    val toks = docs.select(col("doc_id").cast("long").as("doc_id"),
      explode(graft.operators.Dedup.shingles(col("text"), 2)).as("token"))
    t("toks.count warm1")(toks.count())
    t("toks.count warm2")(toks.count())
    val toksM = t("localCheckpoint")(toks.localCheckpoint())
    def round1() = toksM.groupBy("doc_id").agg(count(lit(1)).as("gain"))
      .orderBy(col("gain").desc, col("doc_id").asc).limit(1).collect()
    t("round1 groupBy+top1")(round1())
    t("round1 again")(round1())
    val anti = toksM.join(
      toksM.filter(col("doc_id") === 123L).select("token"),
      Seq("token"), "left_anti")
    t("round2 anti+groupBy+top1")(
      anti.groupBy("doc_id").agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("doc_id").asc).limit(1).collect())
    val pool = toks.groupBy("doc_id")
      .agg(count(lit(1)).as("cnt"), collect_list(col("token")).as("ts"))
      .orderBy(col("cnt").desc, col("doc_id").asc).limit(512)
    val p = t("pool collect")(pool.collect())
    t("pool collect again")(pool.collect())
    println(s"pool size ${p.length}, cMin=${p.last.getLong(1)}, " +
      s"cMax=${p.head.getLong(1)}")
    t("full op")(graft.operators.Curation
      .greedyMaxCoverage(docs, "doc_id", "text", 2, 4).collect().toSeq)
    val full = t("full op again")(graft.operators.Curation
      .greedyMaxCoverage(docs, "doc_id", "text", 2, 4).collect().toSeq)
    println(full.mkString("\n"))
    spark.stop()
  }
}
