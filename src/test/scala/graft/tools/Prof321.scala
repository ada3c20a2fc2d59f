package graft

import org.apache.spark.sql.functions._

/** Throwaway stage profiler for q321_fm_count (round 13 session 2). */
object Prof321 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("prof321")
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
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    docs.count()
    // warm at sf0.001 like Bench
    SparkEntry.queries("q321_fm_count")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()

    import spark.implicits._
    val toks = t("toks checkpoint")(docs.select(col("doc_id"),
        filter(split(lower(col("text")), " "), w => w =!= "").as("ws"))
      .filter(size(col("ws")) > 0).localCheckpoint())
    val top4 = t("top4 bigrams")(toks.filter(size(col("ws")) >= 2)
      .select(explode(expr("transform(sequence(0, size(ws)-2)," +
        " i -> concat_ws(' ', ws[i], ws[i+1]))")).as("pat"))
      .groupBy("pat").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("pat").asc).limit(4)
      .select("pat").as[String].collect().toSeq)
    val tri = t("top trigram")(toks.filter(size(col("ws")) >= 3)
      .select(explode(expr("transform(sequence(0, size(ws)-3)," +
        " i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))")).as("pat"))
      .groupBy("pat").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("pat").asc).limit(1)
      .select("pat").as[String].collect().toSeq)
    val bwt = t("bwt checkpoint")(
      graft.operators.SuffixArray.bwt(docs, "doc_id", "text")
        .localCheckpoint())
    t("bwt count")(bwt.count())
    t("countPatterns end-to-end")(
      graft.operators.FmIndex.countPatterns(spark, docs, "doc_id",
        "text", top4 ++ tri ++ Seq("zzabsent zzabsent"))
      .write.format("noop").mode("overwrite").save())
    t("full q321 again")(
      SparkEntry.queries("q321_fm_count")(spark, dir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
