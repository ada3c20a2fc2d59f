package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Candidate-volume profile of the q160 containment pipeline. */
object AbQ160 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("abq160")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 3; val num = 4; val den = 5
    def ceilFrac(c: Column) = floor((c * num + (den - 1)) / den).cast("int")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"AB $name%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($r)")
    }
    val docs = Tables.documents(spark, dir)
    val post = operators.Dedup.hashedPostingsPacked(docs, "doc_id", "text", n)
      .withColumnRenamed("shingle", "tok")
    val postDf = post.groupBy("tok")
      .agg(collect_list(col("packed")).as("ds"))
      .select(col("tok"), size(col("ds")).as("df"), explode(col("ds")).as("packed"))
    val perDoc = postDf.groupBy("packed")
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("ts"))
    perDoc.persist()
    t("perDoc")(perDoc.count())
    val sz = col("packed").bitwiseAND(lit((1L << 20) - 1))
    val flagged = perDoc
      .select(col("packed"), sz.as("sz"), posexplode(col("ts")).as(Seq("pos", "t")))
      .select(col("t").getField("tok").as("tok"), col("packed"),
        (col("pos") < col("sz") - ceilFrac(col("sz")) + 1).as("inpfx"))
    val grouped = flagged.groupBy("tok")
      .agg(collect_list(when(col("inpfx"), col("packed"))).as("pxs"),
        collect_list(col("packed")).as("all"))
      .filter(size(col("pxs")) >= 1 && size(col("all")) >= 2)
    grouped.persist()
    t("buckets")(grouped.count())
    t("rawvol")(grouped.select(sum(size(col("pxs")) * (size(col("all")) - 1)))
      .collect()(0).getLong(0))
    val cand = grouped
      .select(explode(flatten(transform(col("pxs"), x =>
        filter(transform(col("all"), y => struct(x.as("pa"), y.as("pb"))),
          p => p.getField("pa") =!= p.getField("pb") &&
            (p.getField("pa").bitwiseAND(lit((1L << 20) - 1))) * num <=
              (p.getField("pb").bitwiseAND(lit((1L << 20) - 1))) * den)))).as("p"))
      .select(col("p.pa").as("pa"), col("p.pb").as("pb"))
    t("cand")(cand.count())
    t("dist")(cand.distinct().count())
    spark.stop()
  }
}
