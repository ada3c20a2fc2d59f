package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Stage-by-stage profile of the q147 prefix-similarity pipeline. */
object AbQ147 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("abq147")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 3; val num = 3; val den = 5
    def ceilFrac(c: Column) =
      floor((c * num + (den - 1)) / den).cast("int")
    val docs = Tables.documents(spark, dir)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"AB $name%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($r)")
    }
    // warm the JVM on the same expressions at tiny SF
    operators.Dedup.prefixJaccardPairs(
      Tables.documents(spark, "/root/testdata/sf0.001"),
      "doc_id", "text", 3, 3, 5).write.format("noop").mode("overwrite").save()
    val post = docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("w0"))
      .select(col("doc_id"), array_distinct(
        transform(sequence(lit(0), size(col("w0")) - n),
          i => xxhash64(concat_ws(" ", element_at(col("w0"), i + 1),
            element_at(col("w0"), i + 2), element_at(col("w0"), i + 3)))))
        .as("ws"))
      .filter(size(col("ws")) > 0)
      .select((shiftleft(col("doc_id"), 20) + size(col("ws"))).as("packed"), col("ws"))
      .select(col("packed"), explode(col("ws")).as("tok"))
    t("post")(post.count())
    val postDf = post.groupBy("tok")
      .agg(collect_list(col("packed")).as("ds"))
      .select(col("tok"), size(col("ds")).as("df"), explode(col("ds")).as("packed"))
    val perDoc = postDf.groupBy("packed")
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("ts"))
    perDoc.persist()
    t("perDoc")(perDoc.count())
    val sz = col("packed").bitwiseAND(lit((1L << 20) - 1))
    val prefix = perDoc.select(col("packed"),
      explode(transform(slice(col("ts"), lit(1), sz - ceilFrac(sz) + 1),
        x => x.getField("tok"))).as("tok"))
    val cand = prefix.groupBy("tok")
      .agg(collect_list(col("packed")).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(expr(
        "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds)), y -> struct(least(x, y) as a, greatest(x, y) as b))))")).as("p"))
      .filter((col("p.a").bitwiseAND(lit((1L << 20) - 1))) * num <=
          (col("p.b").bitwiseAND(lit((1L << 20) - 1))) * den &&
        (col("p.b").bitwiseAND(lit((1L << 20) - 1))) * num <=
          (col("p.a").bitwiseAND(lit((1L << 20) - 1))) * den)
      .select(col("p.a").as("pa"), col("p.b").as("pb"))
      .distinct()
    cand.persist()
    t("cand")(cand.count())
    val docSets = perDoc.select(col("packed"),
      transform(col("ts"), x => x.getField("tok")).as("ws"))
    val verify = cand
      .join(docSets.select(col("packed").as("pa"), col("ws").as("ws_a")), Seq("pa"))
      .join(docSets.select(col("packed").as("pb"), col("ws").as("ws_b")), Seq("pb"))
      .select(shiftright(col("pa"), 20).as("a"), shiftright(col("pb"), 20).as("b"),
        size(array_intersect(col("ws_a"), col("ws_b"))).as("common"),
        size(col("ws_a")).as("sz_a"), size(col("ws_b")).as("sz_b"))
      .filter(col("common") * den >= (col("sz_a") + col("sz_b") - col("common")) * num)
    t("verify")(verify.count())
    spark.stop()
  }
}
