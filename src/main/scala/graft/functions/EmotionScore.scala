package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.domain.Emotions

/** The reference's emotion-scoring enrichment (S4, Scraper.py:244/323):
  * text in → 6-dimension emotion vector out. The reference POSTs to the
  * ParallelDots API; this engine scores in-process with a deterministic
  * lexicon-bucket model: every token votes for one of the 6 emotions
  * (bucket = (ascii(first char)·31 + len) mod 6), scores are vote
  * shares. Same shape and role as the remote scorer, zero egress,
  * codegen'd arithmetic — and exactly reproducible in SQL for the
  * oracle.
  */
object EmotionScore {

  /** Emotion bucket of a single token column, 0..5. */
  def bucket(w: Column): Column = (ascii(w) * 31 + length(w)) % 6

  /** Per-document emotion score vector, wide: (id, happy..excited,
    * top_emotion). Long-form groupBy with 6 conditional counts — one
    * shuffle, map-side partials, no UDF. */
  def scoreWide(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(split(lower(col(textCol)), " ")).as("w"))
    val counts = Emotions.names.zipWithIndex.map { case (n, k) =>
      sum(when(bucket(col("w")) === k, 1L).otherwise(0L)).as(s"c_$n")
    }
    val agged = toks.groupBy(col(idCol))
      .agg(counts.head, counts.tail: _*)
      .withColumn("n_words",
        Emotions.names.map(n => col(s"c_$n")).reduce(_ + _))
    val scored = Emotions.names.foldLeft(agged) { (d, n) =>
      d.withColumn(n, col(s"c_$n").cast("double") / col("n_words"))
    }
    // argmax with ties -> emotion name asc (same trick as langId)
    val ordered = Emotions.names.sorted
    val best = array_sort(array(ordered.zipWithIndex.map { case (n, i) =>
      struct(col(n).as("s"), lit(ordered.size - i).as("ord"), lit(n).as("emotion"))
    }: _*))
    scored
      .withColumn("top_emotion",
        element_at(best, ordered.size).getField("emotion"))
      .select(col(idCol) +: Emotions.names.map(col) :+ col("top_emotion"): _*)
  }

  /** SQL twin of `scoreWide` for the DuckDB oracle, parameterized by the
    * source table/CTE with columns (id, text). */
  def scoreWideSql(src: String, idCol: String, textCol: String): String = {
    val scores = Emotions.names.zipWithIndex.map { case (n, k) =>
      s"""CAST(len(list_filter(w, x -> (ascii(x) * 31 + length(x)) % 6 = $k)) AS DOUBLE)
         | / len(w) AS $n""".stripMargin
    }.mkString(",\n  ")
    val ordered = Emotions.names.sorted
    val caseChain = ordered.init.zipWithIndex.map { case (n, i) =>
      val rest = ordered.drop(i + 1).map(r => s"$n >= $r").mkString(" AND ")
      s"WHEN $rest THEN '$n'"
    }.mkString(" ")
    s"""SELECT $idCol, ${Emotions.names.mkString(", ")},
       |  CASE $caseChain ELSE '${ordered.last}' END AS top_emotion
       |FROM (
       |  SELECT $idCol,
       |  $scores
       |  FROM (SELECT $idCol, string_split(lower($textCol), ' ') AS w FROM $src))""".stripMargin
  }
}
