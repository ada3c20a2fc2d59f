package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF term weighting over a document corpus — the classic
  * two-level aggregation: term frequency per (doc, term), document
  * frequency per term, salience = tf · N / df. Extends the reference's
  * text surface (its richest text op is the stopword-free emotion
  * scoring, Scraper.py:244) to the corpus-statistics operator every
  * search/curation pipeline needs.
  *
  * The idf factor is the LINEAR form N/df, not log(N/df): one integer
  * product and one double division — bit-identical in any engine
  * (libm log implementations differ in the last ulp, which would break
  * cross-engine hash verification; monotone in df either way, so
  * top-k per doc is unchanged).
  *
  * Scale shape: two hash aggregations (map-side partial both times —
  * (doc, term) then term), one broadcast of the single-row corpus
  * count, one broadcast-able join tf ⋈ df on term (term dictionary ≪
  * corpus), and a WindowGroupLimit-pruned per-doc top-k. No global
  * sort; shuffle volume is O(distinct (doc, term)).
  */
object TfIdf {

  /** (doc_id, term, tf, df, score) for the top-`k` terms of each
    * document by score desc (ties → term asc). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame = {
    val terms = docs.select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("term"))
    val tf = terms.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf") * col("n_docs")).cast("double") / col("df"))
    TopK.perGroupTopN(scored, Seq(col("doc_id")),
        Seq(col("score").desc, col("term").asc), k, rankCol = "term_rank")
      .select("doc_id", "term", "tf", "df", "score", "term_rank")
  }
}
