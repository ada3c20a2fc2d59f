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

  /** BM25 document ranking for a fixed set of query terms — the
    * retrieval-side sibling of `topTerms`: instead of "which terms
    * characterize this doc", "which docs answer this term". Standard
    * Robertson BM25 with the log-free idf (N − df + 0.5)/(df + 0.5):
    * a strictly monotone transform of the textbook ln(1 + ·) form, so
    * rankings are identical while the score stays engine-exact (libm
    * ln differs in the last ulp across engines; see `topTerms` for the
    * same house rule).
    *
    * Score arithmetic is written in ONE fixed double op order —
    * idf · (tf·(k1+1)) / (tf + k1·(1 − b + b·dl/avgdl)) — with avgdl
    * from an exact long sum and one division, so Spark and DuckDB
    * hash-match bit-for-bit.
    *
    * Scale shape: the term filter prunes the posting build to the
    * query terms before any shuffle (predicate on the exploded term),
    * tf is a map-side-combined groupBy, df/avgdl are broadcast
    * singletons, and the per-term top-k is WindowGroupLimit-pruned.
    * Nothing scales with corpus size except the one tf aggregation
    * over matching postings.
    */
  /** Dirichlet-smoothed query likelihood (Zhai & Lafferty 2001) — the
    * language-modeling retrieval counterpart to [[bm25]]'s
    * probabilistic ranking: p(t|d) = (tf + μ·p(t|C)) / (dl + μ),
    * collection model p(t|C) = cf(t)/|C|, in the engine's
    * composed-floor fixed point (log-free, the q302 stance):
    *
    *   cf_ppb = (10⁹·cf(t)) div |C|
    *   p_ppm  = (10⁶·tf) div (dl + μ) + (μ·cf_ppb) div (1000·(dl + μ))
    *
    * — the collection probability quantized FIRST so no intermediate
    * carries a |C|-sized product (10⁶·tf·|C| overflows 2^63 on a
    * 100 TB corpus); both floors replay exactly in DuckDB. Docs that
    * do NOT contain a term still score (the smoothing mass — the
    * defining difference from tf-only rankers), so the per-term
    * candidate set is every doc; the topK cut keeps the output
    * bounded.
    *
    * Scale shape: one filtered tf groupBy for the query lexicon, one
    * corpus-wide (cf, |C|) aggregate (broadcast, term-lexicon-sized),
    * a doc-length frame joined once, and the [[TopK.perGroupTopN]]
    * per-term cut. */
  def dirichletQl(docs: DataFrame, idCol: String, textCol: String,
                  terms: Seq[String], mu: Long,
                  topK: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(lower(col(textCol)), " ")).as("term"))
    val dl = docs.select(col(idCol).as("doc_id"),
      size(split(lower(col(textCol)), " ")).cast("long").as("dl"))
    val corpusTotal = toks.agg(count(lit(1)).as("c_total"))
    val cf = toks
      .filter(col("term").isin(terms.map(_.asInstanceOf[Any]): _*))
      .groupBy("term").agg(count(lit(1)).as("cf"))
      .crossJoin(broadcast(corpusTotal))
      .select(col("term"),
        expr("(1000000000 * cf) div c_total").as("cf_ppb"))
    val tf = toks
      .filter(col("term").isin(terms.map(_.asInstanceOf[Any]): _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val scored = dl
      .crossJoin(broadcast(cf)) // every doc scores every query term
      .join(tf, Seq("doc_id", "term"), "left")
      .na.fill(0L, Seq("tf"))
      .withColumn("p_ppm",
        expr(s"(1000000 * tf) div (dl + $mu)" +
          s" + ($mu * cf_ppb) div (1000 * (dl + $mu))"))
    TopK.perGroupTopN(scored, Seq(col("term")),
        Seq(col("p_ppm").desc, col("doc_id").asc), topK,
        rankCol = "rnk")
      .select("term", "doc_id", "tf", "dl", "p_ppm", "rnk")
  }

  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double, b: Double,
           topK: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(lower(col(textCol)), " ")).as("term"))
    // doc lengths + corpus avgdl (exact long sum, ONE double division)
    val dl = docs.select(col(idCol).as("doc_id"),
      size(split(lower(col(textCol)), " ")).cast("long").as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = toks.filter(col("term").isin(terms.map(_.asInstanceOf[Any]): _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = (col("n_docs") - col("df")).cast("double") + lit(0.5d)
    val scored = tf
      .join(broadcast(df), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      .withColumn("score",
        (idf / (col("df").cast("double") + lit(0.5d))) *
          (col("tf").cast("double") * lit(k1 + 1.0d)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0d - b) + lit(b) * (col("dl").cast("double")
              / col("avgdl")))))
    TopK.perGroupTopN(scored, Seq(col("term")),
        Seq(col("score").desc, col("doc_id").asc), topK, rankCol = "rnk")
      .select("term", "doc_id", "tf", "df", "dl", "score", "rnk")
  }
}
