package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** BPE merge learning — the first k merge rules of byte-pair encoding
  * fitted to the corpus, the algorithm under every modern tokenizer
  * (the brief's "BPE-ish" token surface, taken from counting to
  * LEARNING). Reference: Sennrich et al. 2016 (ACL), the openly
  * published algorithm.
  *
  * Scale shape: the working set is the DISTINCT-WORD frequency table
  * (vocabulary-sized, not corpus-sized — the standard BPE trick), so
  * each round is: one pair-count aggregation over vocab rows with
  * map-side partials, ONE scalar argmax to the driver (the merge
  * decision — one row per round, not a data collect), and a typed map
  * rewriting symbol arrays. `localCheckpoint` per round keeps the
  * plan O(1) deep (the PageRank convention).
  *
  * Determinism: counts are exact longs; the argmax tie-breaks
  * lexicographically on (left, right), so the learned table is unique
  * and partition-order-free.
  */
object BpeMerges {

  case class WordSyms(freq: Long, syms: Seq[String])
  case class Merge(rank: Int, left: String, right: String, n: Long)

  /** Left-to-right non-overlapping merge application ("aaa" with (a,a)
    * → ["aa","a"], the paper's semantics). */
  def applyMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** @return the k learned merges: (rank, left, right, n) where n is
    *         the corpus-wide pair count that won the round */
  def learn(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // vocabulary: distinct words with corpus frequencies
    var vocab: Dataset[WordSyms] = docs
      .select(explode(split(lower(col(textCol)), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("freq"), split(col("word"), "").as("syms"))
      .as[WordSyms]
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 1
    var exhausted = false
    while (round <= k && !exhausted) {
      // sequence() flips descending when size < 2 (the repo-wide
      // repetitionSignals guard), so single-symbol words emit no pairs
      val pairs = vocab.toDF()
        .select(col("freq"), explode(
          when(size(col("syms")) >= 2,
            expr("transform(sequence(0, size(syms) - 2), " +
              "i -> struct(syms[i] AS l, syms[i+1] AS r))"))
            .otherwise(expr(
              "CAST(array() AS array<struct<l:string,r:string>>)"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1)
        .as[(String, String, Long)]
        .collect() // exactly one row: the round's merge decision
      if (pairs.isEmpty) exhausted = true
      else {
        val (l, r, n) = pairs.head
        merges += Merge(round, l, r, n)
        vocab = vocab
          .map(w => WordSyms(w.freq, applyMerge(w.syms, l, r)))
          .localCheckpoint()
        round += 1
      }
    }
    merges.toSeq.toDF()
      .select(col("rank"), col("left"), col("right"), col("n"))
  }

  /** Encode with a learned merge table: per-document BPE token counts
    * (the compression the tokenizer will actually achieve — the
    * train-side twin of serving-side tokenization). The merge list is
    * k rows in the closure; the encode is one typed map per document,
    * applying merges in rank order per word. */
  def encodedTokenCounts(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val merges = learn(docs, idCol, textCol, k)
      .select("rank", "left", "right")
      .as[(Int, String, String)].collect().sortBy(_._1)
      .map { case (_, l, r) => (l, r) }.toSeq
    docs.select(col(idCol).cast("long"), split(lower(col(textCol)), " ").as("ws"))
      .as[(Long, Seq[String])]
      .map { case (id, ws) =>
        var chars = 0L
        var toks = 0L
        ws.filter(_.nonEmpty).foreach { w =>
          val syms = merges.foldLeft(w.split("").toSeq) {
            case (acc, (l, r)) => applyMerge(acc, l, r)
          }
          chars += w.length
          toks += syms.length
        }
        (id, chars, toks)
      }
      .toDF(idCol, "n_chars_tok", "n_bpe_tokens")
  }
}
