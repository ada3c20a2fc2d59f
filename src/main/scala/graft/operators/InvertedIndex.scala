package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional inverted index + phrase search — the retrieval primitive
  * behind exact-phrase decontamination ("is this eval question quoted
  * verbatim anywhere in the corpus?") and boolean search over a
  * training corpus. Generalizes the reference's substring-membership
  * guard (`Scraper.py` name-in-text checks) from scalar `contains` to
  * indexed multi-term lookup.
  *
  * Scale shape: the postings build is map-only (posexplode); the
  * phrase probe FILTERS postings to the phrase's own terms before any
  * join — candidate volume is the document frequency of the phrase's
  * rarest term, not corpus size. Adjacency is an equi-join on
  * (doc, anchor_pos): each i-th term's postings shift `pos - i` so a
  * verbatim run aligns on the anchor. |phrase| - 1 joins, all hash
  * joins on the same key shape.
  */
object InvertedIndex {

  /** Positional postings (id, pos, term) over the single-space split
    * (the house tokenization, q16/q112-consistent). pos is 0-based. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      posexplode(split(lower(col(textCol)), " ")).as(Seq("pos", "term")))

  /** Exact-phrase occurrence counts: (id, n_hits) for documents
    * containing the phrase verbatim (token-adjacent), n_hits = number
    * of distinct anchor positions. */
  def phraseHits(docs: DataFrame, idCol: String, textCol: String,
      phrase: String): DataFrame = {
    val terms = phrase.toLowerCase.split(" ").toSeq
    require(terms.nonEmpty, "empty phrase")
    val p = postings(docs, idCol, textCol)
    val anchors = terms.zipWithIndex
      .map { case (t, i) =>
        p.filter(col("term") === t)
          .select(col(idCol), (col("pos") - i).as("anchor"))
      }
      .reduce(_.join(_, Seq(idCol, "anchor")))
    anchors.groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
  }
}
