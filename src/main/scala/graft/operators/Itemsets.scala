package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining over document token sets — the a-priori
  * pair pass (Agrawal & Srikant 1994): an itemset can only be
  * frequent if every subset is, so the pair candidates are generated
  * ONLY from tokens that are individually frequent. This is the
  * association-rule backbone (market baskets, co-occurring tags,
  * template phrase pairs) and the support/lift numbers double as a
  * corpus co-occurrence audit.
  *
  * Scale shape: one distinct-presence scan (doc → token, deduped per
  * doc); the frequent-singleton table is bounded above by
  * Σ presences / minSup rows — small enough to BROADCAST, so the
  * downward-closure prune is a map-side semi join, not a shuffle.
  * Pair generation is a per-doc self-join on the pruned presences
  * (tok_a < tok_b) — per-doc work is O(f²) in the doc's FREQUENT
  * token count only, and support counting is one hash groupBy with
  * map-side partial aggregation. No windows, no collect.
  *
  * The support threshold is a ppm FRACTION of the corpus (so the
  * query is scale-invariant), compared by integer cross-multiply —
  * no division, no rounding drift: pass ⇔ 10⁶·sup ≥ minSupPpm·nDocs.
  * Lift is published as the composed floor
  * lift_ppm = ⌊10⁶·sup_ab·n_docs / (sup_a·sup_b)⌋ (> 10⁶ means the
  * pair co-occurs more than independence predicts).
  *
  * Output: (tok_a, tok_b, sup_ab, sup_a, sup_b, n_docs, lift_ppm)
  * for every frequent pair. */
object Itemsets {

  def frequentPairs(docs: DataFrame, idCol: String, textCol: String,
                    minSupPpm: Long): DataFrame = {
    require(minSupPpm >= 1 && minSupPpm <= 1000000)
    val pres = docs.select(col(idCol).cast("long").as("doc"),
        explode(array_distinct(filter(
          split(lower(col(textCol)), " "), t => t =!= ""))).as("tok"))
      .localCheckpoint()
    val nDocs = docs.select(col(idCol)).distinct().count()
    val f1 = pres.groupBy("tok").agg(count(lit(1)).as("sup1"))
      .filter(lit(1000000L) * col("sup1") >= lit(minSupPpm * nDocs))
    val pruned = pres.join(broadcast(f1), Seq("tok"))
    val pairs = pruned.select(col("doc"), col("tok").as("tok_a"),
        col("sup1").as("sup_a"))
      .join(pruned.select(col("doc"), col("tok").as("tok_b"),
        col("sup1").as("sup_b")), Seq("doc"))
      .filter(col("tok_a") < col("tok_b"))
    pairs.groupBy("tok_a", "tok_b", "sup_a", "sup_b")
      .agg(count(lit(1)).as("sup_ab"))
      .filter(lit(1000000L) * col("sup_ab") >= lit(minSupPpm * nDocs))
      .withColumn("n_docs", lit(nDocs))
      .select(col("tok_a"), col("tok_b"), col("sup_ab"), col("sup_a"),
        col("sup_b"), col("n_docs"),
        // overflow contract (the chi2Terms convention): 10⁶·sup·n
        // must fit a long — exact up to ~3·10⁶ docs at full support;
        // beyond that widen to DECIMAL(38,0)
        expr("(1000000L * sup_ab * n_docs) div (sup_a * sup_b)")
          .as("lift_ppm"))
  }
}
