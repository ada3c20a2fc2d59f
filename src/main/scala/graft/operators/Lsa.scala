package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Latent-semantic TOPIC DIRECTION by power iteration on the weighted
  * doc-term bipartite graph — LSA's top singular pair (Deerwester et
  * al. 1990) computed as weighted HITS (Kleinberg 1999: the
  * hub/authority iteration IS the power method on A·Aᵀ for a bipartite
  * adjacency): doc scores h ← A·a, term scores a ← Aᵀ·h, renormalized
  * each half-step. Unlike [[Pca]] (whose D×D gram collapses to a
  * bounded driver solve), the TERM dimension is corpus-dependent, so
  * the iteration stays fully distributed — two equi-joins + grouped
  * sums per half-step, the q236 HITS shape, nothing term-dimensioned
  * ever leaves the cluster.
  *
  * Integer contract: weights are RAW term counts w(d,t) = tf(d,t)
  * (Deerwester's original count matrix — an inverse-df reweighting
  * was tried and rejected: 1/df boosts singleton terms so hard that
  * a lone off-topic doc rivals the main block's singular value, the
  * opposite of a topic summary), and each half-step L1-renormalizes
  * to 10⁶ with truncating DIV (the q236 convention) — so every
  * per-key sum is bounded by max(tf)·10⁶ REGARDLESS of corpus size
  * (Σ of the normalized side is 10⁶ by construction): no overflow at
  * 100 TB, and DuckDB replays the arithmetic exactly. Sign/phase is
  * pinned by the all-ones start (all quantities stay ≥ 0 —
  * Perron-Frobenius direction). */
object Lsa {

  /** Per-document projection onto the dominant latent direction:
    * (doc_id, lsa_ppm), L1-normalized to 10⁶. `iters` full h→a→h
    * rounds, fixed unroll. */
  def topicProjections(docs: DataFrame, idCol: String, textCol: String,
                       iters: Int = 4): DataFrame = {
    require(iters >= 1)
    val tf = docs.select(col(idCol).cast("long").as("doc_id"),
        explode(filter(split(lower(col(textCol)), " "),
          t => t =!= "")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val e = tf.select(col("doc_id"), col("tok"), col("tf").as("w"))
      .localCheckpoint()
    val docIds = e.select("doc_id").distinct().localCheckpoint()
    def normalized(df0: DataFrame, key: String,
                   c: String): DataFrame = {
      val total = df0.agg(sum(col(c)).as("t"))
      df0.crossJoin(broadcast(total))
        .select(col(key),
          when(col("t") > 0, expr(s"1000000 * $c DIV t"))
            .otherwise(0L).as(c))
    }
    var hubs = docIds.withColumn("h", lit(1000000L))
    for (_ <- 1 to iters) {
      val aRaw = e.join(hubs, Seq("doc_id"))
        .groupBy("tok").agg(sum(col("w") * col("h")).as("a"))
      val auths = normalized(aRaw, "tok", "a").localCheckpoint()
      val hRaw = e.join(auths, Seq("tok"))
        .groupBy("doc_id").agg(sum(col("w") * col("a")).as("h"))
      hubs = normalized(hRaw, "doc_id", "h").localCheckpoint()
    }
    hubs.select(col("doc_id"), col("h").as("lsa_ppm"))
  }
}
