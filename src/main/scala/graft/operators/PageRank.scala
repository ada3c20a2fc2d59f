package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Weighted PageRank by join-based power iteration — the canonical
  * iterative-graph workload (link-quality scoring for a crawl corpus,
  * source-authority weighting for training-data curation) expressed as
  * pure DataFrame joins so Catalyst/AQE plan every step.
  *
  * Scale shape: one hash shuffle per iteration on the edge `src` key
  * (contribution join) plus one on `dst` (the aggregation) — the same
  * exchanges GraphX/Pregel would do, with map-side partial sums. The
  * rank frame is eagerly `localCheckpoint`ed every iteration (the
  * DuplicateClusters convention) so the logical plan stays O(1) deep
  * instead of doubling per round; edges/out-weights persist across
  * iterations and release in `finally`.
  *
  * Determinism: ranks are INTEGER micro-units (`scale` = 1e9 total
  * mass), every edge contribution is `(rank * w) div out_w` and the
  * damping step `(15·r0 + 85·Σ) div 100` — exact bigint arithmetic,
  * so partial-sum order cannot perturb a single bit and a SQL oracle
  * reproduces every iteration exactly. Requires rank·max(w) < 2^63:
  * holds for any per-edge weight below ~9e9; pre-normalize heavier
  * edge weights first. Nodes with no out-edges leak their mass (the
  * standard dangling simplification); nodes with no IN-edges settle at
  * the teleport floor 15·r0/100.
  */
object PageRank {

  /** @param edges (src: long, dst: long, w: long) pre-aggregated edge
    *              weights, w > 0
    * @param cpEvery truncate lineage every this many iterations.
    *   `ranks` is referenced ONCE per round (the contribution join),
    *   so un-checkpointed lineage grows LINEARLY, not doubling — a
    *   small stride keeps analysis bounded while skipping most of the
    *   per-round materialization jobs (each localCheckpoint is a full
    *   job — pure scheduling on a small graph, a cluster-wide block
    *   write at scale). A/B at sf0.1 (local[32], best-of-3): stride 1
    *   = 4.36 s, stride 3 = 4.03 s, same bits — the q102 wall clock is
    *   dominated by the 4-table EDGE BUILD each attempt re-runs, not
    *   by iteration overhead; at corpus scale the saved per-round
    *   block writes are the part that matters.
    * @return (node, pagerank_scaled) — integer rank in `scale` units */
  def run(edges: DataFrame, iters: Int, scale: Long = 1000000000L,
          cpEvery: Int = 3): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val outw = e.groupBy("src").agg(sum("w").as("ow"))
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val n = nodes.count() // one tiny action: |V| is a scalar input
        val r0 = scale / n
        var ranks = nodes.withColumn("rank", lit(r0)).localCheckpoint()
        for (i <- 1 to iters) {
          val contrib = e
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outw, "src")
            .select(col("dst").as("node"),
              expr("(rank * w) div ow").as("c"))
            .groupBy("node").agg(sum("c").as("s"))
          ranks = nodes.join(contrib, Seq("node"), "left")
            .select(col("node"),
              expr(s"(CAST(${15L * r0} AS BIGINT) + " +
                "85 * coalesce(s, CAST(0 AS BIGINT))) div 100").as("rank"))
          if (i % cpEvery == 0 && i < iters) ranks = ranks.localCheckpoint()
        }
        ranks.select(col("node"), col("rank").as("pagerank_scaled"))
      } finally nodes.unpersist(false)
    } finally e.unpersist(false)
  }
}
