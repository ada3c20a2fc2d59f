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

  /** Personalized PageRank (Page et al. 1999 §6; the random-walk-with-
    * restart of Tong et al. 2006) — [[run]] with the teleport mass
    * concentrated on a SEED SET instead of spread uniformly: the
    * relevance-to-these-nodes score behind graph-based
    * recommendation, related-entity expansion, and seed-anchored
    * crawl prioritization. Same integer recurrence with a per-node
    * base: rank' = (15·b(v) + 85·Σ contrib) div 100, where b(v) =
    * scale div |S| for seeds and 0 elsewhere; initial ranks ARE the
    * teleport vector. Nodes unreachable from the seeds settle at 0 —
    * the locality that distinguishes PPR from global PageRank.
    *
    * Scale shape: identical to [[run]] (two exchanges per round,
    * lineage cut per stride); the seed frame joins once into the node
    * frame up front. Same rank·w < 2^63 overflow contract.
    *
    * @param seeds one column `node`; seeds absent from the graph are
    *              ignored (|S| counts only present seeds)
    * @return (node, ppr_scaled) */
  def personalized(edges: DataFrame, seeds: DataFrame, iters: Int,
                   scale: Long = 1000000000L, cpEvery: Int = 3): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val outw = e.groupBy("src").agg(sum("w").as("ow"))
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
      val flagged = nodes.join(
          seeds.select(col("node")).distinct().withColumn("_s", lit(1)),
          Seq("node"), "left")
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val nS = flagged.filter(col("_s").isNotNull).count()
        require(nS >= 1, "personalized PageRank needs >= 1 seed in-graph")
        val base = flagged.select(col("node"),
          when(col("_s").isNotNull, lit(scale / nS))
            .otherwise(lit(0L)).as("b"))
          .localCheckpoint()
        var ranks = base.select(col("node"), col("b").as("rank"))
        for (i <- 1 to iters) {
          val contrib = e
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outw, "src")
            .select(col("dst").as("node"),
              expr("(rank * w) div ow").as("c"))
            .groupBy("node").agg(sum("c").as("s"))
          ranks = base.join(contrib, Seq("node"), "left")
            .select(col("node"),
              expr("(15 * b + 85 * coalesce(s, CAST(0 AS BIGINT))) " +
                "div 100").as("rank"))
          if (i % cpEvery == 0 && i < iters) ranks = ranks.localCheckpoint()
        }
        ranks.select(col("node"), col("rank").as("ppr_scaled"))
      } finally flagged.unpersist(false)
    } finally e.unpersist(false)
  }

  /** HITS hubs & authorities (Kleinberg 1999) — the directed-graph
    * complement to [[run]]: PageRank scores "endorsed-ness" in one
    * number, HITS separates GOOD POINTERS (hubs) from GOOD TARGETS
    * (authorities) — for a crawl corpus, the link-farm/directory-page
    * discriminator PageRank cannot express.
    *
    * Power iteration in exact integer ppm: a_{t+1}(v) = Σ_{u→v}
    * h_t(u), then normalize `1e6·a DIV Σa` (truncating — the sum, not
    * L2, so arithmetic stays in bigints; the fixed point direction is
    * identical, only the scale convention differs); h likewise from
    * the fresh authorities. Every step is replayable by the oracle
    * with the iterations unrolled as CTEs (the q102 convention).
    *
    * Overflow contract (matching [[run]]'s rank·w bound): scores are
    * normalized to ≤ 1e6 after every half-step, so a raw per-node sum
    * is at most in-degree·1e6 and the `1000000 * a` staging must stay
    * under 2^63 — i.e. max in-degree (and out-degree) below ~9.2e6.
    * Past that, pre-scale the normalization through DECIMAL or lower
    * the ppm base; under ANSI mode the overflow errors rather than
    * wrapping, so the bound is loud.
    *
    * Scale shape per iteration: two hash shuffles (join on one edge
    * endpoint + aggregate on the other) and two one-row sums
    * broadcast back for the normalization — the PageRank exchange
    * pattern plus the norm scalar. Lineage truncated per round.
    * Nodes with no in-edges get authority 0; no out-edges ⇒ hub 0
    * (rows retained via the node frame left join).
    *
    * Output: (node, authority_ppm, hub_ppm). */
  def hits(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1)
    val e = edges.select(col("src"), col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
        .localCheckpoint()
      var hubs = nodes.withColumn("h", lit(1000000L))
      var auths = nodes.withColumn("a", lit(0L))
      def normalized(df: DataFrame, c: String): DataFrame = {
        val total = df.agg(sum(col(c)).as("t"))
        df.crossJoin(broadcast(total))
          .select(col("node"),
            when(col("t") > 0, expr(s"1000000 * $c DIV t"))
              .otherwise(0L).as(c))
      }
      for (_ <- 1 to iters) {
        val aRaw = e.join(hubs.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("node")).agg(sum("h").as("a"))
        auths = normalized(
          nodes.join(aRaw, Seq("node"), "left").na.fill(0L, Seq("a")),
          "a").localCheckpoint()
        val hRaw = e.join(auths.withColumnRenamed("node", "dst"), "dst")
          .groupBy(col("src").as("node")).agg(sum("a").as("h"))
        hubs = normalized(
          nodes.join(hRaw, Seq("node"), "left").na.fill(0L, Seq("h")),
          "h").localCheckpoint()
      }
      auths.join(hubs, "node")
        .select(col("node"), col("a").as("authority_ppm"),
          col("h").as("hub_ppm"))
    } finally e.unpersist(false)
  }
}
