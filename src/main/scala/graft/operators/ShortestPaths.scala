package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Unweighted single-source shortest paths (BFS levels) by join-based
  * frontier expansion — the reachability/link-distance primitive a
  * crawl-graph curation pipeline uses (e.g. "hops from a trusted seed
  * set" as a quality prior, the OPIC/TrustRank-style distance feature).
  *
  * Scale shape: each round shuffles only the FRONTIER joined against
  * the edge list on `src` — not the whole visited set — then one
  * anti-join against visited to drop already-settled nodes. Frontier
  * size is bounded by the graph's expansion, so rounds get cheaper as
  * the BFS saturates; `localCheckpoint` per round keeps the plan O(1)
  * deep (the [[PageRank]] / DuplicateClusters convention). Distances
  * are exact integers — a recursive-CTE SQL oracle reproduces them
  * bit-for-bit.
  *
  * Iterations stop as soon as a frontier comes back empty; `maxHops`
  * bounds the worst case (diameter) for adversarial graphs.
  */
object ShortestPaths {

  /** @param edges (src: long, dst: long) directed edge list
    * @param source seed node id
    * @return (node: long, dist: int) for every node reachable from
    *         `source`, including (source, 0) */
  def bfs(edges: DataFrame, source: Long, maxHops: Int = 30): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var visited = Seq((source, 0)).toDF("node", "dist").localCheckpoint()
      var frontier = visited
      var hop = 0
      var done = false
      while (hop < maxHops && !done) {
        hop += 1
        val next = e
          .join(frontier.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"))
          .distinct()
          .join(visited.select("node"), Seq("node"), "left_anti")
          .withColumn("dist", lit(hop))
          .localCheckpoint() // truncate lineage; also materializes for isEmpty
        if (next.isEmpty) done = true
        else {
          visited = visited.union(next).localCheckpoint()
          frontier = next
        }
      }
      visited.withColumn("dist", col("dist").cast("int"))
    } finally e.unpersist()
  }

  /** WEIGHTED multi-source shortest paths: bounded-round Bellman-Ford
    * relaxation as iterated join/min (the vertex-centric SSSP loop of
    * Pregel, Malewicz et al. 2010). Each round relaxes every edge
    * once — dist'(v) = min(dist(v), min over in-edges
    * (dist(u) + cost(u,v))) — so after k rounds every shortest path
    * of at most k hops is exact: the bounded-iteration convention
    * this engine uses for all fixed-point graph ops (PageRank /
    * label-prop / k-core), a deterministic k-round prefix the oracle
    * unrolls as CTEs rather than an unbounded convergence loop.
    * [[bfs]] is the unit-cost frontier-optimized special case; this
    * one carries the whole dist frame because weighted relaxation can
    * IMPROVE already-settled nodes.
    *
    * Scale shape: per round ONE equi-join (edges ⋈ dist on src) +
    * one groupBy-min — the two exchanges of a PageRank round; lineage
    * cut every `cpEvery` rounds. All-integer costs keep min-folds
    * order-independent and exact. Unreached nodes simply have no row
    * (no +∞ sentinels to overflow).
    *
    * @param edges   (src, dst, cost) — cost a non-negative integer
    *                column; path sums must stay < 2^63
    * @param sources one column `node`; dist 0, kept even if absent
    *                from the graph (an isolated source is still at 0)
    * @return (node, dist) for every node reached within `iters` hops */
  def sssp(edges: DataFrame, sources: DataFrame, iters: Int,
           cpEvery: Int = 3): DataFrame = {
    require(iters >= 1, s"sssp: iters must be >= 1, got $iters")
    val e = edges.select(col("src"), col("dst"),
        col("cost").cast("long").as("cost"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var dist = sources.select(col("node")).distinct()
        .select(col("node"), lit(0L).as("dist"))
      for (i <- 1 to iters) {
        val relaxed = e
          .join(dist.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"),
            (col("dist") + col("cost")).as("dist"))
        dist = dist.union(relaxed)
          .groupBy("node").agg(min("dist").as("dist"))
        if (i % cpEvery == 0 && i < iters) dist = dist.localCheckpoint()
      }
      dist
    } finally e.unpersist(false)
  }
}
