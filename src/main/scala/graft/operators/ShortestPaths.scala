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
}
