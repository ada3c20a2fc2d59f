package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** k-core decomposition by bounded-round peeling (Matula & Beck 1983;
  * the distributed formulation of Montresor et al. 2013) — the
  * degeneracy filter of the graph family: PageRank/HITS score nodes,
  * label-prop clusters them, k-core finds the maximal subgraph where
  * EVERY member keeps ≥ k induced neighbors. For a crawl/link corpus
  * this is the standard dense-community extractor (link farms, tight
  * citation cliques) and the usual prefilter before expensive
  * community detection.
  *
  * Fixed `rounds` for determinism and oracle replay (the
  * PageRank/Lloyd bounded-iteration convention; a fixpoint reached
  * early makes later rounds no-ops, never a different answer). Each
  * round: keep edges whose BOTH endpoints survived, recompute induced
  * degrees, peel nodes below k. The classic sequential algorithm
  * peels one minimum at a time; peeling all sub-k nodes per round is
  * the parallel variant, which converges to the same k-core (the
  * k-core is the unique maximal fixpoint, and batch peeling only
  * removes nodes that can never rejoin).
  *
  * Scale shape per round: two semi-joins of the edge list against the
  * (shrinking) survivor set — AQE broadcasts survivors once they are
  * small, which is fast on exactly the rounds where the filter bites —
  * plus one map-side-combined degree aggregation. Survivor lineage is
  * truncated per round (localCheckpoint, the PageRank convention).
  * No global sort, no driver state beyond the loop counter.
  */
object KCore {

  /** @param edges  (src: long, dst: long) directed input; the graph is
    *               symmetrized and self-loops dropped, so degrees are
    *               undirected-neighbor counts
    * @param k      core threshold (survivors need ≥ k induced neighbors)
    * @param rounds peeling rounds (the oracle unrolls exactly these)
    * @return one row per ORIGINAL node: (node, in_core, degree) —
    *         degree is the induced degree inside the final survivor
    *         set; peeled nodes report in_core = false, degree = 0 */
  def peel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"bad k-core shape: k=$k rounds=$rounds")
    // undirected simple graph: both directions, no self-loops, distinct
    val dir = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val und = dir.union(dir.select(col("dst").as("src"),
        col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val nodes = und.select(col("src").as("node")).distinct()
        .localCheckpoint()
      var alive = nodes
      for (_ <- 1 to rounds) {
        val induced = und
          .join(alive.withColumnRenamed("node", "src"), Seq("src"),
            "left_semi")
          .join(alive.withColumnRenamed("node", "dst"), Seq("dst"),
            "left_semi")
        alive = induced.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k)
          .select("node")
          .localCheckpoint()
      }
      val finalDeg = und
        .join(alive.withColumnRenamed("node", "src"), Seq("src"),
          "left_semi")
        .join(alive.withColumnRenamed("node", "dst"), Seq("dst"),
          "left_semi")
        .groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      nodes.join(finalDeg, Seq("node"), "left")
        .select(col("node"), col("deg").isNotNull.as("in_core"),
          coalesce(col("deg"), lit(0L)).as("degree"))
    } finally und.unpersist(false)
  }
}
