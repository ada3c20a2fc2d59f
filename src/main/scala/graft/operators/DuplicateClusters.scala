package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: turn pairwise near-dup edges (a, b)
  * into connected components, electing the minimum id as the cluster
  * canonical ("keeper"). Iterative min-label propagation — each round
  * every node adopts the smallest label among itself and its
  * neighbors; converges in O(component diameter) rounds. Pure
  * joins/groupBys, no driver-side graph: this is how dedup clusters
  * are resolved at corpus scale (near-dup components are tiny and
  * shallow, so few rounds suffice).
  */
object DuplicateClusters {

  /** edges: (a, b) with a != b. Output: (doc_id, cluster_id) for every
    * node appearing in an edge, cluster_id = min id in its component. */
  def resolve(edges: DataFrame, maxIters: Int = 10): DataFrame = {
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(edges.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("node"))
      .distinct()
      .withColumn("label", col("node"))
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // each node pulls the min label among its neighbors, then keeps
      // the smaller of (own, best neighbor)
      val neighborMin = sym
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(min(col("label")).as("nbr_label"))
      val next0 = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("label"))
      // Each round references the prior labels twice (next + the
      // convergence check), so unmaterialized lineage doubles per
      // iteration and round N would replan an N-deep DAG. Truncate with
      // an eager localCheckpoint every few rounds (labels are
      // cluster-assignment-sized, far smaller than the corpus); plain
      // persist in between keeps the common case cheap.
      val next =
        if ((i + 1) % 3 == 0) next0.localCheckpoint()
        else next0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val changed = next.join(labels.withColumnRenamed("label", "old"),
        Seq("node"))
        .filter(col("label") =!= col("old"))
        .limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      i += 1
    }
    // Pin the result to a lineage-free, materialized plan so the edge
    // cache can be released before the caller consumes the output.
    val out = labels.localCheckpoint()
    labels.unpersist()
    sym.unpersist()
    out.select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }
}
