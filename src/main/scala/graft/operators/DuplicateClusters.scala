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
    // symmetrize in ONE pass over the edge input: a union of two
    // selects would scan (and recompute) the upstream pair pipeline
    // twice — explode duplicates each row instead
    val sym = edges.select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("node"))
      .distinct()
      .withColumn("label", col("node"))
    // Convergence detector: labels only ever decrease (each node takes
    // the min of itself and its neighbors), so the label sum strictly
    // decreases until the fixpoint — one tiny aggregate per round
    // instead of a join of consecutive label tables. Decimal(38,0) so
    // corpus-scale id sums cannot overflow (ANSI mode errors on long
    // overflow rather than wrapping).
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = prevSum == null // no edges → nothing to do
    var i = 0
    while (!converged && i < maxIters) {
      // each node pulls the min label among its neighbors, then keeps
      // the smaller of (own, best neighbor)
      val neighborMin = sym
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(min(col("label")).as("nbr_label"))
      // NOTE: a pointer-doubling variant (label(v) ← label(label(v))
      // via a hop self-join, O(log diameter) rounds) was A/B-measured
      // at 2.5× SLOWER here: near-dup components are shallow, so the
      // extra per-round join + cache churn buys almost no round
      // savings. Revisit only for deep-component graphs.
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
      val curSum = labelSum(next) // materializes next
      labels.unpersist()
      labels = next
      converged = curSum.compareTo(prevSum) == 0
      prevSum = curSum
      i += 1
    }
    // Pin the result to a lineage-free, materialized plan so the edge
    // cache can be released before the caller consumes the output.
    val out = labels.localCheckpoint()
    labels.unpersist()
    sym.unpersist()
    out.select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Two-phase resolution: partition-local union-find contraction, then
    * min-label propagation on the CONTRACTED root graph only.
    *
    * Phase 1 (one map-only pass, no shuffle of the edge set): each
    * partition runs a union-find over its edges with min-id-as-root
    * (union always attaches the larger root under the smaller), so a
    * partition-local root IS the minimum node id of its local
    * component. Emits one (node, root) pair per distinct node per
    * partition.
    *
    * Phase 2: two partition-local roots must be in the same global
    * component iff they are bridged by a chain of nodes seen in
    * multiple partitions — exactly the (array_min(roots), root) edges
    * of nodes with >1 distinct root. That contracted graph is tiny
    * (only cross-partition nodes contribute), so `resolve`'s
    * iteration runs on orders of magnitude fewer rows and converges in
    * ~diameter-of-contracted-graph rounds, not diameter-of-raw-graph.
    * Global cluster id = min root label over the root component = min
    * node id of the whole component — identical output to `resolve`.
    *
    * 100 TB note: the per-partition union-find holds one LongMap entry
    * per distinct node IN THAT PARTITION — size the edge partition
    * count so partitions stay ~100-500 MB and the map stays far below
    * executor memory. This is the same contraction GraphFrames/Pregel
    * implementations use to make the iterative phase corpus-scale-
    * independent. */
  def resolveContracted(edges: DataFrame, maxIters: Int = 10,
                        maxDriverEdges: Int = 2000000): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val pairs = edges.select(col("a").cast("long"), col("b").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x // path-halving second pass keeps trees flat
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          if (!parent.contains(a)) parent(a) = a
          if (!parent.contains(b)) parent(b) = b
          val ra = find(a); val rb = find(b)
          if (ra != rb) {
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
        }
        val ks = parent.keysIterator.toArray // snapshot: find() mutates
        ks.iterator.map(n => (n, find(n)))
      }
      .toDF("node", "root")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bridge edges between the distinct roots of multi-partition nodes
    val rootEdges = pairs.groupBy(col("node"))
      .agg(collect_set(col("root")).as("roots"))
      .filter(size(col("roots")) > 1)
      .select(array_min(col("roots")).as("a"), explode(col("roots")).as("b"))
      .filter(col("a") =!= col("b"))
    // The contracted graph carries one edge per (multi-partition node,
    // extra root) — orders of magnitude below the corpus. When it fits
    // under an explicit cap, finish with a driver union-find: ONE
    // collect + one broadcast join replaces ~diameter iteration rounds
    // whose cost at cluster scale is all fixed job overhead. Above the
    // cap (adversarially fragmented graphs), fall back to the fully
    // distributed iterative resolve — same output either way.
    val bridgeRows = rootEdges
      .limit(maxDriverEdges + 1)
      .as[(Long, Long)].collect()
    val rootLabels: DataFrame =
      if (bridgeRows.length > maxDriverEdges) {
        resolve(rootEdges, maxIters)
          .select(col("doc_id").as("root"), col("cluster_id").as("root_label"))
      } else {
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        bridgeRows.foreach { case (a, b) =>
          if (!parent.contains(a)) parent(a) = a
          if (!parent.contains(b)) parent(b) = b
          val ra = find(a); val rb = find(b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        parent.keysIterator.toArray.toSeq
          .map(r => (r, find(r)))
          .toDF("root", "root_label")
      }
    val out = pairs
      .join(broadcast(rootLabels), Seq("root"), "left")
      .groupBy(col("node").as("doc_id"))
      .agg(min(coalesce(col("root_label"), col("root"))).as("cluster_id"))
      .localCheckpoint()
    pairs.unpersist()
    out
  }

  /** Quality-aware canonical election inside duplicate clusters (round
    * 7): near-dup dedup should keep the BEST copy of each cluster, not
    * an arbitrary one — the CCNet/RefinedWeb convention where the
    * cluster survivor is chosen by a quality score and min-id is only
    * the tie-break. Composes a `(doc_id, cluster_id)` cluster map
    * (e.g. [[resolveContracted]] over portable MinHash pairs) with a
    * per-doc score table; the member with rank 1 under
    * (score DESC, doc_id ASC) keeps its cluster.
    *
    * Scale shape: one equi-join on the id plus one bounded-group
    * window (clusters are near-dup components — tiny and shallow), so
    * WindowGroupLimit semantics apply and nothing corpus-sized sorts
    * globally. Deterministic: the score is integer (linearScore
    * logits in the registered query) and the tie-break is total.
    *
    * Missing scores (round-8 advisory fix): the score join is LEFT —
    * a cluster member absent from the score frame keeps its row with
    * a NULL score and sorts LAST in the election (desc_nulls_last),
    * so it loses to any scored member but can still be the keeper of
    * an all-unscored cluster (min doc_id). The one-keeper-per-cluster
    * invariant holds regardless of score coverage; the old inner join
    * silently dropped unscored members and could elect nobody.
    *
    * Output: (doc_id, cluster_id, <scoreCol>, keep) — one row per
    * clustered doc; singletons never reach the cluster map and are
    * implicitly kept upstream. */
  def canonicalByQuality(clusters: DataFrame, scores: DataFrame,
                         idCol: String = "doc_id",
                         scoreCol: String = "logit"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col(scoreCol).desc_nulls_last, col(idCol).asc)
    clusters.join(scores.select(col(idCol), col(scoreCol)), Seq(idCol),
        "left")
      .withColumn("rn", row_number().over(w))
      .withColumn("keep", col("rn") === 1)
      .drop("rn")
  }
}
