package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic graph random walks — the DeepWalk / node2vec corpus
  * generator (Perozzi et al. 2014): fixed-length walks from every
  * node whose "random" step is a PRF of (walk id, step), so the walk
  * corpus is REPRODUCIBLE across runs, partitionings, and engines —
  * the engine-wide no-nondeterminism stance applied to the one
  * operator usually run with a live RNG. Step choice: out-edges of a
  * node are densely ranked (by dst — a total order), and the walk at
  * node v takes rank ((h1² + 17) mod P) mod outdeg(v) with
  * h1 = (walk_id·1000003 + step·97 + 12345) mod P — the quadratic
  * PRF family of the sketch suite ([[Sketches]]), replayable in
  * plain SQL. Walks stop early at sink nodes (no out-edges).
  *
  * Scale shape: edge ranking is ONE window over the src partition
  * (bounded by out-degree; hub-heavy graphs pay a per-hub sort once);
  * each of the L steps is one equi-join of the frontier against the
  * ranked edges on (node, picked rank) — frontier size ≤ |V| always,
  * never walk-count × corpus. Lineage cut per step. The emitted
  * corpus is (walk_id, step, node), the skip-gram trainer's input.
  *
  * @param edges (src, dst) directed; duplicate edges collapse (the
  *              rank domain is DISTINCT out-neighbors)
  * @param len   steps per walk (output has steps 0..len, step 0 is
  *              the start node)
  * @return (walk_id, step, node) */
object RandomWalks {

  def deterministicWalks(edges: DataFrame, len: Int): DataFrame = {
    require(len >= 1, s"deterministicWalks: len must be >= 1, got $len")
    val P = 1000000007L
    val e = edges.select(col("src"), col("dst")).distinct()
    val ranked = e
      .withColumn("rnk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("src").orderBy("dst")) - 1)
      .localCheckpoint()
    val outdeg = ranked.groupBy(col("src").as("cur"))
      .agg(count(lit(1)).as("odeg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    var frontier = nodes.select(col("node").as("walk_id"),
      col("node").as("cur"))
    var out = frontier.select(col("walk_id"), lit(0).as("step"),
      col("cur").as("node"))
    for (s <- 1 to len) {
      val h1 = pmod(col("walk_id") * 1000003L + s * 97L + 12345L, lit(P))
      val pick = pmod(h1 * h1 + 17L, lit(P)) % col("odeg")
      // resolve the degree first (a |V|-sized dim — AQE broadcasts it
      // when small), so the edge lookup is a true two-key equi-join:
      // no per-hub row explosion before a filter
      frontier = frontier
        .join(outdeg, Seq("cur"))
        .select(col("walk_id"), col("cur"), pick.as("rnk"))
        .join(ranked.withColumnRenamed("src", "cur"), Seq("cur", "rnk"))
        .select(col("walk_id"), col("dst").as("cur"))
        .localCheckpoint()
      out = out.unionByName(frontier.select(col("walk_id"),
        lit(s).as("step"), col("cur").as("node")))
    }
    out
  }
}
