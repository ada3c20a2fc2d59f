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

  /** Skip-gram PMI over the walk corpus — the DeepWalk pipeline's
    * second half: adjacent (window-1) node pairs from
    * [[deterministicWalks]], counted and scored with the q196 PMI
    * convention (ratio_ppm = c₁₂·T·10⁶ DIV (c₁·c₂), the log-free
    * integer publication — PMI in nats is ln(ratio)−ln(10⁶)). The
    * resulting association table is exactly what a factorization-
    * based node embedding (LINE / NetMF) trains on.
    *
    * Scale shape: the pair derivation is one self-join of the walk
    * frame on (walk_id, step+1) — walk frames are |V|·(len+1) rows;
    * counts are map-side-combined groupBys. */
  def walkPmi(edges: DataFrame, len: Int): DataFrame = {
    val walks = deterministicWalks(edges, len).localCheckpoint()
    val pairs = walks.as("a")
      .join(walks.as("b"),
        col("a.walk_id") === col("b.walk_id") &&
          col("b.step") === col("a.step") + 1)
      .select(col("a.node").as("w1"), col("b.node").as("w2"))
    val c12 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val total = c12.agg(sum("c12").as("t_bi"))
    val uni = walks.groupBy(col("node")).agg(count(lit(1)).as("c"))
    c12
      .join(uni.select(col("node").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("node").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("c12"),
        expr("(c12 * t_bi * 1000000) div (c1 * c2)").as("ratio_ppm"))
  }
}
