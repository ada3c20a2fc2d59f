package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanCut.localCheckpointFlatStats

/** Distributed minimum spanning forest by Borůvka's algorithm (1926;
  * the textbook distributed MST — Chung & Condon 1996's parallel form,
  * the GraphX/Pregel staple): every component picks its lightest
  * incident edge under a strict total order, picked edges hook
  * components together, labels contract by pointer jumping, repeat.
  * O(log n) rounds merge everything; ties cannot produce cycles
  * because the order (w, min(u,v), max(u,v)) is total, so the result
  * is THE unique minimum spanning forest of that order (and any MSF
  * has the same total weight — what q306's closed-form oracle checks).
  *
  * Scale shape, per round:
  *  - component labels reach edges via two equi-joins (comp is
  *    node-keyed, edges are the big side — never collected);
  *  - the per-component argmin is `min(struct(w, u, v, other))` under
  *    a hash groupBy — map-side partial combine, NO window: a late
  *    round's giant component aggregates across partitions instead
  *    of sorting one (the house no-global-window rule);
  *  - the picked edges hook components into merge trees, and the
  *    trees contract to canonical min-labels as the connected
  *    components of the (c → oc) hook graph — label-table-sized,
  *    resolved by [[DuplicateClusters.resolveContracted]]'s
  *    partition-local union-find + bounded driver fold (~2 jobs,
  *    replacing the textbook O(log² n) pointer-jump job storm);
  *  - lineage is cut per round with a STATS-RESETTING checkpoint
  *    ([[org.apache.spark.sql.graft.PlanCut]]): plain localCheckpoint
  *    keeps the origin plan's Statistics snapshot, and under the
  *    size-only estimator compounded join products across unrolled
  *    rounds grow the BigInts until plan-time stats visitation hangs
  *    the driver (observed at sf0.1 with the pointer-jump form).
  *
  * Rounds are a deterministic unroll bounded by ⌈log₂ n⌉ + 1 from ONE
  * node count (a single driver scalar — the emVocab/max-coverage
  * convention): Borůvka halves the component count per round, and
  * contraction is COMPLETE every round (exact connected components) —
  * this matters for correctness, not just speed: a partially
  * contracted label pair from the same merge tree would pick an
  * intra-tree edge next round and close a cycle. Extra rounds no-op
  * (no cross-component edges survive, the picks are empty).
  *
  * Returns the picked edge set (u, v, w) — callers aggregate weight /
  * count per partition key downstream. */
object Mst {

  def boruvkaMsf(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // cut = localCheckpoint + stats reset: the p ⨝ p pointer jump and
    // the m ⨝ m mutual probe DOUBLE the size-only stats' bit-length
    // per pass; with plain localCheckpoint the snapshot compounds
    // across rounds and plan-time stats visitation degenerates into
    // multi-megabit BigInteger multiplies (a driver hang at sf0.1).
    def cut(df: DataFrame): DataFrame = localCheckpointFlatStats(df)
    val e0 = edges.select(col("u").cast("long").as("u"),
        col("v").cast("long").as("v"), col("w").cast("long").as("w"))
      .transform(cut)
    var comp = e0.select(col("u").as("node"))
      .union(e0.select(col("v").as("node")))
      .distinct()
      .select(col("node"), col("node").as("comp"))
      .transform(cut)
    val n = math.max(comp.count(), 2L)
    val bound = 64 - java.lang.Long.numberOfLeadingZeros(n - 1).toInt + 1
    // per-round picks are already checkpointed (m) — collect the
    // frames and union/dedupe ONCE at the end instead of paying a
    // union+distinct+checkpoint job every round
    val pickedRounds =
      scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var round = 0
    var merging = true
    while (round < bound && merging) {
      val labeled = e0
        .join(comp.select(col("node").as("u"), col("comp").as("cu")),
          Seq("u"))
        .join(comp.select(col("node").as("v"), col("comp").as("cv")),
          Seq("v"))
        .filter(col("cu") =!= col("cv"))
      val half = labeled.select(col("cu").as("c"),
          struct(col("w"), least(col("u"), col("v")).as("a"),
            greatest(col("u"), col("v")).as("b"),
            col("cv").as("oc")).as("cand"))
        .union(labeled.select(col("cv").as("c"),
          struct(col("w"), least(col("u"), col("v")).as("a"),
            greatest(col("u"), col("v")).as("b"),
            col("cu").as("oc")).as("cand")))
      // lightest incident edge per component under the total order
      val m = half.groupBy("c").agg(min(col("cand")).as("best"))
        .select(col("c"), col("best.w").as("w"), col("best.a").as("a"),
          col("best.b").as("b"), col("best.oc").as("oc"))
        .transform(cut)
      if (m.isEmpty) { merging = false }
      else {
        pickedRounds += m.select(col("a").as("u"), col("b").as("v"),
          col("w"))
        // contract: the merge trees are exactly the connected
        // components of the (c → oc) hook graph on component labels
        // (component-sized, not edge-sized), and resolveContracted
        // computes them COMPLETELY in ~2 jobs (partition-local
        // union-find + bounded driver fold on the bridge edges) —
        // vs O(log² n) pointer-jump jobs. Complete contraction is a
        // correctness requirement: a partially contracted label pair
        // from the same merge tree would pick an intra-tree edge next
        // round and close a cycle. Min-label canonicalization is as
        // good as any root choice — labels only need to be consistent
        // per merged component.
        val labels = DuplicateClusters.resolveContracted(
            m.select(col("c").as("a"), col("oc").as("b")))
          .select(col("doc_id").as("comp"), col("cluster_id"))
        comp = comp.join(labels, Seq("comp"), "left")
          .select(col("node"),
            coalesce(col("cluster_id"), col("comp")).as("comp"))
          .transform(cut)
        round += 1
      }
    }
    if (pickedRounds.isEmpty)
      spark.emptyDataset[(Long, Long, Long)].toDF("u", "v", "w")
    else pickedRounds.reduce(_ unionByName _).distinct()
  }
}
