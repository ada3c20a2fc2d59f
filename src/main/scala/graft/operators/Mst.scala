package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  *  - hooking gives a functional graph with exactly one 2-cycle per
  *    merge tree (mutual minima under a total order); the smaller
  *    label of each mutual pair roots it, and `jumps` pointer-jump
  *    rounds (p ← p∘p, label tables only — component-sized, not
  *    edge-sized) contract chains of length ≤ 2^jumps;
  *  - lineage is cut per round (localCheckpoint), the suffix-array /
  *    PageRank convention for unrolled iteration.
  *
  * Rounds and jumps are deterministic unrolls (no convergence loop),
  * auto-sized as ⌈log₂ n⌉ + 1 from ONE node count (a single driver
  * scalar — the emVocab/max-coverage convention): Borůvka halves the
  * component count per round, and 2^jumps bounds the deepest hook
  * chain (≤ n), so contraction is always COMPLETE — this matters for
  * correctness, not just speed: a partially contracted label pair
  * from the same merge tree would pick an intra-tree edge next round
  * and close a cycle. Extra rounds no-op (no cross-component edges
  * survive, the picks are empty, labels stable).
  *
  * Returns the picked edge set (u, v, w) — callers aggregate weight /
  * count per partition key downstream. */
object Mst {

  def boruvkaMsf(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e0 = edges.select(col("u").cast("long").as("u"),
        col("v").cast("long").as("v"), col("w").cast("long").as("w"))
      .localCheckpoint()
    var comp = e0.select(col("u").as("node"))
      .union(e0.select(col("v").as("node")))
      .distinct()
      .select(col("node"), col("node").as("comp"))
      .localCheckpoint()
    val n = math.max(comp.count(), 2L)
    val bound = 64 - java.lang.Long.numberOfLeadingZeros(n - 1).toInt + 1
    var picked = spark.emptyDataset[(Long, Long, Long)]
      .toDF("u", "v", "w")
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
        .localCheckpoint()
      if (m.isEmpty) { merging = false }
      else {
        picked = picked
          .unionByName(m.select(col("a").as("u"), col("b").as("v"),
            col("w")).distinct())
          .localCheckpoint()
        // hook: p(c) = oc, except the smaller side of a mutual pair
        // roots itself (breaks the one 2-cycle per merge tree)
        val mutual = m.select(col("c"), col("oc"))
          .join(m.select(col("c").as("oc"), col("oc").as("ococ")),
            Seq("oc"))
        var p = comp.select(col("comp").as("c")).distinct()
          .join(mutual, Seq("c"), "left")
          .select(col("c"),
            when(col("oc").isNull, col("c")) // no incident edge: root
              .when(col("ococ") === col("c") && col("c") < col("oc"),
                col("c")) // mutual pair, smaller label wins
              .otherwise(col("oc")).as("p"))
          .localCheckpoint()
        // pointer-jump to fixpoint: each pass squares reachable depth,
        // so ≤ bound passes even on adversarial monotone chains; the
        // fixpoint probe is a label-sized isEmpty, and COMPLETE
        // contraction is what keeps later rounds cycle-free
        var jump = 0
        var moving = true
        while (jump < bound && moving) {
          val stepped = p.as("x")
            .join(p.select(col("c").as("p"), col("p").as("pp")).as("y"),
              Seq("p"))
            .select(col("c"), col("p"), col("pp"))
            .localCheckpoint()
          moving = !stepped.filter(col("pp") =!= col("p")).isEmpty
          p = stepped.select(col("c"), col("pp").as("p"))
          jump += 1
        }
        comp = comp.join(p.select(col("c").as("comp"), col("p")),
            Seq("comp"))
          .select(col("node"), col("p").as("comp"))
          .localCheckpoint()
        round += 1
      }
    }
    picked
  }
}
