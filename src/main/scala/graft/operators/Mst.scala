package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanCut.localCheckpointFlatStats

/** Distributed minimum spanning forest by Borůvka's algorithm (1926;
  * the textbook distributed MST — Chung & Condon 1996's parallel form,
  * the GraphX/Pregel staple): every component picks its lightest
  * incident edge under a strict total order, picked edges hook
  * components together, labels contract, repeat. O(log n) rounds merge
  * everything; ties cannot produce cycles because the order
  * (w, min(u,v), max(u,v)) is total, so the result is THE unique
  * minimum spanning forest of that order (and any MSF has the same
  * total weight — what q306's closed-form oracle checks).
  *
  * Round-13 rework — the edge table lives in CONTRACTED COMPONENT
  * SPACE and the round tail finishes at the driver:
  *
  *  - edges are kept as (ca, cb, w, a, b): current component labels
  *    plus the original endpoints, MIN-REDUCED per unordered component
  *    pair (by the cycle property only the lightest edge between two
  *    components can ever be picked, under the same total order that
  *    makes the MSF unique). The table therefore SHRINKS geometrically
  *    with the component count instead of re-joining the full input
  *    every round (the pre-round-13 shape paid 2 corpus-sized joins ×
  *    every round);
  *  - the per-component argmin is `min(struct(w, a, b, oc))` under a
  *    hash groupBy — map-side partial combine, NO window;
  *  - picked edges hook components into merge trees, contracted to
  *    canonical min-labels by [[DuplicateClusters.resolveContracted]]
  *    (partition-local union-find + bounded driver fold) — complete
  *    contraction per round is a correctness requirement: a partially
  *    contracted label pair from the same merge tree would pick an
  *    intra-tree edge next round and close a cycle;
  *  - once the contracted edge table fits under `localFinishEdges`,
  *    the remaining O(log) rounds collapse into ONE driver-local
  *    Kruskal over the component graph (the same bounded-driver-fold
  *    convention as resolveContracted's bridge finish, same 2M default
  *    cap ≈ tens of MB). By the contraction lemma MSF(G) = picks so
  *    far ∪ MSF(contracted graph), and Kruskal under the shared total
  *    order returns exactly that unique MSF — the switch point cannot
  *    change the answer. The FIRST pick+contract round always runs
  *    distributed: the input edge table is corpus-sized by assumption
  *    and is never collected;
  *  - lineage is cut per round with a STATS-RESETTING checkpoint
  *    ([[org.apache.spark.sql.graft.PlanCut]]): plain localCheckpoint
  *    keeps the origin plan's Statistics snapshot, and under the
  *    size-only estimator compounded join products across unrolled
  *    rounds grow the BigInts until plan-time stats visitation hangs
  *    the driver (observed at sf0.1 with the pointer-jump form).
  *
  * Distributed rounds are bounded by ⌈log₂ n⌉ + 1 from ONE node count
  * (a single driver scalar): Borůvka at least halves the component
  * count per round, so the contracted edge table is empty by the
  * bound even with the local finish disabled (`localFinishEdges = 0`,
  * the spec's pure-distributed pin).
  *
  * Returns the picked edge set (u, v, w) — callers aggregate weight /
  * count per partition key downstream. */
object Mst {

  def boruvkaMsf(edges: DataFrame,
                 localFinishEdges: Int = 2000000): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    def cut(df: DataFrame): DataFrame = localCheckpointFlatStats(df)
    val e0 = edges.select(col("u").cast("long").as("u"),
        col("v").cast("long").as("v"), col("w").cast("long").as("w"))
      .transform(cut)
    val n = math.max(
      e0.select(col("u").as("x")).union(e0.select(col("v").as("x")))
        .distinct().count(), 2L)
    val bound = 64 - java.lang.Long.numberOfLeadingZeros(n - 1).toInt + 1

    // component space: labels start as the node ids themselves;
    // min-reduce per unordered pair (dedupes parallel edges too)
    var cur = e0.select(least(col("u"), col("v")).as("ca"),
        greatest(col("u"), col("v")).as("cb"),
        struct(col("w"), least(col("u"), col("v")).as("a"),
          greatest(col("u"), col("v")).as("b")).as("e"))
      .groupBy("ca", "cb").agg(min(col("e")).as("e"))
      .select(col("ca"), col("cb"), col("e.w").as("w"),
        col("e.a").as("a"), col("e.b").as("b"))
      .transform(cut)
    var curCount = cur.count()

    val pickedRounds =
      scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var round = 0
    // distributed rounds while the contracted graph is above the
    // driver-finish cap (round 0 always distributed — see scaladoc)
    while (curCount > 0 &&
           (round == 0 || curCount > localFinishEdges) &&
           round < bound) {
      val half = cur.select(explode(array(
          struct(col("ca").as("c"), struct(col("w"), col("a"),
            col("b"), col("cb").as("oc")).as("cand")),
          struct(col("cb").as("c"), struct(col("w"), col("a"),
            col("b"), col("ca").as("oc")).as("cand")))).as("h"))
        .select(col("h.c").as("c"), col("h.cand").as("cand"))
      // lightest incident edge per component under the total order
      val m = half.groupBy("c").agg(min(col("cand")).as("best"))
        .select(col("c"), col("best.w").as("w"), col("best.a").as("a"),
          col("best.b").as("b"), col("best.oc").as("oc"))
        .transform(cut)
      pickedRounds += m.select(col("a").as("u"), col("b").as("v"),
        col("w"))
      val labels = DuplicateClusters.resolveContracted(
          m.select(col("c").as("a"), col("oc").as("b")))
        .select(col("doc_id").as("comp"), col("cluster_id"))
      // relabel the contracted edges, drop intra-component edges,
      // min-reduce the survivors per new component pair
      cur = cur
        .join(broadcast(labels.select(col("comp").as("ca"),
          col("cluster_id").as("la"))), Seq("ca"), "left")
        .join(broadcast(labels.select(col("comp").as("cb"),
          col("cluster_id").as("lb"))), Seq("cb"), "left")
        .select(coalesce(col("la"), col("ca")).as("na"),
          coalesce(col("lb"), col("cb")).as("nb"),
          col("w"), col("a"), col("b"))
        .filter(col("na") =!= col("nb"))
        .select(least(col("na"), col("nb")).as("ca"),
          greatest(col("na"), col("nb")).as("cb"),
          struct(col("w"), col("a"), col("b")).as("e"))
        .groupBy("ca", "cb").agg(min(col("e")).as("e"))
        .select(col("ca"), col("cb"), col("e.w").as("w"),
          col("e.a").as("a"), col("e.b").as("b"))
        .transform(cut)
      curCount = cur.count()
      round += 1
    }

    // driver-local Kruskal over the (capped) contracted component
    // graph — replaces the remaining O(log) near-empty rounds with
    // one bounded collect (resolveContracted's bridge-fold convention)
    if (curCount > 0) {
      val rows = cur.select(col("ca"), col("cb"), col("w"), col("a"),
          col("b"))
        .as[(Long, Long, Long, Long, Long)].collect()
        .sortBy { case (_, _, w, a, b) => (w, a, b) }
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val t = parent(c); parent(c) = r; c = t }
        r
      }
      val local = rows.flatMap { case (ca, cb, w, a, b) =>
        if (!parent.contains(ca)) parent(ca) = ca
        if (!parent.contains(cb)) parent(cb) = cb
        val ra = find(ca); val rb = find(cb)
        if (ra == rb) None
        else {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
          Some((a, b, w))
        }
      }
      pickedRounds += local.toSeq.toDF("u", "v", "w")
    }

    if (pickedRounds.isEmpty)
      spark.emptyDataset[(Long, Long, Long)].toDF("u", "v", "w")
    else pickedRounds.reduce(_ unionByName _).distinct()
  }

  /** Single-link clustering at a FIXED distance cut — WITHOUT the
    * MST: by the Gower & Ross 1969 equivalence, single-link clusters
    * at threshold t are exactly the connected components of the
    * threshold graph {edges: w ≤ t} (the MSF preserves connectivity
    * at every threshold, so cutting the MSF at t and thresholding the
    * raw graph at t give the same partition). A fixed cut therefore
    * needs only component resolution over the filtered edges — one
    * union-find pass, not O(log n) Borůvka rounds. [[boruvkaMsf]]
    * remains the route when the DENDROGRAM (many cuts / merge order)
    * is the product.
    *
    * Output: (doc_id, cluster_id = min node id of the component) for
    * every node incident to a kept edge — identical to resolving the
    * MSF-restricted edges, which is what the q313 oracle pins. */
  def singleLinkCut(edges: DataFrame, cutW: Long): DataFrame =
    DuplicateClusters.resolveContracted(
      edges.filter(col("w") <= cutW)
        .select(col("u").cast("long").as("a"),
          col("v").cast("long").as("b")))
}
