package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan/Albert/Kumara 2007) —
  * community detection as pure relational iterations, the detector a
  * data-curation pipeline runs over similarity/trade/link graphs when
  * PageRank's "importance" is the wrong question and "which cluster"
  * is the right one (e.g. grouping near-duplicate clusters into
  * source families, or partitioning an entity graph before
  * per-community sampling).
  *
  * Made DETERMINISTIC (the classic algorithm is famously order-
  * sensitive): updates are synchronous (every node recomputes from
  * the PREVIOUS round's labels — no within-round ordering), and the
  * neighbor-majority argmax tie-breaks by smallest label. Labels are
  * the node ids themselves, so every round is exact integer
  * relational algebra and a SQL engine replays it verbatim (the q102
  * unrolled-iteration oracle pattern).
  *
  * Scale shape: the undirected edge list is fixed-width and
  * localCheckpoint-pinned once; each round is one equi-join
  * (labels → neighbors), one map-side-combined count aggregation on
  * (node, label), and a WindowGroupLimit-prunable argmax — the
  * PageRank per-iteration cost. No driver state; `iters` is a small
  * fixed constant (LPA converges in a handful of rounds).
  */
object LabelProp {

  /** Run `iters` synchronous rounds over a directed edge list
    * (src, dst); edges are symmetrized and deduplicated internally.
    * Output: (node, label) — nodes sharing a label are one
    * community. Isolated nodes don't appear (no edges ⇒ no rows). */
  def run(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"LabelProp needs iters >= 1, got $iters")
    val und = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var lab = und.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    val wArg = Window.partitionBy(col("u"))
      .orderBy(col("n").desc, col("label").asc)
    for (_ <- 1 to iters) {
      lab = und
        .join(lab.select(col("node").as("v"), col("label")), Seq("v"))
        .groupBy(col("u"), col("label"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(wArg))
        .filter(col("rk") === 1)
        .select(col("u").as("node"), col("label"))
    }
    lab
  }

  /** Newman modularity of a community assignment over an undirected
    * graph — the standard "did the communities actually cut the graph
    * well" audit for [[run]]'s output (or any clustering): Q = Σ_c
    * (e_c/m − (d_c/2m)²), where e_c = intra-community edges, d_c =
    * community degree sum, m = total undirected edges. Published per
    * community as EXACT integers (the q201 convention): `q_num =
    * 4·m·e_c − d_c²` and the shared `q_den = 4m²`, so Q = Σ q_num /
    * q_den with zero doubles anywhere; consumers (and the oracle)
    * reconstruct the real-valued Q or compare community contributions
    * directly.
    *
    * Exact-arithmetic bound: 4m·e_c and d_c² both fit a BIGINT iff
    * m ≤ 10⁸ (4m² ≤ 4·10¹⁶ < 2⁶³), enforced with a loud `require` —
    * ANSI mode would otherwise error mid-query on a carefully-sized
    * graph. Community graphs past 10⁸ edges should be scored per
    * component/tenant partition, not in one exact global sum. (The
    * count behind the require is one aggregate over the already-
    * checkpointed edge set — this operator family is eager-at-build
    * by design, like [[run]]'s localCheckpoint.)
    *
    * Nodes present in `edges` but absent from `labels` are dropped by
    * the inner join (and their edges from e_c but NOT from m/degrees)
    * — pass complete labelings; [[run]] labels every non-isolated
    * node, so the composition is total.
    *
    * Scale shape: symmetrize+dedup once (checkpoint-pinned), then
    * three map-side-combined aggregations (degrees, community
    * rollup, intra-edge count via two label equi-joins) and one
    * broadcast of a single-row m — no driver collect beyond the one
    * guard scalar, no cartesian.
    *
    * Output: (community, n_nodes, intra_edges, degree_sum, q_num,
    * q_den), one row per community. */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val und = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    val ce = und.filter(col("u") < col("v"))
    val m = ce.count()
    require(m <= 100000000L,
      s"modularity: $m edges exceeds the exact-BIGINT bound (4m^2 " +
        "must fit a long); score per component/tenant partition instead")
    val deg = und.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
    val lab = labels.select(col("node"), col("label"))
    val dc = lab.join(deg, "node").groupBy("label")
      .agg(count(lit(1)).as("n_nodes"), sum("deg").as("degree_sum"))
    val ic = ce
      .join(lab.select(col("node").as("u"), col("label").as("la")), "u")
      .join(lab.select(col("node").as("v"), col("label").as("lb")), "v")
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("label"))
      .agg(count(lit(1)).as("intra_edges"))
    dc.join(ic, Seq("label"), "left")
      .na.fill(0L, Seq("intra_edges"))
      .select(col("label").as("community"), col("n_nodes"),
        col("intra_edges"), col("degree_sum"),
        (lit(4L * m) * col("intra_edges")
          - col("degree_sum") * col("degree_sum")).as("q_num"),
        lit(4L * m * m).as("q_den"))
  }
}
