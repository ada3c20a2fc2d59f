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
}
