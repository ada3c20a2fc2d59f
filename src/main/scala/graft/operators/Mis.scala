package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal independent set by Luby's algorithm (Luby 1986, the
  * canonical parallel MIS): each round every still-active node draws a
  * priority; a node whose priority beats ALL its active neighbors'
  * joins the MIS, and it and its neighbors leave the graph. With fresh
  * per-round priorities the edge count halves in expectation, so
  * O(log n) rounds finish w.h.p.
  *
  * Engine determinism contract (the q243 quadratic-PRF stance): the
  * per-round priority is the fixed PRF
  *
  *   key(x, r) = (((x mod P)² · (r+1) + 31·x + 7·r) mod P) · 10^7 + x
  *
  * with P = 1000003 — the trailing + x makes the order total (ties
  * impossible), every intermediate stays far under 2^63 for node ids
  * below 10^7, and DuckDB replays the arithmetic verbatim. The round
  * count is a FIXED unroll (default 24): the engine may exit early
  * once no node is active (the tail rounds are provable no-ops), so
  * engine and replay agree row-for-row regardless of where activity
  * dies; specs pin maximality/independence separately, which is where
  * the "24 is enough" claim is actually enforced on fixtures.
  *
  * Scale shape, per round: priorities are map-side expressions; the
  * active-neighbor minimum is one hash groupBy over the (symmetrized)
  * edge frame with map-side combine — no windows; removal is two
  * broadcast-friendly anti joins against the (shrinking) selected
  * set. Labels only ever join edges by key — nothing is collected. */
object Mis {

  private def key(node: String, r: Int): String =
    s"((((($node % 1000003) * ($node % 1000003)) * ${r + 1}" +
      s" + 31 * $node + 7 * $r) % 1000003) * 10000000 + $node)"

  /** `edges`: (u, v) undirected, long-castable, node ids < 10^7.
    * Returns (node, in_mis). */
  def lubyMis(edges: DataFrame, rounds: Int = 24): DataFrame = {
    val e1 = edges.select(col("u").cast("long").as("u"),
      col("v").cast("long").as("v"))
    val sym = e1.union(e1.select(col("v").as("u"), col("u").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    val nodes = sym.select(col("u").as("node")).distinct()
      .localCheckpoint()
    var active = nodes
    var mis = nodes.limit(0)
    var r = 0
    var alive = true
    while (r < rounds && alive) {
      val nb = sym
        .join(active.select(col("node").as("u")), Seq("u"))
        .join(active.select(col("node").as("v")), Seq("v"))
        .groupBy(col("u").as("node"))
        .agg(min(expr(key("v", r))).as("nmin"))
      val sel = active.join(nb, Seq("node"), "left")
        .filter(col("nmin").isNull ||
          expr(key("node", r)) < col("nmin"))
        .select("node")
        .localCheckpoint()
      mis = mis.unionByName(sel).localCheckpoint()
      val dropped = sel.unionByName(
        sym.join(sel.select(col("node").as("u")), Seq("u"))
          .select(col("v").as("node")))
        .distinct()
      active = active.join(dropped, Seq("node"), "left_anti")
        .localCheckpoint()
      alive = !active.isEmpty
      r += 1
    }
    nodes
      .join(mis.withColumn("in_mis", lit(true)), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("in_mis"), lit(false)).as("in_mis"))
  }
}
