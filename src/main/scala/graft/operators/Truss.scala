package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast => bc, _}
import org.apache.spark.sql.graft.PlanCut.localCheckpointFlatStats

/** Bounded k-truss peeling profile (Cohen 2008, "Trusses: cohesive
  * subgraphs for social network analysis") — the EDGE twin of k-core
  * (q248): an edge survives while it closes at least k−2 triangles
  * with OTHER surviving edges; peeling removes under-supported edges
  * and recomputes, and each round's removal cascades one layer
  * deeper into loosely-attached structure.
  *
  * This is the PROFILE form — a fixed unroll of `rounds` peel steps
  * publishing (round, n_removed, n_remaining) — not the fixpoint:
  * on chain-like graphs (this one: per-nation sorted-neighborhood
  * lines) truss peeling provably cascades O(chain) rounds, so the
  * fixpoint is not a bounded-round object, while the R-step decay
  * profile is exactly the cohesion telemetry a curation pipeline
  * tracks (how fast does the graph shed weak edges?). Rounds after
  * convergence publish zero removals without recompute.
  *
  * Scale shape, per round: support counting is the q311 degree-
  * ordered triangle enumeration — orient edges low-degree → high-
  * degree, wedges = oriented ⨝ oriented (O(m^{3/2}) bound), close
  * with one semi join, explode each closed triangle to its 3
  * canonical edges, hash-aggregate counts. No windows, no collects
  * beyond the two per-round count scalars (the house bounded-driver-
  * fold convention). Each round cuts with the stats-resetting
  * checkpoint ([[org.apache.spark.sql.graft.PlanCut]]) — the wedge
  * self-join is exactly the stats-squaring shape that hung q306. */
object Truss {

  /** Per-edge triangle support of the canonical (u < v) edge set. */
  private def support(und: DataFrame): DataFrame = {
    val deg = und.select(col("u").as("n"))
      .unionAll(und.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val oriented = und
      .join(bc(deg.select(col("n").as("u"), col("d").as("du"))), "u")
      .join(bc(deg.select(col("n").as("v"), col("d").as("dv"))), "v")
      .select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t")))
          .otherwise(struct(col("v").as("s"), col("u").as("t")))
          .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
    val wedges = oriented.select(col("s"), col("t").as("a"))
      .join(oriented.select(col("s"), col("t").as("b")), "s")
      .filter(col("a") < col("b"))
    val closed = wedges.join(
      oriented.select(col("s").as("a"), col("t").as("b"))
        .unionByName(
          oriented.select(col("t").as("a"), col("s").as("b"))),
      Seq("a", "b"), "left_semi")
    closed.select(explode(array(
        struct(least(col("s"), col("a")).as("u"),
          greatest(col("s"), col("a")).as("v")),
        struct(least(col("s"), col("b")).as("u"),
          greatest(col("s"), col("b")).as("v")),
        struct(col("a").as("u"), col("b").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("c"))
  }

  /** edges: (u, v) undirected. Output: (round, n_removed,
    * n_remaining) for round = 1..rounds. */
  def peelProfile(edges: DataFrame, k: Int = 4,
                  rounds: Int = 8): DataFrame = {
    require(k >= 3 && rounds >= 1)
    val spark = edges.sparkSession
    import spark.implicits._
    def cut(df: DataFrame): DataFrame = localCheckpointFlatStats(df)
    var cur = edges.select(
        least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .transform(cut)
    var prev = cur.count()
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long)]
    var converged = false
    var r = 1
    while (r <= rounds) {
      if (converged) out += ((r.toLong, 0L, prev))
      else {
        val next = cur.join(
            support(cur).filter(col("c") >= (k - 2).toLong),
            Seq("u", "v"), "left_semi")
          .transform(cut)
        val n = next.count()
        out += ((r.toLong, prev - n, n))
        converged = n == prev
        prev = n
        cur = next
      }
      r += 1
    }
    out.toSeq.toDF("round", "n_removed", "n_remaining")
  }
}
