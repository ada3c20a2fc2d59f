package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions._

/** Triangle counting by degree-ordered orientation (the
  * Suri–Vassilvitskii / Schank "forward" algorithm): orient every
  * undirected edge from its lower-rank endpoint to its higher-rank
  * endpoint, where rank = (degree, node) — then each triangle is
  * counted EXACTLY once as a directed wedge a→b, a→c closed by b→c.
  *
  * Scale shape: the orientation is the whole trick — after it, every
  * node's out-degree is O(√m), so the wedge self-join fans out to
  * O(m^{3/2}) instead of Σdeg² (which a hub node makes quadratic).
  * Two hash joins on node keys, one tiny degree aggregate broadcast
  * onto the edges; no cross join anywhere. This is the
  * skew-resistant form that survives power-law graphs at 100 TB.
  */
object Triangles {

  /** @param edges undirected edge list (u, v) — duplicates and
    *              self-loops tolerated (normalized away)
    * @return one row: (n_triangles) */
  def count(edges: DataFrame): DataFrame = {
    val und = edges.select(
        least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = und.select(col("u").as("n")).unionAll(und.select(col("v").as("n")))
      .groupBy("n").agg(F.count(lit(1)).as("d"))
    // orient x→y iff (deg(x), x) < (deg(y), y): a total order, so each
    // undirected edge gets exactly one direction
    val oriented = und
      .join(broadcast(deg.select(col("n").as("u"), col("d").as("du"))), "u")
      .join(broadcast(deg.select(col("n").as("v"), col("d").as("dv"))), "v")
      .select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
    // wedges s→a, s→b (a < b in the oriented order is implied by
    // requiring a != b and counting each unordered wedge once)
    val wedges = oriented.select(col("s"), col("t").as("a"))
      .join(oriented.select(col("s"), col("t").as("b")), "s")
      .filter(col("a") < col("b"))
    val closed = wedges.join(
      oriented.select(col("s").as("a"), col("t").as("b"))
        .unionByName(oriented.select(col("t").as("a"), col("s").as("b"))),
      Seq("a", "b"), "left_semi")
    closed.agg(F.count(lit(1)).as("n_triangles"))
  }
}
