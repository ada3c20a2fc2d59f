package graft

import graft.operators.PageRank

/** Integer PageRank: hand-checkable fixtures + invariants. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.run(edges.toDF("src", "dst", "w"), iters)
      .as[(Long, Long)].collect().toMap

  test("source-only node decays to the teleport floor; sink accumulates") {
    // A -> B: r0 = 5e8 each; A keeps only teleport mass
    val r = ranks(Seq((1L, 2L, 1L)), iters = 5)
    val r0 = 1000000000L / 2
    val floor = (15L * r0) / 100 // 75,000,000
    assert(r(1L) == floor)
    assert(r(2L) > r(1L))
    // B is DANGLING (no out-edges): its mass leaks each round — the
    // documented simplification — so B settles at its exact fixed
    // point teleport + 0.85 * rank(A), not at conservation
    assert(r(2L) == (15L * r0 + 85L * floor) / 100)
  }

  test("symmetric cycle stays uniform") {
    // A -> B -> C -> A with equal weights: uniform is a fixed point
    val r = ranks(Seq((1L, 2L, 7L), (2L, 3L, 7L), (3L, 1L, 7L)), iters = 4)
    val r0 = 1000000000L / 3
    assert(r.values.toSet.size == 1)
    assert(math.abs(r(1L) - r0) <= 5) // integer-truncation dust only
  }

  test("heavier in-weight wins under equal out-mass") {
    // both X and Y split mass toward A and B, but A gets 3x the weight
    val r = ranks(
      Seq((10L, 1L, 3L), (10L, 2L, 1L), (11L, 1L, 3L), (11L, 2L, 1L)),
      iters = 3)
    assert(r(1L) > r(2L))
  }
}
