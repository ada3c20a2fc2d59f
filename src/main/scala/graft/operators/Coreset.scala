package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Farthest-point (Gonzalez 1985) k-center coreset sampling — the
  * deterministic diversity sampler: start from a fixed seed, then k−1
  * times pick the point MAXIMIZING its distance to the nearest
  * already-chosen center. Greedy farthest-point is the classic
  * 2-approximation to k-center and the standard "cover the embedding
  * space" selection for dataset pruning / eval-set construction —
  * the opposite pole from SemDeDup's redundancy removal (q92): that
  * deletes near-twins, this SELECTS spread-out exemplars.
  *
  * Portable-arithmetic convention: quantize16 integer vectors, exact
  * integer squared L2, ties on the argmax broken to the smaller id —
  * every selection is replayable by the oracle with the k−1 rounds
  * unrolled as CTEs.
  *
  * Scale shape: the center set is k vectors held on the DRIVER (the
  * sanctioned k-bounded state, like BPE's per-round merge); each
  * round is ONE map-only pass computing min-distance-to-centers
  * (centers inlined as literals — no join, no shuffle) and one
  * TakeOrdered(1) argmax. k rounds total; nothing corpus-sized ever
  * moves. Recomputing min-distance from scratch each round costs
  * O(k²)·n distance evals instead of a checkpointed O(k)·n running
  * minimum — for coreset-sized k the constant is tiny and the
  * stateless form needs no lineage management.
  *
  * Output: (rank, vec_id, mind2) — rank 0 is the seed (mind2 = 0);
  * mind2 is the chosen point's distance² to the nearest prior center
  * at selection time, the non-increasing coverage-radius sequence. */
object Coreset {

  private def d2Lit(q: Column, center: Seq[Long]): Column =
    aggregate(zip_with(q, array(center.map(lit): _*),
      (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  /** vecs: (id, q) with q an array<long> (quantize16). */
  def farthestPointSample(vecs: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val spark = vecs.sparkSession
    import spark.implicits._
    val seed = vecs.orderBy(col("id")).limit(1)
      .select(col("id"), col("q")).head()
    var centers =
      Vector((0, seed.getLong(0), seed.getSeq[Long](1), 0L))
    (1 until k).foreach { r =>
      val dists = centers.map(c => d2Lit(col("q"), c._3))
      val mind = if (dists.size == 1) dists.head else least(dists: _*)
      val next = vecs.select(col("id"), col("q"), mind.as("md"))
        .orderBy(col("md").desc, col("id").asc)
        .limit(1).head()
      centers = centers :+
        ((r, next.getLong(0), next.getSeq[Long](1), next.getLong(2)))
    }
    centers.map { case (r, id, _, md) => (r, id, md) }
      .toDF("rank", "vec_id", "mind2")
  }
}
