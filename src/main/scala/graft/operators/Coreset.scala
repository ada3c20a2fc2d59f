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
  * O(k²)·n distance evals; [[farthestPointSampleCarry]] is the
  * checkpointed O(k)·n running-minimum twin for large k — for
  * coreset-sized k the stateless form wins on having no lineage
  * management.
  *
  * Output: (rank, vec_id, mind2) — rank 0 is the seed (mind2 = 0);
  * mind2 is the chosen point's distance² to the nearest prior center
  * at selection time, the non-increasing coverage-radius sequence. */
object Coreset {

  private def d2Lit(q: Column, center: Seq[Long]): Column =
    aggregate(zip_with(q, array(center.map(lit): _*),
      (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  /** vecs: (id, q) with q an array<long> (quantize16).
    *
    * Fewer than k rows come back when the greedy argmax hits
    * mind2 = 0 — every remaining point coincides with a chosen
    * center, so further rounds would only re-select duplicates
    * (round-9 advice guard; same early stop as [[farthestPointSampleCarry]]). */
  def farthestPointSample(vecs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"farthestPointSample: k must be >= 1, got $k")
    val spark = vecs.sparkSession
    import spark.implicits._
    val seedRows = vecs.orderBy(col("id")).limit(1)
      .select(col("id"), col("q")).collect()
    require(seedRows.nonEmpty,
      "farthestPointSample: input has no vectors (empty frame)")
    val seed = seedRows.head
    var centers =
      Vector((0, seed.getLong(0), seed.getSeq[Long](1), 0L))
    var r = 1
    var exhausted = false
    while (r < k && !exhausted) {
      val dists = centers.map(c => d2Lit(col("q"), c._3))
      val mind = if (dists.size == 1) dists.head else least(dists: _*)
      val next = vecs.select(col("id"), col("q"), mind.as("md"))
        .orderBy(col("md").desc, col("id").asc)
        .limit(1).head()
      if (next.getLong(2) == 0L) exhausted = true
      else {
        centers = centers :+
          ((r, next.getLong(0), next.getSeq[Long](1), next.getLong(2)))
        r += 1
      }
    }
    centers.map { case (rk, id, _, md) => (rk, id, md) }
      .toDF("rank", "vec_id", "mind2")
  }

  /** Running-minimum form (round-9 advisory #8): identical output to
    * [[farthestPointSample]], but the min-distance-to-centers is
    * CARRIED between rounds — each round updates md with ONE distance
    * eval against only the newly-picked center (`least(md, d2_new)`)
    * and checkpoints, so total work is O(k)·n distance evals instead
    * of the stateless form's O(k²)·n. The right form once k stops
    * being coreset-tiny (hundreds of exemplars over a 100 TB corpus);
    * the stateless form stays the default because it needs no lineage
    * management. Equality of the two forms is spec-pinned. */
  def farthestPointSampleCarry(vecs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"farthestPointSampleCarry: k must be >= 1, got $k")
    val spark = vecs.sparkSession
    import spark.implicits._
    val seedRows = vecs.orderBy(col("id")).limit(1)
      .select(col("id"), col("q")).collect()
    require(seedRows.nonEmpty,
      "farthestPointSampleCarry: input has no vectors (empty frame)")
    val seed = seedRows.head
    var picked = Vector((0, seed.getLong(0), 0L))
    var cur = vecs.select(col("id"), col("q"),
        d2Lit(col("q"), seed.getSeq[Long](1)).as("md"))
      .localCheckpoint()
    var r = 1
    var exhausted = false
    while (r < k && !exhausted) {
      val next = cur.orderBy(col("md").desc, col("id").asc)
        .limit(1).head()
      if (next.getLong(2) == 0L) exhausted = true
      else {
        picked = picked :+ ((r, next.getLong(0), next.getLong(2)))
        cur = cur.select(col("id"), col("q"),
            least(col("md"), d2Lit(col("q"), next.getSeq[Long](1)))
              .as("md"))
          .localCheckpoint()
        r += 1
      }
    }
    picked.toDF("rank", "vec_id", "mind2")
  }

  private def dotLit(q: Column, other: Seq[Long]): Column =
    aggregate(zip_with(q, array(other.map(lit): _*),
      (x, y) => x * y), lit(0L), _ + _)

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein
    * 1998) — the relevance-AWARE diversity pick: k rounds of
    * argmax_d [λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)], where rel is
    * the dot product against a fixed query vector and sim the dot
    * against already-selected items. The third pole of the selection
    * triangle: [[farthestPointSample]] is pure spread, SemDeDup pure
    * redundancy removal, MMR trades query relevance off against
    * redundancy — the standard diverse-retrieval / diverse-context
    * reranker in a RAG or eval-harness pipeline.
    *
    * Portable arithmetic: quantize16 integer vectors, exact integer
    * dots, λ in milli units → score_milli = λ·rel − (1000−λ)·maxsim
    * (first pick has no diversity term: score = λ·rel). |dot| ≤
    * dim·2³² keeps λ·rel < 2⁶³ for any sane dim. Argmax ties break to
    * the smaller id; the oracle unrolls the k rounds as CTEs (the
    * q229 pattern).
    *
    * Scale shape: the selected set is k driver-held vectors inlined
    * as literals (the sanctioned k-bounded state); each round is ONE
    * map-only pass + TakeOrdered(1) — the [[farthestPointSample]]
    * shape with max-sim instead of min-dist.
    *
    * Output: (rank 1..k, vec_id, rel, score_milli). Fewer than k rows
    * when candidates run out. */
  def mmrSelect(vecs: DataFrame, queryVec: Seq[Long], k: Int,
                lambdaMilli: Long = 700L): DataFrame = {
    require(k >= 1, s"mmrSelect: k must be >= 1, got $k")
    require(lambdaMilli >= 0 && lambdaMilli <= 1000,
      s"mmrSelect: lambdaMilli must be in [0, 1000], got $lambdaMilli")
    val spark = vecs.sparkSession
    import spark.implicits._
    val scored = vecs.select(col("id"), col("q"),
        dotLit(col("q"), queryVec).as("rel"))
      .localCheckpoint()
    var selected = Vector.empty[(Int, Long, Seq[Long], Long, Long)]
    var r = 1
    var done = false
    while (r <= k && !done) {
      val score =
        if (selected.isEmpty) col("rel") * lambdaMilli
        else {
          val sims = selected.map(s => dotLit(col("q"), s._3))
          val maxSim =
            if (sims.size == 1) sims.head else greatest(sims: _*)
          col("rel") * lambdaMilli - maxSim * (1000L - lambdaMilli)
        }
      val taken = selected.map(_._2)
      val cand = (if (taken.isEmpty) scored
        else scored.filter(!col("id").isin(taken: _*)))
        .select(col("id"), col("q"), col("rel"),
          score.as("score_milli"))
        .orderBy(col("score_milli").desc, col("id").asc)
        .limit(1).collect()
      if (cand.isEmpty) done = true
      else {
        val row = cand.head
        selected = selected :+ ((r, row.getLong(0),
          row.getSeq[Long](1), row.getLong(2), row.getLong(3)))
        r += 1
      }
    }
    selected.map { case (rk, id, _, rel, sc) => (rk, id, rel, sc) }
      .toDF("rank", "vec_id", "rel", "score_milli")
  }
}
