package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV ("k minimum values" / bottom-k, the Theta-sketch core) distinct
  * -value synopses with SET OPERATIONS — Beyer, Haas, Reinwald, Sismanis
  * & Gemulla 2007 ("On synopses for distinct-value estimation under
  * multiset operations", SIGMOD): keep the k smallest distinct hash
  * values of each set; the kth smallest U_(k) estimates the distinct
  * count as (k−1)·M / U_(k) (M the hash-space size), and — the paper's
  * point, what HLL canNOT do — the SAME synopses compose under union
  * and intersection:
  *
  *   union:      bottom-k of (KMV_A ∪ KMV_B) is exactly KMV_{A∪B}
  *               (the k smallest of A∪B are k smallest of the merged
  *               sketches), so est_union follows the same formula;
  *   intersect:  ρ = |KMV_{A∪B} ∩ KMV_A ∩ KMV_B| / k is an unbiased
  *               Jaccard estimator, and est_int = ρ · est_union.
  *
  * Determinism contract (the q243/q132 PRF stance): the hash is the
  * house char-fold (acc·31 + codepoint mod P, the native codegen
  * expression) followed by one affine decorrelation round
  * h = (fold·131 + 17) mod P, P = 10⁹+7 — integer-exact, replayed
  * verbatim by DuckDB, so estimates are published as exact integers
  * ((k−1)·P div U_(k)) with zero float anywhere. Hash collisions fold
  * both sides identically (deterministic synopsis, not a sampled one).
  *
  * Scale shape: the synopsis build is (set, h) distinct → per-set
  * bottom-k via a rank window that Spark's WindowGroupLimit rewrites
  * into map-side partial limits (the K3/K4 house pattern) — each
  * partition forwards at most k rows per set, so the shuffle carries
  * O(sets · k · partitions⁻¹-bounded) rows no matter the corpus size;
  * set-op composition then touches only the k-bounded sketches (pair
  * rows ≤ |sets|²·2k). The EXACT columns are the audit half (the q283
  * HLL-accuracy convention: publish estimate AND truth so recall
  * drift is a red diff, not a shrug) — at 100 TB the audit join is
  * what you'd sample or drop, the sketch path is the product.
  *
  * Output, one row per unordered set pair (sa < sb):
  * (sa, sb, exact_a, est_a, exact_b, est_b,
  *  exact_union, est_union, exact_inter, est_inter, jaccard_est_ppm).
  */
object KmvSketch {

  private val P = 1000000007L

  /** The sketch hash: house char-fold then one affine round mod P. */
  private def prf(tok: Column): Column =
    pmod(org.apache.spark.sql.graft.CharFoldHash.column(tok) * 131L
      + 17L, lit(P))

  /** df must expose (setCol: string, elemCol: string). */
  def setOpEstimates(df: DataFrame, setCol: String, elemCol: String,
                     k: Int = 32): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    // distinct elements once — both the synopsis and the audit read it
    val elems = df.select(col(setCol).as("s"), col(elemCol).as("tok"))
      .distinct()
      .localCheckpoint()
    val exact = elems.groupBy("s").agg(count(lit(1)).as("n_exact"))
    // distinct hash values per set (KMV is over the hash SET)
    val hashes = elems.select(col("s"), prf(col("tok")).as("h"))
      .distinct()
      .localCheckpoint()
    val nHash = hashes.groupBy("s").agg(count(lit(1)).as("n_hash"))
    val sk = hashes
      .withColumn("r", row_number().over(
        Window.partitionBy("s").orderBy("h")))
      .filter(col("r") <= k)
      .localCheckpoint()
    // per-set estimate: (k−1)·P div U_(k); short sets are exact-by-hash
    val perSet = sk.filter(col("r") === k)
      .select(col("s"), col("h").as("hk"))
      .join(nHash, Seq("s"), "right")
      .select(col("s"),
        when(col("n_hash") < k, col("n_hash"))
          // (k−1)·P precomputed: a bare int·int product would
          // overflow int32 under ANSI inside the SQL parser
          .otherwise(expr(s"${(k - 1).toLong * P} div hk")).as("est"))
      .join(exact, Seq("s"))
    // unordered pairs of the (bounded) set catalog
    val sets = elems.select(col("s")).distinct()
    val pairs = sets.select(col("s").as("sa"))
      .crossJoin(sets.select(col("s").as("sb")))
      .filter(col("sa") < col("sb"))
    // merged sketch per pair: bottom-k of the two sketches' union
    val tagged = pairs
      .join(sk.select(col("s").as("sa"), col("h"), lit(1).as("ia"),
        lit(0).as("ib")), Seq("sa"))
      .unionByName(pairs
        .join(sk.select(col("s").as("sb"), col("h"), lit(0).as("ia"),
          lit(1).as("ib")), Seq("sb"))
        .select("sa", "sb", "h", "ia", "ib"))
      .groupBy("sa", "sb", "h")
      .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
    val mergedRk = tagged
      .withColumn("r", row_number().over(
        Window.partitionBy("sa", "sb").orderBy("h")))
      .filter(col("r") <= k)
      .localCheckpoint()
    val unionEst = mergedRk.groupBy("sa", "sb")
      .agg(count(lit(1)).as("n_merged"),
        max(when(col("r") === k, col("h"))).as("hk"),
        sum(col("ia") * col("ib")).as("matches"))
      .select(col("sa"), col("sb"),
        when(col("n_merged") < k, col("n_merged"))
          .otherwise(expr(s"${(k - 1).toLong * P} div hk")).as("est_union"),
        // short merged sketch = the union's full hash set: every
        // member is exact, so ρ uses the actual size, not k
        when(col("n_merged") < k,
            expr("(matches * 1000000) div n_merged"))
          .otherwise(expr(s"(matches * 1000000) div $k"))
          .as("jaccard_est_ppm"),
        col("matches"), col("n_merged"))
    // exact union / intersection audit per pair
    val exPair = pairs
      .join(elems.select(col("s").as("sa"), col("tok"),
        lit(1).as("ia"), lit(0).as("ib")), Seq("sa"))
      .unionByName(pairs
        .join(elems.select(col("s").as("sb"), col("tok"),
          lit(0).as("ia"), lit(1).as("ib")), Seq("sb"))
        .select("sa", "sb", "tok", "ia", "ib"))
      .groupBy("sa", "sb", "tok")
      .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
      .groupBy("sa", "sb")
      .agg(count(lit(1)).as("exact_union"),
        sum(col("ia") * col("ib")).as("exact_inter"))
    unionEst.join(exPair, Seq("sa", "sb"))
      .join(perSet.select(col("s").as("sa"), col("est").as("est_a"),
        col("n_exact").as("exact_a")), Seq("sa"))
      .join(perSet.select(col("s").as("sb"), col("est").as("est_b"),
        col("n_exact").as("exact_b")), Seq("sb"))
      .select(col("sa"), col("sb"),
        col("exact_a"), col("est_a"), col("exact_b"), col("est_b"),
        col("exact_union"), col("est_union"), col("exact_inter"),
        when(col("n_merged") < k,
            expr("(matches * est_union) div n_merged"))
          .otherwise(expr(s"(matches * est_union) div $k"))
          .as("est_inter"),
        col("jaccard_est_ppm"))
  }
}
