package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection (Broder '97 resemblance
  * sketches; the standard web-scale near-dup pipeline).
  *
  * shingle → 64-bit hash → k minhash values (one per permutation
  * `(a_j·h + b_j) mod p`) → group the k values into `bands` bands of
  * `rowsPerBand` each → a pair of documents agreeing on ALL values of
  * any band lands in the same bucket → candidate pair → verified with
  * exact Jaccard on the real shingle sets.
  *
  * Scale shape: everything is per-row until the band-bucket groupBy —
  * one shuffle keyed by (band_idx, band_hash); bucket sizes are tiny for
  * non-duplicate data, so the pair expansion `collect_list → pairwise`
  * never explodes (a cap guards pathological buckets). The verify step
  * re-joins only candidate ids against the shingle postings — Jaccard is
  * computed for candidates, not all pairs.
  *
  * All hashing is xxhash64 (Spark-native, codegen'd, deterministic) —
  * no DuckDB equivalent exists, so this operator is verified by
  * ScalaTest against exact-Jaccard ground truth rather than a SQL
  * oracle.
  */
object MinHashLSH {

  private val P = 2305843009213693951L // 2^61 - 1, Mersenne prime

  /** Deterministic permutation coefficients derived from the index.
    * 31-bit so `a*h + b` with 31-bit `h` stays far below 2^63 (Spark 4
    * runs ANSI mode: silent wraparound is an error, and we would not
    * want it anyway). */
  private def coef(j: Int, salt: Int): Long = {
    // splitmix64-style mix; plain Scala, runs at planning time
    var z = j.toLong * 0x9e3779b97f4a7c15L + salt.toLong * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) & 0x7fffffffL | 1L // odd, positive, < 2^31
  }

  /** (doc_id, signature: array<bigint> of length k) per document.
    * Documents with no shingles (fewer than shingleN words) are absent.
    * Long-form computation: one row per (doc, shingle) hash, k `min`
    * aggregates in one groupBy — whole-stage codegen + map-side partial
    * aggregation, instead of k interpreted array passes per document. */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
                 shingleN: Int, k: Int): DataFrame =
    signaturesFromPostings(
      Dedup.shingleRows(docs, idCol, textCol, shingleN), k)

  /** Candidate pairs (a < b) from banded LSH over the signatures. */
  def candidatePairs(sigs: DataFrame, bands: Int, rowsPerBand: Int,
                     maxBucket: Int = 1000): DataFrame = {
    val banded = sigs.select(
      col("doc_id"),
      posexplode(array((0 until bands).map { bIdx =>
        xxhash64(concat_ws(",",
          (0 until rowsPerBand).map(r =>
            col("sig").getItem(bIdx * rowsPerBand + r)): _*))
      }: _*)).as(Seq("band", "bucket")))
    val buckets = banded.groupBy("band", "bucket")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    // pairwise expansion inside each bucket
    buckets
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids) - i - 1),
          |            y -> struct(x AS a, y AS b))))""".stripMargin)).as("p"))
      .select(col("p.a"), col("p.b"))
      .distinct()
  }

  /** Full pipeline: near-duplicate pairs with exact Jaccard >= threshold.
    * Output: (a, b, jaccard).
    *
    * Exact Jaccard is computed ONLY for LSH candidate pairs (via
    * array_intersect on the two shingle sets), not for every pair
    * sharing a shingle — candidates are rare, so this join is tiny
    * regardless of corpus size. */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     shingleN: Int = 3, k: Int = 32, bands: Int = 8,
                     threshold: Double = 0.5): DataFrame = {
    require(k % bands == 0, "k must divide into bands evenly")
    // occurrence rows, NOT deduped: min-hash is multiset-invariant, so
    // the corpus-wide distinct shuffle is pure waste here
    val post = Dedup.shingleRows(docs, idCol, textCol, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigs = signaturesFromPostings(post, k)
    val cands = candidatePairs(sigs, bands, k / bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Materialize shingle sets ONLY for docs that appear in a candidate
    // pair (semi-join first): the verify stage costs O(candidates), not
    // O(corpus) — at web scale candidates are a vanishing fraction.
    // collect_set dedupes per doc (set semantics for exact Jaccard).
    val candIds = cands.select(col("a").as("doc_id"))
      .unionByName(cands.select(col("b").as("doc_id")))
      .distinct()
    val shSets = post.join(candIds, Seq("doc_id"), "left_semi")
      .groupBy("doc_id")
      .agg(collect_set(col("shingle")).as("sh"))
    cands
      .join(shSets.select(col("doc_id").as("a"), col("sh").as("sha")), Seq("a"))
      .join(shSets.select(col("doc_id").as("b"), col("sh").as("shb")), Seq("b"))
      .withColumn("common", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard",
        col("common") / (size(col("sha")) + size(col("shb")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** As `signatures`, over an existing (doc_id, shingle) posting list. */
  def signaturesFromPostings(post: DataFrame, k: Int): DataFrame = {
    val hashed = post.withColumn("h", abs(xxhash64(col("shingle"))) % 2147483647L)
    val minAggs = (0 until k).map { j =>
      val (a, b) = (coef(2 * j, 17), coef(2 * j + 1, 29))
      min(pmod(col("h") * a + b, lit(P))).as(s"m$j")
    }
    hashed.groupBy("doc_id")
      .agg(minAggs.head, minAggs.tail: _*)
      .select(col("doc_id"),
        array((0 until k).map(j => col(s"m$j")): _*).as("sig"))
  }
}
