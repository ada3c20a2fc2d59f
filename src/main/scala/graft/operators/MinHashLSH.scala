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

  /** (doc_id, band, bucket) rows straight from the signature kernel:
    * the band bucket is an arithmetic mix (LCG fold) of the band's
    * minhash values computed INSIDE the per-doc loop — no string
    * concat, no interpreted array ops, still one map-only stage.
    * (Plain JVM arithmetic wraps — the kernel is outside ANSI SQL's
    * overflow checking, deliberately.) */
  def bandedBuckets(docs: DataFrame, idCol: String, textCol: String,
                    shingleN: Int, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "k must divide into bands evenly")
    val rowsPerBand = k / bands
    val session = docs.sparkSession
    import session.implicits._
    signaturesKernel(docs, idCol, textCol, shingleN, k)
      .as[(Long, Seq[Long])]
      .flatMap { case (id, sig) =>
        (0 until bands).iterator.map { b =>
          var h = 1125899906842597L
          var r = 0
          while (r < rowsPerBand) {
            h = h * 6364136223846793005L + sig(b * rowsPerBand + r)
            r += 1
          }
          (id, b, h)
        }
      }.toDF("doc_id", "band", "bucket")
  }

  /** (doc_id, sh: distinct shingle set) via the same tokenizer as the
    * signature kernel — a tight JVM loop, used on the (pruned)
    * candidate docs where the interpreted `shingles()` expression or a
    * corpus-wide posting pipeline would dominate the runtime. */
  private def shingleSetsKernel(docs: DataFrame, idCol: String,
                                textCol: String, n: Int): DataFrame = {
    import org.apache.spark.unsafe.types.UTF8String
    val session = docs.sparkSession
    import session.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val words = UTF8String.fromString(text).toLowerCase.toString
            .split(" ", -1)
          val nSh = words.length - n + 1
          val set = new java.util.LinkedHashSet[String]()
          val sb = new java.lang.StringBuilder
          var i = 0
          while (i < nSh) {
            sb.setLength(0)
            var j = 0
            while (j < n) {
              if (j > 0) sb.append(' ')
              sb.append(words(i + j)); j += 1
            }
            set.add(sb.toString)
            i += 1
          }
          (id, set.toArray(Array.empty[String]).toSeq)
        }
      }.toDF(idCol, "sh")
  }

  /** Full pipeline: near-duplicate pairs with exact Jaccard >= threshold.
    * Output: (a, b, jaccard).
    *
    * This is the DENSE-duplicate shape: one shingle-occurrence pipeline,
    * persisted and reused by both the signature aggregation and the
    * exact-Jaccard verification. When a large fraction of the corpus
    * participates in candidate pairs (true of heavily-duplicated
    * crawls, and of this testdata — ~60% of docs are LSH candidates),
    * verification touches most docs anyway, so sharing the one cached
    * scan+shingle pass beats recomputing per stage — measured 2×
    * faster than the candidate-pruned kernel shape here. For corpora
    * where candidates are RARE (the usual web-scale case), use
    * [[nearDuplicatesSparse]]. */
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
    try {
      val candIds = cands.select(col("a").as("doc_id"))
        .unionByName(cands.select(col("b").as("doc_id")))
        .distinct()
      val shSets = post.join(candIds, Seq("doc_id"), "left_semi")
        .groupBy("doc_id")
        .agg(collect_set(col("shingle")).as("sh"))
      // eager localCheckpoint materializes the (small) pair set and cuts
      // lineage, so the corpus-sized caches can be dropped immediately
      // instead of living until session end (they would otherwise pile
      // up across repeated invocations and contend for executor memory)
      verifyPairs(cands, shSets, threshold).localCheckpoint()
    } finally {
      cands.unpersist(false)
      post.unpersist(false)
    }
  }

  /** The SPARSE-duplicate shape of [[nearDuplicates]] — same output
    * pairs, different physical plan, for the web-scale regime where
    * candidates are a vanishing fraction of the corpus:
    *  1. map-only signature+banding kernel → (doc_id, band, bucket),
    *     NO corpus shuffle at all before the band-bucket exchange;
    *  2. bucket-size cap (skew guard), codegen'd self-equi-join pair
    *     expansion;
    *  3. shingle sets rebuilt by a tight kernel over ONLY the docs in
    *     candidate pairs (semi-join pruned) — verification cost scales
    *     with candidates, not corpus size. */
  def nearDuplicatesSparse(docs: DataFrame, idCol: String, textCol: String,
                           shingleN: Int = 3, k: Int = 32, bands: Int = 8,
                           threshold: Double = 0.5,
                           maxBucket: Int = 1000): DataFrame = {
    val buckets = bandedBuckets(docs, idCol, textCol, shingleN, k, bands)
    val okBuckets = buckets.groupBy("band", "bucket")
      .agg(count(lit(1)).as("sz"))
      .filter(col("sz").between(2, maxBucket))
      .select("band", "bucket")
    val inOk = buckets.join(okBuckets, Seq("band", "bucket"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = inOk.select(col("band"), col("bucket"), col("doc_id").as("a"))
      .join(inOk.select(col("band"), col("bucket"), col("doc_id").as("b")),
        Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b")
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val candIds = cands.select(col("a").as("doc_id"))
        .unionByName(cands.select(col("b").as("doc_id")))
        .distinct()
      val candDocs = docs
        .select(col(idCol).cast("long").as("doc_id"),
          col(textCol).cast("string").as("_text"))
        .join(candIds, Seq("doc_id"), "left_semi")
      val shSets = shingleSetsKernel(candDocs, "doc_id", "_text", shingleN)
      // see nearDuplicates: materialize small result, release big caches
      verifyPairs(cands, shSets, threshold).localCheckpoint()
    } finally {
      cands.unpersist(false)
      inOk.unpersist(false)
    }
  }

  /** Exact-Jaccard verification of candidate pairs against per-doc
    * shingle sets (shSets: (doc_id, sh array)). */
  private def verifyPairs(cands: DataFrame, shSets: DataFrame,
                          threshold: Double): DataFrame =
    cands
      .join(shSets.select(col("doc_id").as("a"), col("sh").as("sha")), Seq("a"))
      .join(shSets.select(col("doc_id").as("b"), col("sh").as("shb")), Seq("b"))
      .withColumn("common", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard",
        col("common") / (size(col("sha")) + size(col("shb")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")

  /** Signature kernel: the per-document (shingle → k mins) loop as a
    * tight mapPartitions pass — MinHash signatures are per-row
    * computable, so this needs NO shuffle at all (the declarative
    * posting-list form pays an explode + window + groupBy). Bit-equal
    * to [[signaturesFromPostings]]: same Spark XXH64 (seed 42, the
    * xxhash64 builtin's), same fold-to-31-bit, same permutations —
    * pinned by an equivalence spec. At 100 TB this is the map-only
    * stage before the single band-bucket shuffle. */
  def signaturesKernel(docs: DataFrame, idCol: String, textCol: String,
                       shingleN: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    val session = docs.sparkSession
    import session.implicits._
    val coefs = Array.tabulate(k)(j => (coef(2 * j, 17), coef(2 * j + 1, 29)))
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val words = UTF8String.fromString(text).toLowerCase.toString
            .split(" ", -1)
          val nSh = words.length - shingleN + 1
          if (nSh <= 0) Iterator.empty
          else {
            val mins = Array.fill(k)(Long.MaxValue)
            val sb = new java.lang.StringBuilder
            var i = 0
            while (i < nSh) {
              sb.setLength(0)
              var j = 0
              while (j < shingleN) {
                if (j > 0) sb.append(' ')
                sb.append(words(i + j)); j += 1
              }
              val h = math.abs(
                XXH64.hashUTF8String(UTF8String.fromString(sb.toString), 42L)
              ) % 2147483647L
              var m = 0
              while (m < k) {
                val v = (h * coefs(m)._1 + coefs(m)._2) % P
                if (v < mins(m)) mins(m) = v
                m += 1
              }
              i += 1
            }
            Iterator.single((id, mins.toSeq))
          }
        }
      }.toDF("doc_id", "sig")
  }

  /** PORTABLE-hash MinHash over word-token sets — the fully
    * SQL-oracle-checkable twin of the xxhash64 pipelines: the token
    * hash is a polynomial char fold mod p (the q26 fingerprint
    * convention, `list_reduce`-replayable in DuckDB), the k=8
    * permutations are fixed literal affine maps, bands are 2×4
    * signature-prefix equi-joins, and verification is the exact
    * token-set Jaccard as an INTEGER predicate (2·|∩| ≥ |∪| ⇔
    * J ≥ 0.5). Same relational shape as [[nearDuplicatesSparse]]
    * (map-side hashing, min-aggregation with partials, band equi-join,
    * candidate-only verify) — only the mixer is weaker, traded for a
    * bit-for-bit DuckDB replay.
    *
    * @return (a, b, inter, uni) for verified near-duplicate pairs */
  private val PortA = Seq(131L, 137L, 139L, 149L, 151L, 157L, 163L, 167L)
  private val PortB = Seq(17L, 29L, 47L, 71L, 89L, 107L, 131L, 151L)
  // 1e9+7, NOT the 2^61-1 used by the xxhash pipelines: h*a must stay
  // < 2^63 under ANSI mode with the literal multipliers above
  private val PortP = 1000000007L

  /** DISTINCT (doc_id, tok) 3-word shingles (the q19 granularity —
    * unigram sets are too coherent on real corpora to discriminate
    * near-dups); the token array is bound in a projection first (the
    * repo-wide lambda-binding discipline) so the split runs once per
    * row. Round-16 (guide §2.4, the [[Dedup.shinglePostings]]
    * lesson): distinctness here is PER DOCUMENT (doc_id is part of
    * the key), so `array_distinct` inside the per-row shingle array
    * does the whole job map-side — the corpus-wide `.distinct()`
    * shuffle the old shape paid before every signature/verify pass
    * was pure waste. Zero exchanges. */
  private[graft] def portableToks(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        split(lower(col(textCol)), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(0), size(col("ws")) - 3),
          i => concat_ws(" ",
            element_at(col("ws"), i + 1),
            element_at(col("ws"), i + 2),
            element_at(col("ws"), i + 3))))).as("tok"))

  /** Portable k=8 MinHash signature (doc_id, m0..m7, n): char-fold
    * token hash (q26/q132 convention), fixed literal affine
    * permutations — bit-for-bit DuckDB-replayable. `n` is the doc's
    * distinct-shingle count, folded into the SAME aggregation
    * (round-16, guide §2.4): every consumer needs the set size for
    * the Jaccard verify, and computing it here removes a second
    * groupBy over the full posting list plus two size joins from each
    * near-dup operator. */
  private[graft] def portableSignature(toks: DataFrame): DataFrame = {
    // the native codegen'd fold — bit-pinned to the declarative
    // aggregate(split(...)) idiom and the DuckDB list_reduce replay
    // (NativeExprSpec); zero per-char array allocation on the path
    // that hashes every shingle of the corpus.
    // Input is [[portableToks]]'s map-side-distinct posting stream,
    // so the set size is a plain count in the SAME aggregation — one
    // exchange on doc_id covers signature and size together.
    val hashed = toks.withColumn("h", org.apache.spark.sql.graft.CharFoldHash.column(col("tok")))
    val minAggs = (0 until 8).map { j =>
      min(pmod(col("h") * PortA(j) + PortB(j), lit(PortP))).as(s"m$j")
    } :+ count(lit(1)).as("n")
    hashed.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
  }

  /** Round-16 shape (guide §1.2 — fix the distributed algorithm):
    * ONE tokenize+signature pass over the corpus (checkpointed: the
    * old plan re-ran the full tokenize+distinct+aggregate subtree
    * once per band-join SIDE — column pruning made each instance
    * canonically distinct, so no exchange reuse fired and the corpus
    * was scanned/hashed ~8×), band pairs carry both set sizes off the
    * signature rows, and the exact-Jaccard verify tokenizes ONLY the
    * candidate docs (the q374 semi-join-slice stance applied to the
    * self-join: at 100 TB the verify's distinct-shingle shuffle is
    * candidate-sized, not corpus-sized). Output unchanged. */
  def nearDuplicatesPortable(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    selfPairsFromSig(
      portableSignature(portableToks(docs, idCol, textCol))
        .localCheckpoint(),
      docs, idCol, textCol)

  /** The (doc_id, n, bno, k0..k3) banded view of a portable k=8
    * signature frame: each row explodes into its two 4-row bands, so
    * ONE equi-join on (bno, k0..k3) produces the pairs both separate
    * band joins produced (round-16: halves the join count of every
    * near-dup pass; a pair agreeing on both bands surfaces twice and
    * the existing distinct dedups it, exactly as the union did). */
  private def bandedView(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"), col("n"), explode(array(
        struct(lit(0L).as("bno"), col("m0").as("k0"),
          col("m1").as("k1"), col("m2").as("k2"), col("m3").as("k3")),
        struct(lit(1L).as("bno"), col("m4").as("k0"),
          col("m5").as("k1"), col("m6").as("k2"), col("m7").as("k3"))))
        .as("b"))
      .select(col("doc_id"), col("n"), col("b.bno").as("bno"),
        col("b.k0").as("k0"), col("b.k1").as("k1"),
        col("b.k2").as("k2"), col("b.k3").as("k3"))

  private val bandKey = Seq("bno", "k0", "k1", "k2", "k3")

  /** Within-set band pairs + candidate-sliced exact-Jaccard verify
    * over a precomputed (checkpointed) signature frame — the shared
    * body of [[nearDuplicatesPortable]] and [[deltaNearDropIds]]. */
  private def selfPairsFromSig(sig: DataFrame, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val banded = bandedView(sig)
    val cands = banded.toDF(("a" +: "na" +: bandKey): _*)
      .join(banded.toDF(("b" +: "nb" +: bandKey): _*), bandKey)
      .filter(col("a") < col("b"))
      .select("a", "b", "na", "nb")
      .distinct()
    // a semi join dedups the id stream itself — no distinct exchange
    val candIds = cands.select(col("a").as(idCol))
      .union(cands.select(col("b").as(idCol)))
    val candToks = portableToks(
        docs.join(candIds, Seq(idCol), "semi"), idCol, textCol)
      .localCheckpoint()
    cands
      .join(candToks.toDF("a", "tok"), Seq("a"))
      .join(candToks.toDF("b", "tok"), Seq("b", "tok")) // equi (b, tok)
      .groupBy("a", "b", "na", "nb").agg(count(lit(1)).as("inter"))
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .filter(col("inter") * 2 >= col("uni"))
      .select("a", "b", "inter", "uni")
  }

  /** Band/row trade-off audit over ONE portable-signature pass — the
    * "how many hashes do I need" telemetry that sizes a MinHash
    * deployment (the q356 τ-sweep pattern applied to LSH geometry).
    * For every banding (b bands × r rows, b·r = 8) of the SAME k=8
    * signature, publishes the measured candidate count, true-pair
    * hits, recall, and precision against the EXHAUSTIVE 3-gram
    * Jaccard ≥ 1/2 truth set. The S-curve theory (P[cand] =
    * 1−(1−J^r)^b) says more rows per band trade recall for
    * precision; this measures the actual trade on the actual corpus.
    *
    * Scale shape: one tokenize+distinct, one signature aggregation,
    * then 8+4+2+1 = 15 band equi-joins over the (docs × 8-longs)
    * signature table — each a bucketed join on a band key, candidates
    * only ever materialize per bucket (no all-pairs). The truth set
    * is the q19/q147 posting-join kernel (pairs sharing ≥ 1 shingle —
    * lossless for J ≥ 1/2 > 0). All configs aggregate in ONE action:
    * config-tagged union → distinct → left join truth → groupBy
    * config. Integer-exact ppm; -1 sentinels for empty denominators.
    *
    * Output: (bands, rows_per_band, n_candidates, n_true, n_hit,
    * recall_ppm, precision_ppm), one row per config. */
  def bandSweepAudit(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = portableToks(docs, idCol, textCol).localCheckpoint()
    val sig = portableSignature(toks).localCheckpoint()
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // exhaustive truth: every pair sharing >= 1 shingle, exact integer
    // Jaccard >= 1/2 (2·|∩| >= |∪|); disjoint pairs have J = 0
    val truth = toks.select(col("doc_id").as("a"), col("tok"))
      .join(toks.select(col("doc_id").as("b"), col("tok")), Seq("tok"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")),
        Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")),
        Seq("b"))
      .filter(col("inter") * 2 >= col("na") + col("nb") - col("inter"))
      .select("a", "b")
      .localCheckpoint()
    val configs = Seq((8, 1), (4, 2), (2, 4), (1, 8))
    val cands = configs.map { case (b, r) =>
      (0 until b).map { i =>
        val cols = (i * r until (i + 1) * r).map(j => s"m$j")
        val l = sig.select(("doc_id" +: cols).map(col): _*)
          .toDF("a" +: cols: _*)
        val rt = sig.select(("doc_id" +: cols).map(col): _*)
          .toDF("b" +: cols: _*)
        l.join(rt, cols).filter(col("a") < col("b"))
          .select(lit(b.toLong).as("bands"),
            lit(r.toLong).as("rows_per_band"), col("a"), col("b"))
      }.reduce(_ unionByName _)
    }.reduce(_ unionByName _).distinct()
    val counted = cands
      .join(truth.withColumn("t", lit(1L)), Seq("a", "b"), "left")
      .groupBy("bands", "rows_per_band")
      .agg(count(lit(1)).as("n_candidates"),
        coalesce(sum(col("t")), lit(0L)).as("n_hit"))
    // anchor on the config table: a banding with ZERO candidates must
    // still publish its (0, 0) row, not vanish from the sweep
    val spark = docs.sparkSession
    val cfg = spark.createDataFrame(
        configs.map { case (b, r) => (b.toLong, r.toLong) })
      .toDF("bands", "rows_per_band")
    cfg.join(counted, Seq("bands", "rows_per_band"), "left")
      .select(col("bands"), col("rows_per_band"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .join(truth.agg(count(lit(1)).as("n_true")))
      .select(col("bands"), col("rows_per_band"), col("n_candidates"),
        col("n_true"), col("n_hit"),
        when(col("n_true") > 0,
          expr("n_hit * 1000000L div n_true")).otherwise(-1L)
          .as("recall_ppm"),
        when(col("n_candidates") > 0,
          expr("n_hit * 1000000L div n_candidates")).otherwise(-1L)
          .as("precision_ppm"))
      .orderBy(col("bands").desc)
  }

  /** CROSS-SET [[nearDuplicatesPortable]] — the incremental form: the
    * frozen STORE side vs today's BATCH side. Same portable k=8
    * signatures, same two 4-row bands, same exact-Jaccard ≥ 1/2
    * verify — but candidates pair one batch doc with one store doc
    * (the store never self-joins), and the batch doc is always the
    * loser (the store arrived first, whatever the ids say — the
    * q346 cross-run convention). Output: (b_id, s_id, inter, uni)
    * verified pairs. */
  def crossNearDuplicatesPortable(store: DataFrame, batch: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // round-16: one signature pass per side (checkpointed — see
    // [[nearDuplicatesPortable]]), sizes ride the band join, and the
    // verify tokenizes only each side's CANDIDATE docs
    val sS = portableSignature(portableToks(store, idCol, textCol))
      .localCheckpoint()
    val sB = portableSignature(portableToks(batch, idCol, textCol))
      .localCheckpoint()
    val cands = bandedView(sB).toDF(("b_id" +: "nb" +: bandKey): _*)
      .join(bandedView(sS).toDF(("s_id" +: "ns" +: bandKey): _*),
        bandKey)
      .select("b_id", "s_id", "nb", "ns")
      .distinct()
    val tBc = portableToks(batch.join(
        cands.select(col("b_id").as(idCol)),
        Seq(idCol), "semi"), idCol, textCol)
    val tSc = portableToks(store.join(
        cands.select(col("s_id").as(idCol)),
        Seq(idCol), "semi"), idCol, textCol)
    cands
      .join(tBc.toDF("b_id", "tok"), Seq("b_id"))
      .join(tSc.toDF("s_id", "tok"), Seq("s_id", "tok"))
      .groupBy("b_id", "s_id", "nb", "ns").agg(count(lit(1)).as("inter"))
      .withColumn("uni", col("nb") + col("ns") - col("inter"))
      .filter(col("inter") * 2 >= col("uni"))
      .select("b_id", "s_id", "inter", "uni")
  }

  /** The persistable SIGNATURE-STORE artifact for the incremental
    * near-dup pass: one row per doc with the portable k=8 signature
    * AND the doc's distinct-shingle count — (doc_id, m0..m7, n_toks).
    * Persisting n_toks alongside the mins matters: the Jaccard verify
    * needs the store side's set size, and reading it from the
    * artifact keeps the store's TEXT untouched except for the
    * candidate docs the verify actually intersects. Docs under 3
    * words have no shingles and no row — exactly the docs
    * [[portableSignature]] skips, so the artifact is the recompute
    * path's signature frame bit-for-bit (spec-pinned). */
  def portableSignatureStore(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    // n_toks is the signature aggregation's own n (round-16) — the
    // artifact is ONE pass over the posting list, not two plus a join
    portableSignature(portableToks(docs, idCol, textCol))
      .withColumnRenamed("n", "n_toks")

  /** [[crossNearDuplicatesPortable]] reading the STORE side from a
    * persisted [[portableSignatureStore]] artifact instead of
    * recomputing it from text — the production nightly shape: the
    * store's signatures and set sizes come off parquet, and store
    * TEXT is touched only for the banded CANDIDATES the exact-Jaccard
    * verify must intersect (a semi-join-sized slice, not the corpus).
    * Output is bit-identical to the recompute path (spec-pinned):
    * same signatures by the artifact contract, hence same candidate
    * pairs, same verify arithmetic.
    *
    * The artifact and `storeDocs` must describe the SAME store
    * snapshot: a candidate whose doc has since been removed from
    * `storeDocs` fails LOUDLY at execution (below) instead of
    * silently vanishing from the verify joins, and a doc whose text
    * changed after the artifact froze is the caller's contract
    * violation the n_toks column cannot detect — re-extend the
    * artifact on every absorb (the [[portableSignatureStore]]
    * convention) and both stay impossible.
    *
    * @param sigStore  (doc_id, m0..m7, n_toks) — the frozen artifact
    * @param storeDocs (idCol, textCol, …) — store docs, read only for
    *                  verify-candidate shingles */
  def crossNearDuplicatesFromStore(sigStore: DataFrame,
      storeDocs: DataFrame, batch: DataFrame, idCol: String,
      textCol: String): DataFrame =
    // round-16: the batch signature pass runs ONCE (checkpointed —
    // see [[nearDuplicatesPortable]]); both sides' set sizes ride the
    // band join (batch n from the signature aggregation, store n_toks
    // from the artifact), and BOTH verify sides are candidate-sliced
    crossFromStoreWithSig(sigStore, storeDocs,
      portableSignature(portableToks(batch, idCol, textCol))
        .localCheckpoint(),
      batch, idCol, textCol)

  /** [[crossNearDuplicatesFromStore]] body over a precomputed
    * (checkpointed) batch signature frame — shared with
    * [[deltaNearDropIds]] so the incremental day signs its batch
    * exactly once. */
  private def crossFromStoreWithSig(sigStore: DataFrame,
      storeDocs: DataFrame, sB: DataFrame, batch: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val bandedB = bandedView(sB)
    val bandedS = bandedView(sigStore.withColumnRenamed("n_toks", "n"))
    val cands = bandedB.toDF(("b_id" +: "nb" +: bandKey): _*)
      .join(bandedS.toDF(("s_id" +: "ns" +: bandKey): _*), bandKey)
      .select("b_id", "s_id", "nb", "ns")
      .distinct()
    // artifact/store drift fails loudly: every banded candidate must
    // resolve to a store doc (assert_true raises mid-execution on a
    // null marker). The guard MUST stay on its own join side: fusing
    // it into the tokenize chain lets Catalyst reorder the shingle
    // size filter below the assert filter and silently drop the
    // null-text row the assert exists to catch (caught by the
    // Round15Spec drift test when round 16 tried the fused form).
    val candIds = cands.select(col("s_id").as(idCol)).distinct()
      .join(storeDocs.select(col(idCol), lit(true).as("_present")),
        Seq(idCol), "left")
      .filter(assert_true(col("_present"),
        lit("crossNearDuplicatesFromStore: the signature artifact " +
          "references a doc absent from storeDocs — artifact/store " +
          "drift; re-extend the artifact on every absorb")).isNull)
      .select(idCol)
    // store text is read ONLY for the candidate docs
    val candStoreDocs = storeDocs.join(candIds, Seq(idCol), "semi")
    val tSc = portableToks(candStoreDocs, idCol, textCol)
    val tBc = portableToks(batch.join(
        cands.select(col("b_id").as(idCol)),
        Seq(idCol), "semi"), idCol, textCol)
    cands
      .join(tBc.toDF("b_id", "tok"), Seq("b_id"))
      .join(tSc.toDF("s_id", "tok"), Seq("s_id", "tok"))
      .groupBy("b_id", "s_id", "nb", "ns").agg(count(lit(1)).as("inter"))
      .withColumn("uni", col("nb") + col("ns") - col("inter"))
      .filter(col("inter") * 2 >= col("uni"))
      .select("b_id", "s_id", "inter", "uni")
  }

  /** The incremental day's BOTH near-dup passes from ONE batch
    * signature pass (round-16, guide §1.2): batch-vs-store pairs read
    * from the persisted artifact ([[crossNearDuplicatesFromStore]]
    * semantics, drift guard included) and batch-internal pairs
    * ([[nearDuplicatesPortable]] semantics) share the checkpointed
    * batch signature frame; returns the DISTINCT dropped batch ids
    * (the batch doc of every verified cross pair — the store always
    * wins — plus the larger id of every verified internal pair).
    * Bit-equal to unioning the two standalone operators, which is
    * exactly what [[graft.SparkEntry.pipelineDeltaDay]] previously
    * paid two tokenize+signature passes for. */
  def deltaNearDropIds(sigStore: DataFrame, storeDocs: DataFrame,
      batch: DataFrame, idCol: String, textCol: String): DataFrame =
    deltaNearDropIdsFromSig(sigStore, storeDocs,
      portableSignature(portableToks(batch, idCol, textCol))
        .localCheckpoint()
        .withColumnRenamed("n", "n_toks"),
      batch, idCol, textCol)

  /** [[deltaNearDropIds]] over a precomputed batch signature-store
    * frame ((doc_id, m0..m7, n_toks) — [[portableSignatureStore]],
    * checkpointed by the caller). The incremental day computes its
    * batch signatures ONCE, runs both near-dup passes from them, and
    * then slices the same frame per kept doc as the artifact rows it
    * absorbs — zero re-tokenization anywhere in the night. The two
    * verifies are FUSED here: one batch-side candidate tok slice
    * feeds all three verify join sides, and the store slice comes off
    * a single guarded left join (drift still fails loudly — the
    * [[crossNearDuplicatesFromStore]] contract). Drop set bit-equal
    * to unioning the two standalone operators. */
  def deltaNearDropIdsFromSig(sigStore: DataFrame, storeDocs: DataFrame,
      batchSigs: DataFrame, batch: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val bandedB = bandedView(batchSigs.withColumnRenamed("n_toks", "n"))
    val bandedS = bandedView(sigStore.withColumnRenamed("n_toks", "n"))
    val crossCands = bandedB.toDF(("b_id" +: "nb" +: bandKey): _*)
      .join(bandedS.toDF(("s_id" +: "ns" +: bandKey): _*), bandKey)
      .select("b_id", "s_id", "nb", "ns")
      .distinct()
    val selfCands = bandedB.toDF(("a" +: "na" +: bandKey): _*)
      .join(bandedB.toDF(("b" +: "nb" +: bandKey): _*), bandKey)
      .filter(col("a") < col("b"))
      .select("a", "b", "na", "nb")
      .distinct()
    // one batch-side tok slice for all three verify sides (a semi
    // join dedups the id stream itself — no distinct exchange)
    val bIds = selfCands.select(col("a").as(idCol))
      .union(selfCands.select(col("b").as(idCol)))
      .union(crossCands.select(col("b_id").as(idCol)))
    val tBc = portableToks(batch.join(bIds, Seq(idCol), "semi"),
      idCol, textCol).localCheckpoint()
    // guarded store slice — the guard keeps its own join side (see
    // crossFromStoreWithSig: a fused form lets filter reordering
    // silently drop the row the assert exists to catch)
    val candSIds = crossCands.select(col("s_id").as(idCol)).distinct()
      .join(storeDocs.select(col(idCol), lit(true).as("_present")),
        Seq(idCol), "left")
      .filter(assert_true(col("_present"),
        lit("deltaNearDropIds: the signature artifact references a " +
          "doc absent from storeDocs — artifact/store drift; " +
          "re-extend the artifact on every absorb")).isNull)
      .select(idCol)
    val tSc = portableToks(storeDocs.join(candSIds, Seq(idCol), "semi"),
      idCol, textCol)
    val crossDrop = crossCands
      .join(tBc.toDF("b_id", "tok"), Seq("b_id"))
      .join(tSc.toDF("s_id", "tok"), Seq("s_id", "tok"))
      .groupBy("b_id", "s_id", "nb", "ns").agg(count(lit(1)).as("inter"))
      .filter(col("inter") * 2 >= col("nb") + col("ns") - col("inter"))
      .select(col("b_id").as("doc_id"))
    val selfDrop = selfCands
      .join(tBc.toDF("a", "tok"), Seq("a"))
      .join(tBc.toDF("b", "tok"), Seq("b", "tok"))
      .groupBy("a", "b", "na", "nb").agg(count(lit(1)).as("inter"))
      .filter(col("inter") * 2 >= col("na") + col("nb") - col("inter"))
      .select(col("b").as("doc_id"))
    crossDrop.union(selfDrop).distinct()
  }

  /** [[nearDuplicatesPortable]] over a precomputed signature-store
    * frame — the batch-build twin of [[crossNearDuplicatesFromStore]]:
    * band pairs and set sizes come off the artifact, text is
    * tokenized only for verify candidates. Bit-equal to the recompute
    * path by the artifact contract (same per-doc signature function).
    * Lets [[graft.SparkEntry.buildPipelineStoreFrom]] sign its corpus
    * once and reuse the frame as the frozen artifact. */
  def nearDuplicatesFromSigStore(sigStore: DataFrame, docs: DataFrame,
      idCol: String, textCol: String): DataFrame =
    selfPairsFromSig(sigStore.withColumnRenamed("n_toks", "n"),
      docs, idCol, textCol)

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
