package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a join of queries × corpus with
  * a codegen'd dot product (`zip_with` + `aggregate`, no UDF) and a
  * per-query top-k window. Correct at any scale but O(|Q|·|C|): the
  * right tool when |Q| is small (broadcast the queries!) or as the
  * ground-truth oracle for the approximate path.
  *
  * Scale path: random-hyperplane LSH (Charikar '02) — bucket vectors by
  * the sign pattern of `nPlanes` deterministic hyperplanes; only
  * same-bucket (or probed-neighbor-bucket) pairs are scored. Turns the
  * cross product into an equi-join keyed by bucket signature.
  *
  * Products are computed in DOUBLE (cast before multiply) and summed
  * left-to-right so results are deterministic.
  */
object Similarity {

  /** Default ceiling for the broadcast-side collects below. The
    * kernels' contract is "the collected side is a dimension table"
    * (an eval/query set); the cap turns a corpus-sized misuse into an
    * immediate, actionable error instead of a driver OOM. */
  val MaxBroadcastRows: Int = 200000

  /** Thrown by [[collectBounded]] when a broadcast-contract side
    * overflows its cap. A DEDICATED type (round-9 advice): the router
    * below used to match `IllegalArgumentException` by message
    * substring ("exceeds"), which would also swallow unrelated
    * `require` failures from eager upstream construction (e.g.
    * LabelProp.modularity's bound check) and silently downgrade the
    * exact path to LSH. Catching this type catches ONLY the cap. */
  // extends IllegalArgumentException: the cap is an argument-contract
  // violation and callers (Round6Spec's loud-failure pins) match on
  // that supertype; routeTopK still catches the EXACT type, so an
  // unrelated require's IAE can't be mistaken for the cap signal
  private[graft] final class BroadcastCapExceeded(msg: String)
    extends IllegalArgumentException(msg)

  /** Driver-side collect with an explicit bound: fetch at most
    * `maxRows + 1` rows (the limit is pushed into the scan, so the
    * full side is never materialized) and fail loudly past the cap. */
  private def collectBounded[T](ds: org.apache.spark.sql.Dataset[T],
                                maxRows: Int, what: String): Array[T] = {
    val got = ds.limit(maxRows + 1).collect()
    if (got.length > maxRows)
      throw new BroadcastCapExceeded(
        s"$what exceeds $maxRows rows; this kernel collects and broadcasts " +
          s"the whole $what side by contract (dimension-table-sized query/" +
          "eval sets). Use the LSH/IVF paths for corpus-scale inputs, or " +
          "raise maxRows explicitly if the side genuinely fits the driver.")
    got
  }

  /** Probe-then-route shared by [[mutualTopOne]] / [[knnOutliers]]
    * (round-8 fix for the advisory's eager-count note): the exact
    * broadcast kernel's OWN bounded collect is the cap probe — under
    * the cap that collect is the one the kernel needs anyway, so
    * construction runs the upstream pipeline exactly once instead of
    * paying a separate `limit(cap+1).count()` job first; past the cap
    * the collect fails at `maxRows + 1` fetched rows (limit pushed
    * into the scan) and the operator falls back to the LSH join
    * kernel. Construction is still eager by nature — the broadcast
    * kernel materializes its collected side when the DataFrame is
    * BUILT, not when it is first executed — which is the documented
    * cost of the exact path. */
  private def routeTopK(spark: org.apache.spark.sql.SparkSession,
                        q: DataFrame, c: DataFrame, k: Int, maxRows: Int,
                        dims: Int, nPlanes: Int, nProbes: Int): DataFrame =
    try bruteForceTopKFast(spark, q, c, k, maxRows)
    catch {
      case _: BroadcastCapExceeded =>
        lshTopK(q, c, dims, nPlanes, k, nProbes)
    }

  /** Left-fold dot product via interpreted higher-order functions —
    * works for any vector length, but stays outside codegen. Use the
    * unrolled `dotN` on hot paths when the dimension is known. */
  def dotHof(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Unrolled dot product over a known dimension: a flat sum of
    * `GetArrayItem` products, fully inside whole-stage codegen, with
    * the same left-to-right association as the fold (bit-identical
    * result). */
  def dotN(x: Column, y: Column, dims: Int): Column =
    (0 until dims).map { i =>
      x.getItem(i).cast("double") * y.getItem(i).cast("double")
    }.reduce(_ + _)

  /** Cosine similarity of two float-array columns, in double — the
    * native fused-loop Catalyst expression (same left-to-right double
    * accumulation as the HOF/unrolled forms, bit-identical results). */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftFunctions.cosineSim(a, b)

  /** Interpreted-HOF cosine — kept as the reference implementation the
    * native expression is tested against. */
  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / sqrt(dotHof(a, a)) / sqrt(dotHof(b, b))

  /** Brute-force top-k cosine neighbors.
    * queries: (qid, qvec); corpus: (cid, cvec). Output:
    * (query_id, rank, neighbor_id, sim) — rank 1..k, self-match excluded
    * by id inequality, ties broken by neighbor id.
    *
    * When `dims` is given, norms are precomputed once per vector and
    * the per-pair dot product is the unrolled codegen form — the
    * O(|Q|·|C|) inner loop does exactly one dot product per pair. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     dims: Int = -1): DataFrame = {
    val scored =
      if (dims > 0) {
        val q = queries.withColumn("qn", sqrt(dotN(col("qvec"), col("qvec"), dims)))
        val c = corpus.withColumn("cn", sqrt(dotN(col("cvec"), col("cvec"), dims)))
        q.crossJoin(c)
          .filter(col("qid") =!= col("cid"))
          .select(col("qid").as("query_id"), col("cid").as("neighbor_id"),
            (dotN(col("qvec"), col("cvec"), dims) / col("qn") / col("cn"))
              .as("sim"))
      } else {
        queries.crossJoin(corpus)
          .filter(col("qid") =!= col("cid"))
          .select(col("qid").as("query_id"), col("cid").as("neighbor_id"),
            cosine(col("qvec"), col("cvec")).as("sim"))
      }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Brute-force top-k with a primitive-array kernel: the query side
    * (a dimension table by definition) is collected and broadcast; each
    * corpus partition computes dot products in a tight JVM loop and
    * keeps a per-query top-k, so only |partitions|·|Q|·k candidate rows
    * leave the map side — the same partial-top-k shape MLlib uses.
    * Arithmetic is the identical left-to-right double accumulation as
    * the declarative variants (bit-equal sims).
    *
    * Output: (query_id, rank, neighbor_id, sim). */
  def bruteForceTopKFast(spark: org.apache.spark.sql.SparkSession,
                         queries: DataFrame, corpus: DataFrame,
                         k: Int, maxQueries: Int = MaxBroadcastRows): DataFrame = {
    import spark.implicits._
    def norm(v: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    val qRows = collectBounded(queries.select(col("qid"), col("qvec"))
      .as[(Long, Array[Float])], maxQueries, "query set")
    val qVecs = spark.sparkContext.broadcast(
      qRows.map { case (id, v) => (id, v, norm(v)) })

    val partials = corpus.select(col("cid"), col("cvec"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val qs = qVecs.value
        // per-query bounded candidate heaps (ordered worst-first so the
        // head is the eviction candidate)
        val ord = Ordering.by[(Long, Double), (Double, Long)] {
          case (cid, sim) => (-sim, cid)
        }
        val heaps = qs.map(_ => new scala.collection.mutable.PriorityQueue[(Long, Double)]()(ord))
        it.foreach { case (cid, cv) =>
          val cn = norm(cv)
          var qi = 0
          while (qi < qs.length) {
            val (qid, qv, qn) = qs(qi)
            if (qid != cid) {
              var dot = 0.0; var i = 0
              while (i < cv.length) { dot += qv(i).toDouble * cv(i).toDouble; i += 1 }
              val sim = dot / qn / cn
              val h = heaps(qi)
              if (h.size < k) h.enqueue((cid, sim))
              else {
                val (wid, wsim) = h.head
                if (sim > wsim || (sim == wsim && cid < wid)) {
                  h.dequeue(); h.enqueue((cid, sim))
                }
              }
            }
            qi += 1
          }
        }
        qs.iterator.zipWithIndex.flatMap { case ((qid, _, _), qi) =>
          heaps(qi).iterator.map { case (cid, sim) => (qid, cid, sim) }
        }
      }
      .toDF("query_id", "neighbor_id", "sim")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    partials.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Mutual nearest-neighbor pairs within a vector set: (a, b) where
    * b is a's cosine top-1 AND a is b's — the reciprocal-NN criterion
    * that semantic-dedup and bitext-mining pipelines prefer over
    * one-directional top-1 (a hub vector is many points' nearest
    * neighbor without being near any of them; mutuality kills hubs).
    *
    * Rides the [[bruteForceTopKFast]] kernel (k = 1, set vs itself,
    * self-pairs excluded in the scan loop), then one self-equi-join
    * of the tiny top-1 table on the reversed pair; a < b dedups the
    * two directions.
    *
    * Scale route (round 7): past the broadcast cap the operator no
    * longer errors — it switches to the join-based [[lshTopK]] kernel
    * (bucketed candidates, corpus never broadcast, multi-probe for
    * recall) for the top-1 pass and keeps the identical mutual join.
    * The cap probe is the brute kernel's own bounded collect
    * ([[routeTopK]], round 8) — one upstream execution in the common
    * under-cap case, never a separate count job. Below the cap the
    * brute kernel stays exact; above it mutuality is computed over
    * LSH top-1s (approximate, recall-pinned in ScaleSpec against the
    * brute kernel on separated fixtures).
    *
    * Output: (a, b, sim), a < b. */
  def mutualTopOne(spark: org.apache.spark.sql.SparkSession,
                   vecs: DataFrame, idCol: String, vecCol: String,
                   maxRows: Int = MaxBroadcastRows, dims: Int = 64,
                   nPlanes: Int = 8, nProbes: Int = 4): DataFrame = {
    val q = vecs.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val c = vecs.select(col(idCol).as("cid"), col(vecCol).as("cvec"))
    val top1 = routeTopK(spark, q, c, k = 1, maxRows, dims, nPlanes,
        nProbes)
      .select(col("query_id").as("a"), col("neighbor_id").as("b"),
        col("sim"))
    top1.as("x").join(top1.as("y"),
        col("x.a") === col("y.b") && col("x.b") === col("y.a") &&
          col("x.a") < col("x.b"))
      .select(col("x.a").as("a"), col("x.b").as("b"),
        col("x.sim").as("sim"))
  }

  /** Embedding-space outliers by k-th-nearest-neighbor distance: a
    * vector whose k-th NN is still far away sits in empty space —
    * encoder garbage, corrupted inputs, or genuinely novel content;
    * either way the curation pipeline wants them surfaced before
    * they skew clustering/sampling. The standard kNN-distance
    * outlier score, over the same broadcast kernel as
    * [[bruteForceTopKFast]] (set vs itself, rank-k row kept).
    *
    * `maxSim` is the flag threshold on the k-th neighbor's COSINE
    * (not distance): sim_k < maxSim ⇒ outlier. Float sims follow the
    * q182 bit-replay convention, so the flag is engine-exact.
    *
    * Scale route (round 7): past the broadcast cap the operator
    * switches to the join-based [[lshTopK]] kernel instead of
    * erroring (same probe-then-route shape as [[mutualTopOne]]).
    * Above the cap a vector whose bucket (incl. probes) holds fewer
    * than k same-bucket neighbors yields no rank-k row and is
    * conservatively ABSENT rather than mis-flagged — at that point it
    * is by construction in a sparse bucket, i.e. the outlier regime;
    * raise nProbes to tighten. ScaleSpec pins route equivalence on
    * separated fixtures.
    *
    * Output: (query_id, sim_k, outlier). */
  def knnOutliers(spark: org.apache.spark.sql.SparkSession,
                  vecs: DataFrame, idCol: String, vecCol: String,
                  k: Int, maxSim: Double,
                  maxRows: Int = MaxBroadcastRows, dims: Int = 64,
                  nPlanes: Int = 8, nProbes: Int = 4): DataFrame = {
    val q = vecs.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val c = vecs.select(col(idCol).as("cid"), col(vecCol).as("cvec"))
    val topK = routeTopK(spark, q, c, k, maxRows, dims, nPlanes, nProbes)
    topK.filter(col("rank") === k)
      .select(col("query_id"), col("sim").as("sim_k"),
        (col("sim") < maxSim).as("outlier"))
  }

  /** Hard-negative mining: for each query vector, the top-k most
    * cosine-similar corpus vectors carrying a DIFFERENT label — the
    * contrastive-training data builder (negatives that are near the
    * query in embedding space but semantically wrong are the ones
    * that move a retriever's gradients; random negatives are too easy
    * to teach anything).
    *
    * Same broadcast + per-partition bounded-heap kernel as
    * [[bruteForceTopKFast]] — queries are a dimension table, the
    * corpus never moves, only |partitions|·|Q|·k candidates leave the
    * map side — with the label inequality fused into the scan loop so
    * excluded candidates never enter a heap. Tie-break (sim, then
    * smaller cid) matches the declarative variants bit-for-bit.
    *
    * Output: (query_id, rank, neighbor_id, neg_label, sim). */
  def hardNegatives(spark: org.apache.spark.sql.SparkSession,
                    queries: DataFrame, corpus: DataFrame,
                    k: Int, maxQueries: Int = MaxBroadcastRows): DataFrame = {
    import spark.implicits._
    def norm(v: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    val qRows = collectBounded(
      queries.select(col("qid"), col("qvec"), col("qlabel"))
        .as[(Long, Array[Float], Int)], maxQueries, "query set")
    val qVecs = spark.sparkContext.broadcast(
      qRows.map { case (id, v, l) => (id, v, norm(v), l) })
    val partials = corpus.select(col("cid"), col("cvec"), col("clabel"))
      .as[(Long, Array[Float], Int)]
      .mapPartitions { it =>
        val qs = qVecs.value
        val ord = Ordering.by[(Long, Int, Double), (Double, Long)] {
          case (cid, _, sim) => (-sim, cid)
        }
        val heaps = qs.map(_ =>
          new scala.collection.mutable.PriorityQueue[(Long, Int, Double)]()(ord))
        it.foreach { case (cid, cv, cl) =>
          val cn = norm(cv)
          var qi = 0
          while (qi < qs.length) {
            val (qid, qv, qn, ql) = qs(qi)
            if (qid != cid && ql != cl) {
              var dot = 0.0; var i = 0
              while (i < cv.length) { dot += qv(i).toDouble * cv(i).toDouble; i += 1 }
              val sim = dot / qn / cn
              val h = heaps(qi)
              if (h.size < k) h.enqueue((cid, cl, sim))
              else {
                val (wid, _, wsim) = h.head
                if (sim > wsim || (sim == wsim && cid < wid)) {
                  h.dequeue(); h.enqueue((cid, cl, sim))
                }
              }
            }
            qi += 1
          }
        }
        qs.iterator.zipWithIndex.flatMap { case ((qid, _, _, _), qi) =>
          heaps(qi).iterator.map { case (cid, cl, sim) => (qid, cid, cl, sim) }
        }
      }
      .toDF("query_id", "neighbor_id", "neg_label", "sim")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    partials.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "neg_label", "sim")
  }

  /** Semantic benchmark decontamination: flag every corpus vector
    * whose max cosine against the (small) evaluation-set vectors
    * reaches `threshold` — the embedding-space cousin of
    * [[Dedup.decontaminate]]'s n-gram screen, catching paraphrased
    * benchmark leakage that exact shingles miss.
    *
    * MAP-ONLY at corpus scale: the eval set is a dimension table by
    * definition, so it broadcasts whole and each corpus partition
    * computes its max similarity in a tight JVM loop — the corpus
    * never shuffles at all. The loop deliberately has NO
    * early-exit-at-threshold: max_sim must be the TRUE maximum for
    * every row (it is the score an auditor sorts by, and the
    * SQL oracle computes it), and the eval scan is |bench| dot
    * products per row either way. Output: (vec_id, max_sim,
    * contaminated). */
  def decontaminateByEmbedding(spark: org.apache.spark.sql.SparkSession,
                               corpus: DataFrame, bench: DataFrame,
                               threshold: Double,
                               maxBench: Int = MaxBroadcastRows): DataFrame = {
    import spark.implicits._
    def norm(v: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    val bRows = collectBounded(bench.select(col("qid"), col("qvec"))
      .as[(Long, Array[Float])], maxBench, "bench set")
    // Zero-norm bench vectors carry no direction — cosine against them
    // is 0/0 — so they are dropped from the broadcast rather than
    // allowed to poison every row's max_sim with NaN.
    val bVecs = spark.sparkContext.broadcast(
      bRows.map { case (_, v) => (v, norm(v)) }.filter(_._2 > 0.0))
    corpus.select(col("cid"), col("cvec"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val bs = bVecs.value
        it.map { case (cid, cv) =>
          val cn = norm(cv)
          // Empty/zero-norm-only bench, or a zero-norm corpus vector:
          // max cosine is undefined → null max_sim, not contaminated
          // (rather than -Inf or NaN leaking into the audit column).
          if (bs.isEmpty || cn == 0.0) (cid, Option.empty[Double], false)
          else {
            var best = Double.NegativeInfinity
            var bi = 0
            while (bi < bs.length) {
              val (qv, qn) = bs(bi)
              var dot = 0.0; var i = 0
              while (i < cv.length) { dot += qv(i).toDouble * cv(i).toDouble; i += 1 }
              val sim = dot / qn / cn
              if (sim > best) best = sim
              bi += 1
            }
            (cid, Some(best), best >= threshold)
          }
        }
      }
      .toDF("vec_id", "max_sim", "contaminated")
  }

  /** All pairs (a < b) with cosine >= threshold — embedding-space
    * near-duplicate detection. Same broadcast + mapPartitions kernel as
    * bruteForceTopKFast: O(n²) dots in tight JVM loops, emitting only
    * the (rare) above-threshold pairs. Exact; the LSH-bucketed variant
    * is the 100 TB path (this one is the ground truth / small-n tool;
    * the collect is bounded — corpus-scale misuse fails loudly).
    * Output: (a, b, sim). */
  def cosineNearDupPairs(spark: org.apache.spark.sql.SparkSession,
                         vectors: DataFrame, threshold: Double,
                         maxRows: Int = MaxBroadcastRows): DataFrame = {
    import spark.implicits._
    def norm(v: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    val all = collectBounded(vectors.select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])], maxRows, "vector set")
      .map { case (id, v) => (id, v, norm(v)) }
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(all)
    vectors.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val corpus = bc.value
        it.flatMap { case (aId, av) =>
          val an = norm(av)
          corpus.iterator
            .filter(_._1 > aId)
            .flatMap { case (bId, bv, bn) =>
              var dot = 0.0; var i = 0
              while (i < av.length) { dot += av(i).toDouble * bv(i).toDouble; i += 1 }
              val sim = dot / an / bn
              if (sim >= threshold) Some((aId, bId, sim)) else None
            }
        }
      }
      .toDF("a", "b", "sim")
  }

  /** L2-normalize a float-vector column (unit sphere) — cosine ranking
    * becomes L2 ranking, the precondition for IVF/k-means quantizers
    * over a cosine metric. */
  def l2normalize(vec: Column): Column = {
    val n = sqrt(aggregate(transform(vec, x => x.cast("double") * x),
      lit(0.0), (acc, v) => acc + v))
    transform(vec, x => (x.cast("double") / n).cast("float"))
  }

  /** Deterministic pseudo-random hyperplane component, derived from
    * (plane, dim) by integer hashing — reproducible in any engine.
    * Public: the DuckDB oracle emits these as SQL literals and the
    * native `banded_lsh_buckets` expression (in the sparkext package)
    * rebuilds its hyperplane matrix from the same function. */
  def planeComponent(plane: Int, dim: Int): Double = {
    var z = plane.toLong * 0x9e3779b97f4a7c15L + dim.toLong * 0xd1b54a32d192ed03L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    // map to (-1, 1)
    (z.toDouble / Long.MaxValue.toDouble)
  }

  /** Sign-pattern LSH bucket id from `nPlanes` hyperplanes starting at
    * plane index `planeOffset` — the building block for banded LSH,
    * where band `b` uses planes [b·r, (b+1)·r). */
  def lshBucketAt(vec: Column, dims: Int, nPlanes: Int, planeOffset: Int): Column =
    (0 until nPlanes).map { p =>
      val proj = (0 until dims).map { d =>
        vec.getItem(d).cast("double") * planeComponent(planeOffset + p, d)
      }.reduce(_ + _)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }.reduce(_ bitwiseOR _)

  /** Sign-pattern LSH bucket id from `nPlanes` hyperplanes over a
    * `dims`-dim vector column. */
  def lshBucket(vec: Column, dims: Int, nPlanes: Int): Column =
    lshBucketAt(vec, dims, nPlanes, 0)

  /** Banded random-hyperplane LSH near-duplicate pairs — the
    * corpus-scale replacement for the exact all-pairs kernel
    * (`cosineNearDupPairs`). Classic LSH banding (the cosine analogue
    * of MinHash bands): each vector gets `nBands` bucket ids, one per
    * disjoint group of `planesPerBand` hyperplanes; two vectors become
    * a candidate pair iff they share a bucket in ANY band; only
    * candidates are cosine-verified against `threshold`.
    *
    * Scale shape: the corpus never moves — only (vec_id, band, bucket)
    * triples shuffle for the band-bucket equi-join; candidate pairs
    * (deduplicated across bands) join back to the vector table by id
    * for the verify pass. No cross join, no driver-side collect at any
    * step. Recall is the LSH trade: 1 - (1 - p^r)^b with
    * p = 1 - θ/π; raise `planesPerBand` as the corpus grows to keep
    * per-bucket occupancy bounded, add bands to recover recall.
    *
    * Output: (a, b, sim) with a < b and sim >= threshold — a subset of
    * the exact kernel's pairs (superset-recall pinned in DedupSpec). */
  /** The banded bucket array via the declarative per-plane expressions
    * — reference form for the native `banded_lsh_buckets` (the
    * declarative tree is O(bands·planes·dims) terms and busts janino's
    * 64 KB method limit at production parameters; the native
    * expression is the registered path). */
  def bandedBucketsDeclarative(vec: Column, dims: Int, planesPerBand: Int,
                               nBands: Int): Column =
    array((0 until nBands).map { b =>
      lshBucketAt(vec, dims, planesPerBand, b * planesPerBand)
    }: _*)

  def lshNearDupPairs(vectors: DataFrame, dims: Int, planesPerBand: Int,
                      nBands: Int, threshold: Double): DataFrame = {
    val banded = vectors.select(col("vec_id"),
      posexplode(org.apache.spark.sql.graft.BandedLshBuckets.column(
        col("embedding"), dims, planesPerBand, nBands))
        .as(Seq("band", "bucket")))
    val cands = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .distinct()
    val va = vectors.select(col("vec_id").as("a"), col("embedding").as("va"))
    val vb = vectors.select(col("vec_id").as("b"), col("embedding").as("vb"))
    cands.join(va, Seq("a")).join(vb, Seq("b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select(col("a"), col("b"), col("sim"))
  }

  /** LSH-bucketed approximate top-k: only same-bucket pairs scored.
    * Same output shape as bruteForceTopK (some queries may return
    * fewer than k neighbors — the recall/latency trade).
    *
    * `nProbes` > 0 enables multi-probe (Lv et al., VLDB '07): each
    * query additionally probes the buckets at Hamming distance 1 from
    * its own sign pattern (the most-likely-misassigned planes), which
    * recovers most of the recall of extra hash tables WITHOUT
    * re-hashing or duplicating the corpus — the query side fans out
    * ×(nProbes+1), the corpus side is untouched. Probe buckets are
    * pairwise distinct and each corpus vector lives in exactly one
    * bucket, so no candidate pair is generated twice (no dedup step
    * needed). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, dims: Int,
              nPlanes: Int, k: Int, nProbes: Int = 0): DataFrame = {
    val qb = queries.withColumn("bucket0", lshBucket(col("qvec"), dims, nPlanes))
    val probed = col("bucket0") +: (0 until math.min(nProbes, nPlanes))
      .map(p => col("bucket0").bitwiseXOR(lit(1L << p)))
    val q = qb
      .withColumn("bucket", explode(array(probed: _*)))
      .select(col("qid"), col("qvec"), col("bucket"))
    val c = corpus.withColumn("bucket", lshBucket(col("cvec"), dims, nPlanes))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid").as("query_id"), col("cid").as("neighbor_id"),
        cosine(col("qvec"), col("cvec")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023): inside
    * each pre-assigned cluster, compare every vector against the
    * cluster's EARLIER vectors (smaller id) by cosine; a vector with
    * any earlier neighbor at or above `tau` is a semantic duplicate
    * and loses its keep flag — "first arrival represents the
    * neighborhood". Output, one row per input vector:
    * (vec_id, cluster, max_sim_earlier, n_earlier_dups, keep), with
    * max_sim_earlier = −2.0 (below the cosine range) when the vector
    * has no earlier cluster-mates.
    *
    * Scale shape: this is exactly why SemDeDup clusters first — the
    * quadratic term is bounded per cluster, never corpus-wide. The
    * pairwise join is an equi-join on the cluster id (one shuffle;
    * AQE splits a skewed mega-cluster), the per-pair kernel is the
    * fused-loop native cosine, and the final flag join is a per-id
    * left join. At corpus scale the cluster column comes from the
    * k-means/IVF quantizer ([[IvfIndex]] — centroid assign is a
    * broadcast map-side step); here the embeddings table's curated
    * `label` column stands in so the oracle can replay the exact
    * same grouping. */
  def semanticDedup(vecs: DataFrame, idCol: String, vecCol: String,
                    clusterCol: String, tau: Double): DataFrame = {
    val a = vecs.select(col(clusterCol).as("c"), col(idCol).as("a"),
      col(vecCol).as("va"))
    val b = vecs.select(col(clusterCol).as("c"), col(idCol).as("b"),
      col(vecCol).as("vb"))
    val agg = a.join(b, Seq("c"))
      .filter(col("a") < col("b"))
      .select(col("b"), cosine(col("va"), col("vb")).as("sim"))
      .groupBy(col("b").as("vec_id"))
      .agg(max(col("sim")).as("max_sim_earlier"),
        count(when(col("sim") >= tau, 1)).as("n_earlier_dups"))
    vecs.select(col(idCol).as("vec_id"), col(clusterCol).as("cluster"))
      .join(agg, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("max_sim_earlier"), lit(-2.0)).as("max_sim_earlier"),
        coalesce(col("n_earlier_dups"), lit(0L)).as("n_earlier_dups"),
        (coalesce(col("n_earlier_dups"), lit(0L)) === 0).as("keep"))
  }

  /** Intra-cluster semantic near-dup EDGES over LEARNED clusters with
    * an EXACT integer cosine threshold — the round-13 SemDeDup
    * composition: [[IvfIndex.trainPortable]]/[[IvfIndex
    * .assignPortable]] supply the k-means clusters (vs [[semanticDedup]]'s
    * curated label column), and the τ = num/den cosine test runs
    * entirely in integers: cos(a,b) ≥ τ ⇔ idot ≥ 0 ∧
    * idot²·den² ≥ num²·|a|²·|b|² — the squares live in decimal128
    * (≤ 2^84·den² ≪ 10^38), which Spark's DECIMAL(38,0) and DuckDB's
    * HUGEINT both compute exactly, so the oracle replays the edge set
    * bit-for-bit with no float cosine anywhere.
    *
    * Scale shape (the SemDeDup point): the quadratic term is bounded
    * PER CLUSTER — one equi-join on cluster_id (AQE splits a skewed
    * mega-cluster), norms computed once per vector before the self
    * join, the pair kernel is the fused codegen'd [[intDot]].
    *
    * `assigned`: (id, q, cluster_id). Output: (cluster_id, a, b) with
    * a < b, only pairs at or above the threshold. */
  def semanticDupEdges(assigned: DataFrame, thresholdNum: Int,
                       thresholdDen: Int): DataFrame =
    semanticScoredPairs(assigned)
      .filter(cosineAtLeast(thresholdNum, thresholdDen))
      .select(col("c").as("cluster_id"), col("a"), col("b"))

  /** All intra-cluster pairs with the integer score components the
    * exact cosine test needs — [[semanticDupEdges]] is one filter
    * over this; the q356 τ-sensitivity sweep aggregates it at several
    * thresholds from ONE pass. Output:
    * (c, a, b, idot, na, nb) with a < b. */
  def semanticScoredPairs(assigned: DataFrame): DataFrame = {
    val withNorm = assigned.select(col("cluster_id").as("c"), col("id"),
      col("q"), intDot(col("q"), col("q")).as("n2"))
    val x = withNorm.select(col("c"), col("id").as("a"),
      col("q").as("qa"), col("n2").as("na"))
    val y = withNorm.select(col("c"), col("id").as("b"),
      col("q").as("qb"), col("n2").as("nb"))
    x.join(y, Seq("c")).filter(col("a") < col("b"))
      .withColumn("idot", intDot(col("qa"), col("qb")))
      .select(col("c"), col("a"), col("b"), col("idot"), col("na"),
        col("nb"))
  }

  /** The exact integer cosine-≥-τ predicate over a
    * [[semanticScoredPairs]] row (see [[semanticDupEdges]] scaladoc
    * for the decimal128 bound). */
  def cosineAtLeast(thresholdNum: Int, thresholdDen: Int): Column = {
    require(thresholdNum >= 0 && thresholdDen > 0)
    def dec(c: Column) = c.cast("decimal(19,0)")
    col("idot") >= 0 &&
      dec(col("idot")) * dec(col("idot")) *
        lit(thresholdDen.toLong * thresholdDen) >=
      lit(thresholdNum.toLong * thresholdNum) *
        dec(col("na")) * dec(col("nb"))
  }

  // --- portable (oracle-replayable) hyperplane LSH ----------------------

  /** Fixed-point quantization of a float-vector column: each component
    * becomes `floor(x * 2^16)` as a long. Multiplying a float-valued
    * double by a power of two is EXACT in IEEE arithmetic, and floor of
    * an exact double is engine-independent — so the quantized integer
    * vector is bit-identical in Spark and DuckDB, and every similarity
    * computed from it (integer dot products, integer L2) is
    * order-free exact. The portability primitive behind the
    * q132/q133-convention ANN oracles. */
  def quantize16(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 65536).cast("long"))

  /** Integer dot product of two quantized vectors (long overflow-safe
    * for |component| < 2^23 at 64 dims — far above the quantized
    * embedding range). Round-12: routed through the native codegen'd
    * [[org.apache.spark.sql.graft.IntDot]] expression — one fused
    * loop instead of interpreted aggregate(zip_with(...)) lambda
    * trees; long addition is exact, so the value is bit-identical. */
  def intDot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftFunctions.intDot(a, b)

  /** Scalar int8 quantization (SQ8) recall audit — the MOST deployed
    * embedding compression (FAISS SQ8, pgvector halfvec/int8, every
    * serving stack's "4× smaller, nearly-free recall" default), and
    * the missing rung between the exact kernel and PQ/IVFADC: one
    * 8-bit code per DIMENSION (vs PQ's one code per SUBSPACE).
    *
    * Construction, integer-exact end to end (the q175/q226 portable
    * convention): vectors quantize to the fixed-point grid
    * ([[quantize16]]); the codebook is the per-dimension corpus
    * [lo, hi] range (a 64-row aggregate, collected — the codebook IS
    * driver-state in every real system — and inlined as literals);
    * code c = (v − lo)·255 div max(hi − lo, 1) ∈ [0, 255];
    * reconstruction lo + c·span div 255. Search is ASYMMETRIC (ADC
    * convention): exact query against dequantized candidates. The
    * audit scores top-`k` overlap per query vs the exact integer-dot
    * ranking — recall@k, the number a serving team actually gates
    * SQ8 rollouts on.
    *
    * Scale shape: codebook collect is 2·dims longs; both rankings are
    * one broadcast(queries) ⨯ corpus pass with a per-query
    * WindowGroupLimit; the semi-join overlap count is k-bounded per
    * query. Nothing corpus² anywhere.
    *
    * Output: (query_id, n_overlap, recall_ppm) per query. */
  /** SQ8 reconstruction expression over a quantized-long column named
    * `q`: per-dim [lo, hi] corpus codebook (dim-bounded collect,
    * emitted as literals), 8-bit code + decode in exact integer
    * arithmetic — the q348 formula, shared with the round-13
    * SQ8-coded SemDeDup (q355). */
  private[graft] def sq8ReconstructExpr(fp: DataFrame): Column = {
    val st = fp.select(posexplode(col("q")).as(Seq("d0", "v")))
      .groupBy("d0").agg(min("v").as("lo"), max("v").as("hi"))
      .orderBy("d0").collect()
    val losStr = st.map(_.getLong(1)).mkString("array(", "L,", "L)")
    val hisStr = st.map(_.getLong(2)).mkString("array(", "L,", "L)")
    expr(
      s"""transform(q, (x, i) -> element_at($losStr, i + 1) +
         |  ((x - element_at($losStr, i + 1)) * 255 div
         |     greatest(element_at($hisStr, i + 1)
         |       - element_at($losStr, i + 1), 1L))
         |  * greatest(element_at($hisStr, i + 1)
         |       - element_at($losStr, i + 1), 1L) div 255)"""
        .stripMargin)
  }

  def sq8Recall(vectors: DataFrame, k: Int, queryMod: Int): DataFrame = {
    val fp = vectors
      .select(col("vec_id"), quantize16(col("embedding")).as("q"))
      .localCheckpoint()
    val dq = sq8ReconstructExpr(fp)
    val queries = fp.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qid"), col("q").as("qq"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("s").desc, col("cid").asc)
    def topk(corpus: DataFrame, vec: Column): DataFrame = corpus
      .crossJoin(broadcast(queries))
      .filter(col("cid") =!= col("qid"))
      .withColumn("s", intDot(col("qq"), vec))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"))
    val exact = topk(
      fp.select(col("vec_id").as("cid"), col("q").as("cq")), col("cq"))
    val sq = topk(
      fp.select(col("vec_id").as("cid"), dq.as("dq")), col("dq"))
    val overlap = exact.join(sq, Seq("qid", "cid"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("ov"))
    queries.select(col("qid").as("query_id"))
      .join(overlap.withColumnRenamed("qid", "query_id"),
        Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("ov"), lit(0L)).as("n_overlap"),
        expr(s"coalesce(ov, 0L) * 1000000 div $k").as("recall_ppm"))
  }

  /** Portable pseudo-random sign for hyperplane `p`, dimension `d` —
    * a two-round affine PRF mod 1e9+7 (the q132 multiplier family),
    * evaluated at PLAN BUILD TIME in Scala and emitted as literals
    * into both the Spark plan and the DuckDB oracle SQL, so the two
    * engines share the plane matrix by construction. */
  def portablePlaneSign(p: Int, d: Int): Int = {
    val h = ((p.toLong * 1000003L + d.toLong * 7919L) % 1000000007L *
      131L + 17L) % 1000000007L
    if (h % 2 == 1) 1 else -1
  }

  /** Portable sign-pattern LSH bucket over a quantized vector: bit `p`
    * set iff the plane-`p` signed integer projection is >= 0. Pure
    * integer arithmetic end to end. */
  def portableLshBucket(qvec: Column, dims: Int, nPlanes: Int): Column =
    (0 until nPlanes).map { p =>
      val signs = array((0 until dims).map(d =>
        lit(portablePlaneSign(p, d).toLong)): _*)
      val proj = aggregate(zip_with(qvec, signs, (x, s) => x * s),
        lit(0L), _ + _)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Matryoshka truncation audit (Kusupati et al. 2022): how much of
    * the full-dimension top-k neighborhood survives when embeddings
    * are truncated to their first `truncDims` components — THE
    * decision metric for serving truncated vectors (memory/latency ÷
    * 4 if recall holds). Truncation needs no renormalization for
    * RANKING (cosine order is scale-free per vector), so the trunc
    * pass is the same kernel over `slice(vec, 1, truncDims)`.
    *
    * Scale shape: two brute-force passes sharing the q22 shape
    * (query-side broadcast by AQE, WindowGroupLimit rank partials),
    * joined per query on the (k-element) neighbor sets — the
    * quadratic term is the audit's point (run it on an eval slice,
    * not the corpus; the LSH/IVF paths serve production).
    *
    * Output: (query_id, n_common, recall) with recall = n_common/k. */
  def matryoshkaRecall(vectors: DataFrame, truncDims: Int, k: Int,
                       queryMod: Int): DataFrame = {
    val q = vectors.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = vectors.select(col("vec_id").as("cid"), col("embedding").as("cv"))
    def topSet(qe: Column, ce: Column, tag: String): DataFrame = {
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("cid").asc)
      q.crossJoin(c).filter(col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"), cosine(qe, ce).as("sim"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .groupBy("qid").agg(sort_array(collect_list(col("cid"))).as(tag))
    }
    topSet(col("qv"), col("cv"), "full_k")
      .join(topSet(slice(col("qv"), 1, truncDims),
        slice(col("cv"), 1, truncDims), "trunc_k"), Seq("qid"))
      .select(col("qid").as("query_id"),
        size(array_intersect(col("full_k"), col("trunc_k"))).as("n_common"))
      .withColumn("recall", col("n_common") / lit(k.toDouble))
  }

  /** Portable-arithmetic LSH top-k — the ORACLE-CHECKED twin of the
    * float [[lshTopK]] path (q23): same relational shape (one bucket
    * pass over the corpus, bucket equi-join, per-query windowed top-k)
    * but quantized integer vectors, PRF-literal planes, and an integer
    * dot-product ranking key, so DuckDB replays bucket assignment AND
    * neighbor ranking bit-for-bit. Queries = rows with
    * `vec_id % queryMod == 0` (the q23 convention); self-matches
    * excluded; ties broken by neighbor id.
    *
    * Scale shape: identical to lshTopK — the corpus is hashed once,
    * candidates come only from shared buckets (no cross join), and the
    * top-k filter compiles to WindowGroupLimit partials.
    *
    * Output: (query_id, rank, neighbor_id, idot). */
  def lshPortableTopK(vectors: DataFrame, dims: Int, nPlanes: Int,
                      k: Int, queryMod: Int): DataFrame = {
    val bk = vectors
      .select(col("vec_id"), quantize16(col("embedding")).as("q"))
      .withColumn("bucket", portableLshBucket(col("q"), dims, nPlanes))
    val queries = bk.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qid"), col("q").as("qq"), col("bucket"))
    val corpus = bk
      .select(col("vec_id").as("cid"), col("q").as("cq"), col("bucket"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("idot").desc, col("cid").asc)
    queries.join(corpus, Seq("bucket"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("idot", intDot(col("qq"), col("cq")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("cid").as("neighbor_id"), col("idot"))
  }

  /** MULTI-PROBE variant of [[lshPortableTopK]] (Lv et al. VLDB 2007):
    * each query searches its own hyperplane bucket PLUS the nPlanes
    * buckets at Hamming distance 1 (one sign flipped) — the buckets a
    * near-boundary neighbor most likely fell into. Multi-probe is THE
    * standard recall lever that does not multiply index size: same
    * single bucketed layout, (1 + nPlanes)× probe work per query,
    * recall strictly ≥ the single-probe kernel by construction
    * (probe sets are supersets; spec-pinned). Buckets partition the
    * corpus, so the probe union introduces no duplicate candidates.
    *
    * Scale shape: identical to the single-probe kernel — one
    * equi-join on the bucket key, with the query side exploded
    * (1 + nPlanes)×; the window stays per-query bounded. */
  def lshMultiProbeTopK(vectors: DataFrame, dims: Int, nPlanes: Int,
                        k: Int, queryMod: Int): DataFrame = {
    val bk = vectors
      .select(col("vec_id"), quantize16(col("embedding")).as("q"))
      .withColumn("bucket", portableLshBucket(col("q"), dims, nPlanes))
    val probes = array(
      (col("bucket") +:
        (0 until nPlanes).map(p =>
          col("bucket").bitwiseXOR(lit(1L << p)))): _*)
    val queries = bk.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qid"), col("q").as("qq"),
        explode(probes).as("bucket"))
    val corpus = bk
      .select(col("vec_id").as("cid"), col("q").as("cq"), col("bucket"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("idot").desc, col("cid").asc)
    queries.join(corpus, Seq("bucket"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("idot", intDot(col("qq"), col("cq")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("cid").as("neighbor_id"), col("idot"))
  }

  /** Johnson–Lindenstrauss ±1 random projection + distance-
    * preservation audit — the dimensionality-reduction sanity gate a
    * pipeline runs before swapping 64-dim embeddings for a cheaper
    * `projDims`-dim sketch: project with the [[portablePlaneSign]]
    * PRF sign matrix (Achlioptas 2003: ±1 entries suffice for JL),
    * then, on a deterministic sample of vector pairs, publish the
    * exact integer distances before/after and the preservation ratio.
    *
    * For ±1 signs E‖y_a − y_b‖² = projDims · ‖x_a − x_b‖², so
    * `ratio_milli = 1000·d2_proj DIV (projDims·d2_orig)` concentrates
    * around 1000; systematic drift or heavy tails mean the projection
    * is unsafe at the chosen dims. Overflow headroom: |y_j| <
    * dims·2¹⁷ = 2²³ for quantize16 inputs, so d2_proj < projDims·2⁴⁶
    * and 1000·d2_proj < 2⁶⁰ — ANSI-safe.
    *
    * The audited pairs are consecutive ids (anchor % pairMod == 0,
    * partner = anchor+1) — an unbiased deterministic probe that needs
    * ONE equi-join, no pair explosion.
    *
    * Scale shape: projection is map-only (sign literals inlined, one
    * fold per projected dim); the audit join is a hash equi-join on
    * the derived partner id. Output: (a_id, b_id, d2_orig, d2_proj,
    * ratio_milli). */
  def jlDistanceAudit(vecs: DataFrame, dims: Int, projDims: Int,
                      pairMod: Int): DataFrame = {
    require(dims >= 1 && projDims >= 1 && pairMod >= 1)
    val proj = array((0 until projDims).map { j =>
      val signs = array((0 until dims).map(d =>
        lit(portablePlaneSign(j, d).toLong)): _*)
      aggregate(zip_with(col("q"), signs, (x, s) => x * s), lit(0L), _ + _)
    }: _*)
    def d2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)
    val p = vecs.select(col("id"), col("q"), proj.as("y"))
    val a = p.filter(col("id") % pairMod === 0)
      .select(col("id").as("a_id"), (col("id") + 1).as("b_id"),
        col("q").as("qa"), col("y").as("ya"))
    val b = p.select(col("id").as("b_id"), col("q").as("qb"),
      col("y").as("yb"))
    a.join(b, "b_id")
      .select(col("a_id"), col("b_id"),
        d2(col("qa"), col("qb")).as("d2_orig"),
        d2(col("ya"), col("yb")).as("d2_proj"))
      .withColumn("ratio_milli", expr(
        s"""CAST(CASE WHEN d2_orig > 0
           THEN 1000 * d2_proj DIV ($projDims * d2_orig)
           ELSE CAST(0 AS BIGINT) END AS BIGINT)"""))
  }
}
