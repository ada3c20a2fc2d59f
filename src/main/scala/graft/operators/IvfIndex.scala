package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the classic
  * coarse-quantizer index (Jégou et al., IVFADC family): k-means
  * centroids partition the corpus into lists; a query scores only the
  * `nProbe` lists whose centroids are nearest.
  *
  * Training is a few Lloyd iterations, fully distributed: assign =
  * argmin-distance join (cross with the tiny centroid set, window
  * argmin — or, for callers whose centroids are already
  * checkpointed, the round-16 [[assignPortableInlined]] map-only
  * literal argmin), update = centroidsLong-style mean per cluster.
  * Deterministic: centroids initialize from the `k` lowest vec_ids.
  *
  * Scale shape: corpus stays put; each query joins to its probed
  * partitions only — the cross product shrinks by ~k/nProbe. At 100 TB
  * the lists are bucketed/partitioned by centroid id on storage.
  */
object IvfIndex {

  private def dist2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    // native fused-loop expression (stays inside whole-stage codegen);
    // the assign step evaluates it for every (vector × centroid) pair,
    // where the interpreted aggregate/zip_with form was the hot spot.
    // Bit-identical to the HOF fold (NativeExprSpec).
    org.apache.spark.sql.graft.GraftFunctions.l2DistSq(a, b)

  /** Interpreted-HOF squared L2 — the reference form the native
    * expression is spec-tested against. */
  private[graft] def dist2Hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) =>
      (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** Assign each vector to its nearest centroid.
    * vectors: (id, vec); centroids: (cluster_id, cvec) — tiny,
    * broadcast. Output: (id, vec, cluster_id). */
  def assign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id"))
      .orderBy(col("d2").asc, col("cluster_id").asc)
    vectors.crossJoin(broadcast(centroids))
      .withColumn("d2", dist2(col("vec"), col("cvec")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("vec"), col("cluster_id"))
  }

  /** Train k centroids with `iters` Lloyd iterations (deterministic
    * init: the k lowest ids). Returns (cluster_id, cvec). */
  def train(spark: SparkSession, vectors: DataFrame, k: Int,
            iters: Int, dims: Int): DataFrame = {
    import spark.implicits._
    var centroids = vectors.orderBy(col("id")).limit(k)
      .orderBy(col("id"))
      .select(col("vec"))
      .as[Array[Float]].collect().zipWithIndex
      .map { case (v, i) => (i, v) }
      .toSeq.toDF("cluster_id", "cvec")
    (0 until iters).foreach { _ =>
      val assigned = assign(vectors, centroids)
      val means = VectorMean
        .centroidsLong(assigned.withColumnRenamed("cluster_id", "label"),
          "label", "vec")
        .groupBy(col("label"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("avg_value")))),
          s => s.getField("avg_value").cast("float")).as("cvec"))
        .select(col("label").as("cluster_id"), col("cvec"))
      centroids = means
    }
    centroids
  }

  /** IVF top-k search: probe the `nProbe` nearest centroid lists.
    * queries: (qid, qvec); corpus: (cid, cvec).
    * Output: (query_id, rank, neighbor_id, sim). */
  def search(spark: SparkSession, queries: DataFrame, corpus: DataFrame,
             centroids: DataFrame, nProbe: Int, k: Int): DataFrame = {
    // corpus partitioned into lists
    val lists = assign(
      corpus.select(col("cid").as("id"), col("cvec").as("vec")), centroids)
      .select(col("id").as("cid"), col("vec").as("cvec"),
        col("cluster_id"))
    // per query: its nProbe nearest centroids
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("d2").asc, col("cluster_id").asc)
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("d2", dist2(col("qvec"), col("cvec")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("qvec"), col("cluster_id"))
    // score only probed lists; the probe side is eval-set-sized by the
    // kernel contract, so broadcast it — the corpus-sized lists never
    // shuffle for this join (a plain equi-join would SMJ both sides)
    val scored = lists.join(broadcast(probes), Seq("cluster_id"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid").as("query_id"), col("cid").as("neighbor_id"),
        Similarity.cosine(col("qvec"), col("cvec")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  // --- portable (oracle-replayable) IVF ---------------------------------

  /** Integer squared L2 between two quantized vectors. Magnitude bound:
    * per-dim diff < 2^18 after [[Similarity.quantize16]], squared
    * < 2^36, ×64 dims < 2^42 — well inside long (and ANSI-safe). */
  private def intDist2(a: org.apache.spark.sql.Column,
                       b: org.apache.spark.sql.Column) =
    // native fused loop (round-12); bit-identical — integer arithmetic
    org.apache.spark.sql.graft.GraftFunctions.intDist2(a, b)

  /** Portable Lloyd assignment: nearest centroid by INTEGER squared L2
    * (ties to the lower cluster id). vectors: (id, q); centroids:
    * (cluster_id, c) — both quantized-long arrays. LAZY (no driver
    * action at construction) — callers whose centroid frame is
    * already materialized (checkpointed) should prefer
    * [[assignPortableInlined]], which is map-only. */
  def assignPortable(vectors: DataFrame, centroids: DataFrame): DataFrame =
    assignPortableWithDist(vectors, centroids)
      .select(col("id"), col("q"), col("cluster_id"))

  /** [[assignPortable]] keeping the winning integer distance — the
    * round-13 drift audit (q352) aggregates it per cluster. */
  def assignPortableWithDist(vectors: DataFrame,
                             centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id"))
      .orderBy(col("d2").asc, col("cluster_id").asc)
    vectors.crossJoin(broadcast(centroids))
      .withColumn("d2", intDist2(col("q"), col("c")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("q"), col("cluster_id"), col("d2"))
  }

  /** Round-16 MAP-ONLY portable assignment (guide §2.4, remove
    * shuffles outright): the k-bounded centroid set is collected once
    * and inlined as LITERAL arrays, so the argmin is ONE codegen'd
    * projection — `least` over k (d2, cluster_id) structs — with zero
    * joins and zero exchanges; the vector corpus never moves (the
    * production IVF shape: every worker holds the centroid set).
    * Bit-identical to [[assignPortableWithDist]]: struct ordering
    * compares d2 first, then cluster_id — the same (d2 asc,
    * cluster_id asc) tie-break.
    *
    * EAGER (one driver collect of k rows at construction): use where
    * the centroid frame is already checkpointed (the pipeline-store
    * chain always freezes/checkpoints its centroids), NOT on a lazy
    * centroid lineage a query plan would otherwise evaluate only
    * once. */
  def assignPortableInlinedWithDist(vectors: DataFrame,
                                    centroids: DataFrame): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val cents = centroids
      .select(col("cluster_id").cast("long"), col("c"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    if (cents.isEmpty)
      // empty centroid table ⇒ empty assignment (the crossJoin
      // semantics) with the contract schema
      vectors.select(col("id"), col("q"), lit(0L).as("cluster_id"),
        lit(0L).as("d2")).filter(lit(false))
    else {
      require(cents.length <= 65536,
        s"assignPortableInlined: ${cents.length} centroids — the " +
          "inlined argmin is for k-bounded coarse quantizers (<= 65536)")
      val scored = cents.map { case (cid, c) =>
        struct(intDist2(col("q"), typedlit(c)).as("d2"),
          lit(cid).as("cluster_id"))
      }
      val best =
        if (scored.length == 1) scored.head
        else least(scored.toSeq: _*)
      vectors.select(col("id"), col("q"),
        best.getField("cluster_id").as("cluster_id"),
        best.getField("d2").as("d2"))
    }
  }

  /** [[assignPortableInlinedWithDist]] without the distance column. */
  def assignPortableInlined(vectors: DataFrame,
                            centroids: DataFrame): DataFrame =
    assignPortableInlinedWithDist(vectors, centroids)
      .select(col("id"), col("q"), col("cluster_id"))

  /** Portable Lloyd training — the oracle-replayable twin of [[train]]:
    * quantized integer vectors, integer distances, and centroid means
    * as `floor(sum / n)` where the division runs in double (sums stay
    * < 2^53, so the quotient and its floor are engine-exact). Init is
    * the k lowest ids, cluster ids assigned in id order — the same
    * deterministic seed the float path uses. Per-iteration driver
    * traffic: the k seed vectors once, nothing after.
    * vectors: (id, q). Returns (cluster_id, c). */
  def trainPortable(spark: SparkSession, vectors: DataFrame, k: Int,
                    iters: Int): DataFrame = {
    import spark.implicits._
    var centroids = vectors.orderBy(col("id")).limit(k)
      .orderBy(col("id")).select(col("q"))
      .as[Seq[Long]].collect().zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
      .toSeq.toDF("cluster_id", "c")
    // The loop stays fully LAZY (one nested plan the caller evaluates
    // once) — round 16 A/B'd two eager/partial-agg reshapes here and
    // both LOST on the q238-class callers that evaluate the returned
    // centroid frame more than once (a per-iteration driver collect
    // charges construction-time jobs; a groupBy(id, q) argmin falls
    // off the hash-aggregate path because q is an array). The window
    // argmin + posexplode means below is the measured-fastest lazy
    // form; chain callers checkpoint the result and assign with
    // [[assignPortableInlined]].
    (0 until iters).foreach { _ =>
      centroids = assignPortable(vectors, centroids)
        .select(col("cluster_id"), posexplode(col("q")).as(Seq("pos", "v")))
        .groupBy(col("cluster_id"), col("pos"))
        .agg(floor(sum(col("v")).cast("double") / count(lit(1)))
          .cast("long").as("cv"))
        .groupBy(col("cluster_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("cv")))),
          s => s.getField("cv")).as("c"))
    }
    centroids
  }

  /** Portable IVF top-k search — integer end to end: probe the
    * `nProbe` centroids nearest by integer L2, rank candidates by
    * integer dot product (ties to the lower neighbor id). Same
    * relational shape as [[search]]: corpus assigned once, queries
    * fan out only to probed lists, WindowGroupLimit caps the rank.
    * Output: (query_id, rank, neighbor_id, idot). */
  def searchPortable(queries: DataFrame, corpus: DataFrame,
                     centroids: DataFrame, nProbe: Int, k: Int): DataFrame = {
    val lists = assignPortable(
      corpus.select(col("cid").as("id"), col("cq").as("q")), centroids)
      .select(col("id").as("cid"), col("q").as("cq"), col("cluster_id"))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("d2").asc, col("cluster_id").asc)
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("d2", intDist2(col("qq"), col("c")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("qq"), col("cluster_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("idot").desc, col("neighbor_id").asc)
    // broadcast the eval-set-sized probe side (same rationale as
    // [[search]]): the corpus-sized lists stay put
    lists.join(broadcast(probes), Seq("cluster_id"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid").as("query_id"), col("cid").as("neighbor_id"),
        Similarity.intDot(col("qq"), col("cq")).as("idot"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "idot")
  }
}
