package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 quantization audit for embedding columns — the
  * storage/serving-side companion of the ANN operators: before a 100 TB
  * embedding corpus is quantized 4× smaller for the vector index, this
  * measures exactly what the compression costs per vector.
  *
  * Engine-exactness: every per-element op (cast, divide, floor, clamp,
  * multiply, subtract) is deterministic double math in ONE fixed order,
  * so Spark and DuckDB produce bit-identical errors; the only
  * order-sensitive step — summing the squared errors — goes through the
  * house DECIMAL quantization trick (cast each term to DECIMAL(28,15),
  * sum exactly, ONE double division at the end), making the result
  * independent of partitioning and engine.
  *
  * Scale shape: amax is computed map-side with array higher-order
  * functions (no shuffle), the explode carries it along, and the single
  * shuffle is the map-side-combined groupBy on vec_id. No joins, no
  * windows, no driver state.
  */
object Quantization {

  /** Per-vector int8 quantization report:
    * (vec_id, dim, amax, mse, max_abs_err).
    *
    * q_i = clamp(floor(x_i / (amax/127) + 0.5), -127, 127);
    * err_i = x_i − q_i · scale. All-zero vectors quantize losslessly
    * (guarded against 0/0).
    */
  def int8Report(embs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val base = embs.select(
      col(idCol).as("vec_id"),
      array_max(transform(col(vecCol), x => abs(x.cast("double"))))
        .as("amax"),
      size(col(vecCol)).as("dim"),
      explode(col(vecCol)).as("xf"))
      .withColumn("x", col("xf").cast("double"))
    val scale: Column = col("amax") / lit(127.0d)
    val q: Column = greatest(lit(-127.0d), least(lit(127.0d),
      floor(col("x") / scale + lit(0.5d))))
    val err: Column = when(col("amax") === lit(0.0d), lit(0.0d))
      .otherwise(col("x") - q * scale)
    base
      .withColumn("err", err)
      .groupBy("vec_id", "dim", "amax")
      .agg(
        (sum((col("err") * col("err")).cast("decimal(28,15)"))
          .cast("double") / col("dim")).as("mse"),
        max(abs(col("err"))).as("max_abs_err"))
      .select("vec_id", "dim", "amax", "mse", "max_abs_err")
  }

  // --- product quantization (Jégou et al. 2011) -------------------------
  //
  // The standard embedding-compression index: split each vector into S
  // subspaces, learn a tiny per-subspace codebook by Lloyd iterations,
  // store each vector as S small codes (here 8 codes ≈ 8 bytes instead
  // of 256 float bytes), and answer queries by ADC — summing per-
  // subspace distances between the query's subvectors and the CODED
  // centroids, never touching the original vectors.
  //
  // Portable-arithmetic convention (the q132/q176 family): vectors are
  // quantize16 longs, distances are exact integer L2, centroid updates
  // are floor(sum/n) with sums < 2^53, init = the k lowest ids'
  // subvectors per subspace — every step replayable by the oracle with
  // the Lloyd iterations unrolled as CTEs.
  //
  // Scale shape: training/assign joins each (id, subspace) row against
  // the BROADCAST S·k-row codebook (32 rows here) with a per-(id,s)
  // window argmin; the update is a map-side-combined groupBy on
  // (s, cid, pos). Encoding is the same assign; ADC joins the exploded
  // code table to the broadcast codebook and sums S rows per (query,
  // neighbor) pair — queries fan out, the corpus never re-materializes
  // its float vectors. Empty clusters drop out of the update (the
  // trainPortable convention, mirrored by the oracle).

  /** Explode quantized vectors into per-subspace rows.
    * vecs: (id, q[S·subDim]). Output: (id, s, v8). */
  private def subRows(vecs: DataFrame, subspaces: Int,
                      subDim: Int): DataFrame =
    vecs.select(col("id"),
        explode(array((0 until subspaces).map(s =>
          struct(lit(s).as("s"),
            slice(col("q"), s * subDim + 1, subDim).as("v8"))): _*))
          .as("sub"))
      .select(col("id"), col("sub.s").as("s"), col("sub.v8").as("v8"))

  private def subDist2(a: Column, b: Column): Column =
    // native fused loop (round-12); bit-identical — integer arithmetic
    org.apache.spark.sql.graft.GraftFunctions.intDist2(a, b)

  /** Nearest codebook entry per (id, subspace): ties to the lower
    * code. subs: (id, s, v8); codebook: (s, code, cvec). */
  private def assignSubs(subs: DataFrame, codebook: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"), col("s"))
      .orderBy(col("d2").asc, col("code").asc)
    subs.join(broadcast(codebook), Seq("s"))
      .withColumn("d2", subDist2(col("v8"), col("cvec")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("s"), col("v8"), col("code"), col("d2"))
  }

  /** Train per-subspace PQ codebooks: `iters` Lloyd rounds, k codes
    * per subspace, deterministic init from the k lowest ids.
    * vecs: (id, q). Returns (s, code, cvec). */
  def pqTrain(vecs: DataFrame, subspaces: Int, subDim: Int, k: Int,
              iters: Int): DataFrame = {
    require(subspaces >= 1 && subDim >= 1 && k >= 1 && iters >= 0)
    val subs = subRows(vecs, subspaces, subDim).localCheckpoint()
    // seed: the k lowest ids' subvectors, code = rank of the id among
    // the seeds (collected — k·S rows, the sanctioned k-bounded pull)
    val spark = vecs.sparkSession
    import spark.implicits._
    val seedIds = vecs.select(col("id")).orderBy(col("id")).limit(k)
      .as[Long].collect().sorted
    val seedDf = seedIds.zipWithIndex
      .map { case (id, i) => (id, i.toLong) }.toSeq.toDF("id", "code")
    var codebook = subs.join(broadcast(seedDf), "id")
      .select(col("s"), col("code"), col("v8").as("cvec"))
      .localCheckpoint()
    (0 until iters).foreach { _ =>
      codebook = assignSubs(subs, codebook)
        .select(col("s"), col("code"),
          posexplode(col("v8")).as(Seq("pos", "v")))
        .groupBy(col("s"), col("code"), col("pos"))
        .agg(floor(sum(col("v")).cast("double") / count(lit(1)))
          .cast("long").as("cv"))
        .groupBy(col("s"), col("code"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("cv")))),
          st => st.getField("cv")).as("cvec"))
        .localCheckpoint()
    }
    codebook
  }

  /** Encode every vector as S codes + report the exact integer
    * quantization error. vecs: (id, q); codebook from [[pqTrain]].
    * Output: (id, code_0 … code_{S−1}, qerr) — qerr = Σ_s ‖v8_s −
    * cvec(s, code_s)‖² in quantize16 units². */
  def pqCodes(vecs: DataFrame, codebook: DataFrame, subspaces: Int,
              subDim: Int): DataFrame = {
    // one aggregation: codes gathered in subspace order + the error
    // sum, so the assign join is planned exactly once
    assignSubs(subRows(vecs, subspaces, subDim), codebook)
      .groupBy(col("id"))
      .agg(sum(col("d2")).as("qerr"),
        transform(array_sort(collect_list(struct(col("s"), col("code")))),
          st => st.getField("code")).as("codes"))
      .select(col("id") +:
        (0 until subspaces).map(s =>
          element_at(col("codes"), s + 1).as(s"code_$s")) :+
        col("qerr"): _*)
  }

  /** ADC (asymmetric distance computation) top-k: distance from a
    * query's REAL subvectors to each corpus vector's CODED centroids.
    * queries: (qid, q); corpus: (id, q) — encoded internally (a
    * stored-code table composes the same way); codebook: (s, code,
    * cvec). Output: (query_id, rank, neighbor_id, adc_d2).
    *
    * Route (round-9 advisory #7, the routeTopK convention): the
    * |Q|·S·k LUT is broadcast only while it fits `maxLutRows` —
    * probed with a bounded count (limit pushed into the scan, one
    * tiny job; there is no driver collect here whose failure could
    * serve as the probe). Past the cap the LUT stays distributed and
    * the join runs SALTED: (s, code) alone has only S·k distinct
    * values, so an unsalted shuffle join would land everything on
    * S·k reducers — instead the LUT side gets salt = qid mod P and
    * the corpus codes replicate P ways, the standard small-key-space
    * skew treatment. Identical output, spec-pinned. */
  def pqAdcTopK(queries: DataFrame, corpus: DataFrame,
                codebook: DataFrame, subspaces: Int, subDim: Int,
                k: Int,
                maxLutRows: Int = Similarity.MaxBroadcastRows): DataFrame = {
    val codes = assignSubs(subRows(corpus, subspaces, subDim), codebook)
      .select(col("id"), col("s"), col("code"))
    val qsubs = subRows(queries.select(col("qid").as("id"), col("q")),
        subspaces, subDim)
      .select(col("id").as("qid"), col("s"), col("v8").as("qv8"))
    // per-(query, s, code) partial distances: |Q|·S·k rows
    val lut = qsubs.join(broadcast(codebook), Seq("s"))
      .select(col("qid"), col("s"), col("code"),
        subDist2(col("qv8"), col("cvec")).as("pd2"))
    val underCap = lut.limit(maxLutRows + 1).count() <= maxLutRows
    val joined =
      if (underCap) codes.join(broadcast(lut), Seq("s", "code"))
      else {
        val p = 32
        val salted = lut.withColumn("salt",
          pmod(col("qid"), lit(p.toLong)).cast("int"))
        codes.withColumn("salt",
            explode(sequence(lit(0), lit(p - 1))))
          .join(salted, Seq("s", "code", "salt"))
      }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("adc_d2").asc, col("neighbor_id").asc)
    joined
      .filter(col("qid") =!= col("id"))
      .groupBy(col("qid").as("query_id"), col("id").as("neighbor_id"))
      .agg(sum(col("pd2")).as("adc_d2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("adc_d2"))
  }

  /** IVFADC (Jégou et al. 2011 §IV) — the composite index: IVF coarse
    * cells bound WHICH corpus vectors a query scores ([[IvfIndex]]'s
    * probed lists), PQ-ADC bounds HOW each candidate is scored
    * (coded centroids, never the original vectors). This is the
    * standard billion-scale ANN serving shape: search cost drops by
    * ~nProbe/#cells relative to full ADC, storage stays S codes per
    * vector.
    *
    * queries: (qid, q); corpus: (id, q); coarse: (cluster_id, c) from
    * [[IvfIndex.trainPortable]]; codebook: (s, code, cvec) from
    * [[pqTrain]]. All quantize16 integer arithmetic — every step
    * (cell assign, probe argmin, LUT, ADC sum) replays in the oracle.
    *
    * Scale shape: the corpus is assigned to cells and PQ-encoded once
    * (broadcast coarse/codebook joins, window argmin per id); the
    * probe LUT (|Q|·nProbe·S·k rows, query-side-sized by the eval-set
    * contract) broadcasts against the corpus codes on (cluster_id, s,
    * code) — corpus rows fan out only to the queries that probed
    * their cell. Codes in unprobed cells are filtered by the join
    * itself, which is the entire IVFADC win.
    *
    * Output: (query_id, rank, neighbor_id, adc_d2). */
  /** IVFADC with RESIDUAL encoding — the full Jégou 2011 §IV index
    * (q238's [[ivfAdcTopK]] scores raw-vector codes within probed
    * cells; production IVFADC quantizes the residual x − centroid(x),
    * which concentrates the PQ codebook's resolution on the
    * within-cell displacement and is why the composite beats plain
    * ADC at equal code budget). Everything integer: residuals are
    * differences of quantize16 longs, the PQ is [[pqTrain]] run on
    * the residual frame, and the per-probe query residual
    * q − centroid(probed cell) gives a LUT of |Q|·nProbe·S·k rows.
    *
    * Scale shape as [[ivfAdcTopK]], plus: the residual projection is
    * one broadcast join against the k-row coarse table (map-side),
    * and the LUT join key (cluster_id, s, code) again filters
    * unprobed cells inside the join. Trains the PQ internally —
    * callers hold only the coarse table (the serving split: coarse
    * lives with the router, codes with the data).
    *
    * Output: (query_id, rank, neighbor_id, adc_d2). */
  def ivfAdcResidualTopK(queries: DataFrame, corpus: DataFrame,
                         coarse: DataFrame, subspaces: Int, subDim: Int,
                         pqK: Int, pqIters: Int, nProbe: Int,
                         k: Int): DataFrame = {
    require(nProbe >= 1 && k >= 1)
    val cells = IvfIndex.assignPortable(
      corpus.select(col("id"), col("q")), coarse)
    val resid = cells.join(broadcast(coarse), "cluster_id")
      .select(col("id"), col("cluster_id"),
        zip_with(col("q"), col("c"), (x, y) => x - y).as("q"))
      .localCheckpoint() // pqTrain iterates over it
    val cb = pqTrain(resid.select(col("id"), col("q")),
      subspaces, subDim, pqK, pqIters)
    val codes = assignSubs(
        subRows(resid.select(col("id"), col("q")), subspaces, subDim), cb)
      .select(col("id"), col("s"), col("code"))
      .join(resid.select(col("id"), col("cluster_id")), "id")
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("cd2").asc, col("cluster_id").asc)
    val probes = queries.crossJoin(broadcast(coarse))
      .withColumn("cd2", subDist2(col("q"), col("c")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("cluster_id"),
        zip_with(col("q"), col("c"), (x, y) => x - y).as("rq"))
    val qsubs = probes.select(col("qid"), col("cluster_id"),
        explode(array((0 until subspaces).map(s =>
          struct(lit(s).as("s"),
            slice(col("rq"), s * subDim + 1, subDim).as("qv8"))): _*))
          .as("sub"))
      .select(col("qid"), col("cluster_id"),
        col("sub.s").as("s"), col("sub.qv8").as("qv8"))
    val lut = qsubs.join(broadcast(cb), Seq("s"))
      .select(col("qid"), col("cluster_id"), col("s"), col("code"),
        subDist2(col("qv8"), col("cvec")).as("pd2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("adc_d2").asc, col("neighbor_id").asc)
    codes.join(broadcast(lut), Seq("cluster_id", "s", "code"))
      .filter(col("qid") =!= col("id"))
      .groupBy(col("qid").as("query_id"), col("id").as("neighbor_id"))
      .agg(sum(col("pd2")).as("adc_d2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("adc_d2"))
  }

  def ivfAdcTopK(queries: DataFrame, corpus: DataFrame,
                 coarse: DataFrame, codebook: DataFrame,
                 subspaces: Int, subDim: Int, nProbe: Int,
                 k: Int): DataFrame = {
    require(nProbe >= 1 && k >= 1)
    // corpus side: coarse cell + PQ codes per vector, one pass each
    val cells = IvfIndex.assignPortable(
        corpus.select(col("id"), col("q")), coarse)
      .select(col("id"), col("cluster_id"))
    val codes = assignSubs(subRows(corpus, subspaces, subDim), codebook)
      .select(col("id"), col("s"), col("code"))
      .join(cells, "id")
    // query side: nProbe nearest coarse centroids by integer L2
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("cd2").asc, col("cluster_id").asc)
    val probes = queries.crossJoin(broadcast(coarse))
      .withColumn("cd2", subDist2(col("q"), col("c")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("cluster_id"))
    // probe-scoped LUT: (qid, cluster_id, s, code, pd2)
    val qsubs = subRows(queries.select(col("qid").as("id"), col("q")),
        subspaces, subDim)
      .select(col("id").as("qid"), col("s"), col("v8").as("qv8"))
    val lut = qsubs.join(broadcast(codebook), Seq("s"))
      .select(col("qid"), col("s"), col("code"),
        subDist2(col("qv8"), col("cvec")).as("pd2"))
      // both sides are eval-set-sized; the hint keeps the LUT build
      // free of sort-merge exchanges (it feeds a broadcast anyway)
      .join(broadcast(probes), Seq("qid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("adc_d2").asc, col("neighbor_id").asc)
    codes.join(broadcast(lut), Seq("cluster_id", "s", "code"))
      .filter(col("qid") =!= col("id"))
      .groupBy(col("qid").as("query_id"), col("id").as("neighbor_id"))
      .agg(sum(col("pd2")).as("adc_d2"))
      // a candidate seen via one probed cell contributes all S
      // subspaces exactly once: (cluster_id, s, code) matches one
      // LUT row per (qid, s) because cluster_id is functionally
      // determined by id and the probe pair (qid, cluster_id) is
      // unique — so the sum is the plain ADC distance
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("adc_d2"))
  }

  /** ADC shortlist + EXACT re-rank — the production ANN serving
    * pattern (Jégou 2011 §V.A): the compressed-domain index returns a
    * `shortlist`-sized candidate set cheaply, then only those few
    * candidates pay a full-precision distance, fixing the
    * quantization error exactly where ranking happens. The shortlist
    * is per-query bounded, so the exact re-score joins touch
    * |queries|·shortlist full vectors — never the corpus.
    *
    * Output: (query_id, rank, neighbor_id, exact_d2, adc_d2) with
    * rank by exact_d2 (ties to the smaller id). */
  def adcRerankTopK(queries: DataFrame, corpus: DataFrame,
                    coarse: DataFrame, codebook: DataFrame,
                    subspaces: Int, subDim: Int, nProbe: Int,
                    shortlist: Int, k: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val sl = ivfAdcTopK(queries, corpus, coarse, codebook,
      subspaces, subDim, nProbe, shortlist)
    def d2(a: Column, b: Column): Column =
      org.apache.spark.sql.graft.GraftFunctions.intDist2(a, b)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("exact_d2").asc, col("neighbor_id").asc)
    sl.join(queries.select(col("qid").as("query_id"), col("q").as("qq")),
        Seq("query_id"))
      .join(corpus.select(col("id").as("neighbor_id"),
        col("q").as("cq")), Seq("neighbor_id"))
      .withColumn("exact_d2", d2(col("qq"), col("cq")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("exact_d2"), col("adc_d2"))
  }
}
