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

  /** Cosine similarity of two float-array columns, in double. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))
  }

  /** Brute-force top-k cosine neighbors.
    * queries: (qid, qvec); corpus: (cid, cvec). Output:
    * (query_id, rank, neighbor_id, sim) — rank 1..k, self-match excluded
    * by id inequality, ties broken by neighbor id. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = queries.crossJoin(corpus)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid").as("query_id"), col("cid").as("neighbor_id"),
        cosine(col("qvec"), col("cvec")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Deterministic pseudo-random hyperplane component, derived from
    * (plane, dim) by integer hashing — reproducible in any engine. */
  private def planeComponent(plane: Int, dim: Int): Double = {
    var z = plane.toLong * 0x9e3779b97f4a7c15L + dim.toLong * 0xd1b54a32d192ed03L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    // map to (-1, 1)
    (z.toDouble / Long.MaxValue.toDouble)
  }

  /** Sign-pattern LSH bucket id from `nPlanes` hyperplanes over a
    * `dims`-dim vector column. */
  def lshBucket(vec: Column, dims: Int, nPlanes: Int): Column =
    (0 until nPlanes).map { p =>
      val proj = (0 until dims).map { d =>
        vec.getItem(d).cast("double") * planeComponent(p, d)
      }.reduce(_ + _)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }.reduce(_ bitwiseOR _)

  /** LSH-bucketed approximate top-k: only same-bucket pairs scored.
    * Same output shape as bruteForceTopK (some queries may return
    * fewer than k neighbors — the recall/latency trade). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, dims: Int,
              nPlanes: Int, k: Int): DataFrame = {
    val q = queries.withColumn("bucket", lshBucket(col("qvec"), dims, nPlanes))
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
}
