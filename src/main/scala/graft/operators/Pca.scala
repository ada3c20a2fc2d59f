package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PCA, top principal direction — embedding analytics for
  * the curation stack (drift axes, dominant-direction whitening,
  * projection-based sharding all start from component 1). The
  * textbook 100 TB shape: the D×D GRAM MATRIX is one distributed
  * aggregation (D² ≪ corpus; map-side combine does almost all the
  * work), the eigen-solve runs on the DRIVER over that bounded
  * matrix, and the corpus is touched exactly twice — once for the
  * gram pass, once for the map-only projection. Nothing iterative
  * ever loops over the data.
  *
  * Integer contract (the q46 portable-arithmetic stance): embeddings
  * quantize through [[Similarity.quantize16]] (floor(x·2¹⁶) longs),
  * the gram entries are exact integer sums, and the power iteration
  * runs in BigInt with a truncating-division renormalization
  * (v′ = w·2¹⁶ div max|w|, BigInt `/` and DuckDB HUGEINT `//` both
  * truncate toward zero) for a FIXED `rounds` count — every engine
  * replays the identical eigenvector, so the per-row projections
  * hash-compare exactly. Power iteration's sign is pinned by the
  * deterministic all-ones start.
  */
object Pca {

  /** (vec_id, label, proj): the integer projection of every quantized
    * embedding onto the power-iterated top component. */
  def topComponentProjections(embs: DataFrame, idCol: String,
                              vecCol: String, labelCol: String,
                              dims: Int, rounds: Int = 8): DataFrame = {
    require(dims >= 1 && rounds >= 1)
    val rows = embs.select(col(idCol).cast("long").as("vec_id"),
        col(labelCol).cast("long").as("label"),
        Similarity.quantize16(col(vecCol)).as("q"))
      .filter(size(col("q")) === dims)
      .localCheckpoint() // the gram pass and the projection share it
    // upper-triangle gram entries: one explode + one grouped sum;
    // D(D+1)/2 keys — bounded, map-side combined
    val tri = rows.select(explode(expr(
        s"""flatten(transform(sequence(0, ${dims - 1}), i ->
           |  transform(sequence(i, ${dims - 1}), j ->
           |    struct(i AS i, j AS j,
           |      element_at(q, i + 1) * element_at(q, j + 1) AS p))))"""
          .stripMargin)).as("t"))
      .groupBy(col("t.i").as("i"), col("t.j").as("j"))
      .agg(sum(col("t.p")).as("g"))
      .collect() // ≤ D(D+1)/2 rows — the sanctioned bounded collect
    val g = Array.ofDim[BigInt](dims, dims)
    for (i <- 0 until dims; j <- 0 until dims) g(i)(j) = BigInt(0)
    tri.foreach { r =>
      val (i, j, v) = (r.getInt(0), r.getInt(1), BigInt(r.getLong(2)))
      g(i)(j) = v
      g(j)(i) = v
    }
    var v = Array.fill(dims)(BigInt(65536))
    for (_ <- 0 until rounds) {
      val w = Array.tabulate(dims) { i =>
        var s = BigInt(0)
        var j = 0
        while (j < dims) { s += g(i)(j) * v(j); j += 1 }
        s
      }
      val scale = w.map(_.abs).max
      require(scale > 0, "degenerate gram matrix: zero direction")
      v = w.map(x => x * 65536 / scale)
    }
    val vLit = typedlit(v.map(_.toLong).toSeq)
    rows.select(col("vec_id"), col("label"),
      Similarity.intDot(col("q"), vLit).as("proj"))
  }
}
