package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable-arithmetic distinct-count sketch state — the register
  * array of a HyperLogLog (Flajolet et al. 2007) built from scratch
  * with the repo's PRF hash family, so the ENTIRE sketch state is
  * integer-exact and oracle-replayable (the q132 convention applied
  * to cardinality sketches; the built-in HLL++ estimate is audited
  * separately by q49's error-bound check — this operator exposes the
  * mergeable state itself).
  *
  * Register construction: h = (((key·1000003 + 12345) mod P)² + 17)
  * mod P with P = 10⁹+7 — affine then QUADRATIC. The quadratic round
  * is essential and the reason this differs from the affine-only
  * q132 PRF family: any composition of affine rounds mod P is still
  * affine (a·c·k + …), i.e. an arithmetic progression on sequential
  * keys, whose leading-zero ranks are wildly non-geometric (measured
  * 10× estimate inflation single-round, 2× two-round); squaring
  * breaks the linearity, and the resulting estimates match an MD5
  * reference hash within noise (209 vs 211 on a 200-key probe).
  * Register = h mod m; w = h div m; rank ρ(w) =
  * (position of the highest set bit from a 24-bit budget): ρ = 1 for
  * w ≥ 2²³ down to 24 for w = 1, and 25 for w = 0 — the standard
  * leading-zero rank, expressed as an integer threshold cascade (no
  * log, no doubles).
  *
  * Why publish registers, not the estimate: the harmonic-mean
  * estimate needs Σ2^−ρ in floating point (engine-local by nature),
  * but registers are the CANONICAL sketch: mergeable (elementwise
  * max), comparable across engines, and any consumer derives the
  * estimate. At 100 TB the register table IS what a distributed
  * count-distinct service ships between stages.
  *
  * Scale shape: one map-side-combined groupBy((group, register)) MAX
  * — partials are m rows per partition regardless of input size, the
  * textbook mergeable-sketch exchange. */
object Sketches {

  /** Per-group HLL registers. df must carry `groupCol` and `keyCol`
    * (integral key). m must be a power of two (register count).
    * Output: (group, register, max_rho) — registers with no key
    * hashed to them are absent (their ρ is the implicit 0; consumers
    * treat missing as zero, exactly how sparse HLL is stored). */
  def hllRegisters(df: DataFrame, groupCol: String, keyCol: String,
                   m: Int = 64): DataFrame = {
    require(m >= 2 && (m & (m - 1)) == 0, s"m must be a power of 2: $m")
    val P = 1000000007L
    val h1 = pmod(col(keyCol).cast("long") * 1000003L + 12345L, lit(P))
    val h = pmod(h1 * h1 + 17L, lit(P))
    val bound = df.select(col(groupCol).as("grp"), h.as("h"))
      .select(col("grp"), (col("h") % m).as("register"),
        expr(s"h DIV $m").as("w"))
    // threshold cascade: rho = 1 at the top bit of the 24-bit budget
    val budget = 24
    val rho = (1 to budget).foldRight(lit(budget + 1): Column) {
      case (r, rest) =>
        when(col("w") >= (1L << (budget - r)), r).otherwise(rest)
    }
    bound.select(col("grp"), col("register"), rho.as("rho"))
      .groupBy(col("grp"), col("register"))
      .agg(max(col("rho")).cast("long").as("max_rho"))
  }

  /** Per-group COUNT-MIN sketch registers (Cormode & Muthukrishnan
    * 2005) — the frequency twin of [[hllRegisters]], same stance:
    * publish the CANONICAL mergeable state (CM sketches merge by
    * elementwise SUM; estimates are min over rows of
    * counter(j, h_j(key)), one-sided: always ≥ the true count), built
    * from the quadratic PRF family so every register is
    * integer-exact and oracle-replayable. Per-row hash constants
    * derive affinely from the row index j (a_j = 1000003+97j,
    * b_j = 12345+1013j, c_j = 17+29j) — each row keeps the quadratic
    * round that [[hllRegisters]] showed is what breaks arithmetic-
    * progression artifacts on sequential keys.
    *
    * Scale shape: the depth-fold fan-out is map-only (explode of a
    * d-element array), and the single exchange is a map-side-combined
    * groupBy((group, row, bucket)) count — partials are at most
    * d·width rows per partition regardless of input size, the
    * mergeable-sketch exchange. Register bound: counts ≤ group size
    * (long). Output: (grp, sketch_row, bucket, cnt); empty buckets
    * are absent (implicit 0, the sparse convention). */
  def cmRegisters(df: DataFrame, groupCol: String, keyCol: String,
                  depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CM shape: $depth x $width")
    val P = 1000000007L
    val rows = df
      .select(col(groupCol).as("grp"), col(keyCol).cast("long").as("k"))
      .select(col("grp"), explode(array((0 until depth).map { j =>
        val h1 = pmod(col("k") * (1000003L + 97L * j) +
          (12345L + 1013L * j), lit(P))
        struct(lit(j).as("sketch_row"),
          (pmod(h1 * h1 + (17L + 29L * j), lit(P)) % width).as("bucket"))
      }: _*)).as("rb"))
      .select(col("grp"), col("rb.sketch_row"), col("rb.bucket"))
    rows.groupBy("grp", "sketch_row", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }
}
