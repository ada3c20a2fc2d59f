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
  /** Pre-aggregation register rows (grp, register, rho) — the pure
    * per-row half of [[hllRegisters]], shared with the STREAMING
    * register maintenance (q272: the same exprs run under a streaming
    * groupBy-max, so batch and stream sketch states are identical by
    * construction). */
  def hllRegisterRows(df: DataFrame, groupCol: String, keyCol: String,
                      m: Int): DataFrame = {
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
  }

  def hllRegisters(df: DataFrame, groupCol: String, keyCol: String,
                   m: Int = 64): DataFrame =
    hllRegisterRows(df, groupCol, keyCol, m)
      .groupBy(col("grp"), col("register"))
      .agg(max(col("rho")).cast("long").as("max_rho"))

  /** Shared quadratic-PRF bit position for the Bloom family: row-j
    * hash of an integral key, folded to [0, mBits). Same affine-then-
    * quadratic shape (and per-row constant schedule) as
    * [[cmRegisters]] — one PRF family across the sketch suite keeps
    * the oracle replay uniform. */
  private[operators] def bloomBit(k: Column, j: Int, mBits: Int): Column = {
    val P = 1000000007L
    val h1 = pmod(k * (1000003L + 97L * j) + (12345L + 1013L * j), lit(P))
    pmod(h1 * h1 + (17L + 29L * j), lit(P)) % mBits
  }

  /** Per-group BLOOM filter registers (Bloom 1970) — the membership
    * twin of [[hllRegisters]]/[[cmRegisters]]: publish the canonical
    * mergeable state (Bloom filters merge by bitwise OR = set union
    * of the published bit positions; membership test = all `depth`
    * bits present, one-sided: no false negatives), built from the
    * quadratic PRF family so every bit is integer-exact and
    * oracle-replayable.
    *
    * Scale shape: map-only depth-fold explode, then ONE map-side-
    * combined DISTINCT on (group, bit) — partials are at most mBits
    * rows per partition regardless of input size, the mergeable-
    * sketch exchange. Sparse convention: unset bits are absent rows.
    * Output: (grp, bit), one row per set bit. */
  def bloomRegisters(df: DataFrame, groupCol: String, keyCol: String,
                     mBits: Int = 512, depth: Int = 3): DataFrame = {
    require(mBits >= 2 && depth >= 1, s"bad Bloom shape: $depth x $mBits")
    df.select(col(groupCol).as("grp"), col(keyCol).cast("long").as("k"))
      .select(col("grp"), explode(array((0 until depth).map(j =>
        bloomBit(col("k"), j, mBits)): _*)).as("bit"))
      .distinct()
  }

  /** Bloom-filter semi-join reduction — the runtime-filter pattern
    * (Spark's own InjectRuntimeFilter / the classic semi-join
    * reduction of Bernstein & Chiu 1981) hand-rolled portably: build
    * a Bloom filter over the (small, filtered) build side's keys,
    * prune the probe side MAP-SIDE with it, and only the surviving
    * candidates pay the exact semi-join. Published as an audit frame
    * so the Bloom arithmetic itself is oracle-checked: per group,
    * probe rows / Bloom candidates / exact matches / false positives.
    *
    * Correctness lean: Bloom filters have NO false negatives, so the
    * exact join over candidates equals the exact join over the full
    * probe side — the reduction changes cost, never the answer
    * (BloomReduceSpec pins this against the unfiltered join).
    *
    * Scale shape: the build side collapses to mBits/64 packed 64-bit
    * words via one bounded aggregation (≤ mBits/64 rows cross the
    * wire); the word array ships as a broadcast-sized literal — the
    * same state Spark's runtime filter ships — so the probe-side
    * membership test is MAP-ONLY (no join, no shuffle on the 100 TB
    * side); only candidates (a false-positive-rate fraction of the
    * probe) enter the exact semi-join, whose build side AQE
    * broadcasts. Driver state is mBits/64 longs by construction
    * (4096 bits = 64 longs), documented at the collect site. */
  def bloomSemiReduceStats(probe: DataFrame, probeKey: String,
      grpCol: String, build: DataFrame, buildKey: String,
      mBits: Int = 16384, depth: Int = 3): DataFrame = {
    require(mBits >= 64 && mBits % 64 == 0 && depth >= 1,
      s"bad Bloom shape: $depth x $mBits")
    val keys = build.select(col(buildKey).cast("long").as("k")).distinct()
    val nWords = mBits / 64
    // bounded collect: exactly <= nWords rows (one per packed word),
    // independent of build-side cardinality — the runtime-filter state
    val packed = keys
      .select(explode(array((0 until depth).map(j =>
        bloomBit(col("k"), j, mBits)): _*)).as("bit"))
      .distinct()
      .groupBy(expr("bit DIV 64").as("w"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT)))")
        .as("bits"))
      .collect()
    val words = Array.fill(nWords)(0L)
    packed.foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    val wordsLit = typedLit(words.toSeq)
    val probeP = probe
      .select(col(grpCol).as("grp"), col(probeKey).cast("long").as("k"))
      .withColumn("bits", array((0 until depth).map(j =>
        bloomBit(col("k"), j, mBits)): _*))
      .withColumn("pass", (0 until depth).map { j =>
        element_at(wordsLit, expr(s"CAST(bits[$j] DIV 64 AS INT)") + 1)
          .bitwiseAND(expr(
            s"shiftleft(CAST(1 AS BIGINT), CAST(bits[$j] % 64 AS INT))"))
          .=!=(0L)
      }.reduce(_ && _))
      .drop("bits")
    val perGrp = probeP.groupBy("grp")
      .agg(count(lit(1)).as("n_probe"),
        sum(col("pass").cast("long")).as("n_candidates"))
    val matched = probeP.filter(col("pass"))
      .join(keys, Seq("k"), "left_semi")
      .groupBy("grp").agg(count(lit(1)).as("n_matched"))
    perGrp.join(matched, Seq("grp"), "left")
      .na.fill(0L, Seq("n_matched"))
      .withColumn("n_false_pos", col("n_candidates") - col("n_matched"))
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

  /** Count-min JOIN-SIZE estimation (Alon–Gibbons–Matias–Szegedy by
    * way of Cormode & Muthukrishnan §4.2; Rusu & Dobra 2007 survey):
    * |A ⋈ B on key| = Σ_k f_A(k)·f_B(k), the inner product of the two
    * frequency vectors — estimated per sketch row as the inner
    * product of the two rows' counters, Σ_b cA[j,b]·cB[j,b], and
    * combined by MIN over rows (each row over-estimates by hash
    * collisions, never under-estimates). The cardinality-estimation
    * primitive a cost-based planner runs BEFORE a 100 TB join: two
    * sketch scans instead of the join itself.
    *
    * Published as an audit row: (est_join_size, exact_join_size,
    * over_ppm) — the exact side is computed too (test-SF-affordable)
    * so the oracle pins the one-sided-ness. All-integer; counter
    * products stay in bigints for any side below ~3e9 rows per key
    * domain (document the bound at bigger scales).
    *
    * Scale shape: the two [[cmRegisters]] builds are mergeable-sketch
    * exchanges (≤ depth·width partials per partition); the sketch
    * join is depth·width × depth·width at most — constant-size — and
    * the MIN fold is over `depth` rows. The exact count pays one real
    * equi-join (drop it in production; it exists here to publish the
    * audit). */
  def cmJoinSizeEstimate(a: DataFrame, aKey: String,
                         b: DataFrame, bKey: String,
                         depth: Int = 4, width: Int = 64): DataFrame = {
    val cA = cmRegisters(a.select(col(aKey)).withColumn("g", lit(0)),
      "g", aKey, depth, width)
      .select(col("sketch_row"), col("bucket"), col("cnt").as("ca"))
    val cB = cmRegisters(b.select(col(bKey)).withColumn("g", lit(0)),
      "g", bKey, depth, width)
      .select(col("sketch_row"), col("bucket"), col("cnt").as("cb"))
    // per-row inner products; a row with zero overlapping buckets has
    // inner product 0, so re-anchor on the full row domain
    val rowDom = a.sparkSession.range(depth)
      .select(col("id").cast("int").as("sketch_row"))
    val perRow = rowDom.join(
        cA.join(cB, Seq("sketch_row", "bucket"))
          .groupBy("sketch_row")
          .agg(sum(col("ca") * col("cb")).as("prod")),
        Seq("sketch_row"), "left")
      .na.fill(0L, Seq("prod"))
    val exact = a.select(col(aKey).cast("long").as("k"))
      .join(b.select(col(bKey).cast("long").as("k")), Seq("k"))
      .agg(count(lit(1)).as("exact_join_size"))
    perRow.agg(min(col("prod")).as("est_join_size"))
      .crossJoin(broadcast(exact))
      .withColumn("over_ppm", expr(
        """CAST(CASE WHEN exact_join_size > 0
           THEN 1000000 * est_join_size DIV exact_join_size
           ELSE CAST(0 AS BIGINT) END AS BIGINT)"""))
  }

  /** HyperBall (Boldi & Vigna 2013) — per-node BALL-SIZE estimates at
    * every radius t ≤ `rounds`, the trillion-edge
    * distance-distribution algorithm: give each node an HLL counter
    * seeded with itself ([[hllRegisters]] state), then t times merge
    * each node's counter with its out-neighbors' (register-wise MAX —
    * the HLL union). c_t(v) then estimates |{u : dist(v,u) ≤ t}|,
    * from which neighborhood functions, effective diameter, and
    * harmonic centrality all fall out — graph distance metrics
    * WITHOUT any all-pairs computation.
    *
    * Scale shape: per round ONE equi-join (registers ⋈ edges on the
    * neighbor end) + one groupBy-MAX on (node, register) — state is
    * |V|·m rows regardless of edge count, the mergeable-sketch
    * exchange; lineage cut each round. Published per (node, t) as
    * exact sufficient statistics (the q233/q201 stance): n_regs_set,
    * the integer inverse-power sum Σ 2^(25−rho) (unset registers
    * contribute 2^25), and the alpha-free raw harmonic estimate
    * m²·2^25·1000 DIV inv_sum in milli units — callers multiply the
    * standard alpha_m bias constant; the oracle replays every bit.
    *
    * @param edges (src, dst) directed; balls follow OUT-edges
    * @return (node, t, n_regs_set, inv_sum, raw_est_milli) for
    *         t = 0..rounds */
  /** Accuracy audit of the portable HLL itself — per group the EXACT
    * distinct count beside the register-derived raw harmonic estimate
    * (m²·2^25·1000 DIV inv_sum, alpha-free milli units) and the
    * signed error of the alpha-corrected estimate in ppm of truth
    * (alpha_16 = 0.673 → est = 673·raw_milli/1000² at m = 16; the
    * division chain stays integer DIV throughout). The closing audit
    * of the sketch family: q233 publishes the state, q268 proves
    * mergeability, this row quantifies the estimator the state
    * implies — the per-release sanity gate before anyone trusts
    * sketch-derived dashboards.
    *
    * Output: (grp, exact_distinct, n_regs_set, inv_sum,
    * raw_est_milli, est, err_ppm). */
  def hllAccuracy(df: DataFrame, groupCol: String, keyCol: String,
                  m: Int = 16): DataFrame = {
    require(m == 16, "alpha constant below is m = 16's (0.673)")
    val exact = df.groupBy(col(groupCol).as("grp"))
      .agg(countDistinct(col(keyCol)).as("exact_distinct"))
    val stats = hllRegisters(df, groupCol, keyCol, m)
      .groupBy("grp")
      .agg(count(lit(1)).as("n_regs_set"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), " +
          "CAST(25 - max_rho AS INT))")).as("set_sum"))
      .select(col("grp"), col("n_regs_set"),
        ((lit(m.toLong) - col("n_regs_set")) * (1L << 25)
          + col("set_sum")).as("inv_sum"))
      .withColumn("raw_est_milli",
        expr(s"${m.toLong * m * 1000 * (1L << 25)} div inv_sum"))
    exact.join(stats, Seq("grp"))
      .withColumn("est", expr("(673 * raw_est_milli) div 1000000"))
      .withColumn("err_ppm", expr(
        "(1000000 * (est - exact_distinct)) div exact_distinct"))
  }

  /** Harmonic-centrality estimates from [[hyperBall]] (Boldi & Vigna
    * 2014): harmonic(v) = Σ_{u≠v} 1/d(v,u) ≈ Σ_t (|ball_t| −
    * |ball_{t−1}|)/t — the ball-size DELTAS at each radius weighted
    * by 1/t. Published in milli units from the raw (alpha-free)
    * HyperBall estimates: the standard centrality-at-scale derivation
    * that never runs an SSSP per node. Negative deltas (estimator
    * jitter between radii) clamp to 0 — ball sizes are monotone in
    * truth, so the clamp only removes noise.
    *
    * Output: (node, harmonic_milli) — exact integer arithmetic over
    * the q262-published sufficient statistics. */
  def harmonicCentrality(edges: DataFrame, rounds: Int,
                         m: Int = 16): DataFrame = {
    val hb = hyperBall(edges, rounds, m)
      .select(col("node"), col("t"), col("raw_est_milli"))
    val prev = hb.select(col("node"), (col("t") + 1).as("t"),
      col("raw_est_milli").as("prev_milli"))
    hb.join(prev, Seq("node", "t"))
      .select(col("node"), col("t"),
        greatest(col("raw_est_milli") - col("prev_milli"), lit(0L))
          .as("delta_milli"))
      .groupBy("node")
      .agg(sum(expr("delta_milli div t")).as("harmonic_milli"))
  }

  def hyperBall(edges: DataFrame, rounds: Int, m: Int = 16): DataFrame = {
    require(rounds >= 1, s"hyperBall: rounds must be >= 1, got $rounds")
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    var regs = hllRegisters(
      nodes.select(col("node").as("grp"), col("node").as("key")),
      "grp", "key", m).localCheckpoint()
    def stats(t: Int): DataFrame = regs.groupBy(col("grp").as("node"))
      .agg(count(lit(1)).as("n_regs_set"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), " +
          "CAST(25 - max_rho AS INT))")).as("set_sum"))
      .select(col("node"), lit(t).as("t"), col("n_regs_set"),
        ((lit(m.toLong) - col("n_regs_set")) * (1L << 25)
          + col("set_sum")).as("inv_sum"))
      .withColumn("raw_est_milli",
        // single pre-multiplied literal: a "a * b" SQL string with
        // both factors int-sized would multiply as INT and overflow
        expr(s"${m.toLong * m * 1000 * (1L << 25)} div inv_sum"))
    var out = stats(0)
    for (t <- 1 to rounds) {
      val fromNbrs = e
        .join(regs.withColumnRenamed("grp", "dst"), "dst")
        .select(col("src").as("grp"), col("register"), col("max_rho"))
      regs = regs.union(fromNbrs)
        .groupBy("grp", "register").agg(max("max_rho").as("max_rho"))
        .localCheckpoint()
      out = out.unionByName(stats(t))
    }
    out
  }
}
