package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of several
  * bucketed dimensions into one scalar sort key so that range
  * partitioning on that key keeps EVERY dimension's extent bounded
  * inside each partition/file — the multi-dimensional data-skipping
  * move (Delta/Iceberg OPTIMIZE ZORDER) that single-column sorting
  * cannot give. Sorting by `o_custkey` alone leaves each file spanning
  * the full price range, so a `price BETWEEN` predicate prunes
  * nothing; Z-ordering on (custkey, price) bounds both min/max ranges
  * per file and parquet row-group stats prune on either predicate.
  *
  * The reference has no layout control at all (SQLite heap tables,
  * Scraper.py:247-251) — this is a pure scale addition: at 100 TB the
  * difference between scanning every file and pruning to the matching
  * Z-range is the whole game for selective queries.
  *
  * Everything here is codegen'd builtins (shiftleft/shiftright/AND/OR
  * folds) — no UDF, no custom expression needed: the interleave is a
  * fixed-depth expression tree evaluated map-side, and the layout step
  * is `repartitionByRange` (sampled range exchange) + an intra-
  * partition sort — no global sort, no driver state.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each dimension column (longs in
    * [0, 2^bits)) into one Z-value: bit i of dim k lands at position
    * i * ndims + k. Fixed-depth OR fold — whole-stage-codegen folds it
    * into straight-line long arithmetic. */
  def interleaveBits(dims: Seq[Column], bits: Int): Column = {
    val d = dims.size
    val terms = for {
      i <- 0 until bits
      (x, k) <- dims.zipWithIndex
    } yield shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), i * d + k)
    terms.reduce(_ bitwiseOR _)
  }

  /** Inverse of [[interleaveBits]] for one dimension `k` — used by the
    * spec to prove the interleave is a bijection. */
  def deinterleaveBits(z: Column, ndims: Int, k: Int, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(z, i * ndims + k).bitwiseAND(lit(1L)), i)
    }.reduce(_ bitwiseOR _)

  /** Quantize a numeric column into [0, 2^bits) buckets over a FIXED
    * [lo, hi) range (data-independent bounds — at corpus scale these
    * come from table stats, not a per-job scan). */
  def quantize(x: Column, lo: Double, hi: Double, bits: Int): Column = {
    val n = 1L << bits
    least(lit(n - 1), greatest(lit(0L),
      floor((x - lo) / ((hi - lo) / n)).cast("long")))
  }

  /** 2-D Hilbert index of (x, y), both longs in [0, 2^bits) — the
    * space-filling curve whose consecutive cells are ALWAYS adjacent
    * (Z-order jumps at quadrant seams), giving measurably tighter
    * per-cell min/max zone maps on range-scanned layouts. Standard
    * bit-level xy2d walk (rx/ry quadrant bits, Gray-coded quadrant
    * order d += s²·((3·rx) xor ry), rotate/flip into the subquadrant
    * frame). The flip uses the s−1−v form (flip within the CURRENT
    * subsquare) rather than the n−1−v whole-square form — both yield
    * a valid Hilbert curve (bijection + unit-step adjacency,
    * spec-verified); the choice only permutes which of the 4 base
    * orientations each subsquare gets. Expressed as ONE aggregate
    * fold over the literal level
    * sequence with a (x, y, d) struct accumulator — the state is a
    * lambda variable, so the expression tree is LINEAR in `bits`
    * (naive unrolling doubles the x/y subtree per level: 2^bits
    * copies, the q202 CollapseProject trap by another road). */
  def hilbertIndex(xCol: Column, yCol: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31)
    val levels = array((0 until bits).reverse.map(b =>
      lit(1L << b)): _*)
    val init = struct(xCol.cast("long").as("x"),
      yCol.cast("long").as("y"), lit(0L).as("d"))
    aggregate(levels, init, (st, s) => {
      val x = st.getField("x")
      val y = st.getField("y")
      val rx = when(x.bitwiseAND(s) > 0, 1L).otherwise(0L)
      val ry = when(y.bitwiseAND(s) > 0, 1L).otherwise(0L)
      val nd = st.getField("d") + s * s * (rx * 3L).bitwiseXOR(ry)
      val nx = when(ry === 0,
        when(rx === 1, s - 1 - y).otherwise(y)).otherwise(x)
      val ny = when(ry === 0,
        when(rx === 1, s - 1 - x).otherwise(x)).otherwise(y)
      struct(nx.as("x"), ny.as("y"), nd.as("d"))
    }, st => st.getField("d"))
  }

  /** Lay `df` out in Z-order: range-partition on the Z-value (sampled
    * ordered exchange — partition i holds Z-keys strictly below
    * partition i+1) and sort within partitions so parquet row groups
    * inherit tight min/max stats on every interleaved dimension. */
  def layout(df: DataFrame, zCol: Column, numPartitions: Int): DataFrame =
    df.repartitionByRange(numPartitions, zCol.asc)
      .sortWithinPartitions(zCol.asc)

  /** Zone-map (min/max data-skipping) audit: model the table as files
    * of `rowsPerFile` consecutive rows in `layoutCol` order, compute
    * each file's zone map over `valueCol`, and report what the
    * predicate `valueCol BETWEEN lo AND hi` would skip — plus the
    * false-positive rows (scanned but non-matching) that measure how
    * well the layout clusters the value. Run it once on the natural
    * order and once on a Z-ordered/sorted layout and the delta IS the
    * layout's skipping value; at corpus scale this is the audit that
    * justifies an OPTIMIZE pass before buying it.
    *
    * Exact and engine-portable: file_id = (rank − 1) DIV rowsPerFile
    * off a deterministic total order (layoutCol must be unique), all
    * counts integer.
    *
    * Scale shape: one range exchange for the file assignment (the
    * [[Curation.globalRowIds]] two-phase scan — no single-partition
    * window), then one hash aggregation per file; output is one row
    * per file, ≤ rows/rowsPerFile.
    *
    * Output: (file_id, n_rows, min_v, max_v, pruned, n_match). */
  def zoneMapAudit(df: DataFrame, layoutCol: String, valueCol: String,
                   rowsPerFile: Long, lo: Long, hi: Long): DataFrame =
    Curation.globalRowIds(
        df.select(col(layoutCol).as("k"), col(valueCol).cast("long").as("v")),
        Seq("k"))
      .select(expr(s"CAST((global_id - 1) DIV $rowsPerFile AS BIGINT)")
        .as("file_id"), col("v"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"),
        sum(when(col("v").between(lo, hi), 1L).otherwise(0L)).as("n_match"))
      .withColumn("pruned", col("max_v") < lo || col("min_v") > hi)
      .select(col("file_id"), col("n_rows"), col("min_v"), col("max_v"),
        col("pruned"), col("n_match"))
}
