package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Isotonic (PAV) score calibration — the eval-stack step between a
  * model score and a usable probability: fit the monotone-
  * nondecreasing rate curve closest (L2) to the observed per-bin
  * positive rates (Ayer et al. 1955 pool-adjacent-violators; the
  * method behind sklearn's IsotonicRegression and the classic
  * calibration of ranking scores).
  *
  * Scale contract: the corpus reduces to BINNED sufficient statistics
  * first — one groupBy(bin) → (n, pos) shuffle over at most `maxBins`
  * rows — and PAV runs on the DRIVER over that bounded table (the
  * codebook/coreset convention: the data-sized pass is one
  * aggregation; the O(bins) sequential algorithm never sees rows).
  *
  * Integer contract: violations compare pooled rates by cross-
  * multiplication (pos_i·n_j > pos_j·n_i — exact, no division), and
  * the published calibrated value is cal_ppm = 10⁶·pos_blk div n_blk.
  * PAV's fitted VALUES are the unique isotonic optimum (merge order
  * never matters, and equal-rate blocks yield the same fitted value
  * whether or not they pool), so cal_ppm replays identically under
  * any correct PAV — the oracle uses leftmost-merge rounds.
  *
  * Output per input bin: (bin, n, pos, cal_ppm), cal_ppm monotone
  * nondecreasing in bin. */
object Calibration {

  def isotonicCalibrate(df: DataFrame, binCol: String, label: Column,
                        maxBins: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bins = df.groupBy(col(binCol).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"), sum(label.cast("long")).as("pos"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(bins.length <= maxBins,
      s"isotonicCalibrate: ${bins.length} bins exceed maxBins=$maxBins")
    // stack PAV: push each bin, merge while the top pair violates
    // monotonicity (strict cross-multiplied compare)
    final case class Blk(lo: Long, hi: Long, n: Long, pos: Long)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Blk]
    for ((b, n, pos) <- bins) {
      stack += Blk(b, b, n, pos)
      var merging = true
      while (merging && stack.length >= 2) {
        val t = stack(stack.length - 1)
        val p = stack(stack.length - 2)
        if (p.pos * t.n > t.pos * p.n) {
          stack.remove(stack.length - 1)
          stack(stack.length - 1) =
            Blk(p.lo, t.hi, p.n + t.n, p.pos + t.pos)
        } else merging = false
      }
    }
    val out = for {
      (b, n, pos) <- bins
      blk = stack.find(k => b >= k.lo && b <= k.hi).get
    } yield (b, n, pos, 1000000L * blk.pos / blk.n)
    out.toSeq.toDF("bin", "n", "pos", "cal_ppm")
  }
}
