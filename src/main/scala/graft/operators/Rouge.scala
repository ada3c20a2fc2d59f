package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ROUGE-L (Lin 2004) — the LCS-based summarization/near-dup metric,
  * the order-sensitive twin of the n-gram-precision BLEU (q260): with
  * L = |LCS(candidate, reference)| and β = 1,
  *
  *   P = L/n_a, R = L/n_b, F1 = 2PR/(P+R) = 2L/(n_a + n_b)
  *
  * — the F1 collapses to one exact rational, published as the single
  * floor 2·10⁶·L div (n_a + n_b).
  *
  * Boundedness contract (the theilSen/holtTrend stance): both sides
  * truncate to the first `cap` tokens (ROUGE-L-cap), so the per-pair
  * DP is O(cap²) constant work — the right shape for scoring millions
  * of pairs (pair-parallel mapPartitions kernel, the codec tier, with
  * the oracle replaying the DP as `cap` unrolled relational rounds
  * and a spec pinning the kernel against a brute-force
  * all-subsequence check on tiny fixtures).
  *
  * Output: (a, b, n_a, n_b, lcs, rouge_l_f1_ppm). */
object Rouge {

  private[graft] def lcsLen(x: Array[String],
                                y: Array[String]): Int = {
    val row = new Array[Int](y.length + 1)
    var i = 0
    while (i < x.length) {
      var prevDiag = 0 // row(j-1) from the previous round
      var j = 1
      while (j <= y.length) {
        val tmp = row(j)
        val ext = if (x(i) == y(j - 1)) prevDiag + 1 else 0
        row(j) = math.max(math.max(row(j), row(j - 1)), ext)
        prevDiag = tmp
        j += 1
      }
      i += 1
    }
    row(y.length)
  }

  /** pairs: (a, b) doc-id pairs; docs: (idCol, textCol). */
  def rougeLPairs(spark: SparkSession, docs: DataFrame,
                  idCol: String, textCol: String, pairs: DataFrame,
                  cap: Int = 40): DataFrame = {
    import spark.implicits._
    val t = docs.select(col(idCol).cast("long").as("id"),
      col(textCol).as("text"))
    pairs.select(col("a").cast("long").as("a"),
        col("b").cast("long").as("b"))
      .join(t.select(col("id").as("a"), col("text").as("ta")), "a")
      .join(t.select(col("id").as("b"), col("text").as("tb")), "b")
      .select(col("a"), col("b"), col("ta"), col("tb"))
      .as[(Long, Long, String, String)]
      .mapPartitions { it =>
        it.map { case (a, b, ta, tb) =>
          def tok(s: String): Array[String] =
            s.toLowerCase.split(" ").filter(_.nonEmpty).take(cap)
          val x = tok(ta); val y = tok(tb)
          val l = lcsLen(x, y).toLong
          val f1 = if (x.length + y.length == 0) 0L
            else 2000000L * l / (x.length + y.length)
          (a, b, x.length.toLong, y.length.toLong, l, f1)
        }
      }
      .toDF("a", "b", "n_a", "n_b", "lcs", "rouge_l_f1_ppm")
  }
}
