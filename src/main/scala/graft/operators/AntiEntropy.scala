package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Anti-entropy reconciliation between two replicas of a keyed table —
  * the Merkle-tree idea flattened to one level and expressed
  * relationally: bucket the key space, exchange ORDER-INDEPENDENT
  * per-bucket fingerprints (a sum of per-row arithmetic hashes — sums
  * commute, so partial aggregation and partition order cannot change
  * a bit), and drill into only the buckets whose fingerprints differ.
  *
  * At 100 TB this is the difference between diffing two full tables
  * (two table-scale shuffles, q116's snapshotDiff) and shipping
  * |buckets| fingerprint rows + re-scanning only the damaged share:
  * with B buckets and d damaged, the detailed diff touches d/B of the
  * data. The fingerprint is deliberately PORTABLE arithmetic (modular
  * integer math on decimal-exact cents, no engine-specific hash
  * function) so a SQL oracle reproduces it exactly.
  */
object AntiEntropy {

  private val Mod = 1000000007L

  /** Per-row arithmetic fingerprint: modular combine of the key and
    * the decimal-exact cent value of `valueCol`. Collision-weak by
    * crypto standards, order-independent by construction — the
    * operator's contract is the RELATIONAL shape; swap in a stronger
    * mixer (xxhash64) when the oracle does not need to replay it. */
  private def rowFp(key: Column, value: Column): Column =
    pmod(key * 131 + pmod(value.cast("decimal(18,2)") * 100, lit(Mod))
      .cast("long") * 7, lit(Mod))

  /** Bucket fingerprints: (bucket, n_rows, fp). */
  def bucketFingerprints(df: DataFrame, keyCol: String, valueCol: String,
      nBuckets: Int): DataFrame =
    df.withColumn("bucket", pmod(col(keyCol), lit(nBuckets.toLong)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        pmod(sum(rowFp(col(keyCol), col(valueCol))), lit(Mod)).as("fp"))

  /** Repair plan: the key-level diff (added/removed/changed vs replica
    * `a`), computed ONLY inside buckets whose (n_rows, fp) disagree.
    * Equal to the full diff by construction — every differing key
    * perturbs its bucket's count or fingerprint (up to the modular
    * collision odds the caller accepted). */
  def repairPlan(a: DataFrame, b: DataFrame, keyCol: String,
      valueCol: String, nBuckets: Int): DataFrame = {
    val fa = bucketFingerprints(a, keyCol, valueCol, nBuckets)
    val fb = bucketFingerprints(b, keyCol, valueCol, nBuckets)
    val damaged = fa.join(fb, Seq("bucket"), "full_outer")
      .filter(!(fa("n_rows") <=> fb("n_rows")) || !(fa("fp") <=> fb("fp")))
      .select("bucket")
    def inDamaged(df: DataFrame) =
      df.withColumn("bucket", pmod(col(keyCol), lit(nBuckets.toLong)))
        .join(broadcast(damaged), Seq("bucket"), "left_semi")
    Cdc.snapshotDiff(inDamaged(a), inDamaged(b), keyCol, Seq("bucket", valueCol))
      .withColumn("bucket",
        pmod(col(keyCol), lit(nBuckets.toLong)))
      .select(col("bucket"), col(keyCol), col("change_type"))
  }
}
