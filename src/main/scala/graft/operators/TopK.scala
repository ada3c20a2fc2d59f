package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sort / limit / top-k operators (SURVEY.md §2.3).
  *
  * K1 — the reference's analytical heart — is a TWO-STAGE nested-limit
  * select (Project_Overview.ipynb cell 12, raw lines 160/165):
  *
  *   SELECT * FROM (SELECT * FROM t ORDER BY e1 DESC LIMIT 100)
  *   ORDER BY e2 DESC LIMIT 1
  *
  * which is NOT `ORDER BY e1 DESC, e2 DESC LIMIT 1`: it restricts to the
  * top-100 by e1, then takes the argmax by e2 *within that pool*. Both
  * stages get explicit total-order tie-breaks (the reference relied on
  * SQLite's unspecified row order — SURVEY.md §7).
  *
  * At scale both stages are `TakeOrderedAndProject` (per-partition
  * top-k, then a k-row merge on the driver) — no global sort, no big
  * shuffle, survives arbitrarily wide inputs.
  */
object TopK {

  /** K1: top-`poolSize` by `first` ordering, then top-`take` by `second`. */
  def nestedLimit(df: DataFrame, poolSize: Int, first: Seq[Column],
                  second: Seq[Column], take: Int): DataFrame =
    df.orderBy(first: _*).limit(poolSize).orderBy(second: _*).limit(take)

  /** K4 canonical form: per-group top-n by `order` within `partition`.
    * Window + row_number: partial sort inside each hash partition, no
    * driver involvement — the scalable form of the reference's per-row
    * Python dict sort (ipynb cell 12 lines 146-155). */
  def perGroupTopN(df: DataFrame, partition: Seq[Column],
                   order: Seq[Column], n: Int,
                   rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= n)
  }
}
