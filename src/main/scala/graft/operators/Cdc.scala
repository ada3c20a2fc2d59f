package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture batch apply: fold an ordered stream of
  * I(nsert)/U(psert)/D(elete) changes into a snapshot — the MERGE INTO
  * semantics every incremental 100 TB pipeline needs (the reference's
  * insert-if-absent upsert, Scraper.py:402-412, is the I/U half; CDC
  * adds deletes and last-writer-wins ordering).
  *
  * Scale shape: one window over the CHANGES keyed by `key` ordered by
  * `seq` descending picks each key's final change (changes partition
  * by key — bounded groups, never a global sort); the snapshot then
  * anti-joins the touched-key set (broadcast when the change batch is
  * small — the steady-state case) and the surviving I/U payloads union
  * in. The snapshot — the 100 TB side — never shuffles.
  */
object Cdc {

  /** @param snapshot current table state: (key, payload...)
    * @param changes  (key, seq, op ∈ I|U|D, payload...) — same payload
    *                 columns as the snapshot
    * @return the new snapshot state */
  def apply(snapshot: DataFrame, changes: DataFrame,
            key: String, seq: String, op: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(seq).desc)
    val last = changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
    val touched = last.select(col(key))
    val survivors = last.filter(col(op) =!= "D")
      .drop(seq, op)
    snapshot.join(broadcast(touched), Seq(key), "left_anti")
      .unionByName(survivors)
  }
}
