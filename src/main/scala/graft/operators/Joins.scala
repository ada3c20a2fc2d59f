package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join layer (SURVEY.md §2.4). The reference performs every join
  * procedurally — a correlated point lookup inside a Python loop
  * (e.g. `WHERE episode_id={num}` for num in 1..41, ipynb cell 12).
  * Here each loop+lookup is one declarative join, broadcast where the
  * dimension side is small, shuffle-hash/sort-merge otherwise — the
  * 100 TB-safe shape.
  */
object Joins {

  /** J1/J3/J5: equi join with an explicitly broadcast dimension side.
    * Catalyst would often pick this itself under the autoBroadcast
    * threshold; the hint pins it for dimension tables we KNOW are
    * small (region: 5 rows, nation: 25, emotion: 6). */
  def broadcastDim(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim), keys, "inner")

  /** J4: insert-if-absent (Scraper.py:409-412) as a batch upsert:
    * rows of `existing` whose key collides with an incoming row are
    * replaced; genuinely new incoming rows are appended. Pure
    * anti-join + union — no in-place mutation, idempotent, and at
    * scale both sides shuffle once on the key. */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    incoming.unionByName(existing.join(incoming, keys, "left_anti"))

  /** P3/J4 detection half: incoming rows NOT already present. */
  def newRows(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(existing, keys, "left_anti")
}
