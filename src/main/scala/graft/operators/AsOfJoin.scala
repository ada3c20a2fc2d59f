package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — the temporal lookup Spark
  * has no built-in operator for (SURVEY.md custom-operator ladder,
  * tier (a): composed from built-ins).
  *
  * Implementation: union-tag + ordered window. Right rows are tagged
  * and interleaved with left rows in one (key, ts) sort; a
  * last_value(..., ignoreNulls) running window then carries the most
  * recent right payload forward to each left row. ONE shuffle + sort,
  * strictly linear in |L|+|R| — never the range-join row explosion of
  * the naive `l.ts >= r.ts` theta join. At same-instant ties the right
  * row sorts first (isRight desc), giving `<=` semantics.
  *
  * The right side must be unique per (key, ts) for determinism —
  * pre-dedupe it (e.g. keep the max id) if it isn't.
  */
object AsOfJoin {

  /** left:  (key, ts, ...leftCols)
    * right: (key, ts, ...payloadCols) — unique per (key, ts)
    * Output: left rows + `asof_<payload>` columns (null if no earlier
    * right row exists). */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = payloadCols.foldLeft(
      left.withColumn("_is_right", lit(0))) { (d, c) =>
      d.withColumn(s"_p_$c", lit(null).cast(right.schema(c).dataType))
    }
    val rTagged = right.select(
      (Seq(col(key), col(ts), lit(1).as("_is_right")) ++
        payloadCols.map(c => col(c).as(s"_p_$c"))): _*)
    val unioned = lTagged
      .select((Seq(col(key), col(ts), col("_is_right")) ++
        payloadCols.map(c => col(s"_p_$c")) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => col(c))): _*)
      .unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("_is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"asof_$c",
        last(col(s"_p_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("_is_right") === 0)
      .select((leftCols.map(col) ++
        payloadCols.map(c => col(s"asof_$c"))): _*)
  }
}
