package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter
  * 1969) — the decision-theoretic framework behind every serious
  * entity-resolution system: candidate pairs from BLOCKING, per-field
  * agreement/disagreement LOG-ODDS WEIGHTS (w_a = ln(m/u) for
  * agreement, ln((1−m)/(1−u)) for disagreement, fitted by EM out of
  * band), a summed match score, and a two-threshold decision into
  * match / possible (clerical review) / non-match.
  *
  * This operator takes the weights as INTEGER MILLI-UNITS (score =
  * Σ weights in thousandths of a ban/nat — whichever base the fit
  * used; the decision only needs ordering and thresholds, so the
  * base never matters). All-integer end to end: no doubles anywhere
  * in scoring, so the scoreboard is bit-stable across engines (the
  * q201 convention).
  *
  * Comparison-vector convention: both inputs must be pre-projected to
  * carry the SAME field-column names; a field agrees iff the two
  * values are equal and non-null — a NULL on either side scores the
  * disagreement weight (treat "missing ⇒ no information" by giving
  * that field wDisagree = 0 in the caller's weight table, the
  * standard FS practice).
  *
  * Scale shape: ONE equi-join on the blocking key(s) — candidate
  * count is Σ_b |A_b|·|B_b|, never |A|·|B|; a hot block is the skew
  * risk and takes the standard salting/AQE treatment, not a code
  * change here. Scoring is map-side arithmetic on the joined row;
  * the top-k publication is the ordered-limit the optimizer already
  * turns into per-partition limits.
  */
object RecordLinkage {

  /** One comparison field: the shared column name and its
    * agreement/disagreement weights in milli-units. */
  final case class Field(name: String, wAgree: Long, wDisagree: Long)

  /** Score blocked candidate pairs.
    *
    * `a`/`b` must carry `aId`/`bId`, every `blockCols` column, and
    * every `fields(_).name` column. Decision: score ≥ upperMilli ⇒
    * 'match'; ≥ lowerMilli ⇒ 'possible'; else 'non_match'.
    *
    * Output: (a_id, b_id, agree_<field>… , score_milli, decision). */
  def fellegiSunter(a: DataFrame, aId: String,
                    b: DataFrame, bId: String,
                    blockCols: Seq[String], fields: Seq[Field],
                    upperMilli: Long, lowerMilli: Long): DataFrame = {
    require(fields.nonEmpty && upperMilli >= lowerMilli)
    val aSide = a.select((col(aId).as("a_id") +:
      blockCols.map(col)) ++
      fields.map(f => col(f.name).as(s"a_${f.name}")): _*)
    val bSide = b.select((col(bId).as("b_id") +:
      blockCols.map(col)) ++
      fields.map(f => col(f.name).as(s"b_${f.name}")): _*)
    val joined = aSide.join(bSide, blockCols)
    val withAgree = fields.foldLeft(joined) { (d, f) =>
      d.withColumn(s"agree_${f.name}",
        coalesce(col(s"a_${f.name}") === col(s"b_${f.name}"), lit(false)))
    }
    val score = fields.map(f =>
      when(col(s"agree_${f.name}"), f.wAgree).otherwise(f.wDisagree))
      .reduce(_ + _)
    withAgree
      .withColumn("score_milli", score.cast("long"))
      .withColumn("decision",
        when(col("score_milli") >= upperMilli, "match")
          .when(col("score_milli") >= lowerMilli, "possible")
          .otherwise("non_match"))
      .select(col("a_id") +: col("b_id") +:
        fields.map(f => col(s"agree_${f.name}")) :+
        col("score_milli") :+ col("decision"): _*)
  }
}
