package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's matching pipelines (SURVEY.md §2.9, ipynb cells 12/15),
  * de-correlated into real Spark plans.
  *
  * Inputs are LONG-form emotion tables: (episode_id, emotion, score) and
  * (strain_id, emotion, score), plus name dimensions.
  */
object Matching {

  /** Per-entity top-2 emotions → one row per entity:
    * (id, emo1, emo2, score1, score2). Tie-break: score desc, emotion asc.
    * Rebuild of the per-row dict sort (ipynb cell 12 lines 146-155). */
  def top2Emotions(long: DataFrame, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("emotion").asc)
    long.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy(col(idCol))
      .agg(
        max(when(col("rn") === 1, col("emotion"))).as("emo1"),
        max(when(col("rn") === 2, col("emotion"))).as("emo2"),
        max(when(col("rn") === 1, col("score"))).as("score1"),
        max(when(col("rn") === 2, col("score"))).as("score2"))
  }

  /** Cell-15 reverse matching, de-correlated (J6): for each LEFT entity
    * (its top-2 emotions already computed), pick the RIGHT entity by the
    * two-stage nested-limit rule: restrict to the top-`poolSize` right
    * entities by the left's emo1 score, then argmax by emo2 score.
    * Pure joins + windows — one shuffle per window, no driver loop, and
    * the right side is joined long-form on the 6-value emotion key
    * (broadcastable: the per-emotion score table is |right| rows).
    *
    * Unlike cell 12 there is no delete: right entities may repeat.
    */
  def rankMatch(leftTop2: DataFrame, leftId: String,
                rightLong: DataFrame, rightId: String,
                poolSize: Int): DataFrame = {
    // score of every right entity on the left's emo1 → pool of top-N
    val s1 = rightLong.withColumnRenamed("emotion", "emo1")
      .withColumnRenamed("score", "s1")
    val pool = leftTop2.join(s1, Seq("emo1"))
    val w1 = Window.partitionBy(col(leftId))
      .orderBy(col("s1").desc, col(rightId).asc)
    val top = pool.withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= poolSize)
    // within pool: argmax by emo2 score
    val s2 = rightLong.withColumnRenamed("emotion", "emo2")
      .withColumnRenamed("score", "s2")
    val w2 = Window.partitionBy(col(leftId))
      .orderBy(col("s2").desc, col(rightId).asc)
    top.join(s2, Seq("emo2", rightId))
      .withColumn("r2", row_number().over(w2))
      .filter(col("r2") === 1)
      .drop("r1", "r2", "rn")
  }

  /** Cell-12 greedy matching-without-replacement (SURVEY.md §2.9):
    * episodes IN ID ORDER each claim their best strain under the K1
    * two-stage rule; a claimed strain is deleted from the pool (the
    * reference's `DELETE FROM strain_review_table` inside the loop).
    * Iteration i depends on 1..i-1 — inherently sequential.
    *
    * Scale design: ONE distributed job computes, per episode, its
    * top-(poolSize + #episodes) strains by emo1 score (that superset
    * provably contains the greedy pick: at most #episodes-1 strains can
    * have been consumed before any step, so the surviving top-poolSize
    * pool is always inside the collected top-(poolSize+#episodes-1)).
    * The collected matrix is (41 × ~141) rows — the O(episodes²·pool)
    * fold then runs on the driver in microseconds. Strain cardinality
    * can be 100 TB-wide; only episodes×(pool+episodes) rows ever reach
    * the driver.
    */
  def greedyMatch(spark: SparkSession,
                  epTop2: DataFrame, strainLong: DataFrame,
                  poolSize: Int): DataFrame = {
    import spark.implicits._

    val nEpisodes = epTop2.count().toInt
    val fetch = poolSize + nEpisodes

    val s1 = strainLong.withColumnRenamed("emotion", "emo1")
      .withColumnRenamed("score", "s1")
    val s2 = strainLong.withColumnRenamed("emotion", "emo2")
      .withColumnRenamed("score", "s2")
    val w1 = Window.partitionBy($"episode_id")
      .orderBy($"s1".desc, $"strain_id".asc)
    // candidate matrix: per episode the top-`fetch` strains by emo1,
    // each carrying its emo2 score
    val candidates = epTop2.join(s1, Seq("emo1"))
      .withColumn("r1", row_number().over(w1))
      .filter($"r1" <= fetch)
      .join(s2, Seq("emo2", "strain_id"))
      .select($"episode_id", $"strain_id", $"r1", $"s1", $"s2")
      .as[(Long, Long, Int, Double, Double)]
      .collect()
      .groupBy(_._1)

    val order = epTop2.select($"episode_id").as[Long].collect().sorted
    val taken = scala.collection.mutable.Set[Long]()
    val picks = order.flatMap { ep =>
      val pool = candidates.getOrElse(ep, Array.empty)
        .sortBy(c => (c._3, c._2))           // r1 = emo1 score desc, strain asc
        .iterator.filterNot(c => taken(c._2))
        .take(poolSize)                       // surviving two-stage pool
        .toVector
      if (pool.isEmpty) None
      else {
        val best = pool.minBy(c => (-c._5, c._2)) // emo2 desc, strain asc
        taken += best._2
        Some((ep, best._2, best._4, best._5))
      }
    }
    spark.createDataFrame(picks.toSeq)
      .toDF("episode_id", "strain_id", "score1", "score2")
  }
}
