package graft.domain

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's emotion-pipeline data model (SURVEY.md §1) rebuilt
  * over the deterministic testdata tables.
  *
  * The reference stores a 6-dimension emotion vector per episode
  * (episode_emotion_table, Scraper.py:313) and per strain
  * (strain_review_table, Scraper.py:382), laid out WIDE — one
  * (label, score) column pair per emotion. Here:
  *
  *  - "episodes" are the first 41 orders (the reference has 41 TV
  *    episodes), "strains" the first 278 parts (278 strain rows in the
  *    shipped DB) — same cardinalities, deterministic selection.
  *  - scores are synthesized with exact integer arithmetic and a
  *    power-of-two denominator: `((id*p + c) % 1024) / 1024.0`. Every
  *    score is an exact binary fraction, so sums/averages are exact in
  *    IEEE double regardless of partition order — Spark and the DuckDB
  *    oracle agree bit-for-bit.
  *
  * Wide layout mirrors the reference; `long` is the engine's canonical
  * normalization (SURVEY.md §1.5): (id, emotion, score).
  */
object Emotions {
  /** Emotion dimension names, in the reference's enumeration order
    * (Scraper.py:268-270 inserts the ParallelDots JSON map keys). */
  val names: Seq[String] = Seq("happy", "angry", "bored", "fear", "sad", "excited")

  private val primes  = Seq(7, 11, 13, 17, 19, 23)
  private val offsets = Seq(1, 4, 9, 16, 25, 36)

  /** Deterministic synthetic score for emotion k of entity `id`:
    * exact multiple of 1/1024 in [0, 1). */
  def score(id: Column, k: Int): Column =
    ((id * primes(k) + offsets(k)) % 1024) / lit(1024.0)

  /** SQL text of `score` for the DuckDB oracle — identical arithmetic. */
  def scoreSql(idExpr: String, k: Int): String =
    s"(($idExpr * ${primes(k)} + ${offsets(k)}) % 1024) / 1024.0"

  /** Adds the 6 wide score columns named after `names` to `df`. */
  def withScores(df: DataFrame, id: Column): DataFrame =
    names.zipWithIndex.foldLeft(df) { case (d, (n, k)) =>
      d.withColumn(n, score(id, k))
    }

  /** 41 "episodes" from orders: (episode_id, episode_name, 6 scores).
    * episode_name embeds ':' and '-' so the F4 conditional-strip
    * operators have something to strip (Scraper.py:227-229). */
  def episodesWide(spark: SparkSession, dir: String): DataFrame = {
    val eps = Tables.orders(spark, dir)
      .orderBy(col("o_orderkey"))
      .limit(41)
      .select(
        col("o_orderkey").as("episode_id"),
        concat(col("o_orderpriority"), lit(": episode "), col("o_orderkey"))
          .as("episode_name"))
    withScores(eps, col("episode_id"))
  }

  /** 278 "strains" from part: (strain_id, strain_name, 6 scores). */
  def strainsWide(spark: SparkSession, dir: String): DataFrame = {
    val st = Tables.part(spark, dir)
      .orderBy(col("p_partkey"))
      .limit(278)
      .select(
        col("p_partkey").as("strain_id"),
        lower(col("p_name")).as("strain_name"))
    withScores(st, col("strain_id"))
  }

  /** Wide → long normalization (SURVEY.md R1): one row per (id, emotion).
    * Uses Spark's native unpivot — the rebuild of the reference's
    * positional unzip of columns [1,3,5,7,9,11] (ipynb cell 12). */
  def toLong(wide: DataFrame, idCols: Seq[String]): DataFrame =
    wide.unpivot(
      idCols.map(col).toArray,
      names.map(col).toArray,
      "emotion", "score")

  /** DuckDB oracle CTE bodies for the same episode/strain tables. */
  def episodesSql: String = {
    val scores = names.zipWithIndex
      .map { case (n, k) => s"${scoreSql("episode_id", k)} AS $n" }
      .mkString(", ")
    s"""SELECT episode_id, episode_name, $scores FROM (
       |  SELECT o_orderkey AS episode_id,
       |         o_orderpriority || ': episode ' || CAST(o_orderkey AS VARCHAR) AS episode_name
       |  FROM orders ORDER BY o_orderkey LIMIT 41)""".stripMargin
  }

  def strainsSql: String = {
    val scores = names.zipWithIndex
      .map { case (n, k) => s"${scoreSql("strain_id", k)} AS $n" }
      .mkString(", ")
    s"""SELECT strain_id, strain_name, $scores FROM (
       |  SELECT p_partkey AS strain_id, lower(p_name) AS strain_name
       |  FROM part ORDER BY p_partkey LIMIT 278)""".stripMargin
  }

  /** Long-form SQL (id, emotion, score) via UNION ALL — the oracle's
    * equivalent of `toLong`. */
  def longSql(wideCte: String, idCols: Seq[String]): String = {
    val ids = idCols.mkString(", ")
    names.map(n => s"SELECT $ids, '$n' AS emotion, $n AS score FROM $wideCte")
      .mkString("\nUNION ALL\n")
  }
}
