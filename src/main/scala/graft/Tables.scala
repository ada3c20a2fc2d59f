package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed readers for the driver-generated parquet test tables
  * (TESTDATA.md). One parquet file per table under `<sfDir>/`.
  *
  * Stands in for the reference's sources: SQLite table scans
  * (Scraper.py:104,179; Project_Overview.ipynb cell 15) and the CSV /
  * JSON fixtures (Scraper.py:197-207, 394-401). At scale these are
  * columnar scans with pushdown; schemas are fixed by the files, never
  * inferred from samples.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Fixture generations have stored events.ts two ways: parquet
    * TIMESTAMP(NANOS) — which Spark 4 only reads via the legacy
    * nanos-as-long conf, so it arrives as a bigint to truncate — and
    * native TIMESTAMP(MICROS) isAdjustedToUTC=false, which arrives as
    * TIMESTAMP_NTZ. Normalize both to session-TZ microsecond
    * timestamps (the session TZ is pinned to UTC everywhere, so the
    * NTZ→LTZ cast is value-preserving and the output parquet type
    * stays the same across fixture generations; the nanos path floor-
    * divides exactly as DuckDB's nanos read does). */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  private def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  def region(s: SparkSession, d: String): DataFrame    = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = read(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = readEvents(s, d)
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
