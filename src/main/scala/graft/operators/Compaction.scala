package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Small-file compaction — the table-maintenance chore every long-
  * running 100 TB lake needs: streaming sinks and incremental batches
  * leave thousands of KB-sized parquet files per partition, and scan
  * planning degrades to file-listing overhead (one task per tiny
  * file). Compaction rewrites a table directory into files near a
  * target size, preserving rows exactly.
  *
  * Sizing is data-driven, not guessed: the current on-disk byte size
  * comes from the file index (a metadata listing, no data read), and
  * `ceil(bytes / targetBytes)` fixes the output file count. A
  * `repartition(n)` round-robin exchange balances rows; for sorted/
  * z-ordered tables use `repartitionByRange` on the layout key
  * instead ([[ZOrder.layout]]'s convention) so compaction preserves
  * clustering.
  */
object Compaction {

  /** On-disk byte size of a table directory via the catalog file
    * index (metadata only). */
  def tableBytes(spark: SparkSession, dir: String): Long = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(new org.apache.hadoop.fs.Path(dir)).getLength
  }

  /** Rewrite `inputDir` (parquet) into `outputDir` with files sized
    * near `targetBytes`. Returns the chosen file count. */
  def compact(spark: SparkSession, inputDir: String, outputDir: String,
      targetBytes: Long): Int = {
    val bytes = tableBytes(spark, inputDir)
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inputDir)
      .repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(outputDir)
    n
  }
}
