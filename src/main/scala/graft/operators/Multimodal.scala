package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media (image/audio/video) as an
  * opaque `binary` column plus typed metadata, processed in batches via
  * `mapPartitions` — the Scala analogue of a batched decode UDF.
  *
  * The real decode step (JPEG/audio codec) is STUBBED — those native
  * libs are absent here — but everything Spark-level is real: the
  * binary column, the schema, the per-partition batch iteration, and
  * deterministic byte-level feature extraction. Swapping
  * `extractFeatures` for a codec call is a one-function change.
  *
  * Scale notes: binary payloads ride columnar Parquet; mapPartitions
  * keeps one decoder instance per partition (not per row); output is a
  * narrow typed Dataset so downstream pruning works.
  */
object Multimodal {

  /** Typed metadata extracted per media payload. */
  case class MediaMeta(doc_id: Long, byte_len: Int, first_byte: Int,
                       last_byte: Int, checksum: Long)

  /** STUB decode: deterministic byte-level features standing in for a
    * real codec (dimensions, duration, …). */
  private def extractFeatures(id: Long, bytes: Array[Byte]): MediaMeta = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    MediaMeta(id, bytes.length,
      if (bytes.nonEmpty) bytes(0) & 0xff else -1,
      if (bytes.nonEmpty) bytes(bytes.length - 1) & 0xff else -1,
      sum % 65536)
  }

  /** Attach a binary payload column (here: UTF-8 bytes of the text —
    * a deterministic stand-in for stored media blobs). */
  def withPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Batched feature extraction over the binary column. */
  def extract(spark: SparkSession, payloads: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup would initialize a decoder here (once,
        // not per row); the stub needs none.
        it.map { case (id, bytes) => extractFeatures(id, bytes) }
      }
  }
}
