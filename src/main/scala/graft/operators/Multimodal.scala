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

  /** A decoded image stand-in: dimensions + a fixed-size feature
    * vector. A real pipeline gets these from a JPEG/PNG codec; the
    * stub derives deterministic values from the bytes so the Spark
    * plumbing (schema, batching, partitioning) is fully exercised. */
  case class ImageMeta(doc_id: Long, width: Int, height: Int,
                       features: Array[Float])

  /** STUB image decode + resize + featurize, batched per partition.
    * `targetSide` mirrors a resize step: the feature grid is computed
    * at targetSide² resolution regardless of source size. */
  def decodeResizeFeaturize(spark: SparkSession, payloads: DataFrame,
                            targetSide: Int): Dataset[ImageMeta] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real pipeline: codec + resampler initialized once per
        // partition; stub: pure arithmetic over the payload bytes
        it.map { case (id, bytes) =>
          val w = 16 + (math.abs(id) % 16).toInt   // "decoded" dims
          val h = 16 + (math.abs(id * 7) % 16).toInt
          val features = Array.tabulate(targetSide * targetSide) { p =>
            if (bytes.isEmpty) 0.0f
            else (bytes(p % bytes.length) & 0xff).toFloat / 255.0f
          }
          ImageMeta(id, w, h, features)
        }
      }
  }

  /** STUB video frame-sampling: emit one row per sampled "frame"
    * (every `stride`-th byte offset stands in for a frame boundary) —
    * the row-explosion shape of real frame extraction, where one input
    * row fans out to many frame rows. */
  def sampleFrames(spark: SparkSession, payloads: DataFrame,
                   stride: Int, maxFrames: Int): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val n = math.min(maxFrames, math.max(bytes.length / stride, 0))
        (0 until n).iterator.map { f =>
          val off = f * stride
          (id, f, off, bytes(off) & 0xff)
        }
      }
      .toDF("doc_id", "frame_idx", "byte_offset", "frame_key")
  }
}
