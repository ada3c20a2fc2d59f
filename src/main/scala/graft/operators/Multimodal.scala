package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media (image/audio/video) as an
  * opaque `binary` column plus typed metadata, processed in batches via
  * `mapPartitions` — the Scala analogue of a batched decode UDF.
  *
  * Decode status (round 8): BMP and PNG decode are REAL — the
  * from-scratch pure-JVM [[graft.functions.ImageCodec]] (format
  * headers + java.util.zip inflate, no native libs) — so
  * [[decodeResizeFeaturize]] and [[imagePixelStats]] produce exact
  * pixels for those containers. Formats that genuinely need native
  * codecs (JPEG, audio, video) still fall back to the deterministic
  * byte-level stand-in, clearly marked below; swapping that arm for
  * a codec call is a one-function change.
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

  /** Image decode + resize + featurize, batched per partition.
    * `targetSide` is the resize: the feature grid is targetSide²
    * regardless of source size (nearest-neighbor, integer luma).
    *
    * BMP/PNG payloads decode for REAL via
    * [[graft.functions.ImageCodec]]; other formats (JPEG needs a
    * native codec this environment lacks) take the documented
    * deterministic byte-arithmetic STAND-IN arm so mixed corpora
    * degrade per row, never per job. */
  def decodeResizeFeaturize(spark: SparkSession, payloads: DataFrame,
                            targetSide: Int): Dataset[ImageMeta] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          graft.functions.ImageCodec.decode(bytes) match {
            case Some(img) =>
              val small = graft.functions.ImageCodec
                .resizeNearest(img, targetSide)
              val features = Array.tabulate(targetSide * targetSide) { p =>
                graft.functions.ImageCodec.luma(small.rgb(p)) / 255.0f }
              ImageMeta(id, img.width, img.height, features)
            case None =>
              // STAND-IN arm (non-BMP/PNG): deterministic arithmetic
              // in place of the native codec this sandbox lacks
              val w = 16 + (math.abs(id) % 16).toInt
              val h = 16 + (math.abs(id * 7) % 16).toInt
              val features = Array.tabulate(targetSide * targetSide) { p =>
                if (bytes.isEmpty) 0.0f
                else (bytes(p % bytes.length) & 0xff).toFloat / 255.0f
              }
              ImageMeta(id, w, h, features)
          }
        }
      }
  }

  /** All-integer pixel statistics from REAL container decode — the
    * oracle-hashable proof that the BMP/PNG path recovers exact
    * pixels. Per payload: decoded dims, per-channel pixel sums, and
    * the luma sum of the nearest-neighbor `side`×`side` resize
    * (integer 77/150/29 luma). Undecodable payloads keep their row
    * with decoded=false and zero stats (audit-friendly: the corpus
    * count never changes).
    *
    * Scale shape: map-only mapPartitions (one decoder per partition,
    * not per row), narrow output, no shuffle; 100-TB form is
    * identical — decode is embarrassingly parallel and the stats
    * are per-row. */
  def imagePixelStats(spark: SparkSession, payloads: DataFrame,
                      side: Int): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          graft.functions.ImageCodec.decode(bytes) match {
            case Some(img) =>
              var sr = 0L; var sg = 0L; var sb = 0L
              var i = 0
              while (i < img.rgb.length) {
                val px = img.rgb(i)
                sr += (px >> 16) & 0xff; sg += (px >> 8) & 0xff
                sb += px & 0xff; i += 1
              }
              val small = graft.functions.ImageCodec.resizeNearest(img, side)
              var lum = 0L
              var j = 0
              while (j < small.rgb.length) {
                lum += graft.functions.ImageCodec.luma(small.rgb(j)); j += 1 }
              (id, img.width, img.height, sr, sg, sb, lum, true)
            case None => (id, 0, 0, 0L, 0L, 0L, 0L, false)
          }
        }
      }
      .toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b",
        "resized_luma_sum", "decoded")
  }

  /** Deterministic REAL-container payload builder for the q214
    * registered query: every doc renders a pattern raster
    * (w = 8 + id mod 9, h = 8 + 3·id mod 9; r = (7x+id) mod 256,
    * g = (11y+2·id) mod 256, b = (x+y+3·id) mod 256) and encodes it
    * into genuine image bytes — BMP for even ids, PNG (zlib IDAT)
    * for odd — so the decode path downstream exercises both format
    * walks on every run. The pattern is closed-form in (id, x, y),
    * which is what lets DuckDB replay [[imagePixelStats]] without any
    * image support: the oracle computes the same sums directly from
    * the formula, and a hash match proves byte-exact codec recovery.
    *
    * Scale shape: map-only; the encoder is per-row compute. */
  def syntheticImagePayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (8 + id % 9).toInt
          val h = (8 + (3 * id) % 9).toInt
          val rgb = Array.tabulate(w * h) { p =>
            val x = p % w; val y = p / w
            val r = ((7 * x + id) % 256).toInt
            val g = ((11 * y + 2 * id) % 256).toInt
            val b = ((x + y + 3 * id) % 256).toInt
            (r << 16) | (g << 8) | b
          }
          val img = graft.functions.ImageCodec.Image(w, h, rgb)
          val bytes =
            if (id % 2 == 0) graft.functions.ImageCodec.encodeBmp24(img)
            else graft.functions.ImageCodec.encodePng(img)
          (id, bytes)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Round-9 mixed-profile twin of [[syntheticImagePayloads]] for the
    * q241 registered query: the same closed-form rasters, rotated
    * through FOUR real container profiles by id mod 4 — BMP (0),
    * truecolor PNG (1), PALETTED PNG with a first-occurrence PLTE
    * (2), and 8-bit GRAYSCALE PNG (3, raster v = (7x+11y+id) mod 256
    * since color type 0 can only carry r=g=b) — so the round-9
    * real-crawl PNG profiles are exercised with full oracle strength:
    * DuckDB replays the stats from the per-profile formula, and a
    * hash match proves byte-exact recovery through the PLTE indirection
    * and the gray expansion. Map-only. */
  def syntheticMixedImagePayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (8 + id % 9).toInt
          val h = (8 + (3 * id) % 9).toInt
          val bytes = (id % 4) match {
            case 3 =>
              val vals = Array.tabulate(w * h) { p =>
                val x = p % w; val y = p / w
                ((7 * x + 11 * y + id) % 256).toInt
              }
              graft.functions.ImageCodec.encodePngGray(vals, w, h, 8)
            case m =>
              val rgb = Array.tabulate(w * h) { p =>
                val x = p % w; val y = p / w
                val r = ((7 * x + id) % 256).toInt
                val g = ((11 * y + 2 * id) % 256).toInt
                val b = ((x + y + 3 * id) % 256).toInt
                (r << 16) | (g << 8) | b
              }
              val img = graft.functions.ImageCodec.Image(w, h, rgb)
              if (m == 0) graft.functions.ImageCodec.encodeBmp24(img)
              else if (m == 1) graft.functions.ImageCodec.encodePng(img)
              else {
                // first-occurrence palette (≤ w·h ≤ 256 entries)
                val order = scala.collection.mutable.LinkedHashMap[Int, Int]()
                val idx = rgb.map(c => order.getOrElseUpdate(c, order.size))
                graft.functions.ImageCodec.encodePngPaletted(
                  idx, order.keys.toArray, w, h, bitDepth = 8)
              }
          }
          (id, bytes)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Round-9 BASELINE JPEG payloads for the q256 registered query —
    * the last real-crawl image profile
    * ([[graft.functions.JpegCodec]]): DC-only grayscale JPEGs whose
    * decoded pixels are closed-form in (id, bx, by). Dimensions are
    * whole MCU grids (w = 8·(1 + id mod 3), h = 8·(1 + (id div 3)
    * mod 3)); block (bx, by) carries quantized DC
    * dc = ((5·bx + 7·by + 3·id) mod 64) − 32 with DC quantizer 16,
    * so the flat reconstruction is EXACT: every pixel of the block is
    * 2·dc + 128 (IDCT of a lone F00 = F00/8; 16·dc/8 = 2·dc — no
    * clamp, range [64, 190]). The oracle replays
    * [[imagePixelStats]] from that formula, and a hash match proves
    * the whole walk — marker parse, canonical Huffman, DC prediction,
    * dequant, IDCT, level shift — recovered every byte. The Huffman
    * path is NOT trivially flat: DC diffs swing ±63 across the block
    * raster, exercising categories 0..6 and EXTEND on every image.
    * Map-only, the q214 scale shape. */
  def syntheticJpegPayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val wB = (1 + id % 3).toInt
          val hB = (1 + (id / 3) % 3).toInt
          val quant = Array.fill(64)(16)
          val blocks = Array.tabulate(wB * hB) { b =>
            val bx = b % wB; val by = b / wB
            val z = new Array[Int](64)
            z(0) = (((5 * bx + 7 * by + 3 * id) % 64) - 32).toInt
            z
          }
          (id, graft.functions.JpegCodec.encodeJpegGray(
            blocks, wB * 8, hB * 8, quant))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Round-10 PROGRESSIVE twin of [[syntheticJpegPayloads]] for the
    * q291 registered query — same block grid and closed form
    * (pixel = 2·dc + 128), but encoded as SOF2 with the full Annex G
    * scan script (DC first at Al=1, DC refinement, two split AC-first
    * scans whose bands are all-zero here so they entropy-code as pure
    * EOB runs, and an AC refinement pass): a hash match proves the
    * multi-scan accumulation — two-pass DC successive approximation
    * included — reconstructs bit-for-bit what the baseline walk would.
    * Map-only, the q214 scale shape. */
  def syntheticProgressiveJpegPayloads(docs: DataFrame,
                                       idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val wB = (1 + id % 3).toInt
          val hB = (1 + (id / 3) % 3).toInt
          val quant = Array.fill(64)(16)
          val blocks = Array.tabulate(wB * hB) { b =>
            val bx = b % wB; val by = b / wB
            val z = new Array[Int](64)
            z(0) = (((5 * bx + 7 * by + 3 * id) % 64) - 32).toInt
            z
          }
          (id, graft.functions.JpegCodec.encodeJpegGrayProgressive(
            blocks, wB * 8, hB * 8, quant))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Round-10 PIXEL-LEVEL encoder twin of [[syntheticJpegPayloads]]
    * for the q301 registered query: here the engine is handed RAW
    * PIXELS, not coefficients — block (bx, by) is the constant even
    * value v = 2·((5·bx + 7·by + 3·id) mod 112) + 16 ∈ [16, 238], and
    * the full forward path runs in-engine (level shift, separable
    * forward DCT, quantization at flat 16, zigzag, canonical-Huffman
    * entropy coding) before the usual decode→stats kernel. The round
    * trip is EXACT by construction: F00 = 8·(v−128) exactly, AC
    * quantizes to 0, DC = round((v−128)/2) = (v−128)/2 for even v, so
    * the decoded pixel is 2·dc + 128 = v — the oracle replays the
    * stats from the v formula, and a hash match pins the ENCODER
    * (FDCT + quantizer + bit writer) as much as the decoder.
    * Map-only, the q214 scale shape. */
  def syntheticEncodedJpegPayloads(docs: DataFrame,
                                   idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val wB = (1 + id % 3).toInt
          val hB = (1 + (id / 3) % 3).toInt
          val w = wB * 8
          val h = hB * 8
          val quant = Array.fill(64)(16)
          val gray = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = 2 * (((5 * (x / 8) + 7 * (y / 8) + 3 * id) % 112)
                .toInt) + 16
              gray(y * w + x) = v
              x += 1
            }
            y += 1
          }
          (id, graft.functions.JpegCodec.encodeJpegGrayPixels(
            gray, w, h, quant))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Round-9 COLOR twin of [[syntheticJpegPayloads]] for the q265
    * registered query: even ids carry the grayscale profile, odd ids
    * a 3-component 4:4:4 DC-only JPEG — per block the quantized DCs
    * are dcY = ((5bx+7by+3id) mod 64)−32, dcCb = ((3bx+11by+id) mod
    * 64)−32, dcCr = ((7bx+5by+2id) mod 64)−32, so the decoded planes
    * are flat Y/Cb/Cr = 2·dc+128 and the RGB output follows the
    * decoder's 16-bit fixed-point BT.601 exactly (arithmetic >> 16,
    * replayable in SQL as BIGINT >>) — clamps INCLUDED, since chroma
    * swings push r/b outside [0,255] on purpose. A hash match proves
    * the full color walk: three interleaved components, per-component
    * DC prediction, the fixed-point conversion. Map-only. */
  def syntheticMixedJpegPayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val wB = (1 + id % 3).toInt
          val hB = (1 + (id / 3) % 3).toInt
          val quant = Array.fill(64)(16)
          def blocks(f: (Int, Int) => Long): Array[Array[Int]] =
            Array.tabulate(wB * hB) { b =>
              val z = new Array[Int](64)
              z(0) = ((f(b % wB, b / wB) % 64) - 32).toInt
              z
            }
          val bytes =
            if (id % 2 == 0)
              graft.functions.JpegCodec.encodeJpegGray(
                blocks((bx, by) => 5 * bx + 7 * by + 3 * id),
                wB * 8, hB * 8, quant)
            else
              graft.functions.JpegCodec.encodeJpegColor444(
                blocks((bx, by) => 5 * bx + 7 * by + 3 * id),
                blocks((bx, by) => 3 * bx + 11 * by + id),
                blocks((bx, by) => 7 * bx + 5 * by + 2 * id),
                wB * 8, hB * 8, quant)
          (id, bytes)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Round-9 4:2:0 twin for the q273 registered query — the dominant
    * real-crawl JPEG profile: every doc a 16-multiple raster
    * (w = 16·(1 + id mod 2), h = 16·(1 + (id div 2) mod 2)) with
    * per-8×8-block flat Y (dcY = ((5bx+7by+3id) mod 64)−32) and
    * per-16×16-MCU flat chroma (dcCb = ((3mx+11my+id) mod 64)−32,
    * dcCr = ((7mx+5my+2id) mod 64)−32). Replication upsampling keeps
    * the decode closed-form: each Y block lies in exactly one chroma
    * MCU, so r/g/b are constant per 8×8 block and DuckDB replays the
    * stats from the two-grid formula. A hash match pins the
    * interleaved 2×2+1+1 MCU walk and the chroma upsampling. */
  def syntheticJpeg420Payloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val mcuW = (1 + id % 2).toInt
          val mcuH = (1 + (id / 2) % 2).toInt
          val quant = Array.fill(64)(16)
          def blk(dc: Long): Array[Int] = {
            val z = new Array[Int](64)
            z(0) = ((dc % 64) - 32).toInt
            z
          }
          val yB = Array.tabulate(mcuW * mcuH * 4) { i =>
            val mcu = i / 4; val u = i % 4
            val bx = (mcu % mcuW) * 2 + u % 2
            val by = (mcu / mcuW) * 2 + u / 2
            blk(5 * bx + 7 * by + 3 * id)
          }
          val cbB = Array.tabulate(mcuW * mcuH) { m =>
            blk(3 * (m % mcuW) + 11 * (m / mcuW) + id)
          }
          val crB = Array.tabulate(mcuW * mcuH) { m =>
            blk(7 * (m % mcuW) + 5 * (m / mcuW) + 2 * id)
          }
          (id, graft.functions.JpegCodec.encodeJpeg420(
            yB, cbB, crB, mcuW * 16, mcuH * 16, quant))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** All-integer PCM statistics from REAL WAV decode
    * ([[graft.functions.AudioCodec]]) — the audio twin of
    * [[imagePixelStats]]: per payload the decoded format meta
    * (rate, channels, integer-ms duration) and exact sample stats
    * (Σ|s|, max|s|, strict sign-flip zero-crossing count over the
    * interleaved stream). Undecodable payloads keep their row with
    * decoded=false. Map-only mapPartitions, no shuffle; the 100-TB
    * shape is identical (decode is embarrassingly parallel). */
  /** Linear-interpolation PCM resampling over the REAL WAV decode —
    * the rate-normalization step every ASR corpus pays before
    * feature extraction (mixed-rate crawls → one model rate).
    * Channel 0 of each file is resampled to `dstRate`: output i maps
    * to source position i·srcRate/dstRate; with j = num div dstRate
    * and r = num mod dstRate the sample is s[j] when r = 0, else the
    * weighted average (s[j]·(dstRate−r) + s[j+1]·r) div dstRate —
    * ALL integer (Scala `/` and DuckDB `//` both truncate toward
    * zero, so the negative-sample case replays bit-exactly). Output
    * length floor((n−1)·dstRate/srcRate)+1 never indexes past the
    * last frame. Published stats (Σv, Σv²) pin every interpolated
    * value; map-only, the q214 scale shape. */
  def audioResampleStats(spark: SparkSession, payloads: DataFrame,
                         dstRate: Int): DataFrame = {
    import spark.implicits._
    require(dstRate > 0)
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        graft.functions.AudioCodec.decodeWav(bytes) match {
          case Some(wav) if wav.nFrames >= 1 =>
            val n = wav.nFrames
            val ch = wav.channels
            def s(k: Int): Long = wav.samples(k * ch).toLong
            val nOut = ((n - 1).toLong * dstRate / wav.sampleRate).toInt + 1
            var i = 0
            var sum = 0L
            var energy = 0L
            while (i < nOut) {
              val num = i.toLong * wav.sampleRate
              val j = (num / dstRate).toInt
              val r = num % dstRate
              val v =
                if (r == 0L) s(j)
                else (s(j) * (dstRate - r) + s(j + 1) * r) / dstRate
              sum += v
              energy += v * v
              i += 1
            }
            Iterator.single((id, wav.sampleRate.toLong, dstRate.toLong,
              n.toLong, nOut.toLong, sum, energy))
          case _ => Iterator.empty
        }
      }
      .toDF("doc_id", "src_rate", "dst_rate", "n_in", "n_out",
        "sum_out", "energy_out")
  }

  def audioPcmStats(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          graft.functions.AudioCodec.decodeWav(bytes) match {
            case Some(wav) =>
              var sumAbs = 0L; var maxAbs = 0L; var zc = 0L
              var i = 0
              while (i < wav.samples.length) {
                val s = wav.samples(i)
                val a = math.abs(s).toLong
                sumAbs += a; if (a > maxAbs) maxAbs = a
                if (i > 0 && s.toLong * wav.samples(i - 1) < 0) zc += 1
                i += 1
              }
              val durMs = 1000L * wav.nFrames / wav.sampleRate
              (id, wav.sampleRate, wav.channels,
                wav.samples.length.toLong, durMs, sumAbs, maxAbs, zc, true)
            case None => (id, 0, 0, 0L, 0L, 0L, 0L, 0L, false)
          }
        }
      }
      .toDF("doc_id", "sample_rate", "channels", "n_samples", "dur_ms",
        "sum_abs", "max_abs", "zero_crossings", "decoded")
  }

  /** Deterministic REAL-WAV payload builder for the q215 registered
    * query: per doc a mono 16-bit PCM sawtooth-ish waveform
    * (n = 64 + id mod 65 samples, s(i) = (17i + 3·id) mod 2001 − 1000,
    * rate = 8000 + (id mod 5)·1000) encoded into genuine RIFF bytes.
    * Closed-form in (id, i), so DuckDB replays [[audioPcmStats]]
    * without any audio support — a hash match proves byte-exact PCM
    * recovery through the chunk walk. Map-only. */
  def syntheticAudioPayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = (64 + id % 65).toInt
          val rate = (8000 + (id % 5) * 1000).toInt
          val samples = Array.tabulate(n)(i =>
            ((17L * i + 3 * id) % 2001 - 1000).toInt)
          (id, graft.functions.AudioCodec.encodeWavPcm16(rate, 1, samples))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** VAD-style framed energy over REAL decoded PCM — the shape of
    * every speech-pipeline front end (silence trimming, speech-ratio
    * quality gates): frames of `frameLen` samples at `hop` hop, one
    * output row per frame with its exact integer energy Σs² and an
    * activity flag (energy > thr·frameLen, i.e. mean-square > thr —
    * a pure integer compare, oracle-replayable). Docs shorter than
    * one frame contribute zero rows. Map-only flatMap fan-out; at
    * 100 TB the downstream trim is a per-doc filter+regroup, never a
    * global shuffle of samples. */
  def audioFrameEnergy(spark: SparkSession, payloads: DataFrame,
                       frameLen: Int, hop: Int, thr: Long): DataFrame = {
    import spark.implicits._
    require(frameLen > 0 && hop > 0)
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        graft.functions.AudioCodec.decodeWav(bytes) match {
          case Some(wav) if wav.samples.length >= frameLen =>
            val nF = (wav.samples.length - frameLen) / hop + 1
            (0 until nF).iterator.map { f =>
              var e = 0L
              var j = 0
              while (j < frameLen) {
                val s = wav.samples(f * hop + j).toLong
                e += s * s; j += 1
              }
              (id, f, e, e > thr * frameLen)
            }
          case _ => Iterator.empty
        }
      }
      .toDF("doc_id", "frame_idx", "energy", "active")
  }

  /** Autocorrelation pitch probe over REAL decoded PCM — the
    * classic time-domain pitch detector (argmax of the short-time
    * autocorrelation over a lag band, the core of RAPT/YIN-family
    * front ends before their refinements): over the first `frameLen`
    * samples, R(τ) = Σ_{t<frameLen−τ} s(t)·s(t+τ) for τ ∈ [minLag,
    * maxLag]; the detected lag is the R-maximizing τ (ties → smallest
    * τ — a fixed tie order keeps the result partition-invariant), and
    * R(0) = Σ s² anchors a voicing strength comparison downstream.
    * All-integer (exact 64-bit sums of 16-bit products — no overflow
    * below ~2^33 samples/frame), so DuckDB replays it from the q215
    * waveform closed form with a lag self-join. Docs shorter than
    * `frameLen` contribute no row. Map-only, the q215 scale shape:
    * the corpus never shuffles, one row out per payload. */
  def pitchAutocorr(spark: SparkSession, payloads: DataFrame,
                    frameLen: Int = 64, minLag: Int = 2,
                    maxLag: Int = 31): DataFrame = {
    import spark.implicits._
    require(0 < minLag && minLag <= maxLag && maxLag < frameLen)
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        graft.functions.AudioCodec.decodeWav(bytes) match {
          case Some(wav) if wav.samples.length >= frameLen =>
            val s = wav.samples
            var r0 = 0L
            var t = 0
            while (t < frameLen) { r0 += s(t).toLong * s(t); t += 1 }
            var bestLag = minLag
            var bestR = Long.MinValue
            var lag = minLag
            while (lag <= maxLag) {
              var r = 0L
              var u = 0
              while (u < frameLen - lag) {
                r += s(u).toLong * s(u + lag); u += 1
              }
              if (r > bestR) { bestR = r; bestLag = lag }
              lag += 1
            }
            Iterator.single((id, bestLag, bestR, r0))
          case _ => Iterator.empty
        }
      }
      .toDF("doc_id", "best_lag", "r_best", "r0")
  }

  /** Per-document zero-crossing rate + silence-trim bounds over REAL
    * decoded PCM — the other half of the classic VAD front end next
    * to [[audioFrameEnergy]]'s energy: ZCR separates voiced (low
    * ZCR) from fricative/noise (high ZCR) content, and the
    * lead/trail silence bounds are what an audio-corpus trim step
    * actually consumes. All-integer: crossing = sign change between
    * adjacent samples ((s[i−1] < 0) ≠ (s[i] < 0)), `zcr_ppm` =
    * 10⁶·crossings DIV (n−1); a sample is silent iff |s| < thr,
    * `lead_silence`/`trail_silence` are the bounds of the first/last
    * non-silent sample, and an all-silent doc reports lead = n,
    * trail = 0, active_span = 0.
    *
    * Map-only mapPartitions over the codec (one decode per payload,
    * one linear pass per doc); undecodable payloads keep their row
    * with decoded = false and zeros. 100-TB shape: no shuffle — the
    * downstream trim is a per-doc byte-slice, never a sample
    * exchange. */
  def audioSilenceProfile(spark: SparkSession, payloads: DataFrame,
                          silenceThr: Int): DataFrame = {
    import spark.implicits._
    require(silenceThr > 0)
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          graft.functions.AudioCodec.decodeWav(bytes) match {
            case Some(wav) =>
              val s = wav.samples
              val n = s.length
              var zc = 0L
              var i = 1
              while (i < n) {
                if ((s(i - 1) < 0) != (s(i) < 0)) zc += 1
                i += 1
              }
              var firstA = -1; var lastA = -1
              i = 0
              while (i < n) {
                if (math.abs(s(i)) >= silenceThr) {
                  if (firstA < 0) firstA = i
                  lastA = i
                }
                i += 1
              }
              val (lead, trail, span) =
                if (firstA < 0) (n.toLong, 0L, 0L)
                else (firstA.toLong, (n - 1 - lastA).toLong,
                  (lastA - firstA + 1).toLong)
              val zcrPpm = if (n >= 2) 1000000L * zc / (n - 1) else 0L
              (id, n.toLong, wav.sampleRate.toLong, zc, zcrPpm,
                lead, trail, span, true)
            case None => (id, 0L, 0L, 0L, 0L, 0L, 0L, 0L, false)
          }
        }
      }
      .toDF("doc_id", "n_samples", "sample_rate", "zero_crossings",
        "zcr_ppm", "lead_silence", "trail_silence", "active_span",
        "decoded")
  }

  /** Difference-hash (dHash) over REAL decoded pixels — the standard
    * perceptual fingerprint for image-level dedup in multimodal
    * training corpora: nearest-resize to 9×8, integer luma, bit
    * k = 8y+x set iff gray(x+1,y) > gray(x,y). Published as two
    * unsigned 32-bit halves (BIGINT-safe on both engines: no 2⁶³
    * term ever materializes). Deterministic integers end-to-end, so
    * the whole hash is oracle-replayable; duplicate grouping is then
    * a plain groupBy on the halves (map-side combined), exactly the
    * exact-dedup shape of `Dedup.exact`. Undecodable payloads keep
    * their row with decoded=false and zero hash. */
  def imageDHash(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          graft.functions.ImageCodec.decode(bytes) match {
            case Some(img) =>
              val g9 = graft.functions.ImageCodec.resizeNearest(img, 9, 8)
              val gray = g9.rgb.map(graft.functions.ImageCodec.luma)
              var hash = 0L
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  if (gray(y * 9 + x + 1) > gray(y * 9 + x))
                    hash |= 1L << (y * 8 + x)
                  x += 1
                }
                y += 1
              }
              (id, hash >>> 32, hash & 0xffffffffL, true)
            case None => (id, 0L, 0L, false)
          }
        }
      }
      .toDF("doc_id", "dhash_hi", "dhash_lo", "decoded")
  }

  /** Near-duplicate IMAGE pairs by banded dHash Hamming blocking —
    * the [[SimHash.nearPairs]] recipe applied to the perceptual hash:
    * work on DISTINCT hashes (exact-equal images already collapse to
    * one row each with its group size — pairing members would square
    * the hot groups, the q218 302-member group being Exhibit A),
    * split the 64-bit hash into four 16-bit bands, equi-join on
    * (band_idx, band_value) — pigeonhole: any pair within Hamming ≤ 3
    * shares at least one intact band — and verify with exact
    * `bit_count(xor)` over the two 32-bit halves.
    *
    * Scale shape: distinct-hash dedup first (map-side-combined
    * groupBy), then the band join shuffles 4 rows per DISTINCT hash —
    * candidate volume is per-band-bucket bounded, never corpus²; the
    * group sizes multiply analytically in the published (n_a, n_b).
    *
    * Output: (hi_a, lo_a, hi_b, lo_b, rep_a, rep_b, n_a, n_b,
    * hamming, is_near) for pairs with hamming ≤ maxPublish;
    * is_near = hamming ≤ nearDist. */
  def imageNearDupPairs(hashes: DataFrame, nearDist: Int = 3,
                        maxPublish: Int = 6): DataFrame = {
    val distinctH = hashes.filter(col("decoded"))
      .groupBy(col("dhash_hi").as("hi"), col("dhash_lo").as("lo"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("rep"))
    val bands = distinctH.select(col("hi"), col("lo"), col("n"),
      col("rep"),
      posexplode(array(
        expr("hi DIV 65536"), expr("hi % 65536"),
        expr("lo DIV 65536"), expr("lo % 65536")))
        .as(Seq("band_idx", "band_val")))
    val l = bands.select(col("band_idx"), col("band_val"),
      col("hi").as("hi_a"), col("lo").as("lo_a"),
      col("n").as("n_a"), col("rep").as("rep_a"))
    val r = bands.select(col("band_idx"), col("band_val"),
      col("hi").as("hi_b"), col("lo").as("lo_b"),
      col("n").as("n_b"), col("rep").as("rep_b"))
    l.join(r, Seq("band_idx", "band_val"))
      .filter(col("hi_a") < col("hi_b") ||
        (col("hi_a") === col("hi_b") && col("lo_a") < col("lo_b")))
      .select("hi_a", "lo_a", "hi_b", "lo_b", "rep_a", "rep_b",
        "n_a", "n_b")
      .distinct()
      .withColumn("hamming",
        expr("bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)")
          .cast("long"))
      .filter(col("hamming") <= maxPublish)
      .withColumn("is_near", col("hamming") <= nearDist)
  }

  /** Real multi-frame extraction from animated GIF
    * ([[graft.functions.GifCodec]]) — one output row PER DECODED
    * FRAME (the genuine fan-out shape of video frame sampling), with
    * the frame's rect, graphic-control delay, and exact per-channel
    * pixel sums over its own raster. Undecodable payloads contribute
    * zero rows (the per-payload count audit is [[extract]]'s job).
    * Map-only flatMap, no shuffle; 100-TB shape identical. */
  def gifFrameStats(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        graft.functions.GifCodec.decodeGif(bytes) match {
          case Some(gif) =>
            gif.frames.iterator.zipWithIndex.map { case (fr, i) =>
              var sr = 0L; var sg = 0L; var sb = 0L
              var p = 0
              while (p < fr.rgb.length) {
                val px = fr.rgb(p)
                sr += (px >> 16) & 0xff; sg += (px >> 8) & 0xff
                sb += px & 0xff; p += 1
              }
              (id, i, fr.width, fr.height, fr.delayCs, sr, sg, sb)
            }
          case None => Iterator.empty
        }
      }
      .toDF("doc_id", "frame_idx", "width", "height", "delay_cs",
        "sum_r", "sum_g", "sum_b")
  }

  /** Deterministic REAL animated-GIF payload builder for q216: per
    * doc, 2 + id mod 4 full frames of (6 + id mod 6)×(6 + 2·id mod 6)
    * pixels over a formula palette (pal(i) = ((4i+1) mod 256,
    * (2i+7) mod 256, (5i+3) mod 256)); frame f's index raster is
    * (x + 3y + 5f + id) mod 64 and its delay 4 + f cs. Closed-form
    * in (id, f, x, y), so DuckDB replays [[gifFrameStats]] with no
    * GIF support — a hash match proves the LZW walk recovered every
    * palette index exactly. Map-only. */
  def syntheticGifPayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val palette = Array.tabulate(256)(i =>
      (((4 * i + 1) % 256) << 16) | (((2 * i + 7) % 256) << 8) |
        ((5 * i + 3) % 256))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (6 + id % 6).toInt
          val h = (6 + (2 * id) % 6).toInt
          val nf = (2 + id % 4).toInt
          val frames = (0 until nf).map { f =>
            val idx = Array.tabulate(w * h) { p =>
              val x = p % w; val y = p / w
              ((x + 3 * y + 5 * f + id) % 64).toByte
            }
            (4 + f, idx)
          }
          (id, graft.functions.GifCodec.encodeGif(w, h, palette, frames))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** STUB video frame-sampling: emit one row per sampled "frame"
    * (every `stride`-th byte offset stands in for a frame boundary) —
    * the row-explosion shape of real frame extraction over payloads
    * whose container needs a native codec; for animated GIF the REAL
    * path is [[gifFrameStats]]. */
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

  /** Spectral perceptual hash — the pHash recipe (resize, transform
    * to the frequency domain, threshold the low-frequency
    * coefficients at their median) with the Walsh–Hadamard transform
    * in place of the float DCT: H[u,x] = (−1)^popcount(u AND x) is
    * the standard ±1 sequency basis, integer-exact end to end, so
    * unlike cosine pHash the whole hash is deterministic across
    * JVMs/SIMD AND oracle-replayable (the published WHT-hash variant
    * of the pHash family; dHash q218 sees gradients, this sees the
    * global frequency envelope, so it survives local pixel noise
    * that flips dHash bits).
    *
    * Pipeline per payload: decode → nearest-resize to 8×8 (the q218
    * integer mapping) → 77/150/29 luma → 2-D WHT
    * coef(u,v) = Σ_{x,y} (−1)^popcount((u&x))·(−1)^popcount((v&y))·g
    * → bit(8v+u) = 1 iff coef > lower-median of the 63 AC
    * coefficients (DC = coef(0,0) is excluded from both the median
    * pool and the bits — it is the brightness sum dHash-family
    * hashes must ignore). Published as two unsigned 32-bit halves
    * (the q218 convention; no 2⁶³ term). Map-only mapPartitions —
    * the right shape for byte decode; undecodable payloads keep
    * their row with decoded=false and zero hash. */
  def imageWhtHash(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          graft.functions.ImageCodec.decode(bytes) match {
            case Some(img) =>
              val g8 = graft.functions.ImageCodec.resizeNearest(img, 8, 8)
              val gray = g8.rgb.map(graft.functions.ImageCodec.luma)
              val coef = new Array[Long](64)
              var v = 0
              while (v < 8) {
                var u = 0
                while (u < 8) {
                  var s = 0L
                  var y = 0
                  while (y < 8) {
                    var x = 0
                    while (x < 8) {
                      val neg = (java.lang.Integer.bitCount(u & x) +
                        java.lang.Integer.bitCount(v & y)) & 1
                      val g = gray(y * 8 + x).toLong
                      s += (if (neg == 1) -g else g)
                      x += 1
                    }
                    y += 1
                  }
                  coef(v * 8 + u) = s
                  u += 1
                }
                v += 1
              }
              val ac = coef.drop(1).sorted // 63 ACs; lower median
              val med = ac(31) // 32nd smallest = (63+1)/2, house lower median
              var hash = 0L
              var k = 1
              while (k < 64) {
                if (coef(k) > med) hash |= 1L << k
                k += 1
              }
              (id, hash >>> 32, hash & 0xffffffffL, true)
            case None => (id, 0L, 0L, false)
          }
        }
      }
      .toDF("doc_id", "wht_hi", "wht_lo", "decoded")
  }

  /** Sequency-band energy profile of decoded PCM — the q319 trick
    * (integer Walsh–Hadamard transform in place of the float DFT)
    * applied to audio: the 64-point WHT of the first 64 samples,
    * W[u] = Σ_i (−1)^popcount(u AND i)·s_i, grouped into 8 sequency
    * bands of 8 coefficients each with exact energy Σ W². The
    * spectral-envelope feature every audio-quality gate wants
    * (speech vs tone vs noise separate by band profile), with zero
    * float anywhere — deterministic across JVMs and replayable
    * arithmetically (|W| ≤ 64·2¹⁵, band energy ≤ 8·(64·2¹⁵)² fits a
    * long with room). The fast butterfly (O(n log n)) computes the
    * same integers as the definition sum the oracle replays.
    * Map-only mapPartitions; docs shorter than 64 samples zero-pad
    * (the synthetic corpus never is). Output: (doc_id, band,
    * energy), 8 rows per decodable payload. */
  def audioWhtBands(spark: SparkSession,
                    payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          graft.functions.AudioCodec.decodeWav(bytes) match {
            case Some(wav) =>
              val w = new Array[Long](64)
              var i = 0
              while (i < 64) {
                w(i) = if (i < wav.samples.length)
                  wav.samples(i).toLong else 0L
                i += 1
              }
              // in-place fast WHT butterfly
              var len = 1
              while (len < 64) {
                var s = 0
                while (s < 64) {
                  var j = s
                  while (j < s + len) {
                    val a = w(j); val b = w(j + len)
                    w(j) = a + b
                    w(j + len) = a - b
                    j += 1
                  }
                  s += 2 * len
                }
                len *= 2
              }
              (0 until 8).map { band =>
                var e = 0L
                var u = band * 8
                while (u < band * 8 + 8) { e += w(u) * w(u); u += 1 }
                (id, band.toLong, e)
              }
            case None => Seq.empty
          }
        }
      }
      .toDF("doc_id", "band", "energy")
  }

  /** Sobel edge profile over the decoded raster — integer L1 Sobel
    * (|Gx| + |Gy| on the 77/150/29 luma, the classic 3×3 kernels)
    * per interior pixel, rolled up per image: interior count, total
    * magnitude, strong-edge count (mag > thr) and max magnitude. The
    * edge-density quality gate of image curation (blank/synthetic
    * flats score ~0, textured crops score high), exact integers end
    * to end; the oracle replays the closed-form raster and the 3×3
    * convolution relationally. Map-only per-payload compute. */
  def imageSobelProfile(spark: SparkSession, payloads: DataFrame,
                        thr: Long): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          graft.functions.ImageCodec.decode(bytes) match {
            case Some(img) =>
              val w = img.width; val h = img.height
              val g = img.rgb.map(graft.functions.ImageCodec.luma)
              var n = 0L; var tot = 0L; var strong = 0L; var mx = 0L
              var y = 1
              while (y < h - 1) {
                var x = 1
                while (x < w - 1) {
                  def p(dx: Int, dy: Int): Long =
                    g((y + dy) * w + (x + dx)).toLong
                  val gx = (p(1, -1) + 2 * p(1, 0) + p(1, 1)
                    - p(-1, -1) - 2 * p(-1, 0) - p(-1, 1))
                  val gy = (p(-1, 1) + 2 * p(0, 1) + p(1, 1)
                    - p(-1, -1) - 2 * p(0, -1) - p(1, -1))
                  val mag = math.abs(gx) + math.abs(gy)
                  n += 1; tot += mag
                  if (mag > thr) strong += 1
                  if (mag > mx) mx = mag
                  x += 1
                }
                y += 1
              }
              (id, true, n, tot, strong, mx)
            case None => (id, false, 0L, 0L, 0L, 0L)
          }
        }
      }
      .toDF("doc_id", "decoded", "n_interior", "sum_mag",
        "n_strong", "max_mag")
  }
}
