package graft

import graft.functions.{AudioCodec, GifCodec, ImageCodec, JpegCodec}
import graft.functions.ImageCodec.Image

/** Deterministic fuzz over every from-scratch codec: crawl data is
  * hostile bytes, and at 100 TB a decoder that THROWS (instead of
  * degrading to None) kills the whole partition's task. Two attack
  * shapes, both seeded (no Math.random — reproducible failures):
  * (1) random byte blobs behind each format's magic prefix, and
  * (2) every-offset single-byte corruption of a small VALID stream —
  * the mutation set walks headers, tables, lengths, and entropy-coded
  * data alike. The contract under test is total: `Option` out,
  * nothing thrown, at any input. */
class CodecFuzzSpec extends SparkSpec {

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def randomBlob(r: scala.util.Random, prefix: Array[Byte],
                         len: Int): Array[Byte] = {
    val b = new Array[Byte](len)
    r.nextBytes(b)
    System.arraycopy(prefix, 0, b, 0, math.min(prefix.length, len))
    b
  }

  private def mutations(valid: Array[Byte],
                        r: scala.util.Random): Iterator[Array[Byte]] = {
    // every offset once with a random byte, plus truncations
    val all = valid.indices.iterator.map { i =>
      val m = valid.clone(); m(i) = r.nextInt(256).toByte; m
    }
    val truncs = Iterator.range(0, valid.length,
      math.max(1, valid.length / 16)).map(valid.take)
    all ++ truncs
  }

  private def survives[A](name: String, dec: Array[Byte] => Option[A],
                          inputs: Iterator[Array[Byte]]): Unit = {
    var n = 0
    inputs.foreach { in =>
      try { dec(in); n += 1 }
      catch { case e: Throwable =>
        fail(s"$name threw ${e.getClass.getSimpleName} on a " +
          s"${in.length}-byte fuzz input (case $n): ${e.getMessage}")
      }
    }
    assert(n > 0)
  }

  private val gray8x8 = Image(8, 8,
    Array.tabulate(64) { i => val v = (i * 3) % 256; (v << 16) | (v << 8) | v })

  test("JPEG baseline + progressive: fuzz-total") {
    val r = rng(11L)
    val dc = { val z = new Array[Int](64); z(0) = 9; Array(z) }
    val q = Array.fill(64)(16)
    val base = JpegCodec.encodeJpegGray(dc, 8, 8, q)
    val prog = JpegCodec.encodeJpegGrayProgressive(dc, 8, 8, q)
    survives("decodeJpeg", JpegCodec.decodeJpeg,
      mutations(base, r) ++ mutations(prog, r) ++
        Iterator.fill(200)(randomBlob(r,
          Array(0xff.toByte, 0xd8.toByte), 64 + r.nextInt(256))))
  }

  test("PNG: fuzz-total") {
    val r = rng(12L)
    val valid = ImageCodec.encodePng(gray8x8)
    survives("decodePng", ImageCodec.decodePng,
      mutations(valid, r) ++ Iterator.fill(200)(randomBlob(r,
        Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte),
        64 + r.nextInt(256))))
  }

  test("BMP: fuzz-total") {
    val r = rng(13L)
    val valid = ImageCodec.encodeBmp24(gray8x8)
    survives("decodeBmp", ImageCodec.decodeBmp,
      mutations(valid, r) ++ Iterator.fill(200)(randomBlob(r,
        Array('B'.toByte, 'M'.toByte), 32 + r.nextInt(256))))
  }

  test("GIF: fuzz-total") {
    val r = rng(14L)
    val valid = GifCodec.encodeGif(4, 4,
      Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff),
      Seq((10, Array.tabulate(16)(i => (i % 4).toByte))))
    survives("decodeGif", GifCodec.decodeGif,
      mutations(valid, r) ++ Iterator.fill(200)(randomBlob(r,
        "GIF89a".getBytes("US-ASCII"), 32 + r.nextInt(256))))
  }

  test("WAV: fuzz-total") {
    val r = rng(15L)
    val valid = AudioCodec.encodeWavPcm16(8000, 1,
      Array.tabulate(64)(i => ((i * 997) % 2001 - 1000).toShort))
    survives("decodeWav", AudioCodec.decodeWav,
      mutations(valid, r) ++ Iterator.fill(200)(randomBlob(r,
        "RIFF".getBytes("US-ASCII"), 32 + r.nextInt(256))))
  }

  test("SQLite reader: fuzz-total on the from-scratch file decoder") {
    val r = rng(16L)
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val path = java.nio.file.Files.createTempDirectory("graft_fz")
      .resolve("f.db").toString
    graft.sources.sqlite.SqliteWriter.write(path, Seq(
      graft.sources.sqlite.SqliteWriter.TableSpec("t",
        StructType(Seq(StructField("k", LongType),
          StructField("v", StringType))),
        (1 to 40).map(i => Row(i.toLong, s"v$i")))))
    val valid = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))
    // the reader's contract differs from the crawl codecs: it reads a
    // KNOWN warehouse file, so deliberate validation errors (require/
    // IllegalState on a corrupt header or record) are fine — what must
    // never happen is an unguarded out-of-bounds or NPE
    def dec(bytes: Array[Byte]): Option[Long] =
      try {
        val f = new graft.sources.sqlite.SqliteFile(bytes)
        Some(f.tables.values.map { case (root, _) =>
          f.scanSubtree(root).length.toLong }.sum)
      } catch {
        case _: IllegalStateException | _: IllegalArgumentException =>
          None
      }
    // header/page mutations only every 7th offset: the db is 3 pages
    val muts = valid.indices.iterator.filter(_ % 7 == 0).map { i =>
      val m = valid.clone(); m(i) = r.nextInt(256).toByte; m
    }
    var n = 0
    muts.foreach { in =>
      try { dec(in); n += 1 }
      catch { case e: Throwable =>
        fail(s"SqliteFile threw ${e.getClass.getSimpleName} at " +
          s"mutation case $n: ${e.getMessage}")
      }
    }
    assert(n > 0)
  }
}
