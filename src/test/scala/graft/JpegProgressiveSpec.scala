package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{ImageIO, ImageWriteParam}

import graft.functions.JpegCodec

/** Progressive (SOF2) JPEG decode, pinned three ways like the
  * baseline suite: exact DC-only closed forms, equality against the
  * baseline decoder on the SAME coefficient blocks (the refinement
  * scans must reassemble every bit), and cross-implementation against
  * ImageIO's progressive writer. */
class JpegProgressiveSpec extends SparkSpec {

  private def dcBlock(dc: Int): Array[Int] = {
    val z = new Array[Int](64); z(0) = dc; z
  }
  private val flatQ = Array.fill(64)(16)

  test("DC-only progressive round trip is exact: pixel = 2*dc + 128, " +
      "through DC-first + DC-refine + EOB-run AC scans") {
    val dcs = Array(-32, 0, 31, -1, 17, 5)
    val bytes = JpegCodec.encodeJpegGrayProgressive(
      dcs.map(dcBlock), 24, 16, flatQ)
    // stream must really be progressive
    assert(bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2))
    val img = JpegCodec.decodeJpeg(bytes).get
    assert(img.width == 24 && img.height == 16)
    for (y <- 0 until 16; x <- 0 until 24) {
      val b = (y / 8) * 3 + (x / 8)
      val v = 2 * dcs(b) + 128
      assert(img(x, y) == ((v << 16) | (v << 8) | v), s"($x,$y)")
    }
  }

  test("progressive decode equals baseline decode on blocks with AC " +
      "coefficients — every Annex G path (band split, successive " +
      "approximation, EOB runs, ZRL, correction bits) reassembles " +
      "exactly") {
    // deterministic mix: some blocks dense in low band, some with a
    // single high-band coefficient (long zero runs -> ZRL), some
    // all-zero-AC (EOB runs), negative values throughout
    val blocks = Array.tabulate(12) { b =>
      val z = new Array[Int](64)
      z(0) = (b * 7 % 64) - 32
      if (b % 4 != 3) {
        z(1) = (b % 5) - 2
        z(3) = if (b % 2 == 0) 6 else -6
        z(5) = (b % 3) - 1
      }
      if (b % 4 == 1) z(60) = -3 // high band after a long zero run
      if (b % 4 == 2) { z(20) = 1; z(40) = -1 } // refine-only magnitudes
      z
    }
    val base = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpegGray(blocks, 32, 24, flatQ)).get
    // several scan scripts, including a 2-level successive
    // approximation (Al=2 -> 1 -> 0) and single-scan-per-band forms
    val scripts = Seq(
      Seq((0, 0, 0, 1), (0, 0, 1, 0),
        (1, 5, 0, 1), (6, 63, 0, 1), (1, 63, 1, 0)),
      Seq((0, 0, 0, 0), (1, 63, 0, 0)),
      Seq((0, 0, 0, 2), (0, 0, 2, 1), (0, 0, 1, 0),
        (1, 20, 0, 2), (21, 63, 0, 2),
        (1, 63, 2, 1), (1, 63, 1, 0)))
    for (script <- scripts) {
      val prog = JpegCodec.decodeJpeg(JpegCodec.encodeJpegGrayProgressive(
        blocks, 32, 24, flatQ, script))
      assert(prog.isDefined, s"script $script failed to decode")
      assert(prog.get.width == base.width && prog.get.height == base.height)
      assert(prog.get.rgb.sameElements(base.rgb),
        s"script $script raster mismatch")
    }
  }

  test("cross-implementation: ImageIO's progressive gray JPEG decodes " +
      "to the same raster as ImageIO reads back") {
    val w = 40; val h = 24
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 5 + y * 9) % 256
      bi.getRaster.setSample(x, y, 0, v)
    }
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    ios.flush(); writer.dispose()
    val bytes = bos.toByteArray
    assert(bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
      "ImageIO should have written SOF2")
    val ours = JpegCodec.decodeJpeg(bytes)
    assert(ours.isDefined, "progressive ImageIO stream should decode")
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ours.get.width == w && ours.get.height == h)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val a = ours.get(x, y) & 0xff
      val b = ref.getRaster.getSample(x, y, 0)
      maxDiff = math.max(maxDiff, math.abs(a - b))
    }
    // both are IDCT reconstructions of the same coefficients; allow
    // the usual ±1 rounding skew between independent IDCTs
    assert(maxDiff <= 1, s"maxDiff=$maxDiff")
  }

  test("no-throw: single-byte fuzz over a progressive stream degrades " +
      "to None or a wrong raster, never an exception") {
    val blocks = Array.tabulate(4) { b =>
      val z = new Array[Int](64); z(0) = b * 9 - 16; z(2) = 3 - b; z
    }
    val good = JpegCodec.encodeJpegGrayProgressive(blocks, 16, 16, flatQ)
    for (i <- good.indices; v <- Seq(0x00, 0xff, 0x55)) {
      val fuzz = good.clone(); fuzz(i) = v.toByte
      JpegCodec.decodeJpeg(fuzz) // must not throw
    }
  }
}
