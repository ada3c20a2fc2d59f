package graft

import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import graft.functions.{ImageCodec, JpegCodec}
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** The pure-JVM baseline JPEG codec, pinned the same three ways as
  * the BMP/PNG suite: (1) exact closed-form round trips on DC-only
  * streams (flat-block reconstruction is integral by construction);
  * (2) cross-implementation against the JDK's ImageIO JPEG plugin in
  * BOTH directions — grayscale avoids chroma subsampling, so ImageIO
  * reads our streams and we read ImageIO's; (3) hand-exercised
  * entropy-coding corners: ZRL runs, EXTEND on negative coefficients,
  * restart-marker resync, the 4:4:4 color path, MCU cropping, and
  * the reject paths (progressive, subsampled, truncated). AC
  * reconstruction is checked against an independently-written direct
  * O(64²) IDCT (the decoder's is separable) — agreement within ±1
  * rules out a self-consistent-but-wrong transform. */
class JpegCodecSpec extends SparkSpec {
  import spark.implicits._

  private def dcBlock(dc: Int): Array[Int] = {
    val z = new Array[Int](64); z(0) = dc; z
  }
  private val flatQ = Array.fill(64)(16)

  // independent reference: direct (non-separable) IDCT + level shift
  private def refIdctPixels(zig: Array[Int], quant: Array[Int]): Array[Int] = {
    val coef = new Array[Int](64)
    for (z <- 0 until 64)
      coef(JpegCodec.Zigzag(z)) = zig(z) * quant(JpegCodec.Zigzag(z))
    val out = new Array[Int](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8) {
        val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
        s += cu * cv * coef(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          math.cos((2 * y + 1) * v * math.Pi / 16.0)
      }
      val px = math.round(s / 4.0).toInt + 128
      out(y * 8 + x) = math.max(0, math.min(255, px))
    }
    out
  }

  test("DC-only gray round trip is exact: pixel = 2*dc + 128") {
    val dcs = Array(-32, 0, 31, -1, 17, 5) // 3x2 blocks
    val bytes = JpegCodec.encodeJpegGray(dcs.map(dcBlock), 24, 16, flatQ)
    val img = JpegCodec.decodeJpeg(bytes).get
    assert(img.width == 24 && img.height == 16)
    for (y <- 0 until 16; x <- 0 until 24) {
      val b = (y / 8) * 3 + (x / 8)
      val v = 2 * dcs(b) + 128
      assert(img(x, y) == ((v << 16) | (v << 8) | v),
        s"pixel ($x,$y) block $b")
    }
  }

  test("AC path matches an independent direct IDCT within 1") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 20) {
      val zig = new Array[Int](64)
      zig(0) = rnd.nextInt(64) - 32
      // a handful of AC coefficients at random zigzag positions
      for (_ <- 0 until 8)
        zig(1 + rnd.nextInt(63)) = rnd.nextInt(31) - 15
      val bytes = JpegCodec.encodeJpegGray(Array(zig), 8, 8, flatQ)
      val img = JpegCodec.decodeJpeg(bytes).get
      val ref = refIdctPixels(zig, flatQ)
      for (i <- 0 until 64)
        assert(math.abs((img.rgb(i) & 0xff) - ref(i)) <= 1,
          s"pixel $i: got ${img.rgb(i) & 0xff} ref ${ref(i)}")
    }
  }

  test("ZRL runs survive: lone coefficient after a 39-zero run") {
    val zig = new Array[Int](64)
    zig(0) = 4
    zig(40) = 9 // encoder must emit ZRL, ZRL, run-7/size-4
    val bytes = JpegCodec.encodeJpegGray(Array(zig), 8, 8, flatQ)
    val img = JpegCodec.decodeJpeg(bytes).get
    assert(img.rgb.map(_ & 0xff).toSeq ==
      refIdctPixels(zig, flatQ).toSeq)
  }

  test("restart markers resync and reset the DC predictor") {
    val dcs = Array(10, -20, 30, -31, 5, 0) // 6 blocks, 48x8
    val plain = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpegGray(dcs.map(dcBlock), 48, 8, flatQ)).get
    val rst = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpegGray(dcs.map(dcBlock), 48, 8, flatQ,
        restartInterval = 2)).get
    assert(plain.rgb.toSeq == rst.rgb.toSeq)
  }

  test("4:4:4 color: DC-only YCbCr reproduces the fixed-point formula") {
    def clamp(v: Int) = math.max(0, math.min(255, v))
    val yDc = Array(0, 16); val cbDc = Array(-10, 8); val crDc = Array(12, -6)
    val bytes = JpegCodec.encodeJpegColor444(
      yDc.map(dcBlock), cbDc.map(dcBlock), crDc.map(dcBlock), 16, 8, flatQ)
    val img = JpegCodec.decodeJpeg(bytes).get
    for (b <- 0 until 2) {
      val yy = 2 * yDc(b) + 128
      val cb = 2 * cbDc(b) + 128 - 128
      val cr = 2 * crDc(b) + 128 - 128
      val r = clamp(yy + ((91881 * cr + 32768) >> 16))
      val g = clamp(yy - ((22554 * cb + 46802 * cr + 32768) >> 16))
      val bl = clamp(yy + ((116130 * cb + 32768) >> 16))
      val px = img(b * 8 + 3, 4)
      assert(px == ((r << 16) | (g << 8) | bl), s"block $b")
    }
  }

  test("MCU padding is cropped: 12x10 image from 2x2 blocks") {
    val dcs = Array(1, 2, 3, 4)
    val bytes = JpegCodec.encodeJpegGray(dcs.map(dcBlock), 12, 10, flatQ)
    val img = JpegCodec.decodeJpeg(bytes).get
    assert(img.width == 12 && img.height == 10)
    assert((img(0, 0) & 0xff) == 2 * 1 + 128)
    assert((img(11, 0) & 0xff) == 2 * 2 + 128) // right block, cropped
    assert((img(0, 9) & 0xff) == 2 * 3 + 128)
    assert((img(11, 9) & 0xff) == 2 * 4 + 128)
  }

  test("ImageIO decodes our gray stream (cross-implementation, exact " +
      "on flat blocks)") {
    val dcs = Array(-32, 31, 0, 7)
    val bytes = JpegCodec.encodeJpegGray(dcs.map(dcBlock), 32, 8, flatQ)
    val bi = ImageIO.read(new ByteArrayInputStream(bytes))
    assert(bi != null && bi.getWidth == 32 && bi.getHeight == 8)
    for (b <- 0 until 4) {
      val v = 2 * dcs(b) + 128
      // raw raster sample, not getRGB — the latter gamma-maps gray to sRGB
      assert(bi.getRaster.getSample(b * 8 + 4, 4, 0) == v, s"block $b")
    }
  }

  test("we decode ImageIO's gray JPEG (cross-implementation, constant " +
      "raster within DC quantization error)") {
    val bi = new BufferedImage(24, 24, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 24; x <- 0 until 24)
      bi.getRaster.setSample(x, y, 0, 160)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(bi, "jpg", bos)
    val img = JpegCodec.decodeJpeg(bos.toByteArray)
    assert(img.isDefined, "ImageIO gray JPEG should be in-profile")
    assert(img.get.width == 24 && img.get.height == 24)
    // constant image: every decoded pixel within the DC quantizer step
    assert(img.get.rgb.forall(p => math.abs((p & 0xff) - 160) <= 4))
  }

  test("reject paths: progressive marker, truncated stream, foreign bytes") {
    val good = JpegCodec.encodeJpegGray(Array(dcBlock(5)), 8, 8, flatQ)
    // flip SOF0 (FFC0) to SOF2 (FFC2) = progressive
    val prog = good.clone()
    val sof = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    assert(JpegCodec.decodeJpeg(prog).isEmpty)
    assert(JpegCodec.decodeJpeg(good.take(good.length / 2)).isEmpty)
    assert(JpegCodec.decodeJpeg("not a jpeg".getBytes).isEmpty)
    assert(JpegCodec.decodeJpeg(Array[Byte]()).isEmpty)
  }

  test("no-throw contract: crafted in-bounds-length corruption and " +
      "exhaustive single-byte fuzz degrade to None, never throw") {
    val good = JpegCodec.encodeJpegGray(
      Array(dcBlock(5), dcBlock(-9)), 16, 8, flatQ)
    def marker(m: Int): Int = good.indices.find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == m).get
    // SOS Td/Ta nibbles forced to 0xF: table ids would index 4-element
    // arrays out of bounds without the range check
    val sos = marker(0xda)
    // FFDA len(2) Ns Cs1 TdTa1 — TdTa of the first component is sos+6
    val badSos = good.clone(); badSos(sos + 6) = 0xff.toByte
    assert(JpegCodec.decodeJpeg(badSos).isEmpty)
    // SOF0 Tq byte (quant-table id) forced past 3
    // FFC0 len(2) P h(2) w(2) Nf Cid1 HV1 Tq1 — Tq1 is sof+12
    val sof = marker(0xc0)
    val badTq = good.clone(); badTq(sof + 12) = 0x07.toByte
    assert(JpegCodec.decodeJpeg(badTq).isEmpty)
    // DQT declared length shrunk below its 64-entry payload: the table
    // loop must not read past the (in-bounds) segment end
    val dqt = marker(0xdb)
    val badDqt = good.clone()
    badDqt(dqt + 2) = 0; badDqt(dqt + 3) = 0x10
    assert(JpegCodec.decodeJpeg(badDqt).isEmpty)
    // every single-byte mutation of the whole stream: decode may
    // succeed or reject, but must never throw (kills the Spark task)
    for (i <- good.indices; v <- Seq(0x00, 0xff, 0x3c)) {
      val fuzz = good.clone(); fuzz(i) = v.toByte
      JpegCodec.decodeJpeg(fuzz) // must not throw
    }
  }

  test("ImageCodec.decode dispatches FFD8 to the JPEG walk") {
    val bytes = JpegCodec.encodeJpegGray(Array(dcBlock(-7)), 8, 8, flatQ)
    val img = ImageCodec.decode(bytes)
    assert(img.isDefined && (img.get.rgb(0) & 0xff) == 2 * -7 + 128)
  }

  test("4:2:0: DC-only round trip is exact — Y per 8x8 block, chroma " +
      "replicated per 16x16 MCU") {
    def clamp(v: Int) = math.max(0, math.min(255, v))
    // 32x16 = 2 MCUs; Y blocks (bx,by) in a 4x2 grid
    def dcY(bx: Int, by: Int) = (5 * bx + 7 * by) % 64 - 32
    def dcCb(mx: Int) = (3 * mx + 5) % 64 - 32
    def dcCr(mx: Int) = (7 * mx + 11) % 64 - 32
    val yBlocks = Array.tabulate(2 * 4) { i =>
      val mcu = i / 4; val u = i % 4
      dcBlock(dcY(mcu * 2 + u % 2, u / 2))
    }
    val cb = Array.tabulate(2)(mx => dcBlock(dcCb(mx)))
    val cr = Array.tabulate(2)(mx => dcBlock(dcCr(mx)))
    val bytes = JpegCodec.encodeJpeg420(yBlocks, cb, cr, 32, 16, flatQ)
    val img = JpegCodec.decodeJpeg(bytes).get
    assert(img.width == 32 && img.height == 16)
    for (y <- 0 until 16; x <- 0 until 32) {
      val yy = 2 * dcY(x / 8, y / 8) + 128
      val cb2 = 2 * dcCb(x / 16)
      val cr2 = 2 * dcCr(x / 16)
      val er = clamp(yy + ((91881 * cr2 + 32768) >> 16))
      val eg = clamp(yy - ((22554 * cb2 + 46802 * cr2 + 32768) >> 16))
      val eb = clamp(yy + ((116130 * cb2 + 32768) >> 16))
      assert(img(x, y) == ((er << 16) | (eg << 8) | eb), s"($x,$y)")
    }
  }

  test("we decode ImageIO's default color JPEG (a real 4:2:0 stream " +
      "from another encoder)") {
    val bi = new BufferedImage(32, 32, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 32; x <- 0 until 32)
      bi.setRGB(x, y, 0x6090C0) // constant color: subsampling-lossless
    val bos = new ByteArrayOutputStream()
    ImageIO.write(bi, "jpg", bos)
    val img = JpegCodec.decodeJpeg(bos.toByteArray)
    assert(img.isDefined, "ImageIO default color JPEG should decode")
    assert(img.get.width == 32 && img.get.height == 32)
    // constant image: every pixel within quantization error of source
    img.get.rgb.foreach { p =>
      assert(math.abs(((p >> 16) & 0xff) - 0x60) <= 6 &&
        math.abs(((p >> 8) & 0xff) - 0x90) <= 6 &&
        math.abs((p & 0xff) - 0xC0) <= 6, f"pixel $p%06x")
    }
  }

  test("syntheticMixedJpegPayloads: odd ids decode as color with the " +
      "fixed-point conversion, even ids stay gray") {
    def clamp(v: Int) = math.max(0, math.min(255, v))
    val docs = Seq(2L, 3L).toDF("doc_id")
    val imgs = Multimodal.syntheticMixedJpegPayloads(docs, "doc_id")
      .collect()
      .map(r => r.getLong(0) ->
        ImageCodec.decode(r.getAs[Array[Byte]](1)).get).toMap
    val gray = imgs(2L) // block (0,0): dc = (3*2) % 64 - 32 = -26
    assert((gray(0, 0) & 0xff) == 2 * -26 + 128)
    assert(((gray(0, 0) >> 16) & 0xff) == (gray(0, 0) & 0xff))
    val color = imgs(3L) // block (0,0) of id 3
    val yv = 2 * ((9 % 64) - 32) + 128
    val cb2 = 2 * ((3 % 64) - 32)
    val cr2 = 2 * ((6 % 64) - 32)
    val er = clamp(yv + ((91881 * cr2 + 32768) >> 16))
    val eg = clamp(yv - ((22554 * cb2 + 46802 * cr2 + 32768) >> 16))
    val eb = clamp(yv + ((116130 * cb2 + 32768) >> 16))
    assert(color(0, 0) == ((er << 16) | (eg << 8) | eb))
  }

  test("syntheticJpegPayloads: decoded stats equal the closed form") {
    val docs = Tables.documents(spark, sf).limit(40)
    val stats = Multimodal.imagePixelStats(spark,
      Multimodal.syntheticJpegPayloads(docs, "doc_id"), side = 4)
      .collect()
    assert(stats.nonEmpty && stats.forall(_.getBoolean(7)))
    stats.foreach { r =>
      val id = r.getLong(0)
      val wB = (1 + id % 3).toInt; val hB = (1 + (id / 3) % 3).toInt
      assert(r.getInt(1) == wB * 8 && r.getInt(2) == hB * 8)
      def dc(bx: Int, by: Int) = (((5 * bx + 7 * by + 3 * id) % 64) - 32).toInt
      val expSum = (for (bx <- 0 until wB; by <- 0 until hB)
        yield 64L * (2 * dc(bx, by) + 128)).sum
      assert(r.getLong(3) == expSum && r.getLong(4) == expSum &&
        r.getLong(5) == expSum)
      val expLuma = (for (tx <- 0 until 4; ty <- 0 until 4) yield {
        val sx = tx * (wB * 8) / 4; val sy = ty * (hB * 8) / 4
        (2 * dc(sx / 8, sy / 8) + 128).toLong
      }).sum
      assert(r.getLong(6) == expLuma)
    }
  }
}
