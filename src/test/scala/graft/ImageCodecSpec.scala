package graft

import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.functions._
import graft.functions.ImageCodec
import graft.functions.ImageCodec.Image
import graft.operators.Multimodal

/** The pure-JVM BMP/PNG codec, pinned three ways: (1) own-round-trip
  * on random rasters; (2) cross-implementation against the JDK's
  * ImageIO in BOTH directions (our decoder on ImageIO bytes, ImageIO
  * on our bytes) — an independent codec agreeing byte-for-byte rules
  * out a self-consistent-but-wrong format walk; (3) hand-built
  * streams covering every PNG scanline filter, gray/RGBA color
  * types, and the 32-bit/top-down BMP variants the generic encoders
  * rarely emit. Then the Spark plumbing: decodeResizeFeaturize on
  * real PNG payloads and the q214 closed-form stats identity. */
class ImageCodecSpec extends SparkSpec {
  import spark.implicits._

  private def randImage(rnd: scala.util.Random, w: Int, h: Int): Image =
    Image(w, h, Array.fill(w * h)(rnd.nextInt(1 << 24)))

  private def toBuffered(img: Image): BufferedImage = {
    val bi = new BufferedImage(img.width, img.height,
      BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until img.height; x <- 0 until img.width)
      bi.setRGB(x, y, img(x, y))
    bi
  }

  private def imageioBytes(bi: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(bi, fmt, bos), s"ImageIO has no $fmt writer")
    bos.toByteArray
  }

  private def assertPixelsEqual(got: Image, want: Image): Unit = {
    assert(got.width == want.width && got.height == want.height)
    assert(java.util.Arrays.equals(got.rgb, want.rgb))
  }

  test("BMP and PNG round-trip exactly on random rasters (incl. odd widths)") {
    val rnd = new scala.util.Random(81)
    // odd widths exercise the BMP row padding; 1×1 the degenerate edge
    for ((w, h) <- Seq((1, 1), (3, 2), (7, 5), (16, 16), (13, 9), (31, 4))) {
      val img = randImage(rnd, w, h)
      assertPixelsEqual(ImageCodec.decodeBmp(ImageCodec.encodeBmp24(img)).get, img)
      assertPixelsEqual(ImageCodec.decodePng(ImageCodec.encodePng(img)).get, img)
    }
  }

  test("cross-implementation: our decoder equals ImageIO, both directions") {
    val rnd = new scala.util.Random(82)
    for (_ <- 1 to 5) {
      val img = randImage(rnd, 5 + rnd.nextInt(20), 5 + rnd.nextInt(20))
      val bi = toBuffered(img)
      // our decoder on ImageIO-encoded bytes
      assertPixelsEqual(ImageCodec.decode(imageioBytes(bi, "png")).get, img)
      assertPixelsEqual(ImageCodec.decode(imageioBytes(bi, "bmp")).get, img)
      // ImageIO's decoder on our bytes
      for (bytes <- Seq(ImageCodec.encodePng(img), ImageCodec.encodeBmp24(img))) {
        val back = ImageIO.read(new ByteArrayInputStream(bytes))
        assert(back.getWidth == img.width && back.getHeight == img.height)
        for (y <- 0 until img.height; x <- 0 until img.width)
          assert((back.getRGB(x, y) & 0xffffff) == img(x, y),
            s"pixel ($x,$y)")
      }
    }
  }

  test("PNG: all five scanline filters unfilter correctly") {
    // hand-build a PNG whose rows use filters 0..4 in turn, applying
    // each filter's ENCODE transform to known pixel bytes; decoding
    // must recover the original raster through every inverse.
    val rnd = new scala.util.Random(83)
    val w = 6; val h = 5; val bpp = 3
    val img = randImage(rnd, w, h)
    val stride = w * bpp
    def rowBytes(y: Int): Array[Byte] = {
      val r = new Array[Byte](stride)
      for (x <- 0 until w) {
        val px = img(x, y)
        r(x * 3) = (px >> 16).toByte; r(x * 3 + 1) = (px >> 8).toByte
        r(x * 3 + 2) = px.toByte
      }
      r
    }
    val raw = new ByteArrayOutputStream()
    var prev = new Array[Byte](stride) // zero row above the first
    for (y <- 0 until h) {
      val cur = rowBytes(y)
      val f = y % 5
      raw.write(f)
      for (x <- 0 until stride) {
        val a = if (x >= bpp) cur(x - bpp) & 0xff else 0
        val b = prev(x) & 0xff
        val c = if (x >= bpp) prev(x - bpp) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        raw.write(((cur(x) & 0xff) - pred) & 0xff)
      }
      prev = cur
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw.toByteArray); deflater.finish()
    val comp = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    def chunk(t: String, d: Array[Byte]): Unit = {
      def be(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
        (v >> 8).toByte, v.toByte)
      out.write(be(d.length)); out.write(t.getBytes("US-ASCII"))
      out.write(d)
      val crc = new java.util.zip.CRC32()
      crc.update(t.getBytes("US-ASCII")); crc.update(d)
      out.write(be(crc.getValue.toInt))
    }
    chunk("IHDR", Array[Byte](0, 0, 0, w.toByte, 0, 0, 0, h.toByte,
      8, 2, 0, 0, 0))
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    assertPixelsEqual(ImageCodec.decodePng(out.toByteArray).get, img)
  }

  test("PNG gray and RGBA color types decode (via ImageIO encoders)") {
    val gray = new BufferedImage(9, 7, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 7; x <- 0 until 9) {
      val v = (x * 29 + y * 13) % 256
      gray.getRaster.setSample(x, y, 0, v)
    }
    val gGot = ImageCodec.decodePng(imageioBytes(gray, "png")).get
    for (y <- 0 until 7; x <- 0 until 9) {
      val v = (x * 29 + y * 13) % 256
      assert(gGot(x, y) == ((v << 16) | (v << 8) | v), s"gray ($x,$y)")
    }
    val argb = new BufferedImage(8, 6, BufferedImage.TYPE_INT_ARGB)
    val rnd = new scala.util.Random(84)
    val pix = Array.fill(8 * 6)(rnd.nextInt() | 0x01000000) // vary alpha too
    for (y <- 0 until 6; x <- 0 until 8) argb.setRGB(x, y, pix(y * 8 + x))
    val aGot = ImageCodec.decodePng(imageioBytes(argb, "png")).get
    for (y <- 0 until 6; x <- 0 until 8)
      assert(aGot(x, y) == (pix(y * 8 + x) & 0xffffff), s"rgba ($x,$y)")
  }

  test("BMP: 32-bit and top-down variants decode") {
    val rnd = new scala.util.Random(85)
    val img = randImage(rnd, 5, 4)
    // hand-build: 32bpp (no padding), negative height = top-down rows
    val stride = img.width * 4
    val size = 54 + stride * img.height
    val b = new Array[Byte](size)
    def putLe32(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'; putLe32(2, size); putLe32(10, 54)
    putLe32(14, 40); putLe32(18, img.width); putLe32(22, -img.height)
    b(26) = 1; b(28) = 32
    for (y <- 0 until img.height; x <- 0 until img.width) {
      val o = 54 + y * stride + x * 4 // top-down: row y stored y-th
      val px = img(x, y)
      b(o) = px.toByte; b(o + 1) = (px >> 8).toByte
      b(o + 2) = (px >> 16).toByte; b(o + 3) = 0xff.toByte
    }
    assertPixelsEqual(ImageCodec.decodeBmp(b).get, img)
  }

  test("foreign/corrupt bytes decode to None, never throw") {
    val rnd = new scala.util.Random(86)
    assert(ImageCodec.decode("not an image".getBytes).isEmpty)
    assert(ImageCodec.decode(Array.emptyByteArray).isEmpty)
    val png = ImageCodec.encodePng(randImage(rnd, 6, 6))
    assert(ImageCodec.decodePng(png.take(30)).isEmpty)       // truncated
    val bmp = ImageCodec.encodeBmp24(randImage(rnd, 6, 6))
    assert(ImageCodec.decodeBmp(bmp.take(40)).isEmpty)
    // random garbage behind valid magic must not throw
    for (_ <- 1 to 20) {
      val junk = Array.fill(60 + rnd.nextInt(200))(rnd.nextInt().toByte)
      junk(0) = 'B'; junk(1) = 'M'
      ImageCodec.decodeBmp(junk)
      val junk2 = Array.fill(60 + rnd.nextInt(200))(rnd.nextInt().toByte)
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        .copyToArray(junk2)
      ImageCodec.decodePng(junk2)
    }
  }

  test("decodeResizeFeaturize: real PNG payloads give decoded dims + luma grid") {
    val rnd = new scala.util.Random(87)
    val imgs = (1L to 4L).map(id =>
      id -> randImage(rnd, 6 + id.toInt, 5 + id.toInt)).toMap
    val payloads = imgs.toSeq
      .map { case (id, im) => (id, ImageCodec.encodePng(im)) }
      .toDF("doc_id", "payload")
    val got = Multimodal.decodeResizeFeaturize(spark, payloads, targetSide = 4)
      .collect().map(m => m.doc_id -> m).toMap
    imgs.foreach { case (id, im) =>
      val m = got(id)
      assert(m.width == im.width && m.height == im.height)
      val small = ImageCodec.resizeNearest(im, 4)
      val want = small.rgb.map(px => ImageCodec.luma(px) / 255.0f)
      assert(m.features.toSeq == want.toSeq)
    }
    // non-image payloads fall back to the documented stand-in dims
    val stub = Multimodal.decodeResizeFeaturize(spark,
      Seq((9L, "plain text".getBytes)).toDF("doc_id", "payload"), 4)
      .collect().head
    assert(stub.width == (16 + 9 % 16) && stub.height == (16 + (9 * 7) % 16))
  }

  test("q214 stats equal the closed form (the oracle identity, in Scala)") {
    val docs = Seq(2L, 3L, 10L, 25L).toDF("doc_id")
    val out = Multimodal.imagePixelStats(spark,
        Multimodal.syntheticImagePayloads(docs, "doc_id"), side = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    for (d <- Seq(2L, 3L, 10L, 25L)) {
      val w = (8 + d % 9).toInt; val h = (8 + 3 * d % 9).toInt
      def r(x: Int) = ((7 * x + d) % 256).toInt
      def g(y: Int) = ((11 * y + 2 * d) % 256).toInt
      def bl(x: Int, y: Int) = ((x + y + 3 * d) % 256).toInt
      val row = out(d)
      assert(row.getInt(1) == w && row.getInt(2) == h)
      assert(row.getLong(3) ==
        (for (x <- 0 until w; y <- 0 until h) yield r(x).toLong).sum)
      assert(row.getLong(4) ==
        (for (x <- 0 until w; y <- 0 until h) yield g(y).toLong).sum)
      assert(row.getLong(5) ==
        (for (x <- 0 until w; y <- 0 until h) yield bl(x, y).toLong).sum)
      val lum = (for (ty <- 0 until 4; tx <- 0 until 4) yield {
        val sx = tx * w / 4; val sy = ty * h / 4
        ((77 * r(sx) + 150 * g(sy) + 29 * bl(sx, sy)) >> 8).toLong
      }).sum
      assert(row.getLong(6) == lum && row.getBoolean(7))
    }
  }

  // --- round-9 real-crawl PNG profiles: paletted + grayscale ------------

  test("PNG paletted (PLTE): round-trip at bit depths 1/2/4/8") {
    val rnd = new scala.util.Random(91)
    for (depth <- Seq(1, 2, 4, 8)) {
      val nColors = 1 << depth
      val palette = Array.fill(math.min(nColors, 11) max 2)(
        rnd.nextInt(1 << 24))
      val (w, h) = (7, 5) // odd width exercises sub-byte row padding
      val indices = Array.fill(w * h)(rnd.nextInt(palette.length))
      val bytes = ImageCodec.encodePngPaletted(indices, palette, w, h, depth)
      val img = ImageCodec.decodePng(bytes).get
      assert(img.width == w && img.height == h)
      for (p <- 0 until w * h)
        assert(img.rgb(p) == palette(indices(p)), s"depth $depth px $p")
    }
  }

  test("PNG grayscale: sub-byte depths scale by 255/(2^d-1); " +
      "gray+alpha drops alpha") {
    val rnd = new scala.util.Random(92)
    for ((depth, scale) <- Seq((1, 255), (2, 85), (4, 17), (8, 1))) {
      val (w, h) = (9, 4)
      val vals = Array.fill(w * h)(rnd.nextInt(1 << depth))
      val img = ImageCodec.decodePng(
        ImageCodec.encodePngGray(vals, w, h, depth)).get
      for (p <- 0 until w * h) {
        val v = vals(p) * scale
        assert(img.rgb(p) == ((v << 16) | (v << 8) | v),
          s"depth $depth px $p")
      }
    }
    val (w, h) = (5, 3)
    val vals = Array.fill(w * h)(rnd.nextInt(256))
    val alphas = Array.fill(w * h)(rnd.nextInt(256))
    val img = ImageCodec.decodePng(
      ImageCodec.encodePngGrayAlpha(vals, alphas, w, h)).get
    for (p <- 0 until w * h) {
      val v = vals(p)
      assert(img.rgb(p) == ((v << 16) | (v << 8) | v))
    }
  }

  test("cross-implementation: ImageIO paletted/gray PNGs decode " +
      "identically, and ImageIO reads our paletted/gray bytes") {
    val rnd = new scala.util.Random(93)
    // ImageIO TYPE_BYTE_INDEXED writes a real PLTE PNG
    val pal = Array.tabulate(16)(j =>
      (j * 17 << 16) | ((j * 13 % 256) << 8) | (j * 7 % 256))
    val cm = new java.awt.image.IndexColorModel(4, pal.length,
      pal.map(p => ((p >> 16) & 0xff).toByte),
      pal.map(p => ((p >> 8) & 0xff).toByte),
      pal.map(p => (p & 0xff).toByte))
    val biIdx = new BufferedImage(11, 6,
      BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until 6; x <- 0 until 11)
      biIdx.setRGB(x, y, pal(rnd.nextInt(pal.length)))
    val gotIdx = ImageCodec.decode(imageioBytes(biIdx, "png")).get
    for (y <- 0 until 6; x <- 0 until 11)
      assert(gotIdx(x, y) == (biIdx.getRGB(x, y) & 0xffffff),
        s"indexed ($x,$y)")
    // ImageIO TYPE_BYTE_GRAY writes a real color-type-0 PNG. Compare
    // RAW raster samples (set/getRGB on TYPE_BYTE_GRAY routes through
    // an sRGB↔linear conversion that never reaches the PNG bytes —
    // the container carries the raster samples verbatim).
    val biGray = new BufferedImage(8, 7, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 7; x <- 0 until 8)
      biGray.getRaster.setSample(x, y, 0, rnd.nextInt(256))
    val gotGray = ImageCodec.decode(imageioBytes(biGray, "png")).get
    for (y <- 0 until 7; x <- 0 until 8) {
      val v = biGray.getRaster.getSample(x, y, 0)
      assert(gotGray(x, y) == ((v << 16) | (v << 8) | v),
        s"gray ($x,$y)")
    }
    // …and the reverse direction on our new encoders
    val indices = Array.fill(10 * 5)(rnd.nextInt(pal.length))
    val ours = ImageCodec.encodePngPaletted(indices, pal, 10, 5, 4)
    val back = ImageIO.read(new ByteArrayInputStream(ours))
    for (y <- 0 until 5; x <- 0 until 10)
      assert((back.getRGB(x, y) & 0xffffff) == pal(indices(y * 10 + x)))
    val gvals = Array.fill(6 * 6)(rnd.nextInt(256))
    val oursG = ImageCodec.encodePngGray(gvals, 6, 6, 8)
    val backG = ImageIO.read(new ByteArrayInputStream(oursG))
    for (y <- 0 until 6; x <- 0 until 6) // raw samples, as above
      assert(backG.getRaster.getSample(x, y, 0) == gvals(y * 6 + x))
  }
}
