package graft

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import graft.functions.GifCodec
import graft.operators.Multimodal

/** The pure-JVM GIF codec: own round-trip on random multi-frame
  * animations, cross-implementation agreement with ImageIO's GIF
  * plugin in both directions (their real LZW compressor exercises
  * the dict-building and cScSc decode paths our literal encoder
  * never emits), a hand-built interlaced stream, and the q216
  * closed-form identity over the Spark path. */
class GifCodecSpec extends SparkSpec {
  import spark.implicits._

  private def randPalette(rnd: scala.util.Random, n: Int): Array[Int] =
    Array.fill(n)(rnd.nextInt(1 << 24))

  test("animated GIF round-trips exactly: frames, delays, pixels") {
    val rnd = new scala.util.Random(101)
    val (w, h) = (9, 7)
    val palette = randPalette(rnd, 256)
    val frames = (0 until 4).map { f =>
      (3 + 2 * f, Array.fill(w * h)(rnd.nextInt(256).toByte)) }
    val gif = GifCodec.decodeGif(
      GifCodec.encodeGif(w, h, palette, frames)).get
    assert(gif.width == w && gif.height == h && gif.frames.length == 4)
    gif.frames.zipWithIndex.foreach { case (fr, i) =>
      assert(fr.x == 0 && fr.y == 0 && fr.width == w && fr.height == h)
      assert(fr.delayCs == 3 + 2 * i)
      val want = frames(i)._2.map(b => palette(b & 0xff))
      assert(java.util.Arrays.equals(fr.rgb, want), s"frame $i")
    }
  }

  test("long frames cross the literal-encoder CLEAR boundary exactly") {
    // 30×30 = 900 indices: four CLEAR resets inside one frame
    val rnd = new scala.util.Random(102)
    val palette = randPalette(rnd, 256)
    val idx = Array.fill(900)(rnd.nextInt(256).toByte)
    val fr = GifCodec.decodeGif(
      GifCodec.encodeGif(30, 30, palette, Seq((0, idx)))).get.frames.head
    assert(java.util.Arrays.equals(fr.rgb, idx.map(b => palette(b & 0xff))))
  }

  test("cross-implementation: ImageIO reads our GIF; we read ImageIO's LZW") {
    val rnd = new scala.util.Random(103)
    val (w, h) = (11, 8)
    val palette = randPalette(rnd, 256)
    val frames = (0 until 3).map(_ =>
      (0, Array.fill(w * h)(rnd.nextInt(256).toByte)))
    val bytes = GifCodec.encodeGif(w, h, palette, frames)
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    reader.setInput(ImageIO.createImageInputStream(
      new ByteArrayInputStream(bytes)))
    assert(reader.getNumImages(true) == 3)
    for (i <- 0 until 3) {
      val img = reader.read(i)
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.getRGB(x, y) & 0xffffff) ==
          palette(frames(i)._2(y * w + x) & 0xff), s"frame $i ($x,$y)")
    }
    reader.dispose()
    // other direction: ImageIO's REAL LZW compressor (dict growth,
    // repeated-run cScSc chains) -> our decoder. A striped image
    // compresses into multi-byte dictionary strings.
    val cmap = (0 until 256).map(i =>
      (((i * 13) % 256) << 16) | (((i * 29) % 256) << 8) | ((i * 7) % 256))
    val icm = new IndexColorModel(8, 256,
      cmap.map(c => ((c >> 16) & 0xff).toByte).toArray,
      cmap.map(c => ((c >> 8) & 0xff).toByte).toArray,
      cmap.map(c => (c & 0xff).toByte).toArray)
    val bi = new BufferedImage(40, 25, BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until 25; x <- 0 until 40)
      bi.getRaster.setSample(x, y, 0, (x / 5 + y / 3) % 7) // runs galore
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(bi, "gif", bos))
    val ours = GifCodec.decodeGif(bos.toByteArray).get
    assert(ours.frames.length == 1)
    val fr = ours.frames.head
    assert(fr.width == 40 && fr.height == 25)
    for (y <- 0 until 25; x <- 0 until 40)
      assert(fr.rgb(y * 40 + x) == cmap((x / 5 + y / 3) % 7), s"($x,$y)")
  }

  test("interlaced frames de-interlace to the correct row order") {
    // hand-build: same literal-LZW scheme, interlace bit set, rows
    // stored in the 8/8/4/2 pass order
    val rnd = new scala.util.Random(104)
    val (w, h) = (5, 13)
    val palette = randPalette(rnd, 256)
    val idx = Array.fill(w * h)(rnd.nextInt(256).toByte)
    val passOrder =
      (0 until h by 8) ++ (4 until h by 8) ++ (2 until h by 4) ++
        (1 until h by 2)
    val out = new ByteArrayOutputStream()
    def w8(v: Int) = out.write(v & 0xff)
    def w16(v: Int) = { w8(v); w8(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(w); w16(h); w8(0xf7); w8(0); w8(0)
    for (i <- 0 until 256) {
      val px = palette(i); w8(px >> 16); w8(px >> 8); w8(px) }
    w8(0x2c); w16(0); w16(0); w16(w); w16(h); w8(0x40) // interlaced
    w8(8)
    val bits = new ByteArrayOutputStream()
    var acc = 0L; var nAcc = 0
    def putCode(c: Int): Unit = {
      acc |= c.toLong << nAcc; nAcc += 9
      while (nAcc >= 8) { bits.write((acc & 0xff).toInt); acc >>= 8; nAcc -= 8 }
    }
    putCode(256)
    var k = 0
    passOrder.foreach { srcY =>
      for (x <- 0 until w) {
        if (k > 0 && k % 200 == 0) putCode(256)
        putCode(idx(srcY * w + x) & 0xff)
        k += 1
      }
    }
    putCode(257)
    if (nAcc > 0) bits.write((acc & 0xff).toInt)
    val payload = bits.toByteArray
    var off = 0
    while (off < payload.length) {
      val n = math.min(255, payload.length - off)
      w8(n); out.write(payload, off, n); off += n
    }
    w8(0); w8(0x3b)
    val fr = GifCodec.decodeGif(out.toByteArray).get.frames.head
    assert(java.util.Arrays.equals(fr.rgb, idx.map(b => palette(b & 0xff))))
  }

  test("foreign/corrupt bytes decode to None, never throw") {
    val rnd = new scala.util.Random(105)
    assert(GifCodec.decodeGif("GIF89a but no".getBytes).isEmpty)
    assert(GifCodec.decodeGif(Array.emptyByteArray).isEmpty)
    val good = GifCodec.encodeGif(6, 6, randPalette(rnd, 256),
      Seq((0, Array.fill(36)(1.toByte))))
    assert(GifCodec.decodeGif(good.take(good.length / 2)).isEmpty)
    for (_ <- 1 to 20) {
      val junk = Array.fill(80 + rnd.nextInt(300))(rnd.nextInt().toByte)
      "GIF89a".getBytes.copyToArray(junk)
      GifCodec.decodeGif(junk) // must not throw
    }
  }

  test("q216 stats equal the closed form (the oracle identity, in Scala)") {
    val docs = Seq(0L, 3L, 7L, 11L).toDF("doc_id")
    val out = Multimodal.gifFrameStats(spark,
        Multimodal.syntheticGifPayloads(docs, "doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r).toMap
    for (d <- Seq(0L, 3L, 7L, 11L)) {
      val w = (6 + d % 6).toInt; val h = (6 + 2 * d % 6).toInt
      val nf = (2 + d % 4).toInt
      assert(out.keys.count(_._1 == d) == nf)
      for (f <- 0 until nf) {
        val row = out((d, f))
        assert(row.getInt(2) == w && row.getInt(3) == h &&
          row.getInt(4) == 4 + f)
        def ch(m: Int, a: Int): Long =
          (for (x <- 0 until w; y <- 0 until h) yield {
            val idx = (x + 3 * y + 5 * f + d) % 64
            ((m * idx + a) % 256)
          }).sum
        assert(row.getLong(5) == ch(4, 1) && row.getLong(6) == ch(2, 7) &&
          row.getLong(7) == ch(5, 3))
      }
    }
  }
}
