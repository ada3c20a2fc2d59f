package graft

import javax.imageio.ImageIO

import graft.functions.JpegCodec

/** Pixel-level JPEG ENCODER (forward DCT + quantization + entropy
  * coding), pinned the same three ways as the decoder suites: exact
  * closed forms on block-constant fixtures, quantization-error-bounded
  * round trips on arbitrary rasters, and cross-implementation decode
  * of our streams by ImageIO. */
class JpegEncodeSpec extends SparkSpec {

  private val flatQ16 = Array.fill(64)(16)
  private val flatQ8 = Array.fill(64)(8)

  private def gray(img: functions.ImageCodec.Image, x: Int, y: Int): Int =
    img(x, y) & 0xff // encoder output is grayscale: r = g = b

  test("fdctQuantZig: constant block is a lone DC = round(8*(v-128)/q), " +
      "all AC exactly zero (even v — odd v lands 8*(v-128)/16 on a .5 " +
      "boundary where the fdct's ~1e-16 residual may legally tip the " +
      "round, which is why the q301 fixture is even-valued)") {
    for (v <- Seq(0, 16, 64, 128, 130, 238, 254)) {
      val z = JpegCodec.fdctQuantZig(Array.fill(64)(v), flatQ16)
      assert(z(0) == Math.round(8.0 * (v - 128) / 16).toInt, s"v=$v DC")
      assert(z.drop(1).forall(_ == 0), s"v=$v AC")
    }
  }

  test("block-constant even-valued image round-trips EXACTLY through " +
      "encodeJpegGrayPixels -> decodeJpeg (the q301 fixture contract)") {
    val (w, h) = (24, 16)
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      2 * ((5 * (x / 8) + 7 * (y / 8) + 3 * 11) % 112) + 16
    }
    val img = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpegGrayPixels(px, w, h, flatQ16)).get
    assert(img.width == w && img.height == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(gray(img, x, y) == px(y * w + x), s"($x,$y)")
  }

  test("smooth random raster round-trips within quantization error " +
      "(exercises real AC coefficients end to end)") {
    val rnd = new scala.util.Random(301)
    val (w, h) = (40, 24)
    // smooth base (gradients) + small noise: AC energy present but
    // bounded, so flat q=8 keeps the reconstruction tight
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      math.max(0, math.min(255,
        40 + 3 * x + 4 * y + rnd.nextInt(9) - 4))
    }
    val bytes = JpegCodec.encodeJpegGrayPixels(px, w, h, flatQ8)
    val img = JpegCodec.decodeJpeg(bytes).get
    val errs = for (y <- 0 until h; x <- 0 until w)
      yield math.abs(gray(img, x, y) - px(y * w + x))
    assert(errs.max <= 24, s"max=${errs.max}")
    assert(errs.sum.toDouble / errs.size <= 4.0,
      s"mean=${errs.sum.toDouble / errs.size}")
  }

  test("cross-implementation: ImageIO decodes our encoded stream to " +
      "within +-1 of our own decoder") {
    val rnd = new scala.util.Random(77)
    val (w, h) = (32, 16)
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      math.max(0, math.min(255, 128 + 5 * x - 6 * y + rnd.nextInt(7) - 3))
    }
    val bytes = JpegCodec.encodeJpegGrayPixels(px, w, h, flatQ8)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ref != null, "ImageIO must accept our baseline stream")
    val ours = JpegCodec.decodeJpeg(bytes).get
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val r = ref.getRaster.getSample(x, y, 0)
      maxDiff = math.max(maxDiff, math.abs(r - gray(ours, x, y)))
    }
    assert(maxDiff <= 1, s"maxDiff=$maxDiff")
  }

  test("non-multiple-of-8 dimensions: edge-replicated padding keeps " +
      "declared size and interior fidelity") {
    val (w, h) = (13, 11)
    val px = Array.tabulate(w * h)(i => 2 * ((3 * i) % 100) + 20)
    val img = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpegGrayPixels(px, w, h, flatQ8)).get
    assert(img.width == w && img.height == h)
    val errs = for (y <- 0 until h; x <- 0 until w)
      yield math.abs(gray(img, x, y) - px(y * w + x))
    assert(errs.max <= 32, s"max=${errs.max}")
  }
}
