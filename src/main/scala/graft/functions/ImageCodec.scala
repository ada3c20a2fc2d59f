package graft.functions

import java.util.zip.{CRC32, Deflater, Inflater}

/** From-scratch pure-JVM image codec — the round-8 close of the last
  * "partial by environment" survey row. The sandbox has no native
  * image libraries, but two real container formats need none: BMP
  * (BITMAPINFOHEADER, uncompressed 24/32-bit) is plain header
  * arithmetic, and PNG's only compression is zlib DEFLATE, which
  * `java.util.zip` ships in every JDK. So the decode step in
  * [[graft.operators.Multimodal]] is no longer a stub for these
  * formats: bytes in, exact pixels out, implemented from the public
  * format specs (BMP: Windows BITMAPINFOHEADER layout; PNG: RFC 2083
  * — signature, chunk CRCs, IHDR, IDAT concatenation, the five
  * scanline filters including Paeth).
  *
  * Same design stance as the SQLite file decoder
  * (`sources/sqlite/SqliteFile.scala`): a byte-level decoder is pure
  * per-row compute — it rides `mapPartitions` with zero shuffle and
  * scales embarrassingly; the engine-level question is only batch
  * shape and schema, which [[graft.operators.Multimodal]] owns.
  *
  * Everything is deterministic integer arithmetic (including the
  * packed-RGB pixel layout and the 77/150/29 integer luma), so any
  * statistic published from decoded pixels is oracle-replayable.
  *
  * Decoders return None (never throw) on foreign/corrupt bytes so a
  * mixed-format corpus degrades per row, not per job. */
object ImageCodec {

  /** Decoded raster: `rgb(y*width + x)` is 0xRRGGBB (alpha dropped;
    * PNG type-6 alpha is decoded then discarded — stats here are
    * color-plane stats). */
  final case class Image(width: Int, height: Int, rgb: Array[Int]) {
    def apply(x: Int, y: Int): Int = rgb(y * width + x)
  }

  // ---------------------------------------------------------------- BMP

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Uncompressed 24/32-bit BITMAPINFOHEADER BMP. Handles bottom-up
    * (positive biHeight, the common case) and top-down (negative)
    * row order and the 4-byte row padding of the 24-bit layout. */
  def decodeBmp(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOff = le32(bytes, 10)
    val hdrSize = le32(bytes, 14)
    if (hdrSize < 40) return None // BITMAPCOREHEADER not supported
    val w = le32(bytes, 18)
    val hRaw = le32(bytes, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    if (w <= 0 || h <= 0 || compression != 0 ||
        (bpp != 24 && bpp != 32)) return None
    if (w.toLong * h > 64L * 1024 * 1024) return None // 64M-pixel guard
    val bytesPerPx = bpp / 8
    val stride = ((w * bytesPerPx + 3) / 4) * 4
    if (dataOff.toLong + stride.toLong * h > bytes.length) return None
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      var x = 0
      var o = dataOff + srcRow * stride
      val rowBase = y * w
      while (x < w) {
        val b = bytes(o) & 0xff
        val g = bytes(o + 1) & 0xff
        val r = bytes(o + 2) & 0xff
        out(rowBase + x) = (r << 16) | (g << 8) | b
        o += bytesPerPx
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, out))
  }

  /** 24-bit bottom-up BMP encoder (the standard 54-byte header) —
    * fixture/test-side twin of [[decodeBmp]], also used by the q214
    * registered query to manufacture real container bytes in-engine. */
  def encodeBmp24(img: Image): Array[Byte] = {
    val stride = ((img.width * 3 + 3) / 4) * 4
    val size = 54 + stride * img.height
    val b = new Array[Byte](size)
    def putLe32(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    putLe32(2, size); putLe32(10, 54)
    putLe32(14, 40); putLe32(18, img.width); putLe32(22, img.height)
    b(26) = 1; b(28) = 24 // planes=1, bpp=24, compression=0 already
    putLe32(34, stride * img.height)
    var y = 0
    while (y < img.height) {
      var x = 0
      var o = 54 + (img.height - 1 - y) * stride
      while (x < img.width) {
        val px = img(x, y)
        b(o) = px.toByte            // B
        b(o + 1) = (px >> 8).toByte // G
        b(o + 2) = (px >> 16).toByte
        o += 3; x += 1
      }
      y += 1
    }
    b
  }

  // ---------------------------------------------------------------- PNG

  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  /** 8-bit-depth non-interlaced PNG, color types 0 (gray), 2 (RGB)
    * and 6 (RGBA): signature check, chunk walk (IDAT segments
    * concatenated — encoders may split them arbitrarily), one
    * Inflater pass, then per-scanline unfiltering with all five RFC
    * 2083 filters. Chunk CRCs are NOT verified (zlib's own adler32
    * already guards the pixel stream; CRC checking doubles the byte
    * walks for corruption classes that can't silently produce valid
    * inflate output). */
  def decodePng(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 45) return None
    var i = 0
    while (i < 8) { if (bytes(i) != PngSig(i)) return None; i += 1 }
    var off = 8
    var w = 0; var h = 0; var colorType = -1
    var idat = Array.emptyByteArray
    var idatLen = 0
    var sawEnd = false
    while (off + 8 <= bytes.length && !sawEnd) {
      val len = be32(bytes, off)
      if (len < 0 || off + 12L + len > bytes.length) return None
      val ctype = new String(bytes, off + 4, 4, "US-ASCII")
      ctype match {
        case "IHDR" =>
          if (len != 13) return None
          w = be32(bytes, off + 8); h = be32(bytes, off + 12)
          val bitDepth = bytes(off + 16) & 0xff
          colorType = bytes(off + 17) & 0xff
          val interlace = bytes(off + 20) & 0xff
          if (bitDepth != 8 || interlace != 0 ||
              (colorType != 0 && colorType != 2 && colorType != 6))
            return None
          if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024)
            return None
        case "IDAT" =>
          if (idat.length < idatLen + len) {
            val grown = new Array[Byte](math.max(idatLen + len, idat.length * 2 + 64))
            System.arraycopy(idat, 0, grown, 0, idatLen)
            idat = grown
          }
          System.arraycopy(bytes, off + 8, idat, idatLen, len)
          idatLen += len
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped
      }
      off += 12 + len
    }
    if (w == 0 || colorType < 0 || idatLen == 0) return None
    val bpp = colorType match { case 0 => 1; case 2 => 3; case _ => 4 }
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new Inflater()
    try {
      inf.setInput(idat, 0, idatLen)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        got += n
      }
      if (got != raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()

    // unfilter in place over a prev-row buffer, then pack
    val out = new Array[Int](w * h)
    val prev = new Array[Byte](stride)
    val cur = new Array[Byte](stride)
    var y = 0
    while (y < h) {
      val base = y * (stride + 1)
      val filter = raw(base) & 0xff
      System.arraycopy(raw, base + 1, cur, 0, stride)
      filter match {
        case 0 => ()
        case 1 => // Sub
          var x = bpp
          while (x < stride) {
            cur(x) = (cur(x) + cur(x - bpp)).toByte; x += 1 }
        case 2 => // Up
          var x = 0
          while (x < stride) { cur(x) = (cur(x) + prev(x)).toByte; x += 1 }
        case 3 => // Average
          var x = 0
          while (x < stride) {
            val a = if (x >= bpp) cur(x - bpp) & 0xff else 0
            val b = prev(x) & 0xff
            cur(x) = (cur(x) + ((a + b) >> 1)).toByte; x += 1
          }
        case 4 => // Paeth
          var x = 0
          while (x < stride) {
            val a = if (x >= bpp) cur(x - bpp) & 0xff else 0
            val b = prev(x) & 0xff
            val c = if (x >= bpp) prev(x - bpp) & 0xff else 0
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a
                       else if (pb <= pc) b else c
            cur(x) = (cur(x) + pred).toByte; x += 1
          }
        case _ => return None
      }
      var x = 0
      val rowBase = y * w
      while (x < w) {
        val px = colorType match {
          case 0 =>
            val v = cur(x) & 0xff; (v << 16) | (v << 8) | v
          case 2 =>
            ((cur(x * 3) & 0xff) << 16) | ((cur(x * 3 + 1) & 0xff) << 8) |
              (cur(x * 3 + 2) & 0xff)
          case _ =>
            ((cur(x * 4) & 0xff) << 16) | ((cur(x * 4 + 1) & 0xff) << 8) |
              (cur(x * 4 + 2) & 0xff)
        }
        out(rowBase + x) = px
        x += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    Some(Image(w, h, out))
  }

  /** Color-type-2 (RGB, filter 0 per row) PNG encoder — chunk CRCs
    * and a single Deflater-compressed IDAT. Decoded stats are what
    * get published, so Deflater's exact byte choices (which may vary
    * across JDKs) never reach a hashed output. */
  def encodePng(img: Image): Array[Byte] = {
    val stride = img.width * 3
    val raw = new Array[Byte]((stride + 1) * img.height)
    var y = 0
    while (y < img.height) {
      val base = y * (stride + 1)
      raw(base) = 0 // filter: None
      var x = 0
      while (x < img.width) {
        val px = img(x, y)
        raw(base + 1 + x * 3) = (px >> 16).toByte
        raw(base + 2 + x * 3) = (px >> 8).toByte
        raw(base + 3 + x * 3) = px.toByte
        x += 1
      }
      y += 1
    }
    val def_ = new Deflater()
    def_.setInput(raw); def_.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!def_.finished()) comp.write(buf, 0, def_.deflate(buf))
    def_.end()

    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig, 0, 8)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      def be(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
        (v >> 8).toByte, v.toByte)
      out.write(be(data.length), 0, 4)
      val tb = ctype.getBytes("US-ASCII")
      out.write(tb, 0, 4); out.write(data, 0, data.length)
      val crc = new CRC32(); crc.update(tb); crc.update(data)
      out.write(be(crc.getValue.toInt), 0, 4)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (img.width >> 24).toByte; ihdr(1) = (img.width >> 16).toByte
    ihdr(2) = (img.width >> 8).toByte; ihdr(3) = img.width.toByte
    ihdr(4) = (img.height >> 24).toByte; ihdr(5) = (img.height >> 16).toByte
    ihdr(6) = (img.height >> 8).toByte; ihdr(7) = img.height.toByte
    ihdr(8) = 8; ihdr(9) = 2 // bit depth 8, color type 2 (RGB)
    chunk("IHDR", ihdr)
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ----------------------------------------------------------- raster ops

  /** Magic-byte sniff + decode: BMP or PNG, else None (the caller
    * decides the fallback — Multimodal keeps its byte-feature stub
    * for formats that genuinely need native codecs, e.g. JPEG). */
  def decode(bytes: Array[Byte]): Option[Image] =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M')
      decodeBmp(bytes)
    else if (bytes.length >= 8 && bytes(0) == PngSig(0) && bytes(1) == 'P')
      decodePng(bytes)
    else None

  /** Nearest-neighbor resize to side×side — source index
    * floor(t·src/side), the standard integer mapping; deterministic,
    * so oracle SQL can replay it with integer division. */
  def resizeNearest(img: Image, side: Int): Image =
    resizeNearest(img, side, side)

  /** Non-square variant (dHash wants 9×8). */
  def resizeNearest(img: Image, w: Int, h: Int): Image = {
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val sy = y * img.height / h
      var x = 0
      while (x < w) {
        out(y * w + x) = img(x * img.width / w, sy)
        x += 1
      }
      y += 1
    }
    Image(w, h, out)
  }

  /** Integer luma (the 77/150/29 >> 8 fixed-point BT.601 weights —
    * exact, oracle-replayable). */
  def luma(px: Int): Int =
    (77 * ((px >> 16) & 0xff) + 150 * ((px >> 8) & 0xff) +
      29 * (px & 0xff)) >> 8
}
