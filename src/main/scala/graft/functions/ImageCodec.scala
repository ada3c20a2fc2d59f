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
    // dataOff is attacker-controlled: a negative value makes the
    // upper-bound sum below negative and "in bounds" — reject first
    if (dataOff < 54) return None
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

  /** Non-interlaced PNG over the real-crawl profile set (round-9
    * broadening of the original 8-bit 0/2/6 decoder): color types
    * 0 (gray, bit depths 1/2/4/8), 2 (RGB, 8), 3 (paletted via PLTE,
    * bit depths 1/2/4/8), 4 (gray+alpha, 8) and 6 (RGBA, 8) —
    * signature check, chunk walk (IDAT segments concatenated —
    * encoders may split them arbitrarily), one Inflater pass, then
    * per-scanline unfiltering with all five RFC 2083 filters (filter
    * bpp = ceil(bits-per-pixel / 8) per the spec's sub-byte rule).
    * Sub-byte samples unpack MSB-first; gray depths scale by
    * 255/(2^d−1) (= ×255/×85/×17); alpha is decoded then dropped
    * (color-plane stats, the type-6 convention). 16-bit depths and
    * Adam7 interlace remain out of profile and return None. Chunk
    * CRCs are NOT verified (zlib's own adler32 already guards the
    * pixel stream; CRC checking doubles the byte walks for corruption
    * classes that can't silently produce valid inflate output). */
  def decodePng(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 45) return None
    var i = 0
    while (i < 8) { if (bytes(i) != PngSig(i)) return None; i += 1 }
    var off = 8
    var w = 0; var h = 0; var colorType = -1; var bitDepth = 0
    var palette: Array[Int] = null
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
          bitDepth = bytes(off + 16) & 0xff
          colorType = bytes(off + 17) & 0xff
          val interlace = bytes(off + 20) & 0xff
          val profileOk = (colorType, bitDepth) match {
            case (0, 1 | 2 | 4 | 8) => true
            case (2, 8)             => true
            case (3, 1 | 2 | 4 | 8) => true
            case (4, 8)             => true
            case (6, 8)             => true
            case _                  => false
          }
          if (!profileOk || interlace != 0) return None
          if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024)
            return None
        case "PLTE" =>
          if (len % 3 != 0 || len > 768) return None
          palette = Array.tabulate(len / 3) { j =>
            ((bytes(off + 8 + j * 3) & 0xff) << 16) |
              ((bytes(off + 9 + j * 3) & 0xff) << 8) |
              (bytes(off + 10 + j * 3) & 0xff)
          }
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
    if (colorType == 3 && palette == null) return None
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case _ => 4
    }
    val bitsPerPx = channels * bitDepth
    val stride = (w * bitsPerPx + 7) / 8
    val bpp = math.max(1, bitsPerPx / 8) // filter distance, RFC 2083
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
      // sub-byte sample extraction, MSB-first (RFC 2083 §2.3); gray
      // scaling 255/(2^d−1) is exactly ×255/×85/×17 at d=1/2/4
      def sub(x: Int): Int = {
        val bitIdx = x * bitDepth
        val shift = 8 - bitDepth - (bitIdx & 7)
        (cur(bitIdx >> 3) >> shift) & ((1 << bitDepth) - 1)
      }
      val grayScale = bitDepth match {
        case 1 => 255; case 2 => 85; case 4 => 17; case _ => 1
      }
      var x = 0
      val rowBase = y * w
      while (x < w) {
        val px = colorType match {
          case 0 =>
            val v = (if (bitDepth == 8) cur(x) & 0xff else sub(x)) * grayScale
            (v << 16) | (v << 8) | v
          case 2 =>
            ((cur(x * 3) & 0xff) << 16) | ((cur(x * 3 + 1) & 0xff) << 8) |
              (cur(x * 3 + 2) & 0xff)
          case 3 =>
            val idx = if (bitDepth == 8) cur(x) & 0xff else sub(x)
            if (idx >= palette.length) return None
            palette(idx)
          case 4 =>
            val v = cur(x * 2) & 0xff; (v << 16) | (v << 8) | v
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
    pngFromRaw(img.width, img.height, bitDepth = 8, colorType = 2,
      raw = raw, plte = None)
  }

  /** Shared PNG container writer: deflate `raw` (filtered scanlines)
    * into a single IDAT and emit sig/IHDR/(PLTE)/IDAT/IEND with chunk
    * CRCs. */
  private def pngFromRaw(w: Int, h: Int, bitDepth: Int, colorType: Int,
                         raw: Array[Byte],
                         plte: Option[Array[Int]]): Array[Byte] = {
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
    ihdr(0) = (w >> 24).toByte; ihdr(1) = (w >> 16).toByte
    ihdr(2) = (w >> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >> 24).toByte; ihdr(5) = (h >> 16).toByte
    ihdr(6) = (h >> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = bitDepth.toByte; ihdr(9) = colorType.toByte
    chunk("IHDR", ihdr)
    plte.foreach { pal =>
      val data = new Array[Byte](pal.length * 3)
      var j = 0
      while (j < pal.length) {
        data(j * 3) = (pal(j) >> 16).toByte
        data(j * 3 + 1) = (pal(j) >> 8).toByte
        data(j * 3 + 2) = pal(j).toByte
        j += 1
      }
      chunk("PLTE", data)
    }
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Pack per-pixel sample values (one channel, `bitDepth` bits each,
    * MSB-first within each byte, rows byte-aligned, filter 0 per row)
    * into the raw scanline buffer [[pngFromRaw]] wants. */
  private def packScanlines(vals: Array[Int], w: Int, h: Int,
                            bitDepth: Int): Array[Byte] = {
    val stride = (w * bitDepth + 7) / 8
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      val base = y * (stride + 1)
      raw(base) = 0 // filter: None
      var x = 0
      while (x < w) {
        val v = vals(y * w + x) & ((1 << bitDepth) - 1)
        val bitIdx = x * bitDepth
        val shift = 8 - bitDepth - (bitIdx & 7)
        val o = base + 1 + (bitIdx >> 3)
        raw(o) = (raw(o) | (v << shift)).toByte
        x += 1
      }
      y += 1
    }
    raw
  }

  /** Color-type-3 (paletted) PNG at bit depth 1/2/4/8 — the
    * real-crawl profile [[decodePng]] gained in round 9; fixture-side
    * twin. `indices` are palette positions per pixel, row-major. */
  def encodePngPaletted(indices: Array[Int], palette: Array[Int],
                        w: Int, h: Int, bitDepth: Int): Array[Byte] = {
    require(Set(1, 2, 4, 8)(bitDepth) && palette.nonEmpty &&
      palette.length <= (1 << bitDepth) && indices.length == w * h)
    pngFromRaw(w, h, bitDepth, colorType = 3,
      raw = packScanlines(indices, w, h, bitDepth), plte = Some(palette))
  }

  /** Color-type-0 (grayscale) PNG at bit depth 1/2/4/8. `values` are
    * RAW samples (0 .. 2^d−1); the decoder scales them to 8-bit by
    * 255/(2^d−1). */
  def encodePngGray(values: Array[Int], w: Int, h: Int,
                    bitDepth: Int): Array[Byte] = {
    require(Set(1, 2, 4, 8)(bitDepth) && values.length == w * h)
    pngFromRaw(w, h, bitDepth, colorType = 0,
      raw = packScanlines(values, w, h, bitDepth), plte = None)
  }

  /** Color-type-4 (gray+alpha, 8-bit) PNG — alpha is carried in the
    * container and dropped by [[decodePng]] (color-plane stats). */
  def encodePngGrayAlpha(values: Array[Int], alphas: Array[Int],
                         w: Int, h: Int): Array[Byte] = {
    require(values.length == w * h && alphas.length == w * h)
    val stride = w * 2
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      val base = y * (stride + 1)
      raw(base) = 0
      var x = 0
      while (x < w) {
        raw(base + 1 + x * 2) = values(y * w + x).toByte
        raw(base + 2 + x * 2) = alphas(y * w + x).toByte
        x += 1
      }
      y += 1
    }
    pngFromRaw(w, h, bitDepth = 8, colorType = 4, raw = raw, plte = None)
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
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8)
      JpegCodec.decodeJpeg(bytes)
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
