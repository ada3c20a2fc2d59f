package graft.functions

/** From-scratch pure-JVM GIF89a codec — the multi-frame (video-arm)
  * sibling of [[ImageCodec]]/[[AudioCodec]]. An animated GIF is the
  * one real moving-picture container decodable without native
  * libraries: header + logical screen descriptor, global/local color
  * tables, graphic-control extensions (frame delays), and per-frame
  * LZW-compressed palette indices in 255-byte sub-blocks (GIF's
  * variable-width LSB-first LZW with CLEAR/END codes, from the
  * public GIF89a specification).
  *
  * Decoding yields each frame's OWN raster (its rect, palette
  * indices mapped through the active color table) — deliberately no
  * inter-frame compositing: frame-sampling pipelines want per-frame
  * content, and disposal-method compositing is a presentation
  * concern. Interlaced frames are de-interlaced (the 8/8/4/2 row
  * passes). Transparency is ignored (the transparent index still
  * maps through the palette) — stats here are color-table stats.
  *
  * The encoder writes full-frame images over one global color table
  * using the classic literal-code LZW form (a CLEAR every 200
  * literals keeps both sides at the post-clear code width) — valid
  * GIF any decoder accepts, no compression-ratio claims. Decoders
  * return None on foreign/corrupt bytes. */
object GifCodec {

  /** One decoded frame: its rect within the logical screen, the
    * graphic-control delay (centiseconds, 0 if absent), and its own
    * raster as packed 0xRRGGBB. */
  final case class Frame(x: Int, y: Int, width: Int, height: Int,
                         delayCs: Int, rgb: Array[Int])
  final case class Gif(width: Int, height: Int, frames: Vector[Frame])

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** GIF87a/89a decode. */
  def decodeGif(bytes: Array[Byte]): Option[Gif] = {
    if (bytes.length < 13) return None
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val sw = le16(bytes, 6); val sh = le16(bytes, 8)
    if (sw <= 0 || sh <= 0) return None
    val packed = bytes(10) & 0xff
    var off = 13
    var globalTable: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (off + 3 * n > bytes.length) return None
      globalTable = readColorTable(bytes, off, n)
      off += 3 * n
    }
    val frames = Vector.newBuilder[Frame]
    var delayCs = 0
    var done = false
    while (!done && off < bytes.length) {
      (bytes(off) & 0xff) match {
        case 0x3b => done = true // trailer
        case 0x21 => // extension: label + sub-blocks
          if (off + 2 > bytes.length) return None
          val label = bytes(off + 1) & 0xff
          off += 2
          // graphic control: capture the delay for the next image
          if (label == 0xf9 && off + 5 <= bytes.length &&
              (bytes(off) & 0xff) == 4)
            delayCs = le16(bytes, off + 2)
          // skip this extension's sub-blocks (incl. the GCE's own)
          var bs = if (off < bytes.length) bytes(off) & 0xff else return None
          while (bs != 0) {
            off += 1 + bs
            if (off >= bytes.length) return None
            bs = bytes(off) & 0xff
          }
          off += 1 // block terminator
        case 0x2c => // image descriptor
          if (off + 10 > bytes.length) return None
          val fx = le16(bytes, off + 1); val fy = le16(bytes, off + 3)
          val fw = le16(bytes, off + 5); val fh = le16(bytes, off + 7)
          val fp = bytes(off + 9) & 0xff
          off += 10
          if (fw <= 0 || fh <= 0 || fw.toLong * fh > 64L * 1024 * 1024)
            return None
          var table = globalTable
          if ((fp & 0x80) != 0) {
            val n = 2 << (fp & 7)
            if (off + 3 * n > bytes.length) return None
            table = readColorTable(bytes, off, n)
            off += 3 * n
          }
          if (table == null) return None
          if (off >= bytes.length) return None
          val minCodeSize = bytes(off) & 0xff
          off += 1
          if (minCodeSize < 2 || minCodeSize > 11) return None
          // gather LZW sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var bs = if (off < bytes.length) bytes(off) & 0xff else return None
          while (bs != 0) {
            if (off + 1 + bs > bytes.length) return None
            data.write(bytes, off + 1, bs)
            off += 1 + bs
            if (off >= bytes.length) return None
            bs = bytes(off) & 0xff
          }
          off += 1
          val indices = lzwDecode(minCodeSize, data.toByteArray, fw * fh)
            .getOrElse(return None)
          // map through the palette (de-interlacing row order if set)
          val rgb = new Array[Int](fw * fh)
          val rowOrder: Array[Int] =
            if ((fp & 0x40) == 0) Array.range(0, fh)
            else { // interlace passes: start/step (0,8) (4,8) (2,4) (1,2)
              val order = new Array[Int](fh)
              var k = 0
              for ((s0, st) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                   y <- s0 until fh by st) { order(k) = y; k += 1 }
              order
            }
          var srcRow = 0
          while (srcRow < fh) {
            val dstRow = rowOrder(srcRow)
            var x = 0
            while (x < fw) {
              val idx = indices(srcRow * fw + x) & 0xff
              rgb(dstRow * fw + x) = if (idx < table.length) table(idx) else 0
              x += 1
            }
            srcRow += 1
          }
          frames += Frame(fx, fy, fw, fh, delayCs, rgb)
          delayCs = 0
        case _ => return None
      }
    }
    val fs = frames.result()
    if (fs.isEmpty) None else Some(Gif(sw, sh, fs))
  }

  private def readColorTable(b: Array[Byte], off: Int, n: Int): Array[Int] =
    Array.tabulate(n)(i => ((b(off + 3 * i) & 0xff) << 16) |
      ((b(off + 3 * i + 1) & 0xff) << 8) | (b(off + 3 * i + 2) & 0xff))

  /** GIF variable-width LSB-first LZW (clear/end codes, 12-bit cap,
    * the deferred-clear "cScSc" first-byte case). */
  private def lzwDecode(minCodeSize: Int, data: Array[Byte],
                        expected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCodeSize
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var nextCode = end + 1
    var codeSize = minCodeSize + 1
    val out = new Array[Byte](expected)
    var outLen = 0
    val stack = new Array[Byte](4097)
    var bitPos = 0
    val nBits = data.length * 8
    var prev = -1
    def emit(code: Int): Int = { // pushes code's string; returns first byte
      var sp = 0
      var c = code
      while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      val first = c
      if (outLen < out.length) { out(outLen) = c.toByte; outLen += 1 }
      while (sp > 0) {
        sp -= 1
        if (outLen < out.length) { out(outLen) = stack(sp); outLen += 1 }
      }
      first
    }
    while (bitPos + codeSize <= nBits && outLen < expected) {
      // read codeSize bits LSB-first
      var code = 0
      var i = 0
      while (i < codeSize) {
        val p = bitPos + i
        if ((data(p >> 3) & (1 << (p & 7))) != 0) code |= 1 << i
        i += 1
      }
      bitPos += codeSize
      if (code == clear) {
        nextCode = end + 1; codeSize = minCodeSize + 1; prev = -1
      } else if (code == end) {
        return if (outLen == expected) Some(out) else None
      } else if (prev == -1) {
        if (code >= clear) return None
        emit(code); prev = code
      } else {
        var first = 0
        if (code < nextCode) first = emit(code)
        else if (code == nextCode && nextCode < 4096) {
          // cScSc: string(prev) + firstByte(prev)
          var c = prev
          while (c >= clear) c = prefix(c)
          first = c
          emit(prev)
          if (outLen < out.length) { out(outLen) = c.toByte; outLen += 1 }
        } else return None
        if (nextCode < 4096) {
          prefix(nextCode) = prev; suffix(nextCode) = first.toByte
          nextCode += 1
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    if (outLen == expected) Some(out) else None
  }

  /** Animated-GIF encoder: full-frame images over one global color
    * table (padded to 256 entries), literal-code LZW (min code size
    * 8; CLEAR every 200 literals holds the 9-bit width on both
    * sides), one graphic-control extension per frame for the delay.
    * `frames` = (delayCs, palette indices, row-major w×h). */
  def encodeGif(width: Int, height: Int, palette: Array[Int],
                frames: Seq[(Int, Array[Byte])]): Array[Byte] = {
    require(palette.length <= 256 && frames.nonEmpty)
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(width); w16(height)
    w8(0x80 | 0x70 | 7) // global table, 8-bit resolution, 256 entries
    w8(0); w8(0)
    var i = 0
    while (i < 256) {
      val px = if (i < palette.length) palette(i) else 0
      w8(px >> 16); w8(px >> 8); w8(px)
      i += 1
    }
    frames.foreach { case (delayCs, indices) =>
      require(indices.length == width * height)
      w8(0x21); w8(0xf9); w8(4); w8(0); w16(delayCs); w8(0); w8(0)
      w8(0x2c); w16(0); w16(0); w16(width); w16(height); w8(0)
      w8(8) // min LZW code size
      // literal LZW: 9-bit codes, CLEAR(256) leads and recurs
      val bits = new java.io.ByteArrayOutputStream()
      var acc = 0L; var nAcc = 0
      def putCode(c: Int): Unit = {
        acc |= c.toLong << nAcc; nAcc += 9
        while (nAcc >= 8) { bits.write((acc & 0xff).toInt); acc >>= 8; nAcc -= 8 }
      }
      putCode(256)
      var k = 0
      while (k < indices.length) {
        if (k > 0 && k % 200 == 0) putCode(256)
        putCode(indices(k) & 0xff)
        k += 1
      }
      putCode(257) // END
      if (nAcc > 0) bits.write((acc & 0xff).toInt)
      val payload = bits.toByteArray
      var off = 0
      while (off < payload.length) {
        val n = math.min(255, payload.length - off)
        w8(n); out.write(payload, off, n)
        off += n
      }
      w8(0)
    }
    w8(0x3b)
    out.toByteArray
  }
}
