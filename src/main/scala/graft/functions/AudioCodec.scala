package graft.functions

/** From-scratch pure-JVM WAV (RIFF PCM) codec — the audio sibling of
  * [[ImageCodec]], closing the audio arm of the multimodal survey
  * row with a REAL container format that needs no native library:
  * canonical WAV is a RIFF chunk walk plus raw little-endian PCM
  * samples (the format every ASR/TTS data pipeline ingests before
  * feature extraction).
  *
  * Implements the public RIFF/WAVE layout: `RIFF <size> WAVE`, then
  * chunks — `fmt ` (PCM tag 1, channels, sample rate, bits per
  * sample 8/16) and `data` (interleaved samples), with unknown
  * chunks (LIST, fact, cue…) skipped and the RIFF odd-size padding
  * byte honored. 8-bit PCM is unsigned per the spec and is
  * re-centered to signed here so sample arithmetic is uniform.
  *
  * All decoded values are exact integers, so any published statistic
  * (energy, peaks, zero-crossings, duration) is oracle-replayable.
  * Decoders return None on foreign/corrupt bytes — mixed corpora
  * degrade per row, never per job. */
object AudioCodec {

  /** Decoded PCM: `samples` is the interleaved frame stream, signed
    * (16-bit: −32768..32767; 8-bit re-centered: −128..127). */
  final case class Wav(sampleRate: Int, channels: Int,
                       bitsPerSample: Int, samples: Array[Int]) {
    def nFrames: Int = samples.length / channels
  }

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Uncompressed PCM WAV (format tag 1, 8 or 16 bits/sample). */
  def decodeWav(bytes: Array[Byte]): Option[Wav] = {
    if (bytes.length < 44) return None
    if (bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' ||
        bytes(3) != 'F' || bytes(8) != 'W' || bytes(9) != 'A' ||
        bytes(10) != 'V' || bytes(11) != 'E') return None
    var off = 12
    var sampleRate = 0; var channels = 0; var bits = 0
    var fmtSeen = false
    var samples: Array[Int] = null
    while (off + 8 <= bytes.length && samples == null) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val len = le32(bytes, off + 4)
      if (len < 0 || off + 8L + len > bytes.length) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val tag = le16(bytes, off + 8)
          channels = le16(bytes, off + 10)
          sampleRate = le32(bytes, off + 12)
          bits = le16(bytes, off + 22)
          if (tag != 1 || channels < 1 || channels > 8 ||
              sampleRate <= 0 || (bits != 8 && bits != 16)) return None
          fmtSeen = true
        case "data" =>
          if (!fmtSeen) return None
          val bytesPerSample = bits / 8
          val n = len / bytesPerSample
          if (n.toLong > 256L * 1024 * 1024) return None // 256M guard
          val out = new Array[Int](n)
          var i = 0
          var o = off + 8
          if (bits == 16) {
            while (i < n) { out(i) = le16(bytes, o).toShort.toInt
              o += 2; i += 1 }
          } else {
            while (i < n) { out(i) = (bytes(o) & 0xff) - 128
              o += 1; i += 1 }
          }
          samples = out
        case _ => () // ancillary chunk (LIST/fact/cue): skip
      }
      off += 8 + len + (len & 1) // RIFF pads odd chunks to even
    }
    if (samples == null) None
    else Some(Wav(sampleRate, channels, bits, samples))
  }

  /** Canonical 44-byte-header 16-bit PCM encoder — the fixture/query
    * twin of [[decodeWav]]. Samples are the interleaved stream. */
  def encodeWavPcm16(sampleRate: Int, channels: Int,
                     samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val b = new Array[Byte](44 + dataLen)
    def putAscii(o: Int, s: String): Unit = {
      var i = 0; while (i < s.length) { b(o + i) = s.charAt(i).toByte; i += 1 }
    }
    def putLe16(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte }
    def putLe32(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte }
    putAscii(0, "RIFF"); putLe32(4, 36 + dataLen); putAscii(8, "WAVE")
    putAscii(12, "fmt "); putLe32(16, 16)
    putLe16(20, 1); putLe16(22, channels); putLe32(24, sampleRate)
    putLe32(28, sampleRate * channels * 2) // byte rate
    putLe16(32, channels * 2); putLe16(34, 16) // block align, bits
    putAscii(36, "data"); putLe32(40, dataLen)
    var i = 0
    while (i < samples.length) { putLe16(44 + i * 2, samples(i)); i += 1 }
    b
  }
}
