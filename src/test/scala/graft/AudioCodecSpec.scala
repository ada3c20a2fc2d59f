package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.functions.AudioCodec
import graft.operators.Multimodal

/** The pure-JVM WAV codec, pinned like the image codec: own
  * round-trip on random PCM, cross-implementation agreement with the
  * JDK's javax.sound.sampled in both directions, hand-built streams
  * for the spec corners generic encoders never emit (ancillary
  * chunks, odd-length padding, 8-bit samples), and the q215
  * closed-form stats identity over the Spark path. */
class AudioCodecSpec extends SparkSpec {
  import spark.implicits._

  private def randSamples(rnd: scala.util.Random, n: Int): Array[Int] =
    Array.fill(n)(rnd.nextInt(65536) - 32768)

  test("16-bit PCM round-trips exactly (mono and stereo)") {
    val rnd = new scala.util.Random(91)
    for ((ch, n) <- Seq((1, 1), (1, 333), (2, 400), (2, 2), (4, 64))) {
      val s = randSamples(rnd, n * ch)
      val wav = AudioCodec.decodeWav(
        AudioCodec.encodeWavPcm16(16000, ch, s)).get
      assert(wav.sampleRate == 16000 && wav.channels == ch &&
        wav.bitsPerSample == 16 && wav.nFrames == n)
      assert(java.util.Arrays.equals(wav.samples, s))
    }
  }

  test("cross-implementation: decoder equals javax.sound, both directions") {
    val rnd = new scala.util.Random(92)
    val samples = randSamples(rnd, 500)
    // javax.sound-encoded bytes -> our decoder
    val fmt = new AudioFormat(22050f, 16, 1, true, false) // signed LE
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(i * 2) = s.toByte; pcm(i * 2 + 1) = (s >> 8).toByte }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, samples.length)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val ours = AudioCodec.decodeWav(bos.toByteArray).get
    assert(ours.sampleRate == 22050 && ours.channels == 1)
    assert(java.util.Arrays.equals(ours.samples, samples))
    // our bytes -> javax.sound decoder
    val mine = AudioCodec.encodeWavPcm16(22050, 1, samples)
    val back = AudioSystem.getAudioInputStream(new ByteArrayInputStream(mine))
    assert(back.getFormat.getSampleRate == 22050f &&
      back.getFormat.getChannels == 1 &&
      back.getFormat.getSampleSizeInBits == 16)
    val raw = back.readAllBytes()
    assert(raw.length == samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      val got = ((raw(i * 2) & 0xff) | (raw(i * 2 + 1) << 8)).toShort.toInt
      assert(got == s, s"sample $i")
    }
  }

  test("ancillary chunks are skipped, odd sizes padded, 8-bit re-centered") {
    // hand-build: RIFF [ junk(odd len 5) | fmt(8-bit) | LIST | data ]
    val samples8 = Array.tabulate(7)(i => i * 30) // unsigned 0..255 domain
    val body = new ByteArrayOutputStream()
    def ascii(s: String) = body.write(s.getBytes("US-ASCII"))
    def le32(v: Int) = body.write(Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte))
    def le16(v: Int) = body.write(Array[Byte](v.toByte, (v >> 8).toByte))
    ascii("WAVE")
    ascii("junk"); le32(5); body.write(Array[Byte](1, 2, 3, 4, 5, 0)) // pad
    ascii("fmt "); le32(16); le16(1); le16(1); le32(8000); le32(8000)
    le16(1); le16(8)
    ascii("LIST"); le32(4); ascii("INFO")
    ascii("data"); le32(samples8.length)
    samples8.foreach(s => body.write(s))
    val payload = body.toByteArray
    val full = new ByteArrayOutputStream()
    full.write("RIFF".getBytes("US-ASCII"))
    full.write(Array[Byte](payload.length.toByte,
      (payload.length >> 8).toByte, (payload.length >> 16).toByte,
      (payload.length >> 24).toByte))
    full.write(payload)
    val wav = AudioCodec.decodeWav(full.toByteArray).get
    assert(wav.sampleRate == 8000 && wav.bitsPerSample == 8)
    assert(wav.samples.toSeq == samples8.map(_ - 128).toSeq)
  }

  test("foreign/corrupt bytes decode to None, never throw") {
    val rnd = new scala.util.Random(93)
    assert(AudioCodec.decodeWav("RIFFnope".getBytes).isEmpty)
    assert(AudioCodec.decodeWav(Array.emptyByteArray).isEmpty)
    val good = AudioCodec.encodeWavPcm16(8000, 1, randSamples(rnd, 50))
    assert(AudioCodec.decodeWav(good.take(50)).isEmpty) // truncated data
    for (_ <- 1 to 20) {
      val junk = Array.fill(60 + rnd.nextInt(200))(rnd.nextInt().toByte)
      "RIFF".getBytes.copyToArray(junk)
      "WAVE".getBytes.copyToArray(junk, 8)
      AudioCodec.decodeWav(junk) // must not throw
    }
  }

  test("q215 stats equal the closed form (the oracle identity, in Scala)") {
    val docs = Seq(1L, 4L, 64L, 130L).toDF("doc_id")
    val out = Multimodal.audioPcmStats(spark,
        Multimodal.syntheticAudioPayloads(docs, "doc_id"))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (d <- Seq(1L, 4L, 64L, 130L)) {
      val n = (64 + d % 65).toInt
      def s(i: Int) = ((17L * i + 3 * d) % 2001 - 1000).toInt
      val row = out(d)
      assert(row.getInt(1) == 8000 + (d % 5).toInt * 1000)
      assert(row.getInt(2) == 1 && row.getLong(3) == n.toLong)
      assert(row.getLong(4) == 1000L * n / (8000 + (d % 5) * 1000))
      assert(row.getLong(5) == (0 until n).map(i => math.abs(s(i)).toLong).sum)
      assert(row.getLong(6) == (0 until n).map(i => math.abs(s(i)).toLong).max)
      assert(row.getLong(7) ==
        (1 until n).count(i => s(i).toLong * s(i - 1) < 0).toLong)
      assert(row.getBoolean(8))
    }
  }
}
