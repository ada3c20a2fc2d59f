package graft

import graft.functions.JpegCodec
import org.apache.spark.sql.functions._

/** Round-11 pinning specs for the round-10 ADVICE findings:
  * JPEG 0xFF fill-byte tolerance (B.1.1.2) in both marker walks, and
  * minedSpanRemoval's empty-corpus driver aggregate. */
class Round11Spec extends SparkSpec {
  import spark.implicits._

  private def dcBlock(dc: Int): Array[Int] = {
    val z = new Array[Int](64); z(0) = dc; z
  }
  private val flatQ = Array.fill(64)(16)

  /** Insert `n` 0xFF fill bytes at `at` (must sit on a marker
    * boundary): spec-legal padding per B.1.1.2. */
  private def padFill(bytes: Array[Byte], at: Int, n: Int): Array[Byte] =
    bytes.take(at) ++ Array.fill(n)(0xff.toByte) ++ bytes.drop(at)

  test("JPEG baseline walk: 0xFF fill bytes before a marker decode " +
      "identically to the unpadded stream") {
    val dcs = Array(-32, 0, 31, -1, 17, 5)
    val bytes = JpegCodec.encodeJpegGray(dcs.map(dcBlock), 24, 16, flatQ)
    val ref = JpegCodec.decodeJpeg(bytes).get
    // pad right after SOI (offset 2 is always a marker boundary)
    val padded = padFill(bytes, 2, 3)
    val img = JpegCodec.decodeJpeg(padded)
    assert(img.isDefined, "fill-padded baseline stream must decode")
    val got = img.get
    assert(got.width == ref.width && got.height == ref.height)
    for (y <- 0 until ref.height; x <- 0 until ref.width)
      assert(got(x, y) == ref(x, y))
  }

  test("JPEG progressive walk: 0xFF fill bytes before a marker decode " +
      "identically to the unpadded stream") {
    val dcs = Array(7, -3, 12, 0, -20, 5)
    val bytes =
      JpegCodec.encodeJpegGrayProgressive(dcs.map(dcBlock), 24, 16, flatQ)
    val ref = JpegCodec.decodeJpeg(bytes).get
    val padded = padFill(bytes, 2, 4)
    val img = JpegCodec.decodeJpeg(padded)
    assert(img.isDefined, "fill-padded progressive stream must decode")
    val got = img.get
    assert(got.width == ref.width && got.height == ref.height)
    for (y <- 0 until ref.height; x <- 0 until ref.width)
      assert(got(x, y) == ref(x, y))
  }

  test("JPEG walks: a non-marker byte where a marker is required " +
      "still rejects (fill-skip does not mask corruption)") {
    val dcs = Array(1, 2, 3, 4, 5, 6)
    val bytes = JpegCodec.encodeJpegGray(dcs.map(dcBlock), 24, 16, flatQ)
    val broken = bytes.clone()
    broken(2) = 0x00 // SOI must be followed by 0xFF <code>
    assert(JpegCodec.decodeJpeg(broken).isEmpty)
  }

  test("minedSpanRemoval: an all-empty tokenized corpus returns the " +
      "empty result instead of NPE-ing on the null max aggregate") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, " "))
      .toDF("doc_id", "text")
    val out = operators.SuffixArray
      .minedSpanRemoval(docs, "doc_id", "text", minSpan = 2, topK = 5)
      .collect()
    assert(out.isEmpty) // tokenized drops zero-token docs
  }
}
