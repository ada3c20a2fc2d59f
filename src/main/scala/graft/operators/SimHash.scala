package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash near-duplicate fingerprinting (Charikar '02; used by Google
  * for web dedup — Manku et al., WWW'07).
  *
  * Each document maps to a 64-bit fingerprint: for every bit position,
  * sum +1/-1 votes from the xxhash64 of each token; the sign of the sum
  * is the bit. Similar documents differ in few bits (small Hamming
  * distance).
  *
  * Candidate generation at scale uses the Manku trick: split the 64-bit
  * fingerprint into `blocks` chunks; fingerprints within Hamming
  * distance d < blocks must agree on at least one chunk, so an
  * equi-join per chunk finds all candidates with no cross join — same
  * scale shape as banded MinHash.
  *
  * Verified by ScalaTest (no SQL oracle — xxhash64 has no DuckDB twin).
  */
object SimHash {

  /** (doc_id, simhash: bigint). Vote per bit via per-token hashes. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // bind the per-token hash array ONCE: the 64 per-bit aggregates
    // below each evaluate their argument independently (higher-order
    // functions are interpreted — no cross-expression CSE), so an
    // unbound transform(split(...)) here would re-split and re-hash
    // the document 64× per row
    val bound = docs.select(col(idCol).as("doc_id"),
      transform(Dedup.words(col(textCol)), t => xxhash64(t)).as("th"))
    // vote(bit) = sum over tokens of (hash>>bit & 1 ? 1 : -1);
    // bit set iff vote > 0. Built as a 64-term expression — all
    // builtin arithmetic, no UDF.
    val fp = (0 until 64).map { bit =>
      val vote = aggregate(col("th"), lit(0L),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), bit)).otherwise(0L)
    }.reduce(_ bitwiseOR _)
    bound.select(col("doc_id"), fp.as("simhash"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    bit_count(a.bitwiseXOR(b))

  /** Pairs (a, b, dist) with Hamming distance <= maxDist, via the
    * chunk-agreement equi-join. */
  def nearPairs(fps: DataFrame, maxDist: Int, blocks: Int = 4): DataFrame = {
    val chunkBits = 64 / blocks
    val chunked = fps.select(
      col("doc_id"),
      col("simhash"),
      posexplode(array((0 until blocks).map(i =>
        shiftrightunsigned(col("simhash"), i * chunkBits)
          .bitwiseAND((1L << chunkBits) - 1)): _*)).as(Seq("chunk_idx", "chunk")))
    val l = chunked.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("a"), col("simhash").as("ha"))
    val r = chunked.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("b"), col("simhash").as("hb"))
    l.join(r, Seq("chunk_idx", "chunk"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), hamming(col("ha"), col("hb")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  /** PORTABLE-hash SimHash — the SQL-oracle-checkable twin of
    * [[nearPairs]] (the q132 convention): 32-bit fingerprints from
    * count-weighted trigram-shingle votes, token hash = polynomial
    * char fold mod 1e9+7 then mod 2³², Manku 4×8-bit chunk equi-join,
    * exact `bit_count(xor)` verify. Every step is integer arithmetic
    * DuckDB replays bit-for-bit.
    *
    * @return (a, b, dist) pairs with Hamming distance ≤ maxDist */
  def nearPairsPortable(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val Pp = 1000000007L
    val bits = 32
    // count-weighted trigram shingles, tokenizer shared with q132
    val toks = docs
      .select(col(idCol).as("doc_id"),
        split(lower(col(textCol)), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), size(col("ws")) - 3),
          i => concat_ws(" ",
            element_at(col("ws"), i + 1),
            element_at(col("ws"), i + 2),
            element_at(col("ws"), i + 3)))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("w"))
    val hashed = toks.withColumn("h",
      org.apache.spark.sql.graft.CharFoldHash.column(col("tok")) % (1L << bits)) // native fold (NativeExprSpec)
    val sumAggs = (0 until bits).map { i =>
      sum(when(expr(s"h div ${1L << i}") % 2 === 1, col("w"))
        .otherwise(-col("w"))).as(s"s$i")
    }
    val fpExpr = (0 until bits).map { i =>
      when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val fps = hashed.groupBy("doc_id")
      .agg(sumAggs.head, sumAggs.tail: _*)
      .select(col("doc_id"), fpExpr.as("fp"))
    val chunks = fps.select(col("doc_id"), col("fp"),
      posexplode(array((0 until 4).map(j =>
        expr(s"fp div ${1L << (8 * j)}") % 256): _*)).as(Seq("j", "c")))
    val l = chunks.toDF("a", "fpa", "j", "c")
    val r = chunks.toDF("b", "fpb", "j", "c")
    l.join(r, Seq("j", "c"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        expr("CAST(bit_count(fpa ^ fpb) AS INT)").as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }
}
