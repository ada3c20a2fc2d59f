package graft

import org.apache.spark.sql.functions._

/** Round 14: segment-packed sequence packing (the unbounded-stratum
  * q353 path), the explicit per-stratum fold bound, and the splice
  * identity that makes the segmented form safe to substitute. */
class Round14Spec extends SparkSpec {
  import spark.implicits._

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => ((r.getString(0), r.getLong(1)),
      (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  // --- packSequences bound (the ≤5M convention, test-scaled) -----------

  test("packSequences: an over-bound stratum fails LOUDLY with a " +
    "pointer at packSequencesSegmented, under-bound strata pack fine") {
    val docs = Seq(("A", 1L, 4L), ("A", 2L, 5L), ("A", 3L, 3L),
      ("A", 4L, 2L), ("A", 5L, 6L), ("B", 9L, 1L))
      .toDF("source", "doc_id", "n_chars")
    val ex = intercept[Exception] {
      graft.operators.Curation
        .packSequences(docs, "doc_id", "n_chars", "source", 10L,
          maxStratumRows = 3L)
        .collect()
    }
    def causeChain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(c => Option(c.getMessage).getOrElse("")).toSeq
    assert(causeChain(ex).exists(_.contains("packSequencesSegmented")),
      s"guard message must route to the segmented form: $ex")
    // bound >= every stratum: identical to the unbounded default
    val ok = graft.operators.Curation
      .packSequences(docs, "doc_id", "n_chars", "source", 10L,
        maxStratumRows = 5L)
    val dflt = graft.operators.Curation
      .packSequences(docs, "doc_id", "n_chars", "source", 10L)
    assert(asMap(ok) == asMap(dflt))
  }

  // --- packSequencesSegmented ------------------------------------------

  test("packSequencesSegmented: segmentRows >= stratum size is the " +
    "IDENTITY — bit-identical to packSequences on the fixture corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val base = graft.operators.Curation
      .packSequences(docs, "doc_id", "n_chars", "source", 2000L)
    val seg = graft.operators.Curation
      .packSequencesSegmented(docs, "doc_id", "n_chars", "source", 2000L,
        segmentRows = 1000L)
    assert(asMap(seg) == asMap(base))
  }

  test("packSequencesSegmented: hand-checked boundary semantics — a " +
    "segment cut opens a fresh sequence, splice offsets are exact, " +
    "partition-order invariant") {
    // stratum A, capacity 10, segmentRows 2: docs (4,5 | 3,2 | 6)
    // seg0: 4+5 fill seq0 (4 then off 4)       -> local seqs {0}
    // seg1: 3+2 fill its own seq (fresh cut)   -> local seqs {0}
    // seg2: 6                                   -> local seqs {0}
    // splice: bases 0,1,2 — where the unsegmented fold would have
    // packed (4+5)(3+2+... ) differently
    val docs = Seq(("A", 1L, 4L), ("A", 2L, 5L), ("A", 3L, 3L),
      ("A", 4L, 2L), ("A", 5L, 6L),
      // stratum B under one segment: splice is identity
      ("B", 9L, 7L), ("B", 10L, 7L))
      .toDF("source", "doc_id", "n_chars")
    def run(df: org.apache.spark.sql.DataFrame) = asMap(
      graft.operators.Curation.packSequencesSegmented(
        df, "doc_id", "n_chars", "source", 10L, segmentRows = 2L))
    val got = run(docs)
    val expect = Map(
      ("A", 1L) -> ((4L, 0L, 0L)), ("A", 2L) -> ((5L, 0L, 4L)),
      ("A", 3L) -> ((3L, 1L, 0L)), ("A", 4L) -> ((2L, 1L, 3L)),
      ("A", 5L) -> ((6L, 2L, 0L)),
      ("B", 9L) -> ((7L, 0L, 0L)), ("B", 10L) -> ((7L, 1L, 0L)))
    assert(got == expect)
    assert(run(docs.repartition(7)) == expect)
  }

  test("packSequencesSegmented invariants on the fixture: per-stratum " +
    "seq ids dense from 0, offsets respect capacity, boundary waste " +
    "only ever ADDS sequences vs the exact fold") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val seg = graft.operators.Curation
      .packSequencesSegmented(docs, "doc_id", "n_chars", "source", 2000L,
        segmentRows = 8L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    seg.foreach { case (src, id, len, _, off) =>
      assert(off + len <= 2000L || off == 0L, s"$src/$id overflow") }
    seg.groupBy(_._1).foreach { case (src, rs) =>
      val seqs = rs.map(_._4).distinct.sorted.toSeq
      assert(seqs == (0L until seqs.length.toLong).toSeq, s"$src dense")
    }
    val baseSeqs = graft.operators.Curation
      .packSequences(docs, "doc_id", "n_chars", "source", 2000L)
      .groupBy("source").agg(max(col("seq_id")).as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1) + 1)).toMap
    seg.groupBy(_._1).foreach { case (src, rs) =>
      val nSeg = rs.map(_._4).max + 1
      assert(nSeg >= baseSeqs(src),
        s"$src: segmentation can only open MORE sequences")
    }
  }

  test("q364/q365 shape: q365 extra_seqs is non-negative and " +
    "fill_ppm_seg <= fill_ppm_base per source") {
    val out = SparkEntry.queries("q365_pack_boundary_waste")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(3) >= 0L, "extra_seqs >= 0")
      assert(r.getLong(6) <= r.getLong(5),
        "segmented fill cannot beat the exact fold")
    }
  }
}
