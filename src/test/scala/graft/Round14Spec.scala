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

  test("q362 stage order: audit rows chain exactly, masses are " +
    "monotone, every dedup/filter stage is non-vacuous on the " +
    "fixture, and gates match their standalone operators") {
    val out = SparkEntry.queries("q362_pipeline_composite")(spark, sf)
      .collect().sortBy(_.getLong(0))
    assert(out.length === 8)
    // stage k's docs_in is exactly stage k-1's docs_out, removed is
    // exact, and nothing is ever re-added
    for (i <- 1 until 8) {
      assert(out(i).getLong(2) === out(i - 1).getLong(3), s"chain@$i")
      assert(out(i).getLong(4) === out(i).getLong(2) - out(i).getLong(3))
      assert(out(i).getLong(5) <= out(i - 1).getLong(5), s"mass@$i")
    }
    // the fixture exercises the curate gate, near-dedup, SemDeDup and
    // decontamination (exact-dedup is honestly zero: the corpus has
    // no byte-identical texts, asserted below)
    val removedBy = out.map(r => r.getString(1) -> r.getLong(4)).toMap
    for (stg <- Seq("curate", "near_dedup", "semantic_dedup",
        "decontaminate"))
      assert(removedBy(stg) > 0L, s"$stg must bite on the fixture")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(docs.select("text").distinct.count() === docs.count(),
      "fixture has no exact dups, so exact_dedup = 0 is honest")
    assert(removedBy("exact_dedup") === 0L)
    // stage 1 gate replayed directly
    assert(out(1).getLong(3) ===
      docs.filter(size(split(lower(col("text")), " ")) >= 40).count())
    // stage 3 removal = b-sides of the portable near-dup pairs among
    // the gate survivors (per-doc signatures are subset-independent)
    val s1 = docs.filter(size(split(lower(col("text")), " ")) >= 40)
    val nearB = graft.operators.MinHashLSH
      .nearDuplicatesPortable(s1, "doc_id", "text")
      .select(col("b")).distinct().count()
    assert(removedBy("near_dedup") === nearB)
    // tokenize/pack stages preserve the doc set; totals are sane
    assert(out(6).getLong(3) === out(5).getLong(3))
    assert(out(7).getLong(3) === out(6).getLong(3))
    val tokens = out(6).getLong(7)
    val nSeqs = out(7).getLong(8)
    assert(tokens > 0L && nSeqs > 0L)
    // pack lower bounds: at least ceil(tokens/capacity), and at least
    // one sequence per surviving source
    val nSources = 20L // fixture sources; every source keeps >= 1 doc
    assert(nSeqs >= tokens / 256L)
    assert(nSeqs >= nSources || out(5).getLong(3) < nSources)
  }

  test("packSequencesContinued: continuing from packCarry state is " +
    "IDENTICAL to one fold over yesterday-then-today, hand-checked " +
    "and on ordered splits of the fixture") {
    // hand fixture: capacity 10; yesterday A: 4,5 (seq0 fill9); B: 12
    // (oversize, seq0 fill12) — today A: 2 (overflows -> seq1), 7
    // (fits seq1? 2+7=9 <=10 yes off2); B: 1 (12>10 -> fill>0,
    // 12+1>10 -> seq1 off0); C fresh: 3 (seq0)
    val yDocs = Seq(("A", 1L, 4L), ("A", 2L, 5L), ("B", 3L, 12L))
      .toDF("source", "doc_id", "n_chars")
    val tDocs = Seq(("A", 10L, 2L), ("A", 11L, 7L), ("B", 12L, 1L),
      ("C", 13L, 3L)).toDF("source", "doc_id", "n_chars")
    val yPacked = graft.operators.Curation
      .packSequences(yDocs, "doc_id", "n_chars", "source", 10L)
    val carry = graft.operators.Curation
      .packCarry(yPacked, "doc_id", "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(carry.toSet === Set(("A", 0L, 9L), ("B", 0L, 12L)))
    val cont = graft.operators.Curation.packSequencesContinued(
        tDocs, "doc_id", "n_chars", "source", 10L,
        graft.operators.Curation.packCarry(yPacked, "doc_id", "source"))
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(3), r.getLong(4)))).toMap
    assert(cont === Map(
      ("A", 10L) -> ((1L, 0L)), ("A", 11L) -> ((1L, 2L)),
      ("B", 12L) -> ((1L, 0L)), ("C", 13L) -> ((0L, 0L))))
    // equivalence with the single fold when yesterday ids < today ids
    val joint = graft.operators.Curation
      .packSequences(yDocs.unionByName(tDocs), "doc_id", "n_chars",
        "source", 10L)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(3), r.getLong(4)))).toMap
    cont.foreach { case (k, v) => assert(joint(k) === v, s"$k") }
  }

  test("property: packSequencesContinued over a RANDOM ordered split " +
    "equals the single fold, for random lengths/capacities/strata") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      cap <- Gen.choose(1L, 30L)
      n <- Gen.choose(1, 40)
      lens <- Gen.listOfN(n, Gen.choose(0L, 40L))
      strata <- Gen.listOfN(n, Gen.choose(0, 2))
      cut <- Gen.choose(0, n)
    } yield (cap, lens.zip(strata).zipWithIndex.map { case ((l, st), i) =>
      (s"s$st", i.toLong, l) }, cut)
    val prop = Prop.forAll(gen) { case (cap, rows, cut) =>
      val df = rows.toDF("source", "doc_id", "n_chars")
      val joint = graft.operators.Curation
        .packSequences(df, "doc_id", "n_chars", "source", cap)
        .collect().map(r => ((r.getString(0), r.getLong(1)),
          (r.getLong(3), r.getLong(4)))).toMap
      val (yRows, tRows) = rows.splitAt(cut)
      val cont =
        if (tRows.isEmpty) Map.empty[(String, Long), (Long, Long)]
        else if (yRows.isEmpty)
          graft.operators.Curation.packSequences(
              tRows.toDF("source", "doc_id", "n_chars"),
              "doc_id", "n_chars", "source", cap)
            .collect().map(r => ((r.getString(0), r.getLong(1)),
              (r.getLong(3), r.getLong(4)))).toMap
        else {
          val yPacked = graft.operators.Curation.packSequences(
            yRows.toDF("source", "doc_id", "n_chars"),
            "doc_id", "n_chars", "source", cap)
          graft.operators.Curation.packSequencesContinued(
              tRows.toDF("source", "doc_id", "n_chars"),
              "doc_id", "n_chars", "source", cap,
              graft.operators.Curation.packCarry(yPacked, "doc_id",
                "source"))
            .collect().map(r => ((r.getString(0), r.getLong(1)),
              (r.getLong(3), r.getLong(4)))).toMap
        }
      cont.forall { case (k, v) => joint(k) == v }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, s"continuation property: ${res.status}")
  }

  test("crossNearDuplicatesPortable: planted cross dup found, " +
    "store-internal dups ignored, empty sides are total") {
    val store = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // store-internal dup
      (3L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // = store 1/2
      (11L, "totally different words entirely here now")
    ).toDF("doc_id", "text")
    val pairs = graft.operators.MinHashLSH
      .crossNearDuplicatesPortable(store, batch, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // batch 10 pairs with BOTH identical store docs; batch 11 with none
    assert(pairs.toSet === Set((10L, 1L), (10L, 2L)))
    val emptyB = graft.operators.MinHashLSH
      .crossNearDuplicatesPortable(store, batch.limit(0), "doc_id",
        "text")
    assert(emptyB.count() === 0L)
    val emptyS = graft.operators.MinHashLSH
      .crossNearDuplicatesPortable(store.limit(0), batch, "doc_id",
        "text")
    assert(emptyS.count() === 0L)
  }

  test("plan shape: RingReplicas assignment is map-only (no exchange, " +
    "no join) like the scalar RingShard path") {
    val keys = (0L until 50L).toDF("k")
    val assigned = graft.operators.HashRing
      .assignReplicated(keys, "k", 16, 32, replicas = 3)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"replicated assignment must stay map-only:\n$plan")
  }

  test("q370 delta ledger: one row per delta doc, kept docs carry a " +
    "CONTINUED pack address (seq >= the stratum's yesterday carry), " +
    "removed docs carry -1, and the gate count replays") {
    val out = SparkEntry.queries("q370_pipeline_delta")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val delta = docs.filter(col("doc_id") % 7 === 3)
    assert(out.length === delta.count())
    out.foreach { case (id, disp, seq, off) =>
      assert(id % 7 === 3)
      if (disp == "kept") assert(seq >= 0L && off >= 0L, s"doc $id")
      else assert(seq === -1L && off === -1L, s"doc $id")
    }
    val nShort = out.count(_._2 == "short")
    val gateFail = delta
      .filter(size(split(lower(col("text")), " ")) < 40).count()
    assert(nShort.toLong === gateFail)
    assert(out.exists(_._2 == "kept"), "delta must keep something")
    assert(out.exists(r => r._2 == "near_dup" || r._2 == "semantic_dup"),
      "a cross-run dedup stage must bite on the fixture delta")
  }

  test("big-stratum stress: a 50k-doc stratum trips a 10k fold bound " +
    "loudly, while the segmented path packs it with dense seq ids " +
    "and exact capacity discipline") {
    import spark.implicits._
    val big = spark.range(50000)
      .select(lit("S").as("source"), col("id").as("doc_id"),
        (col("id") % 37 + 1).as("n_chars"))
    val ex = intercept[Exception] {
      graft.operators.Curation.packSequences(big, "doc_id", "n_chars",
        "source", 1000L, maxStratumRows = 10000L).collect()
    }
    def chain(t: Throwable) =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(c => Option(c.getMessage).getOrElse("")).toSeq
    assert(chain(ex).exists(_.contains("packSequencesSegmented")))
    val seg = graft.operators.Curation.packSequencesSegmented(big,
        "doc_id", "n_chars", "source", 1000L, segmentRows = 10000L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(seg.length === 50000)
    seg.foreach { case (id, len, _, off) =>
      assert(off + len <= 1000L || off == 0L, s"doc $id") }
    val seqs = seg.map(_._3).distinct.sorted
    assert(seqs === (0L until seqs.length.toLong).toArray, "dense")
  }

  test("plan shape: the q368 ledger and q371 manifest contain no " +
    "cartesian products; the one BroadcastNestedLoopJoin is the " +
    "scalar t_total cross (q371) / none at all (q368)") {
    val led = SparkEntry.queries("q368_pipeline_disposition")(spark, sf)
    val ledPlan = led.queryExecution.executedPlan.toString
    assert(!ledPlan.contains("CartesianProduct"), ledPlan.take(2000))
    val man = SparkEntry.queries("q371_shard_manifest")(spark, sf)
    val manPlan = man.queryExecution.executedPlan.toString
    assert(!manPlan.contains("CartesianProduct"), manPlan.take(2000))
    // the scalar-total cross joins must be 1-row broadcasts at most
    val bnlj = "BroadcastNestedLoopJoin".r
      .findAllIn(ledPlan + manPlan).length
    assert(bnlj <= 2, s"unexpected nested-loop joins: $bnlj")
  }

  test("q371 shard manifest: 16 rows, sequences/docs/tokens conserved " +
    "against the q362 audit totals") {
    val man = SparkEntry.queries("q371_shard_manifest")(spark, sf)
      .collect()
    assert(man.length === 16)
    val audit = SparkEntry.queries("q362_pipeline_composite")(spark, sf)
      .collect().map(r => r.getString(1) -> r).toMap
    assert(man.map(_.getAs[Long]("n_seqs")).sum ===
      audit("pack").getLong(8))
    assert(man.map(_.getAs[Long]("n_docs")).sum ===
      audit("pack").getLong(3))
    assert(man.map(_.getAs[Long]("n_tokens")).sum ===
      audit("pack").getLong(7))
  }

  test("q368 disposition ledger: per-stage counts reconcile exactly " +
    "with q362's audit, survivors carry a valid pack address, " +
    "removed docs carry -1") {
    val audit = SparkEntry.queries("q362_pipeline_composite")(spark, sf)
      .collect().map(r => r.getString(1) -> r).toMap
    val led = SparkEntry.queries("q368_pipeline_disposition")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(led.length === audit("raw").getLong(3))
    val byDisp = led.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val removals = Map(
      "short" -> "curate", "exact_dup" -> "exact_dedup",
      "near_dup" -> "near_dedup", "semantic_dup" -> "semantic_dedup",
      "contaminated" -> "decontaminate")
    removals.foreach { case (disp, stage) =>
      assert(byDisp.getOrElse(disp, 0L) === audit(stage).getLong(4),
        s"$disp vs $stage removed") }
    assert(byDisp.getOrElse("kept", 0L) ===
      audit("decontaminate").getLong(3))
    led.foreach { case (id, disp, seq, off) =>
      if (disp == "kept") assert(seq >= 0L && off >= 0L, s"doc $id")
      else assert(seq === -1L && off === -1L, s"doc $id")
    }
  }

  test("q369 weighted replication: 16 rows, responsibility conserved " +
    "at 3x corpus, primary equals the weighted load audit") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val caps = Seq(64, 64, 32, 32, 32, 32, 16, 16, 16, 16, 16, 16,
      8, 8, 8, 8)
    val audit = graft.operators.HashRing.replicationAuditWeighted(
      spark, docs, "doc_id", caps, replicas = 3).collect()
    assert(audit.length === 16)
    val n = docs.count()
    assert(audit.map(_.getAs[Long]("n_primary")).sum === n)
    assert(audit.map(_.getAs[Long]("n_responsible")).sum === 3 * n)
    val load = graft.operators.HashRing.loadAuditWeighted(
        spark, docs, "doc_id", caps)
      .select("shard", "n_keys").as[(Long, Long)].collect().toMap
    audit.foreach { r =>
      assert(r.getAs[Long]("n_primary") ===
        load(r.getAs[Long]("shard")), s"shard ${r.get(0)}") }
  }

  test("q366/q367 choosers: the selected row IS the sweep's argmax " +
    "under its floor, replayed locally from the full sweep") {
    // band chooser vs its own sweep
    val sweep = SparkEntry.queries("q359_lsh_band_sweep")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val expectBand = sweep
      .map(t => (t, t._7 >= 500000L))
      .sortBy { case ((b, _, nc, _, _, rec, _), q) =>
        (!q, -rec, nc, -b) }
      .head
    val gotBand = SparkEntry.queries("q366_band_chooser")(spark, sf)
      .collect().head
    assert((gotBand.getLong(0), gotBand.getLong(1)) ===
      ((expectBand._1._1, expectBand._1._2)))
    assert(gotBand.getBoolean(7) === expectBand._2)
    // tau chooser vs its own sweep
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val tsweep = SparkEntry.queries("q356_semdedup_tau_sweep")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val expectTau = tsweep
      .map(t => (t, t._5 * 1000000L / nVecs >= 500000L))
      .sortBy { case ((tn, td, _, fl, _), q) =>
        (!q, -fl, tn * 1000000L / td) }
      .head
    val gotTau = SparkEntry.queries("q367_tau_chooser")(spark, sf)
      .collect().head
    assert((gotTau.getLong(0), gotTau.getLong(1)) ===
      ((expectTau._1._1, expectTau._1._2)))
    assert(gotTau.getBoolean(6) === expectTau._2)
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
