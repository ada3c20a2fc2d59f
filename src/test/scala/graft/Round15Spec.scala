package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round 15: the K-day absorbing pipeline loop (fold equivalence),
  * segmented CONTINUED packing (the unbounded-delta path), the carry
  * merge rule, the signature-store artifact, and the loader-manifest
  * conservation pins. */
class Round15Spec extends SparkSpec {
  import spark.implicits._

  private def packMap(df: DataFrame) =
    df.select("source", "doc_id", "len", "seq_id", "seq_offset")
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  // --- segmented CONTINUED packing -----------------------------------

  test("packSequencesSegmentedContinued: with segmentRows >= every " +
    "stratum it is BIT-IDENTICAL to packSequencesContinued (the " +
    "identity splice), for carried and fresh strata alike") {
    val docs = Seq(
      ("A", 10L, 4L), ("A", 11L, 5L), ("A", 12L, 3L), ("A", 13L, 9L),
      ("A", 14L, 2L), ("B", 20L, 6L), ("B", 21L, 6L), ("C", 30L, 1L))
      .toDF("source", "doc_id", "n_chars")
    // A mid-fill from yesterday (room for the first doc); B exactly
    // full; C absent (fresh)
    val carry = Seq(("A", 3L, 5L), ("B", 1L, 10L))
      .toDF("source", "carry_seq", "carry_fill")
    val cont = operators.Curation.packSequencesContinued(
      docs, "doc_id", "n_chars", "source", 10L, carry)
    val seg = operators.Curation.packSequencesSegmentedContinued(
      docs, "doc_id", "n_chars", "source", 10L, segmentRows = 100L,
      carry)
    assert(packMap(seg) == packMap(cont))
    // and the carried numbering actually continued: A starts at seq 3
    val a10 = packMap(cont)(("A", 10L))
    assert(a10 == (4L, 3L, 5L), s"A's first doc tops up the carry: $a10")
    // B's carry is exactly full -> first B doc opens seq 2 at offset 0
    assert(packMap(cont)(("B", 20L)) == (6L, 2L, 0L))
    // C starts fresh at (0, 0)
    assert(packMap(cont)(("C", 30L)) == (1L, 0L, 0L))
  }

  test("packSequencesSegmentedContinued: the FIRST segment is the " +
    "continued fold's prefix bit-for-bit, later segments only add " +
    "boundary waste (conservation + invariants pinned); a stratum " +
    "over the continued bound packs through the segmented form") {
    val rnd = new scala.util.Random(1501)
    val n = 6000 // over a test-scaled per-stratum bound
    val docs = (0 until n).map { i =>
      ("big", i.toLong * 2 + 1, 1L + rnd.nextInt(9).toLong)
    }.toDF("source", "doc_id", "n_chars")
    val carry = Seq(("big", 5L, 4L)).toDF("source", "carry_seq",
      "carry_fill")
    val segRows = 512L
    val seg = operators.Curation.packSequencesSegmentedContinued(
      docs, "doc_id", "n_chars", "source", 20L, segRows, carry)
    val rows = packMap(seg)
    assert(rows.size === n, "every doc packs exactly once")
    rows.foreach { case ((_, id), (len, sq, off)) =>
      assert(off + len <= 20L, s"doc $id overfills: off=$off len=$len")
      assert(sq >= 5L, s"doc $id numbered before the carry seq: $sq")
    }
    // first segment == continued prefix (same carry, same docs)
    val prefix = docs.filter(col("doc_id") < (segRows * 2 + 1))
    val contPrefix = packMap(operators.Curation.packSequencesContinued(
      prefix, "doc_id", "n_chars", "source", 20L, carry))
    contPrefix.foreach { case (k, v) =>
      assert(rows(k) == v, s"first-segment row $k diverges: " +
        s"${rows(k)} vs $v")
    }
    // sequence ids are contiguous from the carry seq
    val seqs = rows.values.map(_._2).toSet
    assert(seqs == (5L to seqs.max).toSet, "contiguous seq numbering")
  }

  test("packCarryMerge: strata in the newer carry take it, untouched " +
    "strata keep the older carry") {
    val newer = Seq(("A", 7L, 3L)).toDF("source", "carry_seq",
      "carry_fill")
    val older = Seq(("A", 2L, 9L), ("B", 4L, 1L))
      .toDF("source", "carry_seq", "carry_fill")
    val merged = operators.Curation.packCarryMerge(newer, older,
        "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(merged == Map("A" -> ((7L, 3L)), "B" -> ((4L, 1L))))
  }

  // --- signature-store artifact ---------------------------------------

  test("portableSignatureStore: the artifact rows are the recompute " +
    "path's signatures plus exact shingle counts; sub-3-word docs " +
    "have no row") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val store = operators.MinHashLSH.portableSignatureStore(
      docs, "doc_id", "text")
    assert(store.columns.toSeq ===
      Seq("doc_id", "m0", "m1", "m2", "m3", "m4", "m5", "m6", "m7",
        "n_toks"))
    val tiny = Seq((1L, "just two"), (2L, "one two three four"))
      .toDF("doc_id", "text")
    val t = operators.MinHashLSH.portableSignatureStore(tiny, "doc_id",
      "text").collect()
    assert(t.map(_.getLong(0)).toSet === Set(2L),
      "a doc under 3 words has no shingles and no artifact row")
    assert(t.head.getLong(9) === 2L, "two 3-shingles in a 4-word doc")
  }

  test("crossNearDuplicatesFromStore: artifact/store drift fails " +
    "LOUDLY — a banded candidate whose store doc was removed raises " +
    "instead of silently vanishing from the verify") {
    val mk = (ids: Seq[Long]) => ids.map(i =>
      (i, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val store = mk(Seq(1L, 2L))
    val sigs = operators.MinHashLSH.portableSignatureStore(store,
      "doc_id", "text")
    val batch = mk(Seq(10L))
    // intact store: the duplicate pair verifies
    assert(operators.MinHashLSH.crossNearDuplicatesFromStore(sigs,
      store, batch, "doc_id", "text").count() === 2L)
    // doc 2 removed from the store but not the artifact -> loud
    val ex = intercept[Exception] {
      operators.MinHashLSH.crossNearDuplicatesFromStore(sigs,
        store.filter(col("doc_id") === 1L), batch, "doc_id", "text")
        .count()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(c => Option(c.getMessage).getOrElse("")).toSeq
    assert(chain(ex).exists(_.contains("artifact/store drift")),
      s"expected the drift guard, got: $ex")
  }

  test("crossNearDuplicatesFromStore == crossNearDuplicatesPortable " +
    "(bit-equal verified pairs) on the fixture split") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val store = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val sigs = operators.MinHashLSH.portableSignatureStore(store,
      "doc_id", "text")
    def pairs(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val viaStore = pairs(operators.MinHashLSH
      .crossNearDuplicatesFromStore(sigs, store, batch, "doc_id",
        "text")
      .select("b_id", "s_id", "inter", "uni"))
    val recompute = pairs(operators.MinHashLSH
      .crossNearDuplicatesPortable(store, batch, "doc_id", "text")
      .select("b_id", "s_id", "inter", "uni"))
    assert(viaStore === recompute)
    assert(recompute.nonEmpty,
      "fixture must actually exercise the cross path")
  }

  // --- K-day fold equivalence (the q373 property) -----------------------
  //
  // Clean-family corpus: duplicate relations are CLOSED within each
  // family (exact families share one text; near families have exactly
  // 2 members, so the banded catch-or-miss is pairwise and identical
  // in every scenario; semantic families share one embedding vector,
  // cos = 1); bench docs are singletons so contamination never
  // entangles with dedup; the day split is id-ordered, so
  // first-arrival == min-id and the two-day absorbed fold must equal
  // ONE delta fold over the union, bit for bit — ledger AND pack
  // addresses.

  private def cleanFamilyCorpus(seed: Int): (Seq[(Long, String, String)],
      Seq[(Long, Array[Long])]) = PipelineFixtures.cleanFamilyCorpus(seed)

  test("pipeline fold equivalence: THREE absorbed delta days == one " +
    "batch delta over the union, bit-exact (ledger + pack address), " +
    "over a random clean-family corpus with random id-ordered splits") {
    val (rows, vecRows) = cleanFamilyCorpus(1504)
    val rnd = new scala.util.Random(1505)
    val docsDf = rows.toDF("doc_id", "text", "source").localCheckpoint()
    val quant = vecRows.map { case (i, q) => (i, q.toSeq) }
      .toDF("id", "q").localCheckpoint()
    // random store/delta assignment, then id-ordered day splits of
    // the delta (arrival order IS id order — the fixture convention)
    val storeMask = rows.map(r => r._1 -> (rnd.nextInt(3) == 0)).toMap
    val storeIds = rows.map(_._1).filter(storeMask)
    val deltaIds = rows.map(_._1).filterNot(storeMask).sorted
    val cut1 = deltaIds(deltaIds.length / 3 + rnd.nextInt(
      deltaIds.length / 6))
    val cut2 = deltaIds(2 * deltaIds.length / 3 + rnd.nextInt(
      deltaIds.length / 6))
    val yDocs = docsDf.filter(col("doc_id").isin(storeIds: _*))
    val dAll = docsDf.filter(!col("doc_id").isin(storeIds: _*))
    val store0 = SparkEntry.buildPipelineStoreFrom(spark, yDocs,
      docsDf, quant)
    def led(df: DataFrame) = df
      .select("doc_id", "disposition", "seq_id", "seq_offset")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    // A: one batch delta over the union
    val oneShot = led(SparkEntry.pipelineDeltaDay(store0, dAll).ledger)
    // B: three absorbed days (the K-day loop, K = 3)
    val day1 = SparkEntry.pipelineDeltaDay(store0,
      dAll.filter(col("doc_id") <= cut1))
    val store1 = SparkEntry.absorbPipelineDay(store0, day1)
    assert(store1.docs.count() ===
      store0.docs.count() + day1.kept.count(),
      "absorb grows the store by exactly the kept day")
    val day2 = SparkEntry.pipelineDeltaDay(store1,
      dAll.filter(col("doc_id") > cut1 && col("doc_id") <= cut2))
    val store2 = SparkEntry.absorbPipelineDay(store1, day2)
    val day3 = SparkEntry.pipelineDeltaDay(store2,
      dAll.filter(col("doc_id") > cut2))
    val threeDay = led(day1.ledger.unionByName(day2.ledger)
      .unionByName(day3.ledger))
    assert(threeDay === oneShot)
    // the corpus must actually exercise every removal stage
    val disp = oneShot.map(_._2).toSet
    assert(Set("short", "exact_dup", "near_dup", "kept")
      .subsetOf(disp), s"weak fixture: $disp")
  }

  // --- loader manifest / weighted reshard conservation ------------------

  test("q376 loader manifest: per-shard ranks are 1..n_seqs, offsets " +
    "are exact exclusive prefix sums, and shard totals reconcile " +
    "with q371") {
    val man = SparkEntry.queries("q376_loader_manifest")(spark, sf)
      .collect()
    val byShard = man.groupBy(_.getLong(0))
    byShard.foreach { case (shard, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq ===
        (1L to rs.length.toLong).toSeq, s"ranks dense on shard $shard")
      var off = 0L
      sorted.foreach { r =>
        assert(r.getLong(6) === off,
          s"offset mismatch on shard $shard rank ${r.getLong(1)}")
        off += r.getLong(5)
      }
    }
    val q371 = SparkEntry.queries("q371_shard_manifest")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    q371.foreach { case (shard, (nSeqs, nDocs, nTok)) =>
      val rs = byShard.getOrElse(shard, Array.empty)
      assert(rs.length.toLong === nSeqs, s"n_seqs shard $shard")
      assert(rs.map(_.getLong(4)).sum === nDocs, s"n_docs shard $shard")
      assert(rs.map(_.getLong(5)).sum === nTok, s"n_tokens shard $shard")
    }
  }

  test("q377 segmented-continued: every odd doc packs exactly once, " +
    "never overfilling, and each stratum's numbering continues the " +
    "even-half carry") {
    val out = SparkEntry.queries("q377_pack_seg_continued")(spark, sf)
      .collect()
    val oddIds = Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 =!= 0)
      .select(col("doc_id").cast("long")).collect().map(_.getLong(0))
      .toSet
    assert(out.map(_.getLong(1)).toSet === oddIds)
    out.foreach { r =>
      assert(r.getLong(4) + r.getLong(2) <= 2000L,
        s"overfill at doc ${r.getLong(1)}")
    }
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").cast("long").as("doc_id"),
        col("n_chars").cast("long").as("n_chars"), col("source"))
    val carry = operators.Curation.packCarry(
      operators.Curation.packSequences(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "n_chars",
        "source", 2000L), "doc_id", "source")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val minSeq = rs.map(_.getLong(3)).min
      assert(minSeq >= carry.getOrElse(src, 0L),
        s"stratum $src numbered before its carry")
    }
  }

  test("q378 absorb drift: one row per frozen cluster, counts " +
    "non-negative, means zero exactly when the side is empty, and " +
    "the retrain flag follows the q352 integer cross-multiply") {
    val out = SparkEntry.queries("q378_absorb_drift")(spark, sf)
      .collect()
    assert(out.length === 8, "k = 8 frozen clusters")
    out.foreach { r =>
      val (ny, nd) = (r.getLong(1), r.getLong(2))
      assert(ny >= 0 && nd >= 0)
      if (ny == 0) assert(r.getLong(3) === 0L)
      if (nd == 0) {
        assert(r.getLong(4) === 0L)
        assert(!r.getBoolean(5), "empty absorbed side never retrains")
      }
    }
    assert(out.map(_.getLong(2)).sum > 0,
      "fixture must absorb at least one vectored doc")
  }

  test("q379 manifest delta: every kept q370 doc lands in exactly one " +
    "delta-manifest row, at most one sequence per stratum extends the " +
    "carry, and new sequences are contiguous after it") {
    val man = SparkEntry.queries("q379_manifest_delta")(spark, sf)
      .collect()
    val kept = SparkEntry.queries("q370_pipeline_delta")(spark, sf)
      .collect().count(_.getString(1) == "kept")
    assert(man.map(_.getLong(3)).sum === kept.toLong,
      "delta-manifest docs == q370 kept docs")
    man.groupBy(_.getString(1)).foreach { case (src, rs) =>
      val ext = rs.filter(_.getBoolean(5))
      assert(ext.length <= 1, s"stratum $src extends >1 sequence")
      val seqs = rs.map(_.getLong(2)).sorted
      assert(seqs.toSet.size === seqs.length, s"dup seq rows in $src")
      assert(seqs.last - seqs.head === seqs.length - 1,
        s"touched sequences not contiguous in $src")
      ext.headOption.foreach { e =>
        assert(e.getLong(2) === seqs.head,
          s"the extending sequence must be the FIRST touched in $src")
      }
    }
    // the reconciliation algebra at the Curation level: the delta
    // touches only sequences >= the stratum carry, so yesterday's
    // manifest rows below the carry are never rewritten
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").cast("long").as("doc_id"),
        col("n_chars").cast("long").as("n_chars"), col("source"))
    val carry = operators.Curation.packCarry(
      operators.Curation.packSequences(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "n_chars",
        "source", 2000L), "doc_id", "source")
    val cmap = carry.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dm = operators.Curation.packSequencesContinued(
        docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "n_chars",
        "source", 2000L, carry)
      .groupBy("source").agg(min(col("seq_id")).as("mn"))
      .collect()
    dm.foreach { r =>
      assert(r.getLong(1) >= cmap.getOrElse(r.getString(0), 0L),
        s"stratum ${r.getString(0)} touched a pre-carry sequence")
    }
  }

  test("q380 serving refresh: dense ranks, no self-neighbors, " +
    "non-increasing scores, and every delta-side result is a q370 " +
    "KEPT doc (the index only serves absorbed survivors)") {
    val out = SparkEntry.queries("q380_serving_refresh")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq ===
        (1L to rs.length.toLong).toSeq, s"ranks not dense for $qid")
      assert(rs.length <= 5)
      assert(sorted.sliding(2).forall(p => p.length < 2 ||
        p(0).getLong(3) >= p(1).getLong(3)),
        s"scores not non-increasing for $qid")
      rs.foreach(r => assert(r.getLong(2) !== qid, "self-neighbor"))
    }
    val kept = SparkEntry.queries("q370_pipeline_delta")(spark, sf)
      .collect().filter(_.getString(1) == "kept").map(_.getLong(0))
      .toSet
    out.filter(_.getBoolean(4)).foreach { r =>
      assert(kept.contains(r.getLong(2)),
        s"delta-side neighbor ${r.getLong(2)} was not absorbed")
    }
  }

  test("tokenizer drift: a delta day that introduces new and " +
    "newly-frequent pieces yields newly_spannable and fewer_pieces " +
    "mass with a non-positive token delta; vocabulary monotonicity " +
    "keeps more_pieces and newly_unspannable provably empty") {
    // yesterday: 'abcd' everywhere, 'aabb' exactly once (its 2+-char
    // pieces stay below minCount); today repeats 'aabb' (now frequent
    // -> fewer pieces) and brings 'wxyz' (chars unseen yesterday ->
    // newly spannable)
    val pad = Seq.fill(39)("abcd").mkString(" ")
    val y = Seq(
      (1L, s"$pad abcd"), (2L, s"$pad abcd"), (3L, s"$pad aabb"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (4L, s"$pad aabb aabb aabb aabb aabb"),
      (5L, s"$pad wxyz wxyz wxyz"))
      .toDF("doc_id", "text")
    val out = SparkEntry.tokenizerDriftFrom(spark, y,
        y.unionByName(delta))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("more_pieces") === ((0L, 0L, 0L)))
    assert(out("newly_unspannable") === ((0L, 0L, 0L)))
    val (fw, fo, fd) = out("fewer_pieces")
    assert(fw === 1L && fo === 6L && fd < 0L,
      s"'aabb' (6 occurrences) must merge better: $fw/$fo/$fd")
    val (nw, no, nd) = out("newly_spannable")
    assert(nw === 1L && no === 3L,
      s"'wxyz' (3 occurrences) must become spannable: $nw/$no")
    // 'wxyz' charged ceil(4/4)=1 both sides of the coalesce -> the
    // class exists even at delta 0; spannability is the signal
    assert(nd <= 0L)
    assert(out("unchanged")._1 >= 1L, "'abcd' stays one piece")
    val total = out.values.map(_._3).sum
    assert(total <= 0L, s"retraining never costs tokens: $total")
  }

  test("q382 epoch order: each (shard, epoch) is a permutation of the " +
    "shard's q376 manifest with dense ranks and exact epoch-local " +
    "offsets, and the two epochs genuinely shuffle differently") {
    val out = SparkEntry.queries("q382_epoch_order")(spark, sf)
      .collect()
    val man = SparkEntry.queries("q376_loader_manifest")(spark, sf)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (s, rs) =>
        s -> rs.map(r => (r.getString(2), r.getLong(3))).toSet }
    var anyDiff = false
    out.groupBy(r => (r.getLong(0), r.getLong(1))).foreach {
      case ((shard, _), rs) =>
        val sorted = rs.sortBy(_.getLong(2))
        assert(sorted.map(_.getLong(2)).toSeq ===
          (1L to rs.length.toLong).toSeq)
        var off = 0L
        sorted.foreach { r =>
          assert(r.getLong(6) === off); off += r.getLong(5)
        }
        assert(rs.map(r => (r.getString(3), r.getLong(4))).toSet ===
          man(shard), s"shard $shard epoch set != manifest")
    }
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byEpoch = rs.groupBy(_.getLong(1)).map { case (e, xs) =>
        e -> xs.sortBy(_.getLong(2))
          .map(r => (r.getString(3), r.getLong(4))).toSeq }
      if (byEpoch.size == 2 && byEpoch(0L) != byEpoch(1L))
        anyDiff = true
    }
    assert(anyDiff, "epoch shuffles must differ somewhere")
  }

  test("quotaAdmitPrefix: admission is a per-stratum id-prefix, the " +
    "budget is respected exactly, missing strata are unlimited, and " +
    "the FIFO backlog loop conserves — day-2 re-offers the backlog " +
    "first and (with room) admits it before fresh docs") {
    val offered = Seq(
      ("A", 1L, 5L), ("A", 2L, 5L), ("A", 3L, 5L), ("A", 4L, 5L),
      ("B", 9L, 7L))
      .toDF("source", "doc_id", "n_tokens")
    val budgets = Seq(("A", 12L)).toDF("source", "budget")
    val d1 = operators.Curation.quotaAdmitPrefix(offered, "doc_id",
        "n_tokens", "source", budgets)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(3), r.getBoolean(4)))
    val adm1 = d1.filter(_._4).map(x => (x._1, x._2)).toSet
    assert(adm1 === Set(("A", 1L), ("A", 2L), ("B", 9L)),
      s"A admits 2 of 4 under budget 12, B is unlimited: $adm1")
    // prefix property: an admitted doc implies every earlier
    // same-stratum doc admitted
    d1.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2).map(_._4)
      assert(!sorted.sliding(2).exists(p =>
        p.length == 2 && !p(0) && p(1)), "non-prefix admission")
    }
    // day 2: the backlog (ids 3, 4) plus a fresh doc; FIFO — the
    // backlog's smaller ids are offered first by the same id-ordered
    // rule, and conservation holds (admitted ∪ backlog == offered)
    val day2 = Seq(("A", 3L, 5L), ("A", 4L, 5L), ("A", 20L, 5L))
      .toDF("source", "doc_id", "n_tokens")
    val d2 = operators.Curation.quotaAdmitPrefix(day2, "doc_id",
        "n_tokens", "source", budgets)
      .collect().map(r => (r.getLong(1), r.getBoolean(4)))
    assert(d2.filter(_._2).map(_._1).toSet === Set(3L, 4L),
      "the backlog is admitted before the fresh doc")
    assert((adm1.map(_._2) ++ d1.filterNot(_._4).map(_._2)).toSet ===
      d1.map(_._2).toSet, "day-1 conservation")
  }

  test("q384 two-day quota: offered rows are exactly q373's kept docs " +
    "per day, each day's budget is respected per source, and day-2 " +
    "admission is a FIFO prefix over (offered_day, id)") {
    val out = SparkEntry.queries("q384_quota_two_day")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val keptByDay = SparkEntry.queries("q373_pipeline_two_day")(spark,
        sf).collect()
      .filter(_.getString(2) == "kept")
      .groupBy(_.getLong(1)).map { case (d, rs) =>
        d -> rs.map(_.getLong(0)).toSet }
    assert(out.filter(_._4 == 1L).map(_._1).toSet ===
      keptByDay.getOrElse(1L, Set.empty),
      "day-1 offer == q373 day-1 kept")
    assert(out.filter(_._4 == 2L).map(_._1).toSet ===
      keptByDay.getOrElse(2L, Set.empty),
      "day-2 fresh offer == q373 day-2 kept")
    out.groupBy(_._2).foreach { case (src, rs) =>
      val o1 = rs.filter(_._4 == 1L)
      val b1 = o1.map(_._3).sum / 2
      assert(o1.filter(_._5 == 1L).map(_._3).sum <= b1,
        s"day-1 budget blown in $src")
      val o2 = rs.filter(r => r._5 != 1L) // backlog + fresh
      val b2 = o2.map(_._3).sum / 2
      assert(o2.filter(_._5 == 2L).map(_._3).sum <= b2,
        s"day-2 budget blown in $src")
      val ordered = o2.sortBy(r => (r._4, r._1)).map(_._5 == 2L)
      assert(!ordered.sliding(2).exists(p =>
        p.length == 2 && !p(0) && p(1)),
        s"day-2 admission not a FIFO prefix in $src")
    }
    assert(out.exists(_._5 == -1L) && out.exists(_._5 == 2L),
      "fixture must exercise both backlog outcomes")
  }

  test("property: quotaAdmitPrefix over random offers and budgets — " +
    "admission is always a per-stratum id-prefix, admitted mass " +
    "never exceeds the budget, cum_before is the exact exclusive " +
    "prefix sum, and strata without a budget admit everything") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      n <- Gen.choose(1, 30)
      rows <- Gen.listOfN(n, for {
        s <- Gen.oneOf("A", "B", "C")
        t <- Gen.choose(1L, 50L)
      } yield (s, t))
      budA <- Gen.choose(0L, 300L)
    } yield (rows.zipWithIndex.map { case ((s, t), i) =>
      (s, i.toLong * 2 + 1, t) }, budA)
    val prop = Prop.forAll(gen) { case (rows, budA) =>
      val df = rows.toDF("source", "doc_id", "n_tokens")
      val out = operators.Curation.quotaAdmitPrefix(df, "doc_id",
          "n_tokens", "source",
          Seq(("A", budA)).toDF("source", "budget"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getLong(2), r.getLong(3), r.getBoolean(4)))
      val bySrc = out.groupBy(_._1)
      bySrc.forall { case (src, rs) =>
        val sorted = rs.sortBy(_._2)
        val prefixOk = !sorted.map(_._5).sliding(2).exists(p =>
          p.length == 2 && !p(0) && p(1))
        val cumOk = sorted.scanLeft(0L)(_ + _._3).init
          .zip(sorted).forall { case (c, r) => c == r._4 }
        val budgetOk = src != "A" ||
          rs.filter(_._5).map(_._3).sum <= budA
        val unlimitedOk = src == "A" || rs.forall(_._5)
        prefixOk && cumOk && budgetOk && unlimitedOk
      } && out.length == rows.length
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, s"quota property: ${res.status}")
  }

  test("plan shape: the round-15 corpus paths stay join-free where " +
    "they must — weighted replicated reshard is map-only + one agg; " +
    "quota admission is one window + a broadcast budget join") {
    val keys = (0L until 50L).toDF("doc_id")
    val reshard = operators.HashRing.replicatedReshardAuditWeighted(
      keys, "doc_id", Seq(4, 4, 2), Seq(4, 4, 2, 2), replicas = 2)
    val rp = reshard.queryExecution.executedPlan.toString
    assert(!rp.contains("Join") && !rp.contains("CartesianProduct"),
      s"weighted reshard must not join:\n$rp")
    val offered = Seq(("A", 1L, 5L)).toDF("source", "doc_id",
      "n_tokens")
    val qa = operators.Curation.quotaAdmitPrefix(offered, "doc_id",
      "n_tokens", "source", Seq(("A", 9L)).toDF("source", "budget"))
    val qp = qa.queryExecution.executedPlan.toString
    assert(qp.contains("BroadcastHashJoin") &&
      !qp.contains("SortMergeJoin") &&
      !qp.contains("CartesianProduct"),
      s"budget join must broadcast:\n$qp")
  }

  test("q375 weighted reshard: both scenarios audit the same corpus; " +
    "copies bounded by [primaries, R x keys]; growth-only contract " +
    "rejected when an existing shard shrinks") {
    val out = SparkEntry.queries("q375_weighted_reshard")(spark, sf)
      .collect()
    assert(out.map(_.getString(0)).toSeq ===
      Seq("four_small", "one_big"))
    val nDocs = Tables.documents(spark, sf).count()
    out.foreach { r =>
      assert(r.getLong(1) === nDocs)
      assert(r.getLong(2) <= r.getLong(4),
        "every moved primary is a moved copy")
      assert(r.getLong(4) <= 3L * nDocs)
      assert(r.getLong(4) > 0L, "growth must move something")
    }
    intercept[IllegalArgumentException] {
      operators.HashRing.replicatedReshardAuditWeighted(
        Tables.documents(spark, sf), "doc_id", Seq(4, 4), Seq(3, 4, 2),
        replicas = 2)
    }
  }
}
