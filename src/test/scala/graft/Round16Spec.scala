package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round 16: the retrain arm (retrained == batch-built), absorb
  * idempotence (the crash-safety pin), the K-day quota FIFO
  * invariants, ring-migration conservation vs the q376 manifest, the
  * epoch-quality stats, and the round's guard fixes. */
class Round16Spec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[String] = {
    val cs = df.columns.sorted
    df.select(cs.head, cs.tail: _*).collect().map(_.toString).sorted.toSeq
  }

  private def storeFields(st: SparkEntry.PipelineStore) = Seq(
    "docs" -> st.docs, "members" -> st.members, "cents" -> st.cents,
    "vocab" -> st.vocab, "sigs" -> st.sigs, "carry" -> st.carry)

  private def assertStoreEqual(a: SparkEntry.PipelineStore,
      b: SparkEntry.PipelineStore, skip: Set[String] = Set.empty): Unit =
    storeFields(a).zip(storeFields(b)).foreach {
      case ((n, fa), (_, fb)) if !skip.contains(n) =>
        assert(rows(fa) === rows(fb), s"store field $n diverges")
      case _ => ()
    }

  // --- absorb idempotence (the crash-safety pin) ------------------------

  test("absorb is idempotent: re-absorbing the same saved day is a " +
    "no-op on every artifact, and a PARTIAL crash (some artifacts " +
    "written, some not) heals to the same store on retry") {
    val (docRows, vecRows) = PipelineFixtures.cleanFamilyCorpus(1601)
    val docsDf = docRows.toDF("doc_id", "text", "source")
      .localCheckpoint()
    val quant = vecRows.map { case (i, q) => (i, q.toSeq) }
      .toDF("id", "q").localCheckpoint()
    val store0 = SparkEntry.buildPipelineStoreFrom(spark,
      docsDf.filter(col("doc_id") % 3 =!= 0), docsDf, quant)
    val day = SparkEntry.pipelineDeltaDay(store0,
      docsDf.filter(col("doc_id") % 3 === 0))
    assert(day.kept.count() > 0, "fixture must absorb something")
    val store1 = SparkEntry.absorbPipelineDay(store0, day)
    // full double-absorb: bit-equal store
    assertStoreEqual(SparkEntry.absorbPipelineDay(store1, day), store1)
    // partial crash: docs + members landed, sigs did not — the retry
    // must append ONLY the missing artifact's rows
    val partial = store1.copy(sigs = store0.sigs)
    assertStoreEqual(SparkEntry.absorbPipelineDay(partial, day), store1)
  }

  test("chain-level crash idempotence: re-RUNNING the delta chain on " +
    "an already-absorbed day dedups everything against the store " +
    "(no doc survives) and the follow-up absorb is a no-op") {
    val (docRows, vecRows) = PipelineFixtures.cleanFamilyCorpus(1602)
    val docsDf = docRows.toDF("doc_id", "text", "source")
      .localCheckpoint()
    val quant = vecRows.map { case (i, q) => (i, q.toSeq) }
      .toDF("id", "q").localCheckpoint()
    val store0 = SparkEntry.buildPipelineStoreFrom(spark,
      docsDf.filter(col("doc_id") % 3 =!= 0), docsDf, quant)
    val dayDocs = docsDf.filter(col("doc_id") % 3 === 0)
    val day = SparkEntry.pipelineDeltaDay(store0, dayDocs)
    val store1 = SparkEntry.absorbPipelineDay(store0, day)
    val rerun = SparkEntry.pipelineDeltaDay(store1, dayDocs)
    assert(rerun.kept.count() === 0L,
      "every re-run doc must dedup against the absorbed store")
    // every doc the first run KEPT (now absorbed) is caught as an
    // exact dup of the store; first-run REJECTS re-reject (their
    // dup partners or flags are unchanged — dispositions may differ
    // in detail, e.g. a near-dup partner absorbed meanwhile)
    val rerunDisp = rerun.ledger
      .select("doc_id", "disposition").as[(Long, String)]
      .collect().toMap
    day.kept.select("doc_id").as[Long].collect().foreach { id =>
      assert(rerunDisp(id) === "exact_dup",
        s"absorbed doc $id must re-run as exact_dup: ${rerunDisp(id)}")
    }
    assert(!rerunDisp.values.exists(_ == "kept"))
    assertStoreEqual(SparkEntry.absorbPipelineDay(store1, rerun), store1)
  }

  // --- the retrain arm (q385) -------------------------------------------

  test("retrained == batch-built over the same corpus: " +
    "retrainPipelineStore equals buildPipelineStoreFrom re-run on the " +
    "grown store's curated docs, field by field (carry excluded by " +
    "design: shipped sequences are physical history)") {
    val (docRows, vecRows) = PipelineFixtures.cleanFamilyCorpus(1603)
    val docsDf = docRows.toDF("doc_id", "text", "source")
      .localCheckpoint()
    val quant = vecRows.map { case (i, q) => (i, q.toSeq) }
      .toDF("id", "q").localCheckpoint()
    val store0 = SparkEntry.buildPipelineStoreFrom(spark,
      docsDf.filter(col("doc_id") % 3 =!= 0), docsDf, quant)
    val day = SparkEntry.pipelineDeltaDay(store0,
      docsDf.filter(col("doc_id") % 3 === 0))
    val store1 = SparkEntry.absorbPipelineDay(store0, day)
    val retrained = SparkEntry.retrainPipelineStore(spark, store1)
    val batch = SparkEntry.buildPipelineStoreFrom(spark, store1.docs,
      docsDf, quant)
    assertStoreEqual(retrained, batch, skip = Set("carry"))
    // and curation is idempotent on a curated corpus: the batch
    // re-run's training base is the store itself (centroids trained
    // on exactly the store's member vectors), so gate/exact/near
    // removed nothing
    val direct = operators.IvfIndex.trainPortable(spark,
      quant.join(store1.docs.select(col("doc_id").as("id")), Seq("id")),
      k = 8, iters = 2)
    assert(rows(retrained.cents) === rows(direct),
      "retrain centroids == Lloyd directly on the store members")
    // the retained carry really is the absorbed one
    assert(rows(retrained.carry) === rows(store1.carry))
  }

  test("q385 on the fixture: frozen and retrained sides cover the " +
    "same member set, reassignments and drops are bounded by their " +
    "cluster sizes, and the fixture actually reassigns and drops") {
    val out = SparkEntry.queries("q385_retrain_refreeze")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.map(_._1).toSeq === (0L to 7L), "all 8 clusters anchored")
    assert(out.map(_._2).sum === out.map(_._4).sum,
      "frozen and retrained assignments cover the same members")
    out.foreach { r =>
      assert(r._6 <= r._2, s"cluster ${r._1}: more reassigned than held")
      assert(r._7 <= r._4, s"cluster ${r._1}: more dropped than assigned")
    }
    assert(out.map(_._6).sum > 0, "fixture must actually reassign")
    assert(out.map(_._7).sum > 0,
      "fixture must exercise the SemDeDup re-screen")
  }

  test("q390: one row per eval probe, overlap bounded by k = 5, " +
    "top1_same iff both top-1 ids exist and agree, and the retrain " +
    "actually moves some result sets without destroying all of them") {
    val out = SparkEntry.queries("q390_retrain_serving")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    val probeIds = Tables.embeddings(spark, sf)
      .select(col("vec_id").cast("long")).as[Long].collect()
      .filter(_ % 20 == 0).toSet
    assert(out.map(_._1).toSet === probeIds, "every 20th vector probed")
    out.foreach { r =>
      assert(r._2 >= 0 && r._2 <= 5, s"overlap out of [0,5] on ${r._1}")
      assert(r._5 === (r._3 != -1L && r._3 == r._4),
        s"top1_same inconsistent on ${r._1}")
    }
    assert(out.exists(!_._5) && out.exists(_._5),
      "fixture must show both stable and drifted probes")
  }

  // --- ring migration (q386) vs the q376 manifest ------------------------

  test("q386 conservation: the before-side columns are exactly the " +
    "q376 loader manifest; after-side ranks are dense per shard; " +
    "moved implies invalidated; equal offsets on an unmoved sequence " +
    "imply NOT invalidated") {
    val mig = SparkEntry.queries("q386_ring_migration")(spark, sf)
      .collect()
    val man = SparkEntry.queries("q376_loader_manifest")(spark, sf)
      .collect()
      .map(r => (r.getString(2), r.getLong(3), r.getLong(0),
        r.getLong(1), r.getLong(4), r.getLong(5), r.getLong(6))).sorted
    val before = mig.map(r => (r.getString(0), r.getLong(1),
        r.getLong(4), r.getLong(5), r.getLong(2), r.getLong(3),
        r.getLong(6))).sorted
    assert(before.toSeq === man.toSeq,
      "before-side manifest must be bit-equal to q376")
    mig.groupBy(_.getLong(7)).foreach { case (shard, rs) =>
      assert(rs.map(_.getLong(8)).sorted.toSeq ===
        (1L to rs.length.toLong).toSeq,
        s"after-ranks dense on shard $shard")
    }
    mig.foreach { r =>
      val (moved, inval) = (r.getBoolean(10), r.getBoolean(11))
      val offEq = r.getLong(6) == r.getLong(9)
      assert(!moved || inval, "moved implies invalidated")
      assert(moved || !offEq || !inval,
        "unmoved + equal offset must stay valid")
      assert(moved || offEq || inval,
        "a shifted offset invalidates the resume point")
    }
    assert(mig.exists(_.getBoolean(10)) &&
      mig.exists(r => !r.getBoolean(11)),
      "fixture must show both moved and still-valid sequences")
  }

  test("q391 weighted migration: both scenarios share identical " +
    "before columns, every moved sequence lands on a NEW shard (old " +
    "shards only lose arcs), and both scenarios actually move " +
    "sequences (64 added vnodes each — the A/B isolates placement, " +
    "not volume)") {
    val out = SparkEntry.queries("q391_weighted_migration")(spark, sf)
      .collect()
    val byScen = out.groupBy(_.getString(0))
    assert(byScen.keySet === Set("one_big", "four_small"))
    def before(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getString(1), r.getLong(2), r.getLong(4),
        r.getLong(5), r.getLong(6))).sortBy(t => (t._1, t._2)).toSeq
    assert(before(byScen("one_big")) === before(byScen("four_small")),
      "the before ring is scenario-independent")
    byScen.foreach { case (scen, rs) =>
      val newShards = if (scen == "one_big") Set(16L)
        else Set(16L, 17L, 18L, 19L)
      rs.filter(_.getBoolean(10)).foreach { r =>
        assert(newShards.contains(r.getLong(7)),
          s"$scen: moved sequence to an OLD shard ${r.getLong(7)}")
      }
      rs.foreach { r =>
        assert(!r.getBoolean(10) || r.getBoolean(11),
          "moved implies invalidated")
      }
    }
    val movedOf = byScen.view.mapValues(_.count(_.getBoolean(10))).toMap
    assert(movedOf("one_big") > 0 && movedOf("four_small") > 0,
      s"fixture must move something in both scenarios: $movedOf")
  }

  // --- K-day quota FIFO invariants (q387 property) -----------------------

  test("property: the K-day quota fold over random offers/budgets — " +
    "admitted_day is non-decreasing in (offered_day, id) priority " +
    "order per source, each day's admission is a prefix of its " +
    "pending queue, admitted mass respects each day's budget, and " +
    "offered docs are conserved (admitted once XOR final backlog)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val k = 3
    val gen = for {
      perDay <- Gen.listOfN(k, Gen.choose(0, 8))
      toks <- Gen.listOfN(perDay.sum, Gen.choose(1L, 40L))
      srcs <- Gen.listOfN(perDay.sum, Gen.oneOf("A", "B"))
      budFrac <- Gen.choose(1L, 4L)
    } yield (perDay, toks, srcs, budFrac)
    val prop = Prop.forAll(gen) { case (perDay, toks, srcs, budFrac) =>
      // day d offers its slice with ids interleaved across days (the
      // %7-style split: arrival day is NOT id order)
      val all = toks.zip(srcs).zipWithIndex.map { case ((t, s), i) =>
        (s, i.toLong * 3 + 1, t) }
      val slices = perDay.zipWithIndex.flatMap { case (n, d) =>
        val start = perDay.take(d).sum
        all.slice(start, start + n).map { case (s, id, t) =>
          (s, id, t, d.toLong + 1) }
      }
      var backlog = Seq.empty[(String, Long, Long, Long)]
      var admitted = Seq.empty[(String, Long, Long, Long, Long)]
      var budgetOk = true
      (1 to k).foreach { d =>
        val pending = backlog ++ slices.filter(_._4 == d.toLong)
        val df = pending.toDF("source", "doc_id", "n_tokens",
          "offered_day")
        val bud = pending.groupBy(_._1).map { case (s, rs) =>
          (s, rs.map(_._3).sum / budFrac) }.toSeq
          .toDF("source", "budget")
        val adm = operators.Curation.quotaAdmitPrefix(df,
            Seq("offered_day", "doc_id"), "n_tokens", "source", bud)
          .collect().map(r => (r.getString(0), r.getLong(1),
            r.getLong(2), r.getLong(3), r.getBoolean(5)))
        val admDay = adm.filter(_._5)
        budgetOk &&= admDay.groupBy(_._1).forall { case (s, rs) =>
          rs.map(_._3).sum <= pending.filter(_._1 == s).map(_._3)
            .sum / budFrac }
        // prefix: in (offered_day, id) order per source, no admit
        // after a reject
        val prefixOk = adm.groupBy(_._1).forall { case (_, rs) =>
          !rs.sortBy(r => (r._4, r._2)).map(_._5).sliding(2)
            .exists(p => p.length == 2 && !p(0) && p(1)) }
        budgetOk &&= prefixOk
        admitted ++= admDay.map(r => (r._1, r._2, r._3, r._4,
          d.toLong))
        backlog = adm.filterNot(_._5).map(r => (r._1, r._2, r._3,
          r._4))
      }
      val conserved = admitted.map(_._2).toSet.size == admitted.size &&
        (admitted.map(_._2).toSet ++ backlog.map(_._2)).size ==
          slices.size &&
        admitted.size + backlog.size == slices.size
      // FIFO across days: per source, order by (offered_day, id);
      // admitted_day (backlog -> infinity) must be non-decreasing
      val byDoc = admitted.map(r => r._2 -> r._5).toMap
      val fifoOk = slices.groupBy(_._1).forall { case (_, rs) =>
        val seq = rs.sortBy(r => (r._4, r._2))
          .map(r => byDoc.getOrElse(r._2, Long.MaxValue))
        seq.sliding(2).forall(p => p.length < 2 || p(0) <= p(1))
      }
      budgetOk && conserved && fifoOk
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, s"K-day quota property: ${res.status}")
  }

  test("q387 on the fixture: flags are consistent (starved/blocked " +
    "only on unadmitted rows, wait_days = admitted_day - offered_day " +
    "for admitted rows and horizon age otherwise), and the horizon " +
    "actually leaves a backlog") {
    val out = SparkEntry.queries("q387_quota_starvation")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6),
        r.getBoolean(7)))
    out.foreach { r =>
      if (r._5 >= 0) {
        assert(r._6 === r._5 - r._4, s"wait mismatch on ${r._1}")
        assert(!r._7 && !r._8, s"flags on an admitted doc ${r._1}")
      } else {
        assert(r._6 === 3L - r._4, s"age mismatch on ${r._1}")
        assert(r._7 === (r._4 < 3L), s"starved flag on ${r._1}")
      }
    }
    assert(out.exists(_._5 == -1L), "horizon must leave a backlog")
    assert(out.exists(r => r._5 > r._4),
      "some doc must be admitted from the backlog (wait >= 1)")
  }

  test("q394: the fifo arm reconciles exactly with q387's per-doc " +
    "audit, both policies conserve offers, and carryover actually " +
    "remedies on the fixture (>= admitted token mass, <= starvation, " +
    "and the policies separate)") {
    val out = SparkEntry.queries("q394_quota_carryover")(spark, sf)
      .collect()
    val byPolicy = out.groupBy(_.getString(0))
    assert(byPolicy.keySet === Set("fifo", "carryover"))
    out.foreach { r =>
      assert(r.getLong(2) === r.getLong(3) + r.getLong(5),
        s"offer conservation on ${r.getString(0)}/${r.getString(1)}")
      assert(r.getLong(6) <= r.getLong(5) && r.getLong(7) <= r.getLong(5),
        s"starved/blocked bounded by backlog on ${r.getString(1)}")
    }
    val audit = SparkEntry.queries("q387_quota_starvation")(spark, sf)
      .collect()
    val agg = audit.groupBy(_.getString(1)).map { case (s, rs) =>
      s -> ((rs.length.toLong,
        rs.count(_.getLong(4) >= 0).toLong,
        rs.filter(_.getLong(4) >= 0).map(_.getLong(2)).sum,
        rs.count(_.getLong(4) < 0).toLong,
        rs.count(_.getBoolean(6)).toLong,
        rs.count(_.getBoolean(7)).toLong,
        rs.map(_.getLong(5)).sum))
    }
    byPolicy("fifo").foreach { r =>
      val (no, na, tok, nb, ns, nbl, sw) = agg(r.getString(1))
      assert(r.getLong(2) === no && r.getLong(3) === na &&
        r.getLong(4) === tok && r.getLong(5) === nb &&
        r.getLong(6) === ns && r.getLong(7) === nbl &&
        r.getLong(8) === sw,
        s"fifo arm diverges from q387 on ${r.getString(1)}")
    }
    def tot(p: String, i: Int) = byPolicy(p).map(_.getLong(i)).sum
    assert(tot("carryover", 4) >= tot("fifo", 4),
      "carryover must admit at least the fifo token mass here")
    assert(tot("carryover", 6) <= tot("fifo", 6),
      "carryover must not starve more here")
    assert(tot("carryover", 3) != tot("fifo", 3) ||
      tot("carryover", 4) != tot("fifo", 4),
      "the fixture must separate the policies")
  }

  // --- epoch quality (q388) ----------------------------------------------

  test("q388: n_seqs reconciles with the q376 manifest per shard, " +
    "sum_d2 is even and bounded by the reversed-order maximum, " +
    "rho_ppm is in [-1e6, 1e6] and never exactly 1e6 (the seeded " +
    "epoch shuffles must differ), runs are within [1, n_seqs]") {
    val out = SparkEntry.queries("q388_epoch_quality")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val manN = SparkEntry.queries("q376_loader_manifest")(spark, sf)
      .collect().groupBy(_.getLong(0)).map { case (s, rs) =>
        s -> rs.length.toLong }
    assert(out.map(_._1).toSet === manN.keySet.filter(manN(_) > 0),
      "every loaded shard audited")
    out.foreach { r =>
      assert(r._2 === manN(r._1), s"shard ${r._1} seq count")
      val n = r._2
      assert(r._3 % 2 === 0L, "footrule sum of (r0-r1)^2 is even")
      assert(r._3 <= n * (n * n - 1L) / 3L,
        s"sum_d2 exceeds the reversal bound on shard ${r._1}")
      if (n >= 2) {
        assert(r._4 <= 1000000L && r._4 >= -1000000L,
          s"rho out of range on shard ${r._1}")
        assert((r._4 == 1000000L) === (r._3 == 0L),
          s"rho = 1e6 iff the epoch orders coincide on shard ${r._1}")
      } else assert(r._4 === -1L)
      assert(r._5 >= 1L && r._5 <= n && r._6 >= 1L && r._6 <= n)
    }
    assert(out.exists(r => r._2 >= 2 && r._4 != 1000000L),
      "the seeded shuffles must actually differ somewhere")
  }

  // --- tokenizer drift de-degeneration (q389) ----------------------------

  test("q389: the bootstrap-vocab slice genuinely differentiates — at " +
    "least two change classes carry non-zero occurrence mass, " +
    "fewer_pieces saves tokens (negative delta), and the monotone " +
    "classes stay provably empty") {
    val out = SparkEntry.queries("q389_tokenizer_drift_boot")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).map(r => r._1 -> r).toMap
    assert(out.values.count(_._3 > 0) >= 2,
      "at least two classes must carry mass")
    assert(out("fewer_pieces")._3 > 0, "fewer_pieces must carry mass")
    assert(out("fewer_pieces")._4 < 0,
      "union retraining must save tokens")
    assert(out("more_pieces")._2 === 0L &&
      out("newly_unspannable")._2 === 0L,
      "count-monotone vocab: growing the corpus cannot lose pieces")
  }

  // --- the loop through the refreeze (q392/q393) --------------------------

  test("q392: the nightly continues through the refreeze — the gate " +
    "verdict is freeze-invariant, frozen contamination flags can " +
    "never be out-kept, pack addresses exist exactly for kept rows, " +
    "and the refreeze visibly changes the night") {
    val out = SparkEntry.queries("q392_refreeze_loop")(spark, sf)
      .collect()
    val day2 = Tables.documents(spark, sf)
      .filter(col("doc_id").cast("long") % 7 === 3).count()
    assert(out.length.toLong === day2, "one row per day-2 doc")
    assert(out.map(_.getLong(0)).distinct.length === out.length)
    out.foreach { r =>
      val (df, dg) = (r.getString(1), r.getString(2))
      assert(r.getBoolean(3) === (df != dg), "changed flag consistency")
      assert((df == "short") === (dg == "short"),
        s"gate must be freeze-invariant on ${r.getLong(0)}")
      assert(!(df == "contaminated" && dg == "kept") &&
        !(dg == "contaminated" && df == "kept"),
        s"contamination flags are frozen on ${r.getLong(0)}")
      assert((r.getLong(4) >= 0) === (df == "kept"),
        s"frozen pack address iff kept on ${r.getLong(0)}")
      assert((r.getLong(6) >= 0) === (dg == "kept"),
        s"refrozen pack address iff kept on ${r.getLong(0)}")
    }
    assert(out.exists(r => r.getBoolean(3) ||
      r.getLong(6) != r.getLong(4) || r.getLong(7) != r.getLong(5)),
      "the refreeze must change a disposition or a pack address")
  }

  test("q393: the repack bill reconciles with the q392 ledgers per " +
    "source, tok_delta is exactly the difference of the arms, and " +
    "sequence counts are bounded by kept docs") {
    val bill = SparkEntry.queries("q393_refreeze_repack")(spark, sf)
      .collect()
    val led = SparkEntry.queries("q392_refreeze_loop")(spark, sf)
      .collect()
    val srcOf = Tables.documents(spark, sf)
      .select(col("doc_id").cast("long"), col("source"))
      .as[(Long, String)].collect().toMap
    def keptBy(col: Int) = led.filter(_.getString(col) == "kept")
      .groupBy(r => srcOf(r.getLong(0)))
      .map { case (s, rs) => s -> rs.length.toLong }
    val (keptF, keptG) = (keptBy(1), keptBy(2))
    bill.foreach { r =>
      val s = r.getString(0)
      assert(r.getLong(1) === keptF.getOrElse(s, 0L),
        s"frozen kept-doc count on $s")
      assert(r.getLong(2) === keptG.getOrElse(s, 0L),
        s"refrozen kept-doc count on $s")
      assert(r.getLong(5) === r.getLong(4) - r.getLong(3),
        s"tok_delta consistency on $s")
      assert(r.getLong(6) <= r.getLong(1) && r.getLong(7) <= r.getLong(2),
        s"each kept doc lands in exactly one sequence on $s")
      assert((r.getLong(6) == 0L) === (r.getLong(1) == 0L))
    }
    assert(bill.exists(r => r.getLong(5) != 0L),
      "the refreeze must reprice at least one source")
  }

  // --- the nightly report's two arms (q396/q397) --------------------------

  test("q396/q397: the calm night stays frozen and the encoder-shift " +
    "night fires and retrains; text-side ledger metrics are " +
    "scale-invariant across the two; internal identities hold") {
    def report(q: String) = SparkEntry.queries(q)(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val calm = report("q396_nightly_report")
    val shift = report("q397_encoder_shift_night")
    assert(calm.keySet === shift.keySet && calm.size === 15)
    // decision arms
    assert(calm("trigger_fired") === 0L &&
      calm("members_reassigned") === 0L &&
      calm("members_evicted") === 0L,
      "the calm night must not retrain")
    assert(shift("trigger_fired") === 1L &&
      shift("members_reassigned") > 0L,
      "the encoder-shift night must fire and move members")
    // the text-only stages are scale-invariant; the semantic stage's
    // cosine VERDICT is too, but its cluster BLOCKING is not (2v can
    // sit nearest a different frozen centroid), so kept/pack/quota
    // metrics may legitimately drift between the nights
    Seq("offered", "gated_out", "exact_dup", "near_dup").foreach { m =>
      assert(calm(m) === shift(m), s"$m must be scale-invariant")
    }
    // internal identities
    Seq(calm, shift).foreach { r =>
      assert(Seq("gated_out", "exact_dup", "near_dup", "semantic_dup",
        "contaminated", "kept").map(r).sum === r("offered"),
        "dispositions partition the offer")
      assert(r("docs_admitted") + r("docs_backlogged") === r("kept"),
        "every kept doc is offered to the quota")
      assert(2L * r("tokens_admitted") <= r("tokens_packed"),
        "half-of-offer budgets bind")
      assert(r("seqs_touched") <= math.max(r("kept"), 1L))
    }
  }

  test("q398: the decided two-night loop — night 1 (encoder shift) " +
    "fires and retrains, night 2 carries no retrain rows (horizon " +
    "ends), and per-night identities hold") {
    val out = SparkEntry.queries("q398_nightly_loop")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out.size === 30, "two nights x 15 metrics")
    assert(out((1L, "trigger_fired")) === 1L,
      "the encoder-shift night must fire")
    assert(out((1L, "members_reassigned")) > 0L,
      "the retrain must move members")
    assert(out((2L, "members_reassigned")) === 0L &&
      out((2L, "members_evicted")) === 0L,
      "no retrain follows night 2")
    Seq(1L, 2L).foreach { n =>
      assert(Seq("gated_out", "exact_dup", "near_dup", "semantic_dup",
        "contaminated", "kept").map(m => out((n, m))).sum ===
        out((n, "offered")), s"night $n dispositions partition")
      assert(out((n, "docs_admitted")) + out((n, "docs_backlogged")) ===
        out((n, "kept")), s"night $n quota covers the kept docs")
      assert(2L * out((n, "tokens_admitted")) <=
        out((n, "tokens_packed")), s"night $n budgets bind")
    }
  }

  // --- the nightly restarted from disk (q395) -----------------------------

  test("persist + cold reload is transparent: every store artifact " +
    "survives the parquet round trip bit-for-bit, and the next delta " +
    "day off the cold store equals the in-memory one") {
    val (docRows, vecRows) = PipelineFixtures.cleanFamilyCorpus(1604)
    val docsDf = docRows.toDF("doc_id", "text", "source")
      .localCheckpoint()
    val quant = vecRows.map { case (i, q) => (i, q.toSeq) }
      .toDF("id", "q").localCheckpoint()
    val store0 = SparkEntry.buildPipelineStoreFrom(spark,
      docsDf.filter(col("doc_id") % 3 =!= 0), docsDf, quant)
    val day = SparkEntry.pipelineDeltaDay(store0,
      docsDf.filter(col("doc_id") % 3 === 0 &&
        col("doc_id") % 2 === 0))
    val store1 = SparkEntry.absorbPipelineDay(store0, day)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_store_rt_spec").toString
    SparkEntry.persistPipelineStore(store1, tmp)
    val cold = SparkEntry.loadPipelineStore(spark, tmp, quant)
    assertStoreEqual(cold, store1)
    assert(rows(cold.contamDrop) === rows(store1.contamDrop),
      "contamination flags survive the round trip")
    val nextDocs = docsDf.filter(col("doc_id") % 3 === 0 &&
      col("doc_id") % 2 === 1)
    assert(rows(SparkEntry.pipelineDeltaDay(cold, nextDocs).ledger) ===
      rows(SparkEntry.pipelineDeltaDay(store1, nextDocs).ledger),
      "the cold store's next night is bit-identical")
  }

  test("persistPipelineStore: numeric-looking sources survive the " +
    "partitioned round trip AS STRINGS (inference defeated), and an " +
    "empty source fails loudly instead of corrupting to null") {
    val (docRows, vecRows) = PipelineFixtures.cleanFamilyCorpus(1605)
    val docsDf = docRows.toDF("doc_id", "text", "source")
      .withColumn("source", (col("doc_id") % 2 + 7).cast("string"))
      .localCheckpoint()
    val quant = vecRows.map { case (i, q) => (i, q.toSeq) }
      .toDF("id", "q").localCheckpoint()
    val store = SparkEntry.buildPipelineStoreFrom(spark, docsDf,
      docsDf, quant)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_store_rt_num").toString
    SparkEntry.persistPipelineStore(store, tmp)
    val cold = SparkEntry.loadPipelineStore(spark, tmp, quant)
    assert(cold.docs.schema("source").dataType ===
      org.apache.spark.sql.types.StringType,
      "partition-column inference must not re-type source")
    assert(rows(cold.docs) === rows(store.docs))
    val bad = store.copy(docs = store.docs.limit(1)
      .withColumn("source", lit("")))
    val e = intercept[IllegalArgumentException] {
      SparkEntry.persistPipelineStore(bad, tmp + "_bad")
    }
    assert(e.getMessage.contains("null/empty source"))
  }

  // --- round-16 guard fixes ----------------------------------------------

  test("quotaAdmitPrefix rejects reserved output columns and the " +
    "segmented-continued pack rejects an over-bound segmentRows") {
    val bad = Seq(("A", 1L, 2L, 3L))
      .toDF("source", "doc_id", "n_tokens", "cum_before")
    val budgets = Seq(("A", 10L)).toDF("source", "budget")
    val e1 = intercept[IllegalArgumentException] {
      operators.Curation.quotaAdmitPrefix(bad, "doc_id", "n_tokens",
        "source", budgets)
    }
    assert(e1.getMessage.contains("cum_before"))
    val docs = Seq(("A", 1L, 2L)).toDF("source", "doc_id", "n_chars")
    val carry = Seq.empty[(String, Long, Long)]
      .toDF("source", "carry_seq", "carry_fill")
    val e2 = intercept[IllegalArgumentException] {
      operators.Curation.packSequencesSegmentedContinued(docs,
        "doc_id", "n_chars", "source", capacity = 10L,
        segmentRows = operators.Curation.MaxStratumRows + 1, carry)
    }
    assert(e2.getMessage.contains("MaxStratumRows"))
  }

  test("quotaAdmitPrefix: a budget at Long.MaxValue admits without " +
    "overflow (the ANSI-mode addition the old predicate would throw " +
    "on), and a doc above the budget is rejected without underflow") {
    val docs = Seq(("A", 1L, Long.MaxValue - 1), ("A", 2L, 1L),
      ("A", 4L, 1L), ("B", 3L, 10L))
      .toDF("source", "doc_id", "n_tokens")
    val budgets = Seq(("A", Long.MaxValue), ("B", 7L))
      .toDF("source", "budget")
    val out = operators.Curation.quotaAdmitPrefix(docs, "doc_id",
        "n_tokens", "source", budgets)
      .collect().map(r => r.getLong(1) -> r.getBoolean(4)).toMap
    assert(out(1L), "huge doc fits the huge budget")
    assert(out(2L), "cum_before + tok == Long.MaxValue exactly fits " +
      "(the old predicate's overflow point)")
    assert(!out(4L), "one past the budget is rejected, not thrown")
    assert(!out(3L), "a doc above its budget is rejected")
  }
}
