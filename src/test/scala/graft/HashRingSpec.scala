package graft

import org.apache.spark.sql.functions._
import graft.operators.HashRing

/** Consistent-hash ring ([[operators.HashRing]]): structural ring
  * invariants, the distributed assignment pinned against a local
  * successor-scan reference, and the property that makes the scheme
  * worth having — growing the ring only ever moves keys TO the new
  * shards. */
class HashRingSpec extends SparkSpec {
  import spark.implicits._

  test("ring: positions distinct, sorted, arcs sum to Mod exactly") {
    for ((s, v) <- Seq((16, 32), (20, 32), (4, 8))) {
      val r = HashRing.ring(s, v)
      assert(r.map(_._1).distinct.size === s * v)
      assert(r.map(_._1) === r.map(_._1).sorted)
      assert(r.forall(p => p._1 >= 0 && p._1 < HashRing.Mod))
      val a = HashRing.arcs(s, v)
      assert(a.size === s)
      assert(a.map(_._2).sum === s.toLong * v)
      assert(a.map(_._3).sum === HashRing.Mod)
    }
  }

  test("mix kills the label-fold clustering the raw fold has") {
    // raw folds of one-digit labels sit inside a few-thousand window;
    // mixed positions must span the ring (the round-13 bug this
    // construction exists to prevent).
    val folds = (0 until 10).flatMap(s => (0 until 8)
      .map(v => HashRing.labelFold(s"shard:$s:$v")))
    assert(folds.max - folds.min < 10000L) // the raw fold DOES cluster
    val mixed = folds.map(HashRing.mix).sorted
    assert(mixed.max - mixed.min > HashRing.Mod / 2) // the mix does not
  }

  test("assign matches a local successor-scan reference") {
    val r = HashRing.ring(16, 32)
    def local(key: Long): Long = {
      val p = ((key % HashRing.Mod) * 2654435761L + 40503L) % HashRing.Mod
      r.find(_._1 >= p).getOrElse(r.head)._2
    }
    val keys = ((0L to 400L) ++ Seq(1000000006L, 999999999999L,
      HashRing.Mod, HashRing.Mod * 3 + 17)).toDF("k")
    val got = HashRing.assign(keys, "k", 16, 32)
      .select("k", "shard").as[(Long, Long)].collect().toMap
    for ((k, s) <- got) assert(s === local(k), s"key $k")
  }

  test("growing 16 -> 20 shards moves keys ONLY to the new shards") {
    val keys = (0L until 2000L).toDF("k")
    val before = HashRing.assign(keys, "k", 16, 32, "shard_before")
      .drop("ring_pos")
    val both = HashRing.assign(before, "k", 20, 32, "shard_after")
    val moved = both.filter(col("shard_before") =!= col("shard_after"))
    assert(moved.count() > 0) // something moves…
    assert(moved.filter(col("shard_after") < 16).count() === 0) // …only outward
    // and survivors' assignments are untouched by construction of the
    // shared labels: every key on an old shard after = same shard before
    assert(both.filter(col("shard_after") < 16 &&
      col("shard_before") =!= col("shard_after")).count() === 0)
  }

  test("loadAudit: 16 rows, keys conserved, arc shares sum to ~1e6") {
    val keys = (0L until 1000L).toDF("doc_id")
    val audit = HashRing.loadAudit(spark, keys, "doc_id", 16, 32)
      .collect()
    assert(audit.length === 16)
    assert(audit.map(_.getAs[Long]("n_keys")).sum === 1000L)
    val arcPpm = audit.map(_.getAs[Long]("arc_ppm")).sum
    assert(arcPpm > 999950L && arcPpm <= 1000000L) // floor rounding only
  }

  test("native RingShard assignment == the declarative HOF " +
    "construction on mixed keys") {
    val keys = ((0L to 500L) ++ Seq(HashRing.Mod - 1, HashRing.Mod,
      999999999999L)).toDF("k")
    for ((s, v) <- Seq((16, 32), (5, 8))) {
      val nat = HashRing.assign(keys, "k", s, v)
        .select("k", "shard").collect().map(r =>
          (r.getLong(0), r.getLong(1))).toMap
      val dec = HashRing.assignDeclarative(keys, "k", s, v)
        .select("k", "shard").collect().map(r =>
          (r.getLong(0), r.getLong(1))).toMap
      assert(nat === dec, s"geometry ($s, $v)")
    }
  }

  test("plan shape: assign is map-only — ring embedded as literals, " +
    "zero exchanges, zero joins") {
    val keys = (0L until 100L).toDF("k")
    val p = HashRing.assign(keys, "k", 16, 32)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"assignment must not shuffle:\n$p")
    assert(!p.contains("Join"), s"assignment must not join:\n$p")
  }

  test("property: assignment matches the local successor scan and " +
    "growth moves keys only outward, for random geometries") {
    // scalacheck through its own runner (the PropertiesSpec pattern)
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val geom = for {
      s1 <- Gen.choose(2, 24)
      grow <- Gen.choose(1, 8)
      v <- Gen.oneOf(4, 8, 16, 32)
      keys <- Gen.listOfN(60,
        Gen.choose(0L, 4L * HashRing.Mod)).map(_.distinct)
    } yield (s1, s1 + grow, v, keys)
    val prop = Prop.forAll(geom) { case (s1, s2, v, keyList) =>
      val r1 = HashRing.ring(s1, v)
      val r2 = HashRing.ring(s2, v)
      def local(r: Seq[(Long, Long)], key: Long): Long = {
        val p = ((key % HashRing.Mod) * 2654435761L + 40503L) %
          HashRing.Mod
        r.find(_._1 >= p).getOrElse(r.head)._2
      }
      val df = keyList.toDF("k")
      val got = HashRing.assign(df, "k", s1, v, "b")
        .drop("ring_pos")
      val both = HashRing.assign(got, "k", s2, v, "a")
        .select("k", "b", "a").collect()
      both.forall { row =>
        val (k, b, a) = (row.getLong(0), row.getLong(1), row.getLong(2))
        b == local(r1, k) && a == local(r2, k) &&
          (b == a || a >= s1) // moved ⇒ to a NEW shard only
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, s"ring property: ${res.status}")
  }

  test("weighted ring: vnode counts match capacities, arcs sum to " +
    "Mod, and growing ONE shard's capacity only pulls keys toward it") {
    val caps = Seq(8, 4, 2, 2)
    val r = HashRing.ringWeighted(caps)
    assert(r.size === caps.sum)
    val keys = (0L until 800L).toDF("doc_id")
    val audit = HashRing.loadAuditWeighted(spark, keys, "doc_id", caps)
      .collect()
    assert(audit.map(_.getAs[Long]("n_vnodes")).toSeq ===
      caps.map(_.toLong))
    assert(audit.map(_.getAs[Long]("n_keys")).sum === 800L)
    val arcPpm = audit.map(_.getAs[Long]("arc_ppm")).sum
    assert(arcPpm > 999950L && arcPpm <= 1000000L)
    // grow shard 2 (2 -> 6 vnodes): its labels are a superset, every
    // other shard's vnodes are unchanged, so arcs only move TO it
    val before = HashRing.assignWeighted(keys, "doc_id", caps, "b")
      .drop("ring_pos")
    val both = HashRing.assignWeighted(before, "doc_id",
      Seq(8, 4, 6, 2), "a")
    assert(both.filter(col("b") =!= col("a")).count() > 0)
    assert(both.filter(col("b") =!= col("a") && col("a") =!= 2)
      .count() === 0)
  }

  test("reshardPlan: conserves the audit's moved count and only " +
    "targets new shards") {
    val keys = (0L until 1500L).toDF("doc_id")
    val plan = HashRing.reshardPlan(keys, "doc_id", 16, 20, 32)
      .collect()
    val audit = HashRing.reshardAudit(keys, "doc_id", 16, 20, 32)
      .collect().head
    assert(plan.map(_.getAs[Long]("n_keys")).sum ===
      audit.getAs[Long]("ring_moved"))
    assert(plan.forall(_.getAs[Long]("shard_after") >= 16L))
    assert(plan.forall(_.getAs[Long]("shard_before") < 16L))
  }

  test("replicated assignment: replica sets are DISTINCT shards in " +
    "walk order, element 0 is exactly the primary, and the native " +
    "walk matches a local reference") {
    val r = HashRing.ring(16, 32)
    def localReps(key: Long, n: Int): Seq[Long] = {
      val p = ((key % HashRing.Mod) * 2654435761L + 40503L) %
        HashRing.Mod
      val start = r.indexWhere(_._1 >= p) match {
        case -1 => 0; case i => i }
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var i = start
      while (out.size < n) {
        val s = r(i)._2
        if (!out.contains(s)) out += s
        i = (i + 1) % r.size
      }
      out.toSeq
    }
    val keys = ((0L to 400L) ++ Seq(1000000006L, 999999999999L,
      HashRing.Mod, HashRing.Mod * 3 + 17)).toDF("k")
    val got = HashRing.assignReplicated(keys, "k", 16, 32, replicas = 3)
      .select("k", "replica_set").as[(Long, Seq[Long])].collect()
    val primary = HashRing.assign(keys, "k", 16, 32)
      .select("k", "shard").as[(Long, Long)].collect().toMap
    got.foreach { case (k, reps) =>
      assert(reps.size === 3 && reps.distinct.size === 3, s"key $k")
      assert(reps === localReps(k, 3), s"key $k")
      assert(reps.head === primary(k), s"key $k primary")
    }
  }

  test("replicationAudit: responsibility conserved at R × corpus, " +
    "primary column equals loadAudit's key counts, 16 rows") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val audit = HashRing.replicationAudit(spark, docs, "doc_id",
      16, 32, replicas = 3).collect()
    assert(audit.length === 16)
    val n = docs.count()
    assert(audit.map(_.getAs[Long]("n_primary")).sum === n)
    assert(audit.map(_.getAs[Long]("n_responsible")).sum === 3 * n)
    val load = HashRing.loadAudit(spark, docs, "doc_id", 16, 32)
      .select("shard", "n_keys").as[(Long, Long)].collect().toMap
    audit.foreach { r =>
      assert(r.getAs[Long]("n_primary") ===
        load(r.getAs[Long]("shard")), s"shard ${r.get(0)}")
    }
  }

  test("property: ringWeighted is total for random capacity vectors " +
    "(distinct sorted positions, capacity-exact vnode counts) and " +
    "BIT-UNCHANGED from the unsalted construction when no label " +
    "collides") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val caps = Gen.nonEmptyListOf(Gen.choose(1, 40)).map(_.take(32))
    val prop = Prop.forAll(caps) { cs =>
      val r = HashRing.ringWeighted(cs)
      val naive = (for {
        (c, s) <- cs.zipWithIndex
        v <- 0 until c
      } yield (HashRing.labelPos(s"shard:$s:$v"), s.toLong)).sortBy(_._1)
      r.size == cs.sum &&
        r.map(_._1).distinct.size == r.size &&
        r.map(_._1) == r.map(_._1).sorted &&
        ((naive.map(_._1).distinct.size != naive.size) || r == naive)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, s"weighted-ring property: ${res.status}")
  }

  test("salt-retry: under an injected tiny position space the " +
    "unsalted labels DO collide and the retry walk still yields a " +
    "total, distinct, deterministic ring; exhaustion fails loudly") {
    // 97 slots, 60 vnodes: birthday collisions guaranteed in practice
    val posOf = (l: String) => HashRing.labelFold(l) % 97L
    val caps = Seq(20, 25, 15)
    val naive = (for {
      (c, s) <- caps.zipWithIndex; v <- 0 until c
    } yield posOf(s"shard:$s:$v")).toSeq
    assert(naive.distinct.size < naive.size,
      "fixture must actually exercise the retry path")
    val r = HashRing.ringWeightedWith(caps, posOf)
    assert(r.size === caps.sum)
    assert(r.map(_._1).distinct.size === r.size)
    assert(r.map(_._1) === r.map(_._1).sorted)
    // per-shard vnode counts survive the retries exactly
    assert(r.groupBy(_._2).view.mapValues(_.size).toMap ===
      caps.zipWithIndex.map { case (c, s) => s.toLong -> c }.toMap)
    assert(r === HashRing.ringWeightedWith(caps, posOf), "deterministic")
    // more vnodes than positions: the 4096-retry bound trips loudly
    val ex = intercept[IllegalArgumentException] {
      HashRing.ringWeightedWith(Seq(98), posOf)
    }
    assert(ex.getMessage.contains("position space exhausted"))
  }

  test("replicatedReshardAudit: primary_moved equals reshardAudit's " +
    "ring_moved, copies bounded by [new-primary count, R x keys], " +
    "and every moved copy targets a shard in the after ring") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val rep = HashRing.replicatedReshardAudit(docs, "doc_id",
      16, 20, 32, replicas = 3).collect().head
    val base = HashRing.reshardAudit(docs, "doc_id", 16, 20, 32)
      .collect().head
    assert(rep.getAs[Long]("n_keys") === base.getAs[Long]("n_keys"))
    assert(rep.getAs[Long]("primary_moved") ===
      base.getAs[Long]("ring_moved"))
    val copies = rep.getAs[Long]("copies_moved")
    assert(copies >= 0L && copies <= 3 * rep.getAs[Long]("n_keys"))
    // a key whose primary moved to a NEW shard necessarily moves >= 1
    // copy, so copies >= the new-primary subset of primary moves; at
    // this geometry every moved primary IS a new shard (q358 contract)
    assert(copies >= rep.getAs[Long]("primary_moved"))
  }

  test("reshardAudit: ring beats mod-N on the documents fixture") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val row = HashRing.reshardAudit(docs, "doc_id", 16, 20, 32)
      .collect().head
    val ringPpm = row.getAs[Long]("ring_moved_ppm")
    val modPpm = row.getAs[Long]("mod_moved_ppm")
    assert(ringPpm < modPpm / 2, s"ring $ringPpm vs mod $modPpm")
  }
}
