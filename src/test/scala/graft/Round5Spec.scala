package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.{JaroWinklerAlgo, JaroWinklerFunctions}
import graft.operators.{Cdc, Compaction, IncrementalAgg, InvertedIndex, RangeJoin, ShortestPaths, Skyline, Stats, Temporal, TextAnalysis}

/** Round-5 operators: Jaro-Winkler native expression, BFS shortest
  * paths, date-spine gap fill, trailing RANGE-frame average, Simpson
  * diversity, per-group top n-grams. */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerAlgo.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  // --- Jaro-Winkler kernel ----------------------------------------------
  test("jaro_winkler matches the pinned DuckDB/rapidfuzz semantics") {
    // classic textbook pair: jaro = (1 + 1 + 5/6)/3, prefix 3
    val jMartha = (1.0 + 1.0 + 5.0 / 6.0) / 3.0
    assert(jw("martha", "marhta") == jMartha + 3 * 0.1 * (1.0 - jMartha))
    // empty input is 0 EVEN when both sides are empty (DuckDB behavior)
    assert(jw("", "") == 0.0)
    assert(jw("a", "") == 0.0)
    assert(jw("same", "same") == 1.0)
    // below the 0.7 threshold the prefix boost must NOT apply
    val noBoost = (1.0 / 2 + 1.0 / 4 + 1.0) / 3.0 // m=1 of l1=2, l2=4
    assert(jw("ax", "aykz") == noBoost)
    // transpositions are HALF counts: abcd vs abdc has m=4, t=1
    val jT = (1.0 + 1.0 + 3.0 / 4.0) / 3.0
    assert(jw("abcd", "abdc") == jT + 2 * 0.1 * (1.0 - jT))
  }

  test("jaro_winkler codegen path agrees with the direct kernel") {
    val pairs = Seq(("martha", "marhta"), ("duane", "dwayne"),
      ("", ""), ("ax", "aykz"), ("kush", "kash"), ("og kush", "og kusha"))
      .toDF("a", "b")
    val got = pairs
      .withColumn("jw", JaroWinklerFunctions.jaroWinkler($"a", $"b"))
      .as[(String, String, Double)].collect()
    got.foreach { case (a, b, v) =>
      assert(java.lang.Double.doubleToLongBits(v)
        == java.lang.Double.doubleToLongBits(jw(a, b)), s"($a, $b)")
    }
  }

  test("jaro_winkler algebraic properties on random byte strings") {
    // pure-JVM kernel — exhaustive-ish randomized check, no Spark job
    val rnd = new scala.util.Random(42)
    def rs() = (0 until rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    (1 to 2000).foreach { _ =>
      val (a, b) = (rs(), rs())
      val v = jw(a, b)
      assert(v >= 0.0 && v <= 1.0, s"range: ($a, $b) -> $v")
      assert(v == jw(b, a), s"symmetry: ($a, $b)") // JW is symmetric
      if (a.nonEmpty && a == b) assert(v == 1.0)
      if (a.isEmpty || b.isEmpty) assert(v == 0.0)
    }
  }

  // --- BFS shortest paths ------------------------------------------------
  test("bfs returns first-reach hop counts; unreachable nodes absent") {
    // chain 0→1→2→3 plus a shortcut 0→2 and an unreachable island 7→8
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 2L), (7L, 8L))
      .toDF("src", "dst")
    val got = ShortestPaths.bfs(edges, source = 0L)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(0L -> 0, 1L -> 1, 2L -> 1, 3L -> 2))
  }

  test("bfs handles cycles without looping") {
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 2L)).toDF("src", "dst")
    val got = ShortestPaths.bfs(edges, source = 0L)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(0L -> 0, 1L -> 1, 2L -> 2))
  }

  // --- month spine gap fill ---------------------------------------------
  test("monthSpine zero-fills silent months per key") {
    val df = Seq(
      (1L, "2024-01-15 00:00:00", 10.0),
      (1L, "2024-03-02 00:00:00", 20.0),
      (2L, "2024-02-01 00:00:00", 5.0))
      .toDF("k", "ts", "v")
      .withColumn("ts", $"ts".cast("timestamp"))
    val got = Temporal.monthSpine(df, "k", "ts",
      scala.collection.immutable.ListMap(
        "n" -> count(lit(1)),
        "rev" -> sum($"v".cast("decimal(18,2)")).cast("double")))
      .select($"k", date_format($"month", "yyyy-MM").as("m"), $"n", $"rev")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(got == Set(
      (1L, "2024-01", 1L, 10.0),
      (1L, "2024-02", 0L, 0.0), // the gap month, zero-filled
      (1L, "2024-03", 1L, 20.0),
      (2L, "2024-02", 1L, 5.0)))
  }

  // --- trailing RANGE-frame average -------------------------------------
  test("trailingAvg frame is inclusive of the window boundary") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000)
    val df = Seq(
      (1L, 100L, at(0), 10.0),
      (2L, 100L, at(50), 30.0),   // 50 s after e1: inside a 60 s window
      (3L, 100L, at(110), 50.0),  // exactly 60 s after e2: still inside
      (4L, 100L, at(171), 70.0),  // 61 s after e3: e3 only
      (5L, 200L, at(0), 99.0))    // other key, own frame
      .toDF("event_id", "user_id", "ts", "value")
    val byId = Temporal.trailingAvg(df, "user_id", "ts", "value", windowSec = 60)
      .select("event_id", "win_n", "win_avg")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(1L) == ((1L, 10.0)))
    assert(byId(2L) == ((2L, 20.0)))
    assert(byId(3L) == ((2L, 40.0))) // e2+e3; e1 is 110 s back, outside
    assert(byId(4L) == ((1L, 70.0)))
    assert(byId(5L) == ((1L, 99.0)))
  }

  // --- Simpson diversity -------------------------------------------------
  test("lexicalDiversity is the exact integer collision ratio") {
    val docs = Seq((1L, "a a b"), (2L, "x y z"), (3L, "w w w w"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.lexicalDiversity(docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "n_distinct", "sum_sq", "collision_prob")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((3L, 2L, 5L, 5.0 / 9.0)))
    assert(got(2L) == ((3L, 3L, 3L, 3.0 / 9.0)))
    assert(got(3L) == ((4L, 1L, 16L, 1.0)))
  }

  // --- snapshot diff -----------------------------------------------------
  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val a = Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, "z", 30.0))
      .toDF("k", "name", "bal")
    val b = Seq((1L, "x", 10.0), (2L, "y", 25.0), (4L, "w", 40.0))
      .toDF("k", "name", "bal")
    val got = Cdc.snapshotDiff(a, b, "k", Seq("name", "bal"))
      .select("k", "change_type").as[(Long, String)].collect().toSet
    assert(got == Set((2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("snapshotDiff column compare is null-safe") {
    val a = Seq((1L, Option.empty[String]), (2L, Some("v")))
      .toDF("k", "name")
    val b = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "name")
    val got = Cdc.snapshotDiff(a, b, "k", Seq("name"))
      .select("k", "change_type").as[(Long, String)].collect().toSet
    // key 1: null == null under <=> → unchanged, dropped
    assert(got == Set((2L, "changed")))
  }

  // --- MAD outliers ------------------------------------------------------
  test("madOutliers uses exact lower medians and flags beyond k*MAD") {
    // group g: values 1,2,3,4,100 → lower median 3, devs 2,1,0,1,97,
    // MAD = lower median of (0,1,1,2,97) = 1 → outlier iff dev > 3
    val df = Seq(("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 3.0),
      ("g", 4L, 4.0), ("g", 5L, 100.0))
      .toDF("grp", "id", "v")
    val got = Stats.madOutliers(df, "grp", "id", "v")
      .select("id", "med", "mad", "is_outlier")
      .as[(Long, Double, Double, Int)].collect()
      .map(r => r._1 -> r).toMap
    got.values.foreach { case (_, med, mad, _) =>
      assert(med == 3.0 && mad == 1.0)
    }
    assert(got(5L)._4 == 1)            // dev 97 > 3·1
    assert(got.filter(_._1 != 5L).values.forall(_._4 == 0))
    // the single extreme value did NOT move the center or the scale —
    // the property the z-score lacks
  }

  // --- phrase search -----------------------------------------------------
  test("phraseHits counts token-adjacent occurrences only") {
    val docs = Seq(
      (1L, "the cat sat on the cat sat"),   // "the cat sat" twice
      (2L, "the dog cat sat"),              // terms present, not adjacent
      (3L, "cat the sat"))                  // wrong order
      .toDF("doc_id", "text")
    val got = InvertedIndex.phraseHits(docs, "doc_id", "text", "the cat sat")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L))
  }

  test("phraseHits overlapping occurrences each count") {
    val docs = Seq((1L, "a a a a")).toDF("doc_id", "text")
    val got = InvertedIndex.phraseHits(docs, "doc_id", "text", "a a")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L))
  }

  // --- interval overlap join --------------------------------------------
  test("intervalOverlapPairs matches the quadratic overlap join exactly") {
    // intervals spanning multiple buckets, touching endpoints, disjoint
    val iv = Seq((1L, 0L, 150L), (2L, 150L, 200L), (3L, 201L, 300L),
      (4L, 90L, 1000L), (5L, 2000L, 2100L))
    val a = iv.toDF("a_id", "a_lo", "a_hi")
    val b = iv.map { case (i, l, h) => (i, l, h) }.toDF("b_id", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlapPairs(a, b,
        "a_lo", "a_hi", "b_lo", "b_hi", bucketWidth = 100L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val naive = (for {
      (i, l1, h1) <- iv; (j, l2, h2) <- iv
      if l1 <= h2 && l2 <= h1
    } yield (i, j)).toSet
    assert(got == naive) // incl. the 150-touches-150 inclusive boundary
    assert(got.contains((1L, 2L)) && !got.contains((2L, 3L)))
  }

  // --- skyline -----------------------------------------------------------
  test("frontier2d equals the quadratic domination filter") {
    val rows = Seq( // (id, price, size)
      (1L, 10.0, 5), (2L, 10.0, 7), (3L, 12.0, 7), (4L, 12.0, 9),
      (5L, 15.0, 9), (6L, 15.0, 12), (7L, 8.0, 3), (8L, 10.0, 7))
    val df = rows.toDF("id", "price", "size")
    val got = Skyline.frontier2d(df, "price", "size")
      .select("id").as[Long].collect().toSet
    val naive = rows.filter { case (_, p, s) =>
      !rows.exists { case (_, p2, s2) =>
        p2 <= p && s2 >= s && (p2 < p || s2 > s) }
    }.map(_._1).toSet
    assert(got == naive)
    // ties on both dims both survive (2 and 8); dominated same-price (1) out
    assert(got.contains(2L) && got.contains(8L) && !got.contains(1L))
  }

  // --- incremental aggregate merge --------------------------------------
  test("IncrementalAgg.merge handles disjoint, overlapping and zero keys") {
    val base = Seq(("a", 2L, BigDecimal("10.50")), ("b", 1L, BigDecimal("5.00")))
      .toDF("k", "n", "rev")
    val delta = Seq(("b", 3L, BigDecimal("1.25")), ("c", 1L, BigDecimal("7.00")))
      .toDF("k", "n", "rev")
    val got = IncrementalAgg.merge(base, delta, Seq("k"), Seq("n", "rev"))
      .select($"k", $"n", $"rev".cast("string"))
      .as[(String, Long, String)].collect().toSet
    assert(got.map(r => (r._1, r._2)) == Set(("a", 2L), ("b", 4L), ("c", 1L)))
    val revs = got.map(r => r._1 -> BigDecimal(r._3)).toMap
    assert(revs("a") == BigDecimal("10.50"))
    assert(revs("b") == BigDecimal("6.25"))
    assert(revs("c") == BigDecimal("7.00"))
  }

  test("incremental merge of decimal aggregates equals direct aggregation") {
    val rows = (1 to 100).map(i => (i % 7L, BigDecimal(i) / 4))
    val df = rows.toDF("k", "v")
    def agg(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("k").agg(count(lit(1)).as("n"),
        sum($"v".cast("decimal(18,2)")).as("s"))
    val merged = IncrementalAgg.merge(
      agg(df.filter($"k" =!= 3L)), agg(df.filter($"k" === 3L)),
      Seq("k"), Seq("n", "s"))
      .select($"k", $"n", $"s".cast("double"))
      .as[(Long, Long, Double)].collect().toSet
    val direct = agg(df).select($"k", $"n", $"s".cast("double"))
      .as[(Long, Long, Double)].collect().toSet
    assert(merged == direct)
  }

  // --- anti-entropy reconciliation --------------------------------------
  test("antiEntropy repair plan equals the full snapshot diff") {
    val a = (1L to 200L).map(k => (k, k * 1.25)).toDF("k", "v")
    val b = a.filter($"k" % 13 =!= 0)
      .withColumn("v", when($"k" % 7 === 0, $"v" + 1).otherwise($"v"))
      .unionByName(a.filter($"k" % 11 === 0).withColumn("k", $"k" + 1000))
    val plan = graft.operators.AntiEntropy.repairPlan(a, b, "k", "v", 8)
      .select("k", "change_type").as[(Long, String)].collect().toSet
    val full = Cdc.snapshotDiff(a, b, "k", Seq("v"))
      .select("k", "change_type").as[(Long, String)].collect().toSet
    assert(plan == full && plan.nonEmpty)
  }

  test("antiEntropy fingerprints localize damage to its bucket") {
    val a = (1L to 160L).map(k => (k, 1.0)).toDF("k", "v")
    val b = a.withColumn("v", when($"k" === 40, 2.0).otherwise($"v"))
    val fa = graft.operators.AntiEntropy.bucketFingerprints(a, "k", "v", 8)
    val fb = graft.operators.AntiEntropy.bucketFingerprints(b, "k", "v", 8)
    val damaged = fa.join(fb, Seq("bucket"))
      .filter(!(fa("fp") <=> fb("fp")) || !(fa("n_rows") <=> fb("n_rows")))
      .select("bucket").as[Long].collect().toSeq
    assert(damaged == Seq(40L % 8)) // exactly one bucket flagged
  }

  // --- BPE merge learning -----------------------------------------------
  test("BPE merges follow the hand-computed schedule on a fixture") {
    // corpus: "aaab" x3, "ab" x2
    // r1: (a,a) appears 2x3=6 > (a,b) 3+2=5      -> merge (a,a), n=6
    //     "aaab" -> [aa,a,b]; "ab" -> [a,b]
    // r2: (aa,a) 3, (a,b) 3+2=5                  -> merge (a,b), n=5
    //     "aaab" -> [aa,ab]; "ab" -> [ab]
    // r3: (aa,ab) 3                              -> merge (aa,ab), n=3
    val docs = Seq((1L, "aaab aaab ab"), (2L, "aaab ab"))
      .toDF("doc_id", "text")
    val got = graft.operators.BpeMerges.learn(docs, "doc_id", "text", k = 5)
      .select("rank", "left", "right", "n")
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1, "a", "a", 6L), (2, "a", "b", 5L), (3, "aa", "ab", 3L)))
    // after r3 every word is a single symbol: no pairs remain, so the
    // learner stops early instead of padding to k
  }

  test("applyMerge is left-to-right non-overlapping") {
    import graft.operators.BpeMerges.applyMerge
    assert(applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(applyMerge(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(applyMerge(Seq("x"), "a", "a") == Seq("x"))
    assert(applyMerge(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
  }

  // --- parquet schema evolution -----------------------------------------
  test("mergeSchema reads evolving parquet batches as one table") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    // batch 1 writes (id, a); batch 2 adds column b later
    spark.range(0, 3).selectExpr("id", "id * 2 AS a")
      .write.mode("append").parquet(tmp)
    spark.range(3, 5).selectExpr("id", "id * 2 AS a", "id * 10 AS b")
      .write.mode("append").parquet(tmp)
    val merged = spark.read.option("mergeSchema", "true").parquet(tmp)
    assert(merged.columns.sorted.toSeq == Seq("a", "b", "id"))
    val rows = merged.select("id", "b").as[(Long, Option[Long])]
      .collect().toMap
    assert(rows(1L).isEmpty && rows(4L).contains(40L)) // old rows null-fill
  }

  // --- plan shapes of the new join paths --------------------------------
  test("interval-overlap and anti-entropy paths plan as equi-joins") {
    Seq("q119_concurrent_sessions", "q126_anti_entropy").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name plans a nested-loop join")
    }
  }

  // --- BPE encode --------------------------------------------------------
  test("BPE encode compresses: tokens strictly below chars, above words") {
    val docs = Seq((1L, "aaab aaab ab"), (2L, "aaab ab")).toDF("doc_id", "text")
    val got = graft.operators.BpeMerges
      .encodedTokenCounts(docs, "doc_id", "text", k = 3)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // after merges (a,a),(a,b),(aa,ab): "aaab" -> 1 token, "ab" -> 1
    assert(got(1L) == ((10L, 3L))) // 10 chars, 3 words -> 3 tokens
    assert(got(2L) == ((6L, 2L)))
  }

  // --- portable MinHash vs exact ground truth ---------------------------
  test("portable MinHash pairs are exact-verified and recall the truth set") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val got = graft.operators.MinHashLSH
      .nearDuplicatesPortable(docs, "doc_id", "text")
      .select("a", "b").as[(Long, Long)].collect().toSet
    // exact ground truth: all-pairs trigram-set Jaccard >= 0.5 (corpus
    // is tiny at this SF, the quadratic check is the point)
    val sets = docs.as[(Long, String)].collect().map { case (id, t) =>
      val ws = t.toLowerCase.split(" ", -1)
      id -> ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    val exact = (for {
      (i, si) <- sets; (j, sj) <- sets if i < j
      inter = (si & sj).size
      if 2 * inter >= (si.size + sj.size - inter)
    } yield (i, j)).toSet
    assert(got.subsetOf(exact)) // precision 1.0: verify step is exact
    assert(exact.isEmpty || got.size * 10 >= exact.size * 8,
      s"recall ${got.size}/${exact.size}") // 2×4 banding recall ≥ 0.8 here
  }

  // --- scalable ntile ----------------------------------------------------
  test("scalableNtile is bit-identical to the window ntile") {
    import org.apache.spark.sql.expressions.Window
    // n = 10, k = 4: uneven buckets (3,3,2,2) — the closed form must
    // reproduce ntile's first-r-buckets-get-one-extra rule; ties in v
    // broken by id in both forms
    val df = Seq(5, 3, 3, 8, 1, 9, 7, 3, 2, 6).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val viaWindow = df.withColumn("nt",
      ntile(4).over(Window.orderBy($"v".asc, $"id".asc)))
      .select("id", "nt").as[(Long, Int)].collect().toMap
    val viaScalable = graft.operators.Curation
      .scalableNtile(df, Seq("v", "id"), 4, "nt")
      .select("id", "nt").as[(Long, Int)].collect().toMap
    assert(viaScalable == viaWindow)
    // also k > n: every row its own bucket prefix
    val tiny = Seq((1L, 10), (2L, 20)).toDF("id", "v")
    val sc = graft.operators.Curation
      .scalableNtile(tiny, Seq("v", "id"), 4, "nt")
      .select("id", "nt").as[(Long, Int)].collect().toMap
    assert(sc == Map(1L -> 1, 2L -> 2))
  }

  // --- DSv2 sink ---------------------------------------------------------
  test("DSv2 sink two-phase commit: atomic flip, lossless round-trip") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val df = spark.range(0, 200)
      .selectExpr("id AS k", "concat('v \"x\"\n', id) AS v")
    df.repartition(4).write
      .format("graft.sources.v2.RecordApiSink")
      .option("path", tmp).mode("append").save()
    val files = new java.io.File(tmp).listFiles.map(_.getName).toSet
    assert(files.contains("_SUCCESS"))
    assert(!files.exists(_.startsWith("_tmp")), s"uncommitted temps: $files")
    assert(files.count(_.endsWith(".jsonl")) == 4) // one per partition
    val back = spark.read
      .schema("k LONG, v STRING")
      .option("pathGlobFilter", "*.jsonl").json(tmp)
      .as[(Long, String)].collect().toSet
    val orig = df.as[(Long, String)].collect().toSet
    assert(back == orig) // JSON escaping (quotes, newline) lossless
  }

  // --- small-file compaction --------------------------------------------
  test("compact rewrites a fragmented table into fewer files, rows intact") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val frag = s"$tmp/frag"; val out = s"$tmp/out"
    val df = spark.range(0, 10000).selectExpr("id", "id % 7 AS k")
    df.repartition(64).write.parquet(frag) // 64 tiny files
    val nFiles = (d: String) => new java.io.File(d)
      .listFiles.count(_.getName.endsWith(".parquet"))
    assert(nFiles(frag) == 64)
    val target = Compaction.tableBytes(spark, frag) / 4 // aim for ~4 files
    val n = Compaction.compact(spark, frag, out, target)
    assert(n <= 5 && nFiles(out) == n)
    val a = spark.read.parquet(frag).orderBy("id").collect().toSeq
    val b = spark.read.parquet(out).orderBy("id").collect().toSeq
    assert(a == b)
  }

  // --- per-group top n-grams --------------------------------------------
  test("topNgramsPerGroup counts within group and breaks ties lexically") {
    val docs = Seq(
      ("en", "the cat sat the cat sat"), // "the cat sat" ×2, others ×1
      ("en", "a b c"),
      ("de", "x y"))                      // too short for a trigram
      .toDF("lang", "text")
    val got = TextAnalysis.topNgramsPerGroup(docs, "lang", "text", n = 3, k = 2)
      .select("lang", "gram", "cnt", "rank")
      .as[(String, String, Long, Int)].collect().toSet
    assert(got.exists(r => r == (("en", "the cat sat", 2L, 1))))
    // rank-2 tie between "a b c", "cat sat the", "sat the cat" → lexical
    assert(got.exists(r => r == (("en", "a b c", 1L, 2))))
    assert(!got.exists(_._1 == "de"))
  }
}
