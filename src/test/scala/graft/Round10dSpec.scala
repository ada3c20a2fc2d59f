package graft

import org.apache.spark.sql.functions._

/** Round-10 session-4 specs, part 2: FD audit, Holt smoothing,
  * truss peeling profile. */
class Round10dSpec extends SparkSpec {
  import spark.implicits._

  // --- approximate-FD audit ---------------------------------------------------

  test("fdAudit: exact FD reports zero everywhere, violations count " +
      "groups/excess/g3 per the TANE definitions") {
    val df = Seq(
      // x=1 → {a}, x=2 → {a,b,b}, x=3 → {a,b,c}
      (1L, "a"), (1L, "a"),
      (2L, "a"), (2L, "b"), (2L, "b"),
      (3L, "a"), (3L, "b"), (3L, "c")).toDF("x", "y")
    val exact = Seq((1L, "k1"), (2L, "k2")).toDF("x", "y")
    val got = operators.Profiling.fdAudit(Seq(
        ("dirty", df, "x", "y"), ("clean", exact, "x", "y")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    // dirty: 8 rows, 3 groups, 2 violating, excess (0+1+2)=3,
    // g3 = (2-2)+(3-2)+(3-1)=3, ppm = 375000
    assert(got("dirty") == ((8L, 3L, 2L, 3L, 3L, 375000L)))
    assert(got("clean") == ((2L, 2L, 0L, 0L, 0L, 0L)))
  }

  // --- Holt double exponential smoothing ---------------------------------------

  test("holtTrend: recursion matches a hand fold, ramp has positive " +
      "trend, constant series has zero trend and exact level") {
    val ramp = (1 to 12).map(t => ("r", t.toLong, (10 * t).toLong))
    val const = (1 to 12).map(t => ("c", t.toLong, 7L))
    val df = (ramp ++ const).toDF("g", "t", "y")
    val got = operators.Temporal.holtTrend(df, "g", "t", "y")
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // hand fold (same truncation-toward-zero ÷4)
    def fold(ys: Seq[Long]): (Long, Long) = {
      var s = 1000L * ys.head; var b = 0L
      ys.tail.foreach { y =>
        val sN = (1000L * y + 3L * (s + b)) / 4L // positive here
        val bN0 = (sN - s) + 3L * b
        val bN = if (bN0 >= 0) bN0 / 4L else -((-bN0) / 4L)
        s = sN; b = bN
      }
      (s, b)
    }
    val (rs, rb) = fold(ramp.map(_._3))
    assert(got("r") == ((12, rs, rb, rs + rb)))
    assert(rb > 0L, "ramp trend positive")
    // constant series: s stays 7000, b stays 0 (fixed point of the
    // recursion), forecast = level
    assert(got("c") == ((12, 7000L, 0L, 7000L)))
  }

  test("holtTrend: negative trend truncates toward zero like the " +
      "oracle's //") {
    val fall = (1 to 10).map(t => ("f", t.toLong, (1000 - 90 * t).toLong))
    val got = operators.Temporal.holtTrend(
        fall.toDF("g", "t", "y"), "g", "t", "y")
      .collect().head
    assert(got.getLong(3) < 0L, "falling series trends negative")
    // replay with BigInt quot (truncation toward zero)
    var s = BigInt(1000L * fall.head._3); var b = BigInt(0)
    fall.tail.foreach { case (_, _, y) =>
      val sN = (BigInt(1000L * y) + 3 * (s + b)) / 4 // BigInt / truncates
      b = ((sN - s) + 3 * b) / 4
      s = sN
    }
    assert(got.getLong(2) == s.toLong && got.getLong(3) == b.toLong)
  }

  // --- truss peeling profile ----------------------------------------------------

  test("trussPeel: a clique never peels, a pendant triangle chain " +
      "sheds one layer per round") {
    // K5 (support 3 per edge ≥ 2) + a chain of triangles hanging off:
    // 5-6-7, 6-7-8, 7-8-9 (each new node closes one triangle)
    val k5 = for (i <- 1 to 5; j <- (i + 1) to 5) yield (i.toLong, j.toLong)
    val chain = Seq((5L, 6L), (5L, 7L), (6L, 7L), (6L, 8L), (7L, 8L),
      (7L, 9L), (8L, 9L))
    val edges = (k5 ++ chain).toDF("u", "v")
    val prof = operators.Truss.peelProfile(edges, k = 4, rounds = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // every edge of K5 has support >= 3; chain edges support:
    // (7,9),(8,9) support 1 -> removed round 1; cascade follows
    assert(prof.head._2 > 0L, "round 1 removes the weak tail")
    val last = prof.last
    assert(last._3 == 10L, s"K5 survives all peeling, got $last")
    assert(prof.map(_._2).sum + last._3 == (k5.size + chain.size).toLong,
      "removed + remaining telescopes to the edge count")
    // monotone: remaining never increases
    assert(prof.sliding(2).forall(p => p(1)._3 <= p.head._3))
  }

  // --- classic OLAP shapes -----------------------------------------------------

  test("q327 plan: dimension sides broadcast, no cartesian product") {
    val df = SparkEntry.queries("q327_local_supplier_rev")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "nation/supplier sides should broadcast")
    assert(!plan.contains("CartesianProduct"),
      "the 6-table tree must stay equi-joined")
    assert(df.collect().map(_.getLong(1)).forall(_ > 0L))
  }

  test("q328: every returned order clears the quantity threshold " +
      "and ordering is deterministic") {
    val rows = SparkEntry.queries("q328_large_orders")(spark, sf)
      .collect().map(r => (r.getLong(2), r.getLong(1)))
    assert(rows.forall(_._1 > 30000L))
    assert(rows.sameElements(rows.sortBy(r => (-r._1, r._2))))
  }

  test("trussPeel: convergence short-circuit publishes zero rounds") {
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("u", "v")
    // k=3: support >= 1, the triangle is stable from round 1
    val prof = operators.Truss.peelProfile(tri, k = 3, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(prof.forall(_._2 == 0L))
    assert(prof.forall(_._3 == 3L))
    assert(prof.map(_._1) sameElements Array(1L, 2L, 3L, 4L))
  }
}
