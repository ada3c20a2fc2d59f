package graft

import org.apache.spark.sql.functions._
import graft.operators.{Privacy, Stats}

/** ECDF transform, weighted median, reproducible-DP release
  * (q157-q159). */
class StatsPlusSpec extends SparkSpec {
  import spark.implicits._

  test("ecdf is the exact count ratio, ties share a value's F") {
    val df = Seq(10L, 20L, 20L, 30L).toDF("v")
    val got = Stats.ecdfTransform(df, "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSet
    assert(got == Set(10L -> 0.25, 20L -> 0.75, 30L -> 1.0))
  }

  test("weighted median crosses half the total mass, lower convention") {
    // group g: values 1(w=1), 2(w=1), 3(w=10) -> median 3 (10/12 mass)
    // group h: values 1(w=5), 2(w=5)          -> lower median 1 (tie)
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 10L),
      ("h", 1L, 5L), ("h", 2L, 5L)).toDF("grp", "v", "w")
    val got = Stats.weightedMedian(df, "grp", "v", "w")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("g") == ((3L, 12L, 3L)))
    assert(got("h") == ((2L, 10L, 1L)))
  }

  test("dp release: reproducible, centered, and actually noisy") {
    val df = (1L to 1000L).map(i => (i, i % 20)).toDF("id", "grp")
    val a = Privacy.noisyCounts(df, "grp", epsilon = 1.0, seed = 42L)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = Privacy.noisyCounts(df, "grp", epsilon = 1.0, seed = 42L)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a == b)                                   // replayable
    val noises = a.map { case (g, rel) => rel - 50.0 }
    assert(noises.exists(n => math.abs(n) > 1e-3))   // not a no-op
    assert(noises.forall(n => math.abs(n) < 20))     // Laplace(1) tail sane
    // a different seed draws different noise
    val c = Privacy.noisyCounts(df, "grp", epsilon = 1.0, seed = 43L)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a != c)
  }

  test("dp epsilon scales the noise magnitude") {
    val df = (1L to 100L).map(i => (i, i % 5)).toDF("id", "grp")
    def absNoise(eps: Double) =
      Privacy.noisyCounts(df, "grp", eps, seed = 7L)
        .collect().map(r => math.abs(r.getDouble(2) - 20.0)).sum
    assert(absNoise(0.1) > absNoise(10.0)) // smaller eps, more noise
  }
}
