package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Aho–Corasick multi-pattern scan — the blocklist / PII-lexicon /
  * contamination-phrase scanner a crawl pipeline runs over every
  * document (reference scope: the engine's string-function family
  * F1–F9 covers single needles; this is the many-needles form).
  * Aho & Corasick 1975: a trie over the pattern set with BFS failure
  * links turns K `contains` scans into ONE pass — O(len + matches)
  * per document regardless of K, counting ALL (overlapping)
  * occurrences of every pattern.
  *
  * Scale shape: the automaton is built once on the DRIVER from the
  * BOUNDED pattern set (a lexicon is thousands of entries; the corpus
  * is 100 TB — the q28 emotion-lexicon contract) and ships in the
  * task closure; the scan is map-only `mapPartitions`, zero shuffle
  * before the per-doc result rows. Versus the naive
  * `K × contains(text, pat)` plan this removes the factor K from the
  * per-row cost — the difference between a 10-pattern demo and a
  * 50k-entry PII lexicon.
  */
object PatternScan {

  /** Compiled automaton: immutable per-state transition maps, failure
    * links, merged output lists (pattern indices ending at the
    * state). Serializable — ships in the task closure. */
  final class Automaton private[PatternScan] (
      val next: Array[Map[Char, Int]],
      val fail: Array[Int],
      val out: Array[List[Int]],
      val patterns: Array[String]) extends Serializable

  def compile(patterns: Seq[String]): Automaton = {
    require(patterns.nonEmpty, "empty pattern set")
    require(patterns.forall(_.nonEmpty), "empty pattern")
    require(patterns.distinct.size == patterns.size, "duplicate pattern")
    val nextB = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    val outB = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      for (c <- p) s = nextB(s).getOrElseUpdate(c, {
        nextB += scala.collection.mutable.Map.empty[Char, Int]
        outB += Nil
        nextB.size - 1
      })
      outB(s) = pi :: outB(s)
    }
    val n = nextB.size
    val fail = new Array[Int](n)
    val queue = scala.collection.mutable.Queue.empty[Int]
    nextB(0).values.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      for ((c, s) <- nextB(r)) {
        queue += s
        var f = fail(r)
        while (f != 0 && !nextB(f).contains(c)) f = fail(f)
        fail(s) = nextB(f).getOrElse(c, 0)
        // BFS order: fail(s) is shallower, its outputs already merged
        outB(s) = outB(s) ++ outB(fail(s))
      }
    }
    new Automaton(nextB.map(_.toMap).toArray, fail, outB.toArray,
      patterns.toArray)
  }

  /** Occurrence count per pattern over one text — all matches,
    * overlaps included. */
  def countMatches(text: String, a: Automaton): Array[Int] = {
    val counts = new Array[Int](a.patterns.length)
    var s = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (s != 0 && !a.next(s).contains(c)) s = a.fail(s)
      s = a.next(s).getOrElse(c, 0)
      var o = a.out(s)
      while (o.nonEmpty) { counts(o.head) += 1; o = o.tail }
      i += 1
    }
    counts
  }

  /** Per-document occurrence counts of every pattern (lower-cased
    * text, char-level matching, overlaps counted). Output:
    * (doc_id, pattern, n_matches) for patterns with ≥ 1 match. */
  def scanCounts(docs: DataFrame, idCol: String, textCol: String,
                 patterns: Seq[String]): DataFrame = {
    val a = compile(patterns)
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        lower(col(textCol)).as("t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, t) =>
          val cnt = countMatches(t, a)
          cnt.indices.iterator.filter(cnt(_) > 0)
            .map(pi => (id, a.patterns(pi), cnt(pi).toLong))
        }
      }
      .toDF("doc_id", "pattern", "n_matches")
  }
}
