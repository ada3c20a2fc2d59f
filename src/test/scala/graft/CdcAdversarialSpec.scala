package graft

import org.apache.spark.sql.functions._

/** Round-13 verdict ask #4: the Round12Spec treatment for the
  * cross-run incrementality family — Cdc.apply / Cdc.snapshotDiff
  * under adversarial inputs: duplicate (key, seq) collisions,
  * D-then-U / U-then-D op ordering, fingerprint collisions (two
  * texts, one fp — forced through the known charFold modulus), and
  * empty yesterday/today sides. */
class CdcAdversarialSpec extends SparkSpec {
  import spark.implicits._

  private def applyRows(snapshot: org.apache.spark.sql.DataFrame,
                        changes: org.apache.spark.sql.DataFrame) =
    graft.operators.Cdc.apply(snapshot, changes, "k", "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("apply: duplicate (key, seq) rows fold deterministically — " +
    "tied D outranks I/U, and the result is partition-order invariant") {
    val snapshot = Seq((1L, "old1"), (2L, "old2")).toDF("k", "v")
    // key 1: tied seq 5 carries both a D and a U -> D wins (op asc)
    // key 2: tied seq 7 carries two Us with different payloads ->
    //        the payload-ascending one wins
    val changes = Seq(
      (1L, 5L, "U", "uv1"), (1L, 5L, "D", "zzz"),
      (2L, 7L, "U", "bbb"), (2L, 7L, "U", "aaa")
    ).toDF("k", "seq", "op", "v")
    val expected = Set((2L, "aaa")) // key 1 deleted
    assert(applyRows(snapshot, changes) == expected)
    // partition-order invariance: shuffle the change rows hard
    assert(applyRows(snapshot, changes.repartition(7)) == expected)
    assert(applyRows(snapshot,
      changes.orderBy(col("v").desc).repartition(3)) == expected)
  }

  test("apply: D-then-U resurrects, U-then-D removes — seq order " +
    "wins regardless of row arrival order") {
    val snapshot = Seq((1L, "old"), (2L, "old")).toDF("k", "v")
    val changes = Seq(
      (1L, 1L, "D", "x"), (1L, 2L, "U", "new1"), // D then U -> alive
      (2L, 1L, "U", "new2"), (2L, 2L, "D", "x")  // U then D -> gone
    ).toDF("k", "seq", "op", "v")
    assert(applyRows(snapshot, changes) == Set((1L, "new1")))
    assert(applyRows(snapshot, changes.orderBy(col("seq").desc)) ==
      Set((1L, "new1")))
  }

  test("apply: empty change set is the identity; empty snapshot " +
    "keeps exactly the surviving I/U payloads") {
    val snapshot = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val noChanges = Seq.empty[(Long, Long, String, String)]
      .toDF("k", "seq", "op", "v")
    assert(applyRows(snapshot, noChanges) == Set((1L, "a"), (2L, "b")))
    val emptySnap = Seq.empty[(Long, String)].toDF("k", "v")
    val changes = Seq((1L, 1L, "U", "u1"), (2L, 1L, "D", "x"))
      .toDF("k", "seq", "op", "v")
    assert(applyRows(emptySnap, changes) == Set((1L, "u1")))
  }

  /** The house charFold fp (q345 family): fold acc*31 + ascii over
    * the chars, mod 1e9+7 — replicated here to FORCE a collision:
    * "az" (97·31+122 = 3129) and "b[" (98·31+91 = 3129). */
  private def charFp(c: org.apache.spark.sql.Column) =
    aggregate(split(c, ""), lit(0L),
      (acc, ch) => pmod(acc * 31 + ascii(ch), lit(1000000007L)))

  test("snapshotDiff: a forced fp collision reads as 'unchanged' and " +
    "is dropped — the documented fingerprint-level trade") {
    // sanity: the two texts really collide under the known modulus
    val fps = Seq(("az"), ("b[")).toDF("t")
      .select(charFp(col("t")).as("fp")).collect().map(_.getLong(0))
    assert(fps(0) == fps(1) && fps(0) == 3129L)
    val y = Seq((1L, "az"), (2L, "keep")).toDF("doc_id", "text")
      .select(col("doc_id"), charFp(col("text")).as("fp"))
    val t = Seq((1L, "b["), (2L, "keep")).toDF("doc_id", "text")
      .select(col("doc_id"), charFp(col("text")).as("fp"))
    // doc 1 DID change content, but at fp level it is invisible
    assert(graft.operators.Cdc
      .snapshotDiff(y, t, "doc_id", Seq("fp")).count() == 0L)
  }

  test("snapshotDiff: empty yesterday -> all added; empty today -> " +
    "all removed; both empty -> empty diff") {
    val some = Seq((1L, 10L), (2L, 20L)).toDF("doc_id", "fp")
    val none = Seq.empty[(Long, Long)].toDF("doc_id", "fp")
    def kinds(a: org.apache.spark.sql.DataFrame,
              b: org.apache.spark.sql.DataFrame) =
      graft.operators.Cdc.snapshotDiff(a, b, "doc_id", Seq("fp"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(kinds(none, some) == Set((1L, "added"), (2L, "added")))
    assert(kinds(some, none) == Set((1L, "removed"), (2L, "removed")))
    assert(kinds(none, none) == Set.empty)
  }

  test("snapshotDiff: null fp values compare null-safely — " +
    "null == null is unchanged, null vs value is changed") {
    val y = Seq((1L, Option.empty[Long]), (2L, Some(5L)),
      (3L, Option.empty[Long])).toDF("doc_id", "fp")
    val t = Seq((1L, Option.empty[Long]), (2L, Option.empty[Long]),
      (3L, Some(7L))).toDF("doc_id", "fp")
    val got = graft.operators.Cdc
      .snapshotDiff(y, t, "doc_id", Seq("fp"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((2L, "changed"), (3L, "changed")))
  }
}
