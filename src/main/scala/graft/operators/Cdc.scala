package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture batch apply: fold an ordered stream of
  * I(nsert)/U(psert)/D(elete) changes into a snapshot — the MERGE INTO
  * semantics every incremental 100 TB pipeline needs (the reference's
  * insert-if-absent upsert, Scraper.py:402-412, is the I/U half; CDC
  * adds deletes and last-writer-wins ordering).
  *
  * Scale shape: one window over the CHANGES keyed by `key` ordered by
  * `seq` descending picks each key's final change (changes partition
  * by key — bounded groups, never a global sort); the snapshot then
  * anti-joins the touched-key set (broadcast when the change batch is
  * small — the steady-state case) and the surviving I/U payloads union
  * in. The snapshot — the 100 TB side — never shuffles.
  */
object Cdc {

  /** @param snapshot current table state: (key, payload...)
    * @param changes  (key, seq, op ∈ I|U|D, payload...) — same payload
    *                 columns as the snapshot
    * @return the new snapshot state
    *
    * Seq collisions (round-13 hardening): `seq` SHOULD totally order a
    * key's changes, but a feed that violates that must still fold
    * deterministically — two runs over the same rows in different
    * partition orders cannot disagree. On a (key, seq) tie the winner
    * is picked by (op, payload columns) ASCENDING, so a tied 'D'
    * outranks 'I'/'U' (conservative: the tied delete removes) and
    * exact duplicate rows collapse to themselves. Pinned by
    * CdcAdversarialSpec; feeds with meaningful tie semantics must
    * encode them in `seq`. */
  def apply(snapshot: DataFrame, changes: DataFrame,
            key: String, seq: String, op: String): DataFrame = {
    val tieCols = changes.columns.toSeq
      .filterNot(c => c == key || c == seq || c == op)
      .sorted.map(col(_).asc)
    val w = Window.partitionBy(col(key))
      .orderBy(col(seq).desc +: col(op).asc +: tieCols: _*)
    val last = changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
    val touched = last.select(col(key))
    val survivors = last.filter(col(op) =!= "D")
      .drop(seq, op)
    snapshot.join(broadcast(touched), Seq(key), "left_anti")
      .unionByName(survivors)
  }

  /** Snapshot diff — the inverse of [[apply]]: given two versions of a
    * table, emit the change set (added / removed / changed per key)
    * that turns A into B. The audit/reconciliation primitive for
    * incremental pipelines: diff yesterday's corpus snapshot against
    * today's to see what a rebuild actually changed.
    *
    * One full outer join on the key — the single unavoidable shuffle;
    * unchanged keys (the overwhelming majority in steady state) are
    * filtered out POST-join but pre-materialization, so the output is
    * only the delta. Column comparison is null-safe (`<=>`).
    *
    * Preconditions (round 13, CdcAdversarialSpec): `key` must be
    * UNIQUE on each side — both inputs are SNAPSHOTS, i.e. keyed
    * tables; a duplicated key fans out through the full-outer join
    * like any keyed MERGE would. And when `compareCols` are
    * fingerprints rather than content, a fingerprint COLLISION between
    * the old and new value of a key reads as "unchanged" and is
    * dropped from the diff — the inherent fp-level trade
    * (1/modulus ≈ 1e-9 per changed key for the house charFold fp),
    * pinned by spec so the behavior is a documented decision. */
  def snapshotDiff(a: DataFrame, b: DataFrame, key: String,
      compareCols: Seq[String]): DataFrame = {
    val an = a.select((key +: compareCols).map(c => col(c).as("a_" + c)): _*)
    val bn = b.select((key +: compareCols).map(c => col(c).as("b_" + c)): _*)
    val joined = an.join(bn, col("a_" + key) === col("b_" + key), "full_outer")
    val same = compareCols
      .map(c => col("a_" + c) <=> col("b_" + c))
      .reduce(_ && _)
    joined
      .withColumn("change_type",
        when(col("a_" + key).isNull, "added")
          .when(col("b_" + key).isNull, "removed")
          .when(!same, "changed"))
      .filter(col("change_type").isNotNull)
      .withColumn(key, coalesce(col("a_" + key), col("b_" + key)))
      .select((key +: "change_type" +:
        (compareCols.map("a_" + _) ++ compareCols.map("b_" + _))).map(col): _*)
  }

  /** SCD type-2 interval build (Kimball's slowly-changing-dimension
    * type 2): fold an ordered per-key change log into VALIDITY
    * INTERVALS — one row per run of equal attribute values, carrying
    * [valid_from, valid_to) and the is_current flag. [[apply]] keeps
    * only the latest state; this keeps the full history in the shape
    * warehouse dimensions (and as-of joins) consume.
    * [[Temporal.scd2Intervals]] versions EVERY change row; this
    * variant collapses runs first — no-op updates (the common case in
    * a wide CDC feed) open no interval.
    *
    * Run collapse is null-safe (`<=>`) across ALL `attrs`: a row
    * opens a new interval iff it is the key's first row or any
    * tracked attribute differs from the previous row. `seqCols` must
    * totally order rows within a key (pass a tie-breaker column —
    * nondeterministic input order is the classic silent SCD2 bug);
    * valid_from/valid_to take the FIRST seq column's value.
    *
    * Scale shape: one hash shuffle on the key; both window passes
    * (run detection, then lead() over the collapsed runs) and the
    * filter between them preserve that partitioning, so Catalyst
    * plans a single Exchange. Per-key groups are bounded by a key's
    * change count — no global sort. */
  def scd2Intervals(changes: DataFrame, key: String, seqCols: Seq[String],
                    attrs: Seq[String]): DataFrame = {
    require(seqCols.nonEmpty && attrs.nonEmpty,
      "scd2Intervals needs >= 1 seq column and >= 1 tracked attribute")
    val w = Window.partitionBy(col(key)).orderBy(seqCols.map(col): _*)
    val opens = changes
      .withColumn("_rn", row_number().over(w))
      .withColumn("_chg",
        col("_rn") === 1 ||
          attrs.map(a => !(col(a) <=> lag(col(a), 1).over(w)))
            .reduce(_ || _))
      .filter(col("_chg"))
    opens
      .withColumn("valid_from", col(seqCols.head))
      .withColumn("valid_to", lead(col(seqCols.head), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((key +: attrs).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }
}
