package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Consistent-hash ring sharding — the placement scheme a 100 TB
  * corpus store / serving fleet actually uses, plus the telemetry
  * that justifies it (how much data MOVES when the fleet grows).
  *
  * The reference pipeline writes everything into one SQLite file
  * (`Scraper.py:261-420`); at warehouse scale the same rows land on N
  * shards, and the naive placement `key mod N` reassigns ~(1 − 1/M)
  * of all keys when N grows to M — a full-corpus rewrite for a 25%
  * fleet grow. A hash ring with virtual nodes (Karger et al. 1997;
  * the memcached/Dynamo placement scheme) moves only the arcs the new
  * shards steal, ≈ (M−N)/M of keys, and the reshard audit below
  * measures both numbers exactly.
  *
  * Portability: ring positions start from the repo's char-fold
  * fingerprint (`(acc·31 + codepoint) mod 1e9+7`, the q132/q345
  * convention) over the deterministic vnode label `"shard:<s>:<v>"` —
  * but the raw fold is NOT avalanche: labels differing only in
  * trailing digits land within a few thousand of each other, and an
  * affine re-map preserves the translate structure (shards' vnode
  * sets become shifted copies, measured as identical arc sums). So
  * positions pass through a QUADRATIC mix, `(f² + f·2654435761 +
  * 40503) mod 1e9+7`, which breaks the difference structure while
  * staying bit-replayable in any BIGINT engine: f ≤ 1e9+6, so
  * f² ≤ 1.0e18 and the full polynomial ≤ 3.7e18 < 2^63 — no overflow
  * under ANSI mode. Key positions use the affine map alone (keys are
  * arbitrary, not adversarially-similar constants).
  *
  * Scale shape: the ring is O(shards · vnodes) driver-side constants
  * (128 entries here) embedded as array/map LITERALS — assignment is
  * one map-only pass over the corpus (codegen'd array HOFs, no
  * shuffle, nothing broadcast-joined); only the per-shard count agg
  * shuffles, and that is |shards| rows after map-side partials.
  */
object HashRing {

  val Mod = 1000000007L

  /** Char-fold fingerprint of a vnode label (q132 convention, no
    * case fold — labels are constants). */
  def labelFold(label: String): Long =
    label.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % Mod)

  /** Quadratic mix (see class doc): scatters the clustered label
    * folds across the ring without losing BIGINT replayability. */
  def mix(f: Long): Long = (f * f + f * 2654435761L + 40503L) % Mod

  /** A vnode's ring position: mixed label fold. */
  def labelPos(label: String): Long = mix(labelFold(label))

  /** [[mix]] as a column expression — the one shared definition of
    * the quadratic-mix constants for row-level keys (the q382 epoch
    * sort key). f < Mod keeps every term inside long. */
  def mixColumn(f: Column): Column =
    pmod(f * f + f * lit(2654435761L) + lit(40503L), lit(Mod))

  /** The ring: (position, shard) for every virtual node, sorted by
    * position. Positions are distinct — collisions (never observed
    * for shards ≤ 64, vnodes ≤ 64) fail loudly at construction (the
    * oracle replays unsalted positions; see [[ringWeighted]]). */
  def ring(nShards: Int, vnodesPerShard: Int): Seq[(Long, Long)] =
    ringWeighted(Seq.fill(nShards)(vnodesPerShard))

  /** WEIGHTED ring — shard s contributes `capacities(s)` vnodes, so
    * its expected arc share is capacity-proportional: the
    * heterogeneous-fleet form (mixed disk/machine generations), same
    * labels, same mix, same successor rule.
    *
    * Position collisions (two vnode labels mixing to the same ring
    * point — possible in principle for arbitrary capacity vectors)
    * FAIL LOUDLY here: every DuckDB oracle replay (ringCtes,
    * q369/q371/q372/q375) computes unsalted positions, so a silently
    * salt-remapped ring would diverge from the oracle's geometry at
    * hash-check time instead of construction time. A fleet that
    * genuinely needs arbitrary capacity vectors without an oracle
    * replay uses [[ringWeightedSalted]], whose deterministic
    * salt-retry resolves collisions (and is BIT-IDENTICAL to this
    * form whenever no label collides — spec-pinned). */
  def ringWeighted(capacities: Seq[Int]): Seq[(Long, Long)] =
    ringWeightedWith(capacities, labelPos, allowSalt = false)

  /** Salt-retrying weighted ring: the later vnode in (shard, vnode)
    * order re-mixes with label `"shard:<s>:<v>:r<N>"` for N = 1, 2, …
    * until free. NOT oracle-replayed — registered queries use
    * [[ringWeighted]] so any collision fails at construction rather
    * than silently diverging from the SQL replay. */
  def ringWeightedSalted(capacities: Seq[Int]): Seq[(Long, Long)] =
    ringWeightedWith(capacities, labelPos, allowSalt = true)

  /** Position-function-parameterized form so the salt-retry mechanism
    * is testable without hunting a real mix collision (sequential
    * decimal labels collide only when two folds sum to exactly
    * −2654435761 mod p — never observed in practical ranges). */
  private[graft] def ringWeightedWith(capacities: Seq[Int],
      posOf: String => Long, allowSalt: Boolean = true): Seq[(Long, Long)] = {
    require(capacities.nonEmpty && capacities.forall(_ >= 1),
      "every shard needs >= 1 vnode")
    val seen = scala.collection.mutable.HashSet.empty[Long]
    val vs = for {
      (c, s) <- capacities.zipWithIndex
      v <- 0 until c
    } yield {
      var pos = posOf(s"shard:$s:$v")
      var retry = 0
      while (seen.contains(pos)) {
        require(allowSalt,
          s"vnode label shard:$s:$v collides with an earlier ring " +
            "position — the DuckDB oracle replays UNSALTED positions, " +
            "so this geometry would silently diverge from the replay; " +
            "use ringWeightedSalted for fleets without an oracle")
        retry += 1
        require(retry <= 4096,
          s"shard:$s:$v cannot find a free ring position in 4096 " +
            "salt retries — position space exhausted")
        pos = posOf(s"shard:$s:$v:r$retry")
      }
      seen += pos
      (pos, s.toLong)
    }
    vs.sortBy(_._1)
  }

  /** Key position on the ring: affine map of the key into [0, Mod).
    * The key is reduced mod first so the multiply cannot overflow at
    * any key magnitude (ANSI-safe at 100 TB key ranges). */
  def keyPos(key: Column): Column =
    pmod(pmod(key, lit(Mod)) * lit(2654435761L) + lit(40503L), lit(Mod))

  /** Successor-vnode assignment: each key goes to the shard owning
    * the first vnode clockwise from the key's position (wrap to the
    * ring's minimum). Map-only, and O(log |ring|) per row: the
    * sorted ring is baked into one native binary-search expression
    * ([[org.apache.spark.sql.graft.RingShard]] — the original
    * `array_min(filter(...))` + map-literal `element_at` walked all
    * |ring| entries per row through interpreted HOFs, the wrong cost
    * class for a whole-corpus pass; HashRingSpec pins native ==
    * declarative == local scan). Adds `ring_pos` and `shard`
    * (named `shardCol`). */
  def assign(df: DataFrame, keyCol: String, nShards: Int,
      vnodesPerShard: Int, shardCol: String = "shard"): DataFrame = {
    val r = ring(nShards, vnodesPerShard)
    df.withColumn("ring_pos", keyPos(col(keyCol)))
      .withColumn(shardCol, org.apache.spark.sql.graft.RingShard
        .column(col("ring_pos"), r.map(_._1), r.map(_._2)))
  }

  /** The pre-native declarative assignment construction, kept as the
    * independent twin HashRingSpec pins [[assign]] against (the
    * ContentChunkStarts convention). */
  private[graft] def assignDeclarative(df: DataFrame, keyCol: String,
      nShards: Int, vnodesPerShard: Int,
      shardCol: String = "shard"): DataFrame = {
    val r = ring(nShards, vnodesPerShard)
    val posArr = typedLit(r.map(_._1))
    val posToShard = typedLit(r.toMap)
    df.withColumn("ring_pos", keyPos(col(keyCol)))
      .withColumn(shardCol, element_at(posToShard, coalesce(
        array_min(filter(posArr, x => x >= col("ring_pos"))),
        lit(r.head._1))))
  }

  /** Per-shard arc ownership: (shard, n_vnodes, arc) where arc is the
    * total ring length whose successor is one of the shard's vnodes
    * (arcs sum to Mod exactly). Driver-computed from the same
    * constants as [[ring]] — this is the THEORETICAL load share the
    * empirical per-shard counts are audited against. */
  def arcs(nShards: Int, vnodesPerShard: Int): Seq[(Long, Long, Long)] =
    arcsOf(ring(nShards, vnodesPerShard))

  /** Per-shard arc ownership of an arbitrary (sorted) ring. */
  private def arcsOf(r: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
    val prev = (r.last._1 - Mod) +: r.map(_._1).init
    r.zip(prev).map { case ((pos, shard), pp) => (shard, pos - pp) }
      .groupBy(_._1).toSeq
      .map { case (s, as) => (s, as.size.toLong, as.map(_._2).sum) }
      .sortBy(_._1)
  }

  /** Shard-load audit: one row per shard with the vnode count, the
    * theoretical arc share (ppm of the ring) and the empirical key
    * count + load share (ppm of the corpus). One map pass + one
    * |shards|-row aggregation. */
  def loadAudit(s: SparkSession, df: DataFrame, keyCol: String,
      nShards: Int, vnodesPerShard: Int): DataFrame = {
    val arcDf = s.createDataFrame(arcs(nShards, vnodesPerShard))
      .toDF("shard", "n_vnodes", "arc")
    val counts = assign(df, keyCol, nShards, vnodesPerShard)
      .groupBy("shard").agg(count(lit(1)).as("n_keys"))
    arcDf.join(counts, Seq("shard"), "left")
      .join(df.agg(count(lit(1)).as("n_total")))
      .select(col("shard"), col("n_vnodes"),
        expr(s"arc * 1000000L div ${Mod}L").as("arc_ppm"),
        coalesce(col("n_keys"), lit(0L)).as("n_keys"),
        loadPpm.as("load_ppm"))
      .orderBy("shard")
  }

  /** Empirical load share with the repo's empty-denominator sentinel:
    * an EMPTY corpus publishes -1, not a divide-by-zero (the
    * bandSweepAudit convention). */
  private val loadPpm: Column =
    when(col("n_total") > 0,
      expr("coalesce(n_keys, 0L) * 1000000L div n_total"))
      .otherwise(lit(-1L))

  /** REPLICATED assignment — Dynamo placement: each key maps to its
    * first `replicas` DISTINCT-shard clockwise successors (element 0
    * is exactly [[assign]]'s primary, spec-pinned). One native
    * binary-search + bounded-walk expression per row
    * ([[org.apache.spark.sql.graft.RingReplicas]]); still map-only.
    * Adds `ring_pos` and an array column `replica_set` (walk order:
    * index 0 = primary). */
  def assignReplicated(df: DataFrame, keyCol: String, nShards: Int,
      vnodesPerShard: Int, replicas: Int): DataFrame = {
    val r = ring(nShards, vnodesPerShard)
    df.withColumn("ring_pos", keyPos(col(keyCol)))
      .withColumn("replica_set", org.apache.spark.sql.graft.RingReplicas
        .column(col("ring_pos"), r.map(_._1), r.map(_._2), replicas))
  }

  /** Replication load audit: one row per shard with its PRIMARY key
    * count (replica_rank 1) and its REPLICA key count (ranks
    * 2..replicas), plus both shares in ppm of the corpus — the "who
    * holds how much data, counting copies" capacity-planning table.
    * n_responsible sums to replicas × corpus size exactly (each key
    * names `replicas` distinct shards). Shape: one map pass + one
    * posexplode (replicas rows per key) + a |shards|-row aggregation;
    * zero-load shards keep a row via the driver arc table. */
  def replicationAudit(s: SparkSession, df: DataFrame, keyCol: String,
      nShards: Int, vnodesPerShard: Int, replicas: Int): DataFrame = {
    val arcDf = s.createDataFrame(arcs(nShards, vnodesPerShard))
      .toDF("shard", "n_vnodes", "arc").select("shard")
    val counts = assignReplicated(df, keyCol, nShards, vnodesPerShard,
        replicas)
      .select(posexplode(col("replica_set")).as(Seq("rank0", "shard")))
      .groupBy("shard")
      .agg(sum(when(col("rank0") === 0, 1L).otherwise(0L))
          .as("n_primary"),
        sum(when(col("rank0") > 0, 1L).otherwise(0L)).as("n_replica"))
    arcDf.join(counts, Seq("shard"), "left")
      .join(df.agg(count(lit(1)).as("n_total")))
      .select(col("shard"),
        coalesce(col("n_primary"), lit(0L)).as("n_primary"),
        coalesce(col("n_replica"), lit(0L)).as("n_replica"),
        (coalesce(col("n_primary"), lit(0L)) +
          coalesce(col("n_replica"), lit(0L))).as("n_responsible"),
        when(col("n_total") > 0,
          expr("coalesce(n_primary, 0L) * 1000000L div n_total"))
          .otherwise(lit(-1L)).as("primary_ppm"),
        when(col("n_total") > 0,
          expr("(coalesce(n_primary, 0L) + coalesce(n_replica, 0L)) " +
            "* 1000000L div n_total"))
          .otherwise(lit(-1L)).as("responsible_ppm"))
      .orderBy("shard")
  }

  /** [[assignReplicated]] against a WEIGHTED ring: Dynamo placement
    * on the heterogeneous fleet — a big shard's vnodes appear more
    * often in every walk, so it carries capacity-proportional PRIMARY
    * and REPLICA load alike. */
  def assignReplicatedWeighted(df: DataFrame, keyCol: String,
      capacities: Seq[Int], replicas: Int): DataFrame = {
    val r = ringWeighted(capacities)
    df.withColumn("ring_pos", keyPos(col(keyCol)))
      .withColumn("replica_set", org.apache.spark.sql.graft.RingReplicas
        .column(col("ring_pos"), r.map(_._1), r.map(_._2), replicas))
  }

  /** [[replicationAudit]] on a weighted ring, with the fleet's
    * capacity intent published alongside: per shard, capacity ppm of
    * total vnodes vs measured primary and total-responsibility ppm of
    * the corpus. The capacity-planning question this answers: does
    * replica load ALSO track capacity (it does — replicas are just
    * more successor walks over the same arcs). */
  def replicationAuditWeighted(s: SparkSession, df: DataFrame,
      keyCol: String, capacities: Seq[Int], replicas: Int): DataFrame = {
    val r = ringWeighted(capacities)
    val totalCap = capacities.map(_.toLong).sum
    val arcDf = s.createDataFrame(arcsOf(r))
      .toDF("shard", "n_vnodes", "arc")
    val counts = assignReplicatedWeighted(df, keyCol, capacities,
        replicas)
      .select(posexplode(col("replica_set")).as(Seq("rank0", "shard")))
      .groupBy("shard")
      .agg(sum(when(col("rank0") === 0, 1L).otherwise(0L))
          .as("n_primary"),
        sum(when(col("rank0") > 0, 1L).otherwise(0L)).as("n_replica"))
    arcDf.join(counts, Seq("shard"), "left")
      .join(df.agg(count(lit(1)).as("n_total")))
      .select(col("shard"), col("n_vnodes"),
        expr(s"n_vnodes * 1000000L div ${totalCap}L").as("capacity_ppm"),
        coalesce(col("n_primary"), lit(0L)).as("n_primary"),
        coalesce(col("n_replica"), lit(0L)).as("n_replica"),
        (coalesce(col("n_primary"), lit(0L)) +
          coalesce(col("n_replica"), lit(0L))).as("n_responsible"),
        when(col("n_total") > 0,
          expr("coalesce(n_primary, 0L) * 1000000L div n_total"))
          .otherwise(lit(-1L)).as("primary_ppm"),
        when(col("n_total") > 0,
          expr("(coalesce(n_primary, 0L) + coalesce(n_replica, 0L)) " +
            "* 1000000L div n_total"))
          .otherwise(lit(-1L)).as("responsible_ppm"))
      .orderBy("shard")
  }

  /** REPLICATED reshard-movement audit, growing `nShards` →
    * `nShardsAfter` under R-way placement: the copy-migration bill a
    * replicated fleet actually pays. Per key, the before/after
    * replica sets (first R distinct-shard successors on each ring —
    * surviving shards keep their vnode labels, the consistent-hashing
    * contract); a COPY must move for every after-shard not already
    * holding one (|A \ B|). One row: keys, primaries moved (exactly
    * [[reshardAudit]]'s ring_moved, spec-pinned), total copies to
    * move, and both ppm — copies_ppm against the R·keys placements.
    * Two map passes + one global agg; nothing corpus-sized shuffles. */
  def replicatedReshardAudit(df: DataFrame, keyCol: String,
      nShards: Int, nShardsAfter: Int, vnodesPerShard: Int,
      replicas: Int): DataFrame =
    // the uniform fleet IS the constant-capacity weighted fleet
    // (ring(n, v) already delegates to ringWeighted the same way),
    // so the audit body lives once, in the weighted form
    replicatedReshardAuditWeighted(df, keyCol,
      Seq.fill(nShards)(vnodesPerShard),
      Seq.fill(nShardsAfter)(vnodesPerShard), replicas)

  /** [[replicatedReshardAudit]] on WEIGHTED rings — the
    * capacity-planning form: the copy-migration bill of growing a
    * HETEROGENEOUS fleet from `capsBefore` to `capsAfter` under R-way
    * placement. Surviving shards keep every existing vnode label and
    * may only GAIN vnodes (the consistent-hashing contract extended
    * to capacity growth: `capsAfter` must prefix-dominate
    * `capsBefore`), so arcs only move TOWARD new vnodes. Same two
    * map passes + one global agg as the uniform form — the audit
    * that answers "add one big box or four small ones". */
  def replicatedReshardAuditWeighted(df: DataFrame, keyCol: String,
      capsBefore: Seq[Int], capsAfter: Seq[Int],
      replicas: Int): DataFrame = {
    require(capsAfter.length >= capsBefore.length &&
      capsBefore.zip(capsAfter).forall { case (b, a) => a >= b },
      "capsAfter must keep every existing shard at >= its current " +
        "capacity (surviving vnode labels are immutable)")
    val rb = ringWeighted(capsBefore)
    val ra = ringWeighted(capsAfter)
    val withSets = df
      .withColumn("ring_pos", keyPos(col(keyCol)))
      .withColumn("before_set", org.apache.spark.sql.graft.RingReplicas
        .column(col("ring_pos"), rb.map(_._1), rb.map(_._2), replicas))
      .withColumn("after_set", org.apache.spark.sql.graft.RingReplicas
        .column(col("ring_pos"), ra.map(_._1), ra.map(_._2), replicas))
    withSets.agg(
        count(lit(1)).as("n_keys"),
        sum(when(element_at(col("after_set"), 1) =!=
          element_at(col("before_set"), 1), 1L).otherwise(0L))
          .as("primary_moved"),
        sum(size(array_except(col("after_set"), col("before_set")))
          .cast("long")).as("copies_moved"))
      .select(col("n_keys"), col("primary_moved"),
        when(col("n_keys") > 0,
          expr("primary_moved * 1000000L div n_keys"))
          .otherwise(lit(-1L)).as("primary_moved_ppm"),
        col("copies_moved"),
        when(col("n_keys") > 0,
          expr(s"copies_moved * 1000000L div (n_keys * ${replicas}L)"))
          .otherwise(lit(-1L)).as("copies_moved_ppm"))
  }

  /** Successor assignment against a WEIGHTED ring ([[ringWeighted]]);
    * same native binary-search expression as [[assign]]. */
  def assignWeighted(df: DataFrame, keyCol: String, capacities: Seq[Int],
      shardCol: String = "shard"): DataFrame = {
    val r = ringWeighted(capacities)
    df.withColumn("ring_pos", keyPos(col(keyCol)))
      .withColumn(shardCol, org.apache.spark.sql.graft.RingShard
        .column(col("ring_pos"), r.map(_._1), r.map(_._2)))
  }

  /** Weighted-ring load audit: per shard, the vnode count, its
    * CAPACITY share (ppm of total vnodes — the fleet's intent), its
    * theoretical arc share, and the empirical key count + load share.
    * The story the three ppm columns tell side by side: arc tracks
    * capacity (more vnodes ⇒ proportionally more ring), and load
    * tracks arc — capacity-weighted placement without any per-key
    * state. Same shapes as [[loadAudit]]. */
  def loadAuditWeighted(s: SparkSession, df: DataFrame, keyCol: String,
      capacities: Seq[Int]): DataFrame = {
    val r = ringWeighted(capacities)
    val totalCap = capacities.map(_.toLong).sum
    val arcDf = s.createDataFrame(arcsOf(r))
      .toDF("shard", "n_vnodes", "arc")
    val counts = assignWeighted(df, keyCol, capacities)
      .groupBy("shard").agg(count(lit(1)).as("n_keys"))
    arcDf.join(counts, Seq("shard"), "left")
      .join(df.agg(count(lit(1)).as("n_total")))
      .select(col("shard"), col("n_vnodes"),
        expr(s"n_vnodes * 1000000L div ${totalCap}L").as("capacity_ppm"),
        expr(s"arc * 1000000L div ${Mod}L").as("arc_ppm"),
        coalesce(col("n_keys"), lit(0L)).as("n_keys"),
        loadPpm.as("load_ppm"))
      .orderBy("shard")
  }

  /** Reshard migration plan, growing `nShards` → `nShardsAfter`: one
    * row per (shard_before, shard_after) pair with the key count to
    * move — the work order a migration executor consumes. Under the
    * consistent-hashing contract every destination is a NEW shard
    * (old shards only lose arcs to new vnodes), which
    * [[reshardAudit]]'s companion spec pins. Same two map passes as
    * the audit; the groupBy is |moved pairs| ≤ old·new rows. */
  def reshardPlan(df: DataFrame, keyCol: String, nShards: Int,
      nShardsAfter: Int, vnodesPerShard: Int): DataFrame = {
    val before = assign(df, keyCol, nShards, vnodesPerShard, "shard_before")
      .drop("ring_pos")
    assign(before, keyCol, nShardsAfter, vnodesPerShard, "shard_after")
      .filter(col("shard_before") =!= col("shard_after"))
      .groupBy("shard_before", "shard_after")
      .agg(count(lit(1)).as("n_keys"))
      .orderBy("shard_before", "shard_after")
  }

  /** Reshard-movement audit, ring vs mod-N, growing `nShards` →
    * `nShardsAfter` (same vnode labels for surviving shards — the
    * consistent-hashing contract). One row: exact moved counts and
    * ppm for both schemes. Two map passes + one global agg; nothing
    * corpus-sized shuffles. */
  def reshardAudit(df: DataFrame, keyCol: String, nShards: Int,
      nShardsAfter: Int, vnodesPerShard: Int): DataFrame = {
    val before = assign(df, keyCol, nShards, vnodesPerShard, "shard_before")
      .drop("ring_pos")
    val both = assign(before, keyCol, nShardsAfter, vnodesPerShard,
      "shard_after")
    both.agg(
        count(lit(1)).as("n_keys"),
        sum(when(col("shard_before") =!= col("shard_after"), 1L)
          .otherwise(0L)).as("ring_moved"),
        sum(when(pmod(col(keyCol), lit(nShards.toLong)) =!=
            pmod(col(keyCol), lit(nShardsAfter.toLong)), 1L)
          .otherwise(0L)).as("mod_moved"))
      .select(col("n_keys"),
        col("ring_moved"),
        expr("ring_moved * 1000000L div n_keys").as("ring_moved_ppm"),
        col("mod_moved"),
        expr("mod_moved * 1000000L div n_keys").as("mod_moved_ppm"))
  }
}
