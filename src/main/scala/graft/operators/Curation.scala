package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus curation operators: quota sampling, token-budget
  * shard packing, and duplicate-representative election. These extend
  * the reference's capability surface (its closest analog is the
  * 300-strain scrape cap, Scraper.py:364-365 — a crude global quota)
  * toward what a 100 TB pre-training pipeline actually runs.
  *
  * Scale shape: every operator is a window over a BOUNDED partition
  * (stratum / source / duplicate group) — no global sorts, no driver
  * state. The only shuffle is the hash partition on the grouping key.
  */
object Curation {

  /** Deterministic scrambled ordering key: a fixed odd multiplier over
    * the id folded into [0, 2^31-1). Reduce-then-multiply keeps the
    * product < 2^63 for ANY bigint id (Spark 4 ANSI mode makes
    * overflow an error, and the same expression must run verbatim in
    * the DuckDB oracle). A keyed hash, not a RNG: sampling is
    * reproducible across runs, engines, and partitionings. */
  def scrambleKey(id: Column): Column =
    pmod(pmod(id, lit(2147483647L)) * lit(2654435761L), lit(2147483647L))

  /** Per-stratum quota sampling: keep at most `n` rows from each
    * stratum, chosen by the scrambled-id order (uniform-ish but fully
    * deterministic — the curation move "cap every (lang, source) cell
    * so no domain dominates the training mix").
    *
    * One hash shuffle on the strata; WindowGroupLimit prunes each
    * partition to its top-n BEFORE the exchange, so shuffle volume is
    * O(strata × n), not O(rows) — survives arbitrarily large strata. */
  def quotaSample(df: DataFrame, idCol: String, strata: Seq[String],
                  n: Int): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(scrambleKey(col(idCol)).asc, col(idCol).asc)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= n)
  }

  /** Data-mixture downsampling: scale every source toward a per-source
    * token budget. keep_rate(source) = min(1, budget / source_tokens),
    * and a document survives iff scrambleKey(id) < rate · (2^31-1) —
    * the deterministic keyed-hash coin every mixture re-weighting step
    * uses so reruns, engines, and partitionings agree row-for-row.
    * Expected kept tokens per source ≈ budget; oversampled sources
    * shrink, under-budget sources pass through whole.
    *
    * Shape: one tiny per-source aggregate broadcast back onto the
    * corpus — a map-side filter over the documents, no corpus shuffle.
    * This is the "mix web/books/code at chosen proportions" primitive
    * scaled by token mass rather than row count. */
  def mixtureSample(df: DataFrame, idCol: String, groupCol: String,
                    tokensCol: String, budget: Long): DataFrame = {
    val totals = df.groupBy(col(groupCol))
      .agg(sum(col(tokensCol)).as("grp_tokens"))
    df.join(broadcast(totals), groupCol)
      .withColumn("keep_rate",
        least(lit(1.0), lit(budget).cast("double") / col("grp_tokens")))
      .filter(scrambleKey(col(idCol)).cast("double")
        < col("keep_rate") * 2147483647.0)
  }

  /** Sliding-window chunking: cut each document's token sequence into
    * overlapping context-window chunks (window `w` tokens, stride `s`)
    * — the retrieval/pretraining prep step for models with a fixed
    * context. Chunk k covers tokens [k·s, k·s + w); starts run while
    * k·s < n_tokens, so tails shorter than the window are kept (and a
    * doc shorter than one window yields exactly one chunk).
    *
    * Map-side only: per-row array build + explode, no shuffle; chunk
    * count per doc is ceil(n/s), so output scales linearly. */
  def chunkWindows(df: DataFrame, idCol: String, textCol: String,
                   w: Int, s: Int): DataFrame = {
    val toks = split(lower(col(textCol)), " ")
    df.select(col(idCol), toks.as("toks"))
      .select(col(idCol), explode(
        // Column `/` is double division — floor() it back to the
        // integer chunk-start count (size >= 1, so never negative)
        transform(sequence(lit(0),
            floor((size(col("toks")) - 1) / s).cast("int")),
          k => struct(k.as("chunk_id"),
            concat_ws(" ", slice(col("toks"), k * s + 1, lit(w))).as("chunk_text"),
            size(slice(col("toks"), k * s + 1, lit(w))).as("n_chunk_tokens"))))
        .as("c"))
      .select(col(idCol), col("c.chunk_id"), col("c.chunk_text"),
        col("c.n_chunk_tokens"))
  }

  /** Token-budget shard packing: within each `groupCol` (a natural
    * corpus partition — source, date, crawl snapshot), lay documents
    * end-to-end in `orderCol` order and cut a new shard every `budget`
    * tokens: shard_id = floor(tokens-before-this-doc / budget). The
    * standard "pack documents into ~equal training shards" step.
    *
    * Contiguous first-fit, not bin-packing — deterministic, one pass,
    * and the per-group running sum is a partition-local window (never
    * the single-partition global-window trap). */
  def packByTokenBudget(df: DataFrame, groupCol: String, orderCol: String,
                        tokensCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("tokens_before",
        sum(col(tokensCol)).over(w) - col(tokensCol))
      .withColumn("shard_id", floor(col("tokens_before") / budget))
  }

  /** Per-group winsorization: clamp a numeric column into its group's
    * [lo, hi] exact-percentile band — the outlier-trimming pass run
    * before loss-weighting or feature normalization so a handful of
    * pathological rows can't dominate a statistic.
    *
    * Exact `percentile` (not approx) so the DuckDB oracle's
    * quantile_cont reproduces it bit-for-bit (same linear
    * interpolation — q41 pins this). Shape: one tiny per-group
    * percentile aggregate broadcast back onto the fact side; the facts
    * never shuffle. For corpora where groups are huge, swap in
    * percentile_approx and lose the oracle, not the shape. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                lo: Double, hi: Double): DataFrame = {
    val bands = df.groupBy(col(groupCol)).agg(
      expr(s"percentile($valueCol, $lo)").as("band_lo"),
      expr(s"percentile($valueCol, $hi)").as("band_hi"))
    df.join(broadcast(bands), groupCol)
      .withColumn(s"${valueCol}_winsorized",
        least(greatest(col(valueCol), col("band_lo")), col("band_hi")))
  }

  /** Per-group z-score normalization — the feature-standardization
    * pass before loss weighting / embedding comparison. Group moments
    * come from EXACT decimal sums (Σv, Σv² over DECIMAL(18,6)) so the
    * result is independent of partition/accumulation order and
    * bit-reproducible in the DuckDB oracle; the double arithmetic
    * after the casts follows one fixed operation order on both sides.
    * Shape: tiny per-group aggregate broadcast onto the facts — the
    * fact side never shuffles. */
  def zscore(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val d6 = col(valueCol).cast("decimal(18,6)")
    val stats = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_grp"),
      sum(d6).cast("double").as("s1"),
      sum(d6 * d6).cast("double").as("s2"))
    df.join(broadcast(stats), groupCol)
      .withColumn(s"${valueCol}_z",
        (col(valueCol) - col("s1") / col("n_grp")) /
          sqrt((col("s2") - col("s1") * col("s1") / col("n_grp"))
            / (col("n_grp") - 1)))
      .drop("n_grp", "s1", "s2")
  }

  /** Deterministic stratified train/val/test split with EXACT
    * per-stratum proportions: rows are ranked inside each stratum by
    * the scrambled-id order and cut at ⌊n·trainPct⌋ / ⌊n·(trainPct +
    * valPct)⌋. Purely integer arithmetic (rank·100 ≤ count·pct) so
    * there is no float-threshold edge to disagree on, and the same
    * document lands in the same split on every rerun, engine, and
    * partitioning — the property that keeps eval sets stable across
    * pipeline versions.
    *
    * One hash shuffle on the strata; the rank window is per-stratum. */
  def trainValTestSplit(df: DataFrame, idCol: String, strata: Seq[String],
                        trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val part = strata.map(col)
    val w = Window.partitionBy(part: _*)
      .orderBy(scrambleKey(col(idCol)).asc, col(idCol).asc)
    val cw = Window.partitionBy(part: _*)
    df.withColumn("_rn", row_number().over(w))
      .withColumn("_cnt", count(lit(1)).over(cw))
      .withColumn("split",
        when(col("_rn") * 100 <= col("_cnt") * trainPct, "train")
          .when(col("_rn") * 100 <= col("_cnt") * (trainPct + valPct), "val")
          .otherwise("test"))
      .drop("_rn", "_cnt")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis 2006):
    * each row draws a deterministic uniform u ∈ (0,1) from its id
    * ([[scrambleKey]] — a keyed hash, not an RNG, so reruns, engines,
    * and partitionings agree) and ranks by key = u^(1/w); the top `k`
    * keys ARE a weighted sample without replacement. The curation move
    * "pick k documents with probability proportional to length/quality"
    * made reproducible.
    *
    * The key is quantized to DECIMAL(18,9) before ranking (the q80
    * convention): pow() is not bit-specified across math libraries, and
    * the 1e-9 grid absorbs last-ulp JVM-vs-oracle noise; grid ties
    * break by id, deterministic on both sides.
    *
    * Scale shape: the keying is map-only; the global top-k compiles to
    * TakeOrderedAndProject — per-partition top-k heaps, only k rows per
    * partition ever reach the driver-side merge, never a global sort.
    * The final rank window orders k rows, not the corpus. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    val u = (scrambleKey(col(idCol)) + 1).cast("double") / 2147483648.0
    val key = pow(u, lit(1.0) / col(weightCol).cast("double"))
      .cast("decimal(18,9)")
    val top = df.withColumn("_key", key)
      .orderBy(col("_key").desc, col(idCol).asc)
      .limit(k)
    top.withColumn("sample_rank", row_number().over(
        Window.orderBy(col("_key").desc, col(idCol).asc)))
      .drop("_key")
  }

  /** One-pass corpus data card — the summary table a dataset release
    * ships (Gebru et al.'s datasheets, Dolma/ROOTS-style reports):
    * corpus size, source/language breadth, emptiness, exact-dup mass,
    * token totals and extremes, all as EXACT integers in one long
    * (metric, value) frame so it lands in any dashboard unpivoted.
    *
    * Scale shape: ONE aggregation over a single map-only derivation
    * pass (token counts bound once, distinct counts as partial
    * aggregates) then a literal unpivot of the 1-row result — no
    * joins, no windows, one shuffle.
    *
    * Output: (metric, value) — n_docs, n_sources, n_langs,
    * n_empty_docs, total_tokens, total_chars, distinct_texts,
    * exact_dup_docs (= n_docs − distinct normalized texts),
    * mean_tokens_ppm, max_tokens, min_tokens. */
  def corpusReport(docs: DataFrame, idCol: String, textCol: String,
                   langCol: String, sourceCol: String): DataFrame = {
    val t = docs.select(
      size(filter(split(lower(col(textCol)), " "), w => w =!= ""))
        .cast("long").as("n_toks"),
      length(col(textCol)).cast("long").as("n_chars"),
      col(langCol).as("lang"), col(sourceCol).as("source"),
      lower(col(textCol)).as("norm"))
    val agg = t.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"),
      sum(when(col("n_toks") === 0, 1L).otherwise(0L))
        .as("n_empty_docs"),
      sum(col("n_toks")).as("total_tokens"),
      sum(col("n_chars")).as("total_chars"),
      countDistinct(col("norm")).as("distinct_texts"),
      max(col("n_toks")).as("max_tokens"),
      min(col("n_toks")).as("min_tokens"))
    val metrics = Seq(
      "n_docs", "n_sources", "n_langs", "n_empty_docs",
      "total_tokens", "total_chars", "distinct_texts", "max_tokens",
      "min_tokens")
    agg
      .withColumn("exact_dup_docs",
        col("n_docs") - col("distinct_texts"))
      .withColumn("mean_tokens_ppm", expr(
        """CAST(CASE WHEN n_docs > 0
           THEN 1000000 * total_tokens DIV n_docs
           ELSE CAST(0 AS BIGINT) END AS BIGINT)"""))
      .select(explode(array(
        (metrics ++ Seq("exact_dup_docs", "mean_tokens_ppm")).map(m =>
          struct(lit(m).as("metric"), col(m).cast("long").as("value"))
        ): _*)).as("kv"))
      .select(col("kv.metric"), col("kv.value"))
  }

  /** Length-sorted batching padding audit — the "how much GPU time is
    * padding" readout that decides a training loader's batching
    * strategy: sort documents by token length (globally — the
    * [[globalRowIds]] range-partition ordinal, no single-partition
    * window), form consecutive batches of `batchSize`, and report per
    * batch the exact integer padding waste (batchSize·max_len −
    * Σ len; ragged final batch uses its actual size). Length-sorted
    * batching is the standard 30–60% padding saving over arrival
    * order; this operator measures the number on YOUR corpus instead
    * of asserting the folklore.
    *
    * Scale shape: one tokenize pass (map-only), the globalRowIds
    * ordinal machinery, one map-side-combined groupBy(batch) — the
    * batch id is a pure function of the ordinal, so batches are
    * contiguous in the sorted order by construction.
    *
    * Output: (batch, n_docs, max_len, sum_len, padding, padding_ppm)
    * — padding_ppm = 10⁶·padding DIV (n_docs·max_len), 0 for
    * all-empty batches. */
  def paddingAudit(docs: DataFrame, idCol: String, textCol: String,
                   batchSize: Int): DataFrame = {
    require(batchSize >= 1)
    val lens = docs.select(col(idCol).cast("long").as("doc_id"),
      size(filter(split(lower(col(textCol)), " "), w => w =!= ""))
        .cast("long").as("len"))
    globalRowIds(lens, Seq("len", "doc_id"))
      .select(col("len"),
        expr(s"(global_id - 1) DIV $batchSize").as("batch"))
      .groupBy("batch")
      .agg(count(lit(1)).as("n_docs"), max("len").as("max_len"),
        sum("len").as("sum_len"))
      .withColumn("padding",
        col("n_docs") * col("max_len") - col("sum_len"))
      .withColumn("padding_ppm", expr(
        """CAST(CASE WHEN n_docs * max_len > 0
           THEN 1000000 * padding DIV (n_docs * max_len)
           ELSE CAST(0 AS BIGINT) END AS BIGINT)"""))
  }

  /** Contiguous global row ids in `orderCols` order, WITHOUT the
    * single-partition window trap: `row_number() OVER (ORDER BY ...)`
    * with no PARTITION BY collapses the whole dataset onto one task,
    * which is exactly what cannot happen at corpus scale. Instead:
    * range-partition on the order columns (a sampled, ordered
    * partitioning — partition i holds keys strictly below partition
    * i+1), sort within partitions, then zip indices per partition and
    * shift each partition by the total count of the partitions before
    * it (`zipWithIndex` — one tiny count job of one long per
    * partition, then a map-only assign). Ids start at 1 and are
    * independent of the partition count: they're a pure function of
    * the total order, which `orderCols` must make unique.
    *
    * The genuine per-partition imperative step (carry a running
    * counter) is the sanctioned RDD case; everything before it is
    * declarative. The sorted input is persisted across zipWithIndex's
    * two passes and eagerly checkpointed out so the cache releases
    * before return (the q19 convention). */
  def globalRowIds(df: DataFrame, orderCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val ordered = df
      .repartitionByRange(orderCols.map(col(_).asc): _*)
      .sortWithinPartitions(orderCols.map(col(_).asc): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val schema = org.apache.spark.sql.types.StructType(
        ordered.schema.fields :+ org.apache.spark.sql.types.StructField(
          "global_id", org.apache.spark.sql.types.LongType, nullable = false))
      val rows = ordered.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
      }
      spark.createDataFrame(rows, schema).localCheckpoint()
    } finally ordered.unpersist(false)
  }

  /** GLOBAL dense ranks in `orderCols` order over rows whose keys MAY
    * tie (ties share a rank; ranks are 1..#distinct with no gaps) —
    * `dense_rank() OVER (ORDER BY …)` without the single-partition
    * window, and without the distinct → [[globalRowIds]] → join-back
    * detour the suffix-array rounds used to take (three extra
    * corpus-sized exchanges per round). Two-phase, one exchange:
    * range-partition + sort on the keys, then (1) a stats pass
    * collecting per-partition (first key, last key, #distinct) — one
    * tiny row per partition — so the driver can compute each
    * partition's rank base, SPLICING tie groups that straddle a range
    * boundary (equal keys may land on both sides of a cut; the
    * continuation must not open a new rank); (2) a map pass carrying
    * a running dense counter from the partition's base. Output ranks
    * are a pure function of the total order — deterministic under any
    * partitioning, which the partition-invariance specs rely on.
    *
    * Returns (ranked frame with a `global_rank` column, #distinct
    * keys) — the count is a free by-product the prefix-doubling
    * early-exit needs (it used to be a separate count job per round).
    * Eagerly checkpointed; cache released (the globalRowIds
    * convention). */
  private[graft] def globalDenseRanksWithCount(
      df: DataFrame, orderCols: Seq[String]): (DataFrame, Long) = {
    val spark = df.sparkSession
    val ordered = df
      .repartitionByRange(orderCols.map(col(_).asc): _*)
      .sortWithinPartitions(orderCols.map(col(_).asc): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val keyIdx = orderCols.map(ordered.schema.fieldIndex).toArray
      val stats = ordered.rdd.mapPartitionsWithIndex { (pid, it) =>
        var first: Seq[Any] = null
        var last: Seq[Any] = null
        var n = 0L
        it.foreach { r =>
          val k = keyIdx.toSeq.map(r.get)
          if (first == null) first = k
          if (k != last) { n += 1; last = k }
        }
        Iterator.single((pid, first, last, n))
      }.collect().sortBy(_._1)
      // driver: rank base per partition; a partition whose first key
      // equals the nearest non-empty predecessor's last key continues
      // that tie group instead of opening a new rank
      val bases = new Array[Long](stats.length)
      var runningBase = 0L
      var prevLast: Seq[Any] = null
      stats.foreach { case (pid, first, last, n) =>
        val continues = first != null && first == prevLast
        bases(pid) = if (continues) runningBase - 1 else runningBase
        runningBase = bases(pid) + n
        if (last != null) prevLast = last
      }
      val total = runningBase
      val schema = org.apache.spark.sql.types.StructType(
        ordered.schema.fields :+ org.apache.spark.sql.types.StructField(
          "global_rank", org.apache.spark.sql.types.LongType,
          nullable = false))
      val basesB = spark.sparkContext.broadcast(bases)
      val rows = ordered.rdd.mapPartitionsWithIndex { (pid, it) =>
        var dense = basesB.value(pid)
        var prev: Seq[Any] = null
        it.map { r =>
          val k = keyIdx.toSeq.map(r.get)
          if (k != prev) { dense += 1; prev = k }
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ dense)
        }
      }
      (spark.createDataFrame(rows, schema).localCheckpoint(), total)
    } finally ordered.unpersist(false)
  }

  /** Scalable GLOBAL running sum of a bigint column in `orderCol`
    * order — `sum() OVER (ORDER BY …)` without the single-partition
    * window: range-partition by the (unique) order key, per-partition
    * running sums in one pass, then add the collected partition
    * totals as offsets (the classic two-phase prefix scan; the
    * driver sees #partitions longs, nothing more). The same
    * sanctioned-RDD shape as [[globalRowIds]], with the cache
    * released behind an eager checkpoint.
    *
    * The order key must be UNIQUE: rows sharing a key could land on
    * either side of a range boundary, and their within-tie prefix
    * order would then depend on the range sampler. */
  def globalCumsum(df: DataFrame, orderCol: String,
                   valueCol: String): DataFrame =
    globalCumsums(df, orderCol, Seq(valueCol -> "cum"))

  /** [[globalCumsum]] over SEVERAL bigint columns in one pass — the
    * same two-phase prefix scan, carrying one running counter per
    * value column (a PR-curve sweep needs cumulative n AND n_pos in
    * the same order; two separate scans would sort twice). Each
    * `(valueCol, outName)` pair appends `outName` holding the running
    * sum of `valueCol`; the driver sees #partitions × #cols longs. */
  def globalCumsums(df: DataFrame, orderCol: String,
                    cols: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    val ordered = df
      .repartitionByRange(col(orderCol).asc)
      .sortWithinPartitions(col(orderCol).asc)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val vis = cols.map { case (v, _) => ordered.schema.fieldIndex(v) }.toArray
      val nc = vis.length
      val partSums = ordered.rdd
        .mapPartitionsWithIndex { (pi, it) =>
          val s = new Array[Long](nc)
          it.foreach { r =>
            var c = 0; while (c < nc) { s(c) += r.getLong(vis(c)); c += 1 } }
          Iterator((pi, s))
        }.collect().sortBy(_._1).map(_._2)
      // offsets(pi)(c) = sum of column c strictly before partition pi
      val offsets = partSums.scanLeft(new Array[Long](nc)) { (acc, p) =>
        Array.tabulate(nc)(c => acc(c) + p(c))
      }
      val schema = org.apache.spark.sql.types.StructType(
        ordered.schema.fields ++ cols.map { case (_, out) =>
          org.apache.spark.sql.types.StructField(
            out, org.apache.spark.sql.types.LongType, nullable = false) })
      val rows = ordered.rdd.mapPartitionsWithIndex { (pi, it) =>
        val s = offsets(pi).clone()
        it.map { r =>
          var c = 0; while (c < nc) { s(c) += r.getLong(vis(c)); c += 1 }
          org.apache.spark.sql.Row.fromSeq(r.toSeq ++ s) }
      }
      spark.createDataFrame(rows, schema).localCheckpoint()
    } finally ordered.unpersist(false)
  }

  /** GPT-style context packing: concatenate the corpus in `idCol`
    * order and split into fixed `budget`-token context windows; per
    * document report its token count, running end position, first
    * and last window, and whether it straddles a window boundary
    * (the packing-efficiency signal — straddling docs get truncated
    * or bridged by attention masking, so curation tracks the rate).
    * Pure integer arithmetic off the [[globalCumsum]] prefix scan:
    * start_w = (cum − n) div B, end_w = (cum − 1) div B. */
  def contextPack(docs: DataFrame, idCol: String, textCol: String,
                  budget: Int): DataFrame = {
    val counted = docs.select(col(idCol),
      size(split(col(textCol), " ")).cast("long").as("n_tokens"))
    globalCumsum(counted, idCol, "n_tokens")
      .withColumn("start_w", expr(s"(cum - n_tokens) div $budget"))
      .withColumn("end_w", expr(s"(cum - 1) div $budget"))
      .withColumn("straddles", col("start_w") =!= col("end_w"))
  }

  /** End-to-end corpus curation — the composed "user story" the
    * individual operators exist for: quality-gate → exact-dedup →
    * blocklist → context-pack, emitting one row per INPUT document
    * with its disposition, so the audit trail ("why is doc X not in
    * the training set?") is a first-class output rather than a diff
    * of intermediate frames.
    *
    * Disposition precedence (first failure wins, mirroring pipeline
    * stage order): 'short' (token count < minTokens), 'duplicate'
    * (not the min-id owner of its normalized text), 'blocked'
    * (contains a blocklist term), else 'kept'. Kept docs get their
    * [[contextPack]] window span; dropped docs carry NULL spans.
    *
    * Scale shape = the union of its parts, nothing more: one map
    * pass for tokens/blocklist, one hash groupBy for the dedup
    * keeper (normalized-text xxhash64, min doc_id — first-write-wins
    * made order-deterministic), the two-phase prefix scan for
    * packing over the kept subset, and a final left join of spans
    * back onto the audit frame. */
  def corpusPipeline(docs: DataFrame, idCol: String, textCol: String,
                     minTokens: Int, blocklist: Seq[String],
                     budget: Int): DataFrame = {
    val norm = lower(col(textCol))
    val base = docs.select(col(idCol), col(textCol),
      size(split(norm, " ")).cast("long").as("n_tokens"),
      xxhash64(norm).as("_nk"),
      (size(array_intersect(array_distinct(split(norm, " ")),
        array(blocklist.map(t => lit(t.toLowerCase)): _*))) > 0)
        .as("_blocked"))
    // keeper election happens AFTER the quality gate (stage order):
    // a short copy cannot suppress a surviving twin. Blocked docs DO
    // compete (dedup precedes the blocklist stage), so a duplicate of
    // a later-blocked keeper still reads 'duplicate' — exactly what a
    // sequential pipeline would have done.
    val keepers = base.filter(col("n_tokens") >= minTokens)
      .groupBy("_nk").agg(min(col(idCol)).as("_keeper"))
    val judged = base.join(keepers, Seq("_nk"), "left")
      .withColumn("disposition",
        when(col("n_tokens") < minTokens, lit("short"))
          .when(col(idCol) =!= col("_keeper"), lit("duplicate"))
          .when(col("_blocked"), lit("blocked"))
          .otherwise(lit("kept")))
    val packed = contextPack(
        judged.filter(col("disposition") === "kept")
          .select(col(idCol), col(textCol)),
        idCol, textCol, budget)
      .select(col(idCol), col("start_w"), col("end_w"))
    judged.join(packed, Seq(idCol), "left")
      .select(col(idCol), col("disposition"), col("n_tokens"),
        col("start_w"), col("end_w"))
  }

  /** Scalable global ntile: SQL's `ntile(k) OVER (ORDER BY ...)` —
    * without the single-partition window that global ORDER BY
    * normally plans. Rides [[globalRowIds]] (range partition +
    * per-partition zipWithIndex) and computes the bucket from the
    * 1-based global id in closed form: with n = q·k + r, the first r
    * buckets hold q+1 rows. Bit-identical to the window ntile
    * (spec-pinned), but every stage is partition-parallel.
    */
  def scalableNtile(df: DataFrame, orderCols: Seq[String], k: Int,
      outCol: String): DataFrame = {
    val withId = globalRowIds(df, orderCols)
    val n = withId.count() // materialized by globalRowIds; cheap scalar
    val q = n / k
    val r = n % k
    val i = col("global_id")
    val bucket =
      when(i <= lit(r * (q + 1)),
        floor((i - 1) / lit(q + 1)))
        .otherwise(lit(r) + floor((i - lit(r * (q + 1)) - 1) /
          lit(math.max(q, 1L))))
    withId.withColumn(outCol, (bucket + 1).cast("int")).drop("global_id")
  }

  /** Blocklist screen: per document, the sorted distinct blocklist
    * terms it contains (as one comma-joined string — scalar output,
    * the driver-comparator convention) plus hit count and flag. The
    * unsafe-content / licensing-string screen every curation pipeline
    * runs before training.
    *
    * Scale shape: the blocklist is a LITERAL array, so the whole
    * screen is one map-side `array_intersect` against the per-row
    * distinct word set — zero shuffles, zero joins, and the corpus
    * never moves. (For blocklists too big for a literal, the same
    * screen is the broadcast semi-join of [[Dedup.decontaminate]].) */
  def blocklistFlag(docs: DataFrame, idCol: String, textCol: String,
                    terms: Seq[String]): DataFrame = {
    val hits = array_sort(array_intersect(
      array_distinct(split(lower(col(textCol)), " ")),
      array(terms.map(t => lit(t.toLowerCase)): _*)))
    docs.select(col(idCol), hits.as("hs"))
      .select(col(idCol), size(col("hs")).as("n_hits"),
        concat_ws(",", col("hs")).as("matched"))
      .withColumn("flagged", col("n_hits") > 0)
  }

  /** Deterministic round-robin interleave across sources: the
    * training-order schedule that spreads every source evenly through
    * the epoch instead of concatenating corpora (mixing order shapes
    * early-training gradients; round-robin is the canonical
    * degenerate-free default). Row r of source s lands at global
    * position rank((r, s)) in (round, source) lexicographic order —
    * i.e. round 1 of every source first, then round 2, sources
    * alternating within each round.
    *
    * Scale shape: the per-source round number is a partitioned
    * window (shuffle by source); the global position rides
    * [[globalRowIds]] (range-partition + per-partition zipWithIndex),
    * NOT a single-partition global window — the same machinery as
    * [[scalableNtile]], so every stage stays partition-parallel at
    * corpus scale. */
  def interleaveOrder(df: DataFrame, sourceCol: String,
                      idCol: String): DataFrame = {
    val byRound = df
      .withColumn("round", row_number().over(
        Window.partitionBy(col(sourceCol)).orderBy(col(idCol))))
    globalRowIds(byRound, Seq("round", sourceCol))
      .withColumnRenamed("global_id", "global_pos")
  }

  /** Duplicate-representative election: among rows sharing `keyCol`
    * (an exact-dup text key or a resolved near-dup cluster id), keep
    * the one with the highest `scoreCol` (ties → smallest `idCol`).
    * The curation step after dedup detection: "of these N copies,
    * which single document enters the corpus?" — by quality, not by
    * arrival order (contrast the reference's keep-first-seen upsert,
    * Scraper.py:409-412). */
  def electRepresentatives(df: DataFrame, keyCol: String, idCol: String,
                           scoreCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .withColumn("dup_count", count(lit(1)).over(
        Window.partitionBy(col(keyCol))))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Fixed-stride token chunking (the RAG / context-window sharding
    * step): cut each document's whitespace tokens into windows of
    * `width` tokens starting every `stride` tokens (width > stride ⇒
    * overlapping context, width < stride ⇒ gapped sampling). A chunk
    * is emitted for every start index inside the document, so the
    * tail is covered by a (possibly shorter) final chunk; an empty
    * document yields one empty chunk, keeping the per-document row
    * contract total.
    *
    * Output: (doc_id, chunk_id, chunk_start, n_chunk_toks,
    * chunk_text) — chunk_start = chunk_id · stride in token units.
    *
    * Scale shape: map-only (sequence + explode + slice — the
    * [[Dedup.shingleRows]] kernel with a stride), no shuffle;
    * ~n/stride output rows per n-token document. */
  def tokenChunks(docs: DataFrame, idCol: String, textCol: String,
                  width: Int, stride: Int): DataFrame = {
    require(width >= 1 && stride >= 1,
      s"tokenChunks needs width/stride >= 1, got width=$width stride=$stride")
    val toks = filter(split(lower(col(textCol)), " "), w => w =!= "")
    docs.select(col(idCol).as("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0),
          greatest(floor((size(col("toks")) - 1) / stride).cast("int"),
            lit(0)))).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * stride).cast("int").as("chunk_start"),
        slice(col("toks"), col("chunk_id") * stride + 1, lit(width))
          .as("ctoks"))
      .select(col("doc_id"), col("chunk_id"), col("chunk_start"),
        size(col("ctoks")).as("n_chunk_toks"),
        concat_ws(" ", col("ctoks")).as("chunk_text"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling", restated in
    * exact integer arithmetic): hashed-unigram counts in a TARGET
    * slice vs the RAW corpus give per-feature importance ratios, and
    * each document scores the sum of its tokens' ratios — the signal
    * for "pick raw-corpus documents that look like the target
    * domain". Ratios are Laplace-smoothed and fixed-point scaled,
    * w(f) = ((n_target(f)+1) · 10⁶) DIV (n_raw(f)+1), all BIGINT
    * (safe while per-feature counts stay < ~9·10¹² — hold buckets
    * accordingly at scale), so the score is exact in any engine; the
    * hash is the [[TextAnalysis.linearScore]] polynomial char fold
    * mod 1e9+7, SQL-replayable.
    *
    * Output: (doc_id, n_toks, score_scaled, avg_w_scaled).
    *
    * Scale shape: one token explode feeding a BOUNDED feature
    * aggregation (≤ `buckets` rows, broadcast back — no second big
    * shuffle) and one map-side-combined per-doc sum. The target flag
    * rides the token rows, so target and raw counts come out of the
    * same single aggregation. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, buckets: Int): DataFrame = {
    val P = 1000000007L
    def bucket(w: Column): Column = {
      val h = org.apache.spark.sql.graft.CharFoldHash.column(w) // native fold, bit-pinned (NativeExprSpec)
      pmod(h, lit(buckets.toLong))
    }
    val toks = docs.select(col(idCol).as("doc_id"), isTarget.as("is_t"),
        explode(filter(split(lower(col(textCol)), " "), w => w =!= ""))
          .as("w"))
      .select(col("doc_id"), col("is_t"), bucket(col("w")).as("f"))
    val feats = toks.groupBy("f")
      .agg(count(lit(1)).as("n_raw"),
        count(when(col("is_t"), 1)).as("n_t"))
      .select(col("f"),
        expr("CAST(((n_t + 1) * 1000000) DIV (n_raw + 1) AS BIGINT)")
          .as("w_scaled"))
    toks.join(broadcast(feats), Seq("f"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        sum(col("w_scaled")).as("score_scaled"))
      .select(col("doc_id"), col("n_toks").cast("int").as("n_toks"),
        col("score_scaled"),
        expr("CAST(score_scaled DIV n_toks AS BIGINT)").as("avg_w_scaled"))
  }

  /** Exact integer square root, isqrt(n) = ⌊√n⌋ for n ≥ 0: seed with
    * the double sqrt, then correct ±1 in INTEGER comparisons — the
    * float seed is within 1 of the truth for any bigint, and the
    * correction makes the result engine-independent (a bare
    * floor(sqrt(n)) can land on either side of a perfect square
    * depending on the libm rounding of sqrt). The +1 probe squares
    * isqrt(n)+1, so n must stay below ~2⁶³ − 6·10⁹ (ANSI overflow
    * otherwise) — row counts never get there. */
  def isqrt(n: Column): Column = {
    val a = floor(sqrt(n.cast("double"))).cast("long")
    val down = a - when(a * a > n, 1L).otherwise(0L)
    down + when((down + 1) * (down + 1) <= n, 1L).otherwise(0L)
  }

  /** Temperature-scaled source sampling (the multilingual α-sampling
    * move, α = 1/2): a corpus-wide budget of `budget` documents is
    * apportioned across sources with weight w_i = isqrt(n_i) — up-
    * weighting small sources relative to proportional sampling, the
    * standard fix for head-domain dominance in a training mix — and
    * each source then keeps its quota's worth of documents in
    * [[scrambleKey]] order.
    *
    * The apportionment is EXACT largest-remainder (Hamilton): base_i
    * = ⌊B·w_i / W⌋, and the leftover B − Σ base_i goes one-each to
    * the largest remainders (B·w_i mod W), ties to the smaller
    * source name — so Σ quota_i = min(B, achievable) with no float
    * rounding, bit-reproducible in any engine. A source with fewer
    * rows than its quota keeps everything (quota is a cap, not a
    * target; the shortfall is NOT redistributed — one pass, as a
    * production mixer runs it).
    *
    * Scale shape: per-source counts are one map-side-combined
    * aggregate (≤ #sources rows); the apportionment windows run over
    * that bounded frame; the quota table broadcasts back. The
    * per-group quota is data-dependent, so the rank window first
    * filters on the LITERAL bound `budget` (quota ≤ budget always) —
    * that constant limit is what WindowGroupLimit prunes on, capping
    * each group's surviving rows at `budget` before the exact
    * per-source `quota` filter lands.
    *
    * Output: kept rows as (id, group, samp_rank, quota). */
  def alphaQuotaSample(df: DataFrame, idCol: String, groupCol: String,
                       budget: Long): DataFrame = {
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("w", isqrt(col("n_rows")))
    // Bounded frame (one row per source): global windows are fine here.
    val wAll = Window.partitionBy()
    val wRem = Window.partitionBy()
      .orderBy(pmod(lit(budget) * col("w"), col("wsum")).desc,
        col(groupCol).asc)
    val quotas = counts
      .withColumn("wsum", sum(col("w")).over(wAll))
      .withColumn("base",
        expr(s"CAST($budget * w DIV wsum AS BIGINT)"))
      .withColumn("leftover", lit(budget) - sum(col("base")).over(wAll))
      .withColumn("rem_rank", row_number().over(wRem))
      .withColumn("quota",
        col("base") + when(col("rem_rank") <= col("leftover"), 1L)
          .otherwise(0L))
      .select(col(groupCol), col("quota"))
    val wGrp = Window.partitionBy(col(groupCol))
      .orderBy(scrambleKey(col(idCol)).asc, col(idCol).asc)
    df.select(col(idCol), col(groupCol))
      .withColumn("samp_rank", row_number().over(wGrp))
      .filter(col("samp_rank") <= budget) // literal → WindowGroupLimit
      .join(broadcast(quotas), groupCol :: Nil)
      .filter(col("samp_rank") <= col("quota"))
  }

  /** Stratified k-fold assignment (cross-validation prep): within
    * each stratum, rows ordered by the [[scrambleKey]] deterministic
    * shuffle take folds round-robin, fold = (rank − 1) mod k — so
    * every stratum's rows split across folds as evenly as integers
    * allow (fold sizes within a stratum differ by ≤ 1), and the
    * assignment is reproducible across runs, engines, and
    * partitionings.
    *
    * Scale shape: one hash shuffle on the strata and a per-stratum
    * row_number — no global ordering, no driver state.
    *
    * Output: input columns + fold ∈ [0, k). */
  def stratifiedKFold(df: DataFrame, idCol: String, strata: Seq[String],
                      k: Int): DataFrame = {
    require(k >= 2, s"stratifiedKFold needs k >= 2, got $k")
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(scrambleKey(col(idCol)).asc, col(idCol).asc)
    df.withColumn("fold",
      pmod(row_number().over(w) - 1, lit(k)).cast("int"))
  }

  /** Train/test split-leakage audit — the eval-hygiene pass run after
    * any random split: near-duplicate document pairs that STRADDLE a
    * [[trainValTestSplit]] boundary are exactly the pairs that let a
    * model "memorize" its way to inflated held-out numbers. Composes
    * the split assignment with the lossless prefix-filtered Jaccard
    * join ([[Dedup.prefixJaccardPairs]], q147's kernel) and keeps the
    * cross-split pairs; `leaks_train` marks the actionable subset
    * (one side trains, the other evaluates → drop the eval side or
    * re-split).
    *
    * Scale shape: the pair join is the q147 bucketed kernel (no
    * all-pairs); the surviving pair set is USUALLY far smaller than
    * the corpus, but on templated corpora it is inherently quadratic
    * (prefixJaccardPairs' own caveat) — so the split-label joins are
    * NOT hint-forced to broadcast (round-7 fix: a forced
    * `broadcast(pairs)` would OOM the driver exactly when the audit
    * matters most). AQE sizes the built side at runtime: small pair
    * sets still broadcast, pathological ones fall back to a shuffle
    * join and complete.
    *
    * Output: (a, b, common, jaccard, split_a, split_b, leaks_train),
    * cross-split pairs only. */
  def splitLeakage(docs: DataFrame, idCol: String, textCol: String,
                   strata: Seq[String], n: Int,
                   thresholdNum: Int, thresholdDen: Int): DataFrame = {
    val splits = trainValTestSplit(docs, idCol, strata)
      .select(col(idCol).cast("long").as("sid"), col("split"))
    val pairs = graft.operators.Dedup.prefixJaccardPairs(
      docs, idCol, textCol, n, thresholdNum, thresholdDen)
    pairs
      .join(splits.select(col("sid").as("a"), col("split").as("split_a")),
        Seq("a"))
      .join(splits.select(col("sid").as("b"), col("split").as("split_b")),
        Seq("b"))
      .filter(col("split_a") =!= col("split_b"))
      .withColumn("leaks_train",
        col("split_a") === "train" || col("split_b") === "train")
  }

  /** Greedy maximum-coverage selection (Nemhauser–Wolsey–Fisher 1978):
    * pick k documents that together cover the most DISTINCT word
    * n-gram shingles — each round selects the document adding the
    * most not-yet-covered shingles. Coverage is a monotone submodular
    * objective, so this greedy is the classic (1 − 1/e)-approximation;
    * it's the standard "small seed corpus with maximal vocabulary
    * breadth" selector for tokenizer training and eval-set
    * construction — the lexical counterpart of the embedding-space
    * [[graft.operators.Coreset]]. The shingle order n is the coverage
    * granularity knob (n = 1 is plain vocabulary coverage; small-
    * vocabulary corpora need n ≥ 2 for the objective to discriminate).
    *
    * Scale shape — lazy greedy (Minoux 1978) with an exactness
    * certificate: ONE corpus pass aggregates per-doc (distinct count,
    * token set) and TakeOrdered-collects the top `candidatePool` docs
    * by initial count; the k rounds then run LOCALLY over those sets.
    * A local round is provably the true greedy pick whenever its gain
    * strictly exceeds the pool's minimum initial count: an uncollected
    * doc's round-r gain is at most its initial count (coverage gain is
    * monotone non-increasing as the covered set grows), which is at
    * most that minimum. If the certificate ever fails — or ties make
    * the doc-id tie-break ambiguous against uncollected docs — the
    * remaining rounds fall back to the distributed anti-join + groupBy
    * + TakeOrdered(1) loop, so the result is bit-identical either way.
    * Driver state is bounded by candidatePool · maxDocShingles (the
    * documented doc-length cap convention), plus the k picked rows.
    * At 100 TB the happy path is one exchange + one bounded collect
    * instead of k+1 corpus-wide passes. Ties on the argmax break to
    * the smaller doc id, so every pick is oracle-replayable with the
    * rounds unrolled as CTEs.
    *
    * Early stop: a round whose best gain would be 0 (or an exhausted
    * corpus) ends the selection — further picks could only add
    * fully-covered documents. Output: (pick_round, doc_id, gain,
    * covered_total) where covered_total is the running distinct-token
    * coverage (Σ gains — exact, since a gain counts only new tokens). */
  def greedyMaxCoverage(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, k: Int,
                        candidatePool: Int = 512): DataFrame = {
    require(k >= 1, s"greedyMaxCoverage: k must be >= 1, got $k")
    require(n >= 1, s"greedyMaxCoverage: n must be >= 1, got $n")
    val spark = docs.sparkSession
    import spark.implicits._
    // shinglePostings binds words(text) to an attribute BEFORE the
    // n-gram lambda — inlining words() re-splits the text per element
    // (the shingleHashArr re-evaluation hazard; measured 4 s → 0.3 s
    // on this builder at sf0.1). Per-doc arrays are already distinct,
    // so (doc_id, token) needs no cross-doc distinct shuffle.
    val toks = graft.operators.Dedup.shinglePostings(
        docs.select(col(idCol).cast("long").as("doc_id"),
          col(textCol)), "doc_id", textCol, n)
      .withColumnRenamed("shingle", "token")

    // ONE distributed pass: top-candidatePool docs by initial distinct
    // count, WITH their token sets (collect_list is enough — per-doc
    // tokens are already distinct). TakeOrderedAndProject bounds the
    // collect at candidatePool rows.
    val pool = toks.groupBy("doc_id")
      .agg(count(lit(1)).as("cnt"), collect_list(col("token")).as("ts"))
      .orderBy(col("cnt").desc, col("doc_id").asc)
      .limit(candidatePool)
      .collect()
      .map(row => (row.getLong(0), row.getLong(1),
        row.getSeq[String](2).toSet))
    // all docs collected → the local greedy IS the greedy; otherwise
    // certify each round against the pool's minimum initial count
    val allCollected = pool.length < candidatePool
    val cMin = if (pool.isEmpty) 0L else pool.last._2

    var picked = Vector.empty[Long]
    var picks = Vector.empty[(Int, Long, Long, Long)]
    var covered = Set.empty[String]
    var total = 0L
    var r = 1
    var done = false
    var certified = true
    while (r <= k && !done && certified) {
      val gains = pool.iterator
        .filterNot(p => picked.contains(p._1))
        .map(p => (p._1, (p._3 diff covered).size.toLong, p._3))
      val best = gains.foldLeft(Option.empty[(Long, Long, Set[String])]) {
        case (acc, g) => acc match {
          case Some(b) if b._2 > g._2 ||
            (b._2 == g._2 && b._1 < g._1) => acc
          case _ => Some(g)
        }
      }
      best match {
        case Some((doc, gain, ts)) if gain > 0 &&
            (allCollected || gain > cMin) =>
          // strict > cMin: an uncollected doc can tie at cMin with a
          // smaller id, so equality is not certifiable locally
          total += gain
          picked :+= doc
          picks :+= ((r, doc, gain, total))
          covered = covered union ts
          r += 1
        case Some(_) if !allCollected => certified = false
        // an exhausted INCOMPLETE pool must route to the distributed
        // fallback, not terminate: today the pool's minimum-count doc
        // can never pass the strict `gain > cMin` certificate, so this
        // arm is unreachable — but that invariant is implicit, and a
        // future certificate tweak must not silently truncate picks
        case None if !allCollected => certified = false
        case _ => done = true // nothing (collectable) can add coverage
      }
    }

    // fallback: the distributed rounds, resuming from the certified
    // prefix (covered = exactly the picked docs' tokens, re-derived
    // from toks by an isin filter — AQE broadcasts the tiny side)
    if (!certified) {
      val toksM = toks.localCheckpoint()
      done = false
      while (r <= k && !done) {
        val remaining =
          if (picked.isEmpty) toksM
          else toksM.join(
            toksM.filter(col("doc_id").isin(picked: _*)).select("token"),
            Seq("token"), "left_anti")
        val best = remaining
          .groupBy("doc_id").agg(count(lit(1)).as("gain"))
          .orderBy(col("gain").desc, col("doc_id").asc)
          .limit(1).collect()
        if (best.isEmpty) done = true
        else {
          val doc = best.head.getLong(0)
          val gain = best.head.getLong(1)
          total += gain
          picked :+= doc
          picks :+= ((r, doc, gain, total))
          r += 1
        }
      }
    }
    picks.toDF("pick_round", "doc_id", "gain", "covered_total")
  }

  /** Greedy sequential sequence packing (round 13) — the
    * training-batch packing pass every tokenized corpus goes through
    * before the trainer sees it: within each stratum, documents in id
    * order fill fixed-`capacity` sequences FIRST-FIT-SEQUENTIALLY — a
    * document that would overflow the current (non-empty) sequence
    * opens the next one; a document longer than the capacity gets a
    * sequence of its own (truncation is the tokenizer's concern, not
    * the packer's). Deterministic by construction: the fold order is
    * (stratum, id asc) and the rule has no ties.
    *
    * The fold is ORDER-DEPENDENT and does not decompose associatively
    * (the current fill is carried state), so it runs per stratum as
    * one bounded object-island fold over the id-sorted struct list —
    * the qEwma/greedy-match convention: groups are stratum-sized,
    * nothing orders globally, and the oracle replays the identical
    * recurrence as a recursive CTE.
    *
    * Output: one row per document —
    * (strataCol, idCol, len, seq_id, seq_offset), seq_id 0-based per
    * stratum, seq_offset the fill before this document.
    *
    * Strata are bounded at [[MaxStratumRows]] (the UnigramSegment
    * ≤5M broadcast-collect convention): a 100 TB run with an
    * over-sized stratum fails LOUDLY with a pointer at
    * [[packSequencesSegmented]] instead of OOMing one task. */
  def packSequences(docs: DataFrame, idCol: String, lenCol: String,
                    strataCol: String, capacity: Long): DataFrame =
    packSequences(docs, idCol, lenCol, strataCol, capacity, MaxStratumRows)

  /** Bound-parameterized form so the adversarial spec can exercise the
    * guard without materializing 5M rows. */
  private[graft] def packSequences(docs: DataFrame, idCol: String,
      lenCol: String, strataCol: String, capacity: Long,
      maxStratumRows: Long): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(strataCol).cast("string").as("s"),
        col(idCol).cast("long").as("_1"), col(lenCol).cast("long").as("_2"))
      .groupBy("s")
      .agg(array_sort(collect_list(struct(col("_1"), col("_2")))).as("xs"))
      .as[(String, Seq[(Long, Long)])]
      .flatMap { case (src, xs) =>
        require(xs.size <= maxStratumRows,
          s"stratum '$src' has ${xs.size} docs — the per-stratum fold " +
            s"is bounded (<= $maxStratumRows); use packSequencesSegmented")
        packFold(xs, capacity).map { case (id, len, seq, off) =>
          (src, id, len, seq, off) }
      }
      .toDF(strataCol, idCol, "len", "seq_id", "seq_offset")
  }

  /** Per-stratum fold bound for [[packSequences]] — the ≤5M
    * sanctioned-collect convention (UnigramSegment.broadcastScores):
    * 5M (id, len) structs ≈ 160 MB per group, collectable; beyond it
    * the fold throws instead of OOMing. */
  val MaxStratumRows: Long = 5000000L

  /** The first-fit-sequential recurrence shared by [[packSequences]],
    * [[packSequencesSegmented]] and [[packSequencesContinued]] —
    * id-sorted (id, len) in, one (id, len, seq, offset) row out per
    * doc, starting from carried state (seq0, fill0) ((0, 0) = a fresh
    * fold). */
  private def packFold(xs: Seq[(Long, Long)], capacity: Long,
      seq0: Long = 0L, fill0: Long = 0L)
      : Seq[(Long, Long, Long, Long)] = {
    var seq = seq0
    var fill = fill0
    xs.map { case (id, len) =>
      if (fill > 0 && fill + len > capacity) { seq += 1; fill = 0L }
      val off = fill
      fill += len
      (id, len, seq, off)
    }
  }

  /** SEGMENT-PACKED [[packSequences]] — the unbounded-stratum form.
    * The fold is order-dependent and non-associative, so it cannot
    * distribute within a stratum; what CAN distribute is the corpus:
    * range-partition each stratum into ≤`segmentRows` SEGMENTS in doc
    * order (per-stratum ranks via the [[globalRowIds]] partition-
    * offset machinery — no single-partition window), pack every
    * segment independently in parallel, then splice segment-local
    * sequence ids into per-stratum ids by offsetting each segment
    * with the sequence count of the segments before it (a window over
    * the per-SEGMENT summary — #segments rows, corpus-size
    * independent).
    *
    * The splice opens a fresh sequence at every segment boundary, so
    * the output differs from [[packSequences]] only by boundary
    * waste: ≤ (capacity − 1) chars per boundary, i.e. a vanishing
    * ppm at real segment sizes (ledgered in SCALE.md). With
    * `segmentRows` ≥ every stratum's row count the splice is the
    * identity and the output is BIT-IDENTICAL to [[packSequences]]
    * (spec-pinned). */
  def packSequencesSegmented(docs: DataFrame, idCol: String,
      lenCol: String, strataCol: String, capacity: Long,
      segmentRows: Long): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(segmentRows >= 1, s"segmentRows must be >= 1, got $segmentRows")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(strataCol).cast("string").as("s"),
      col(idCol).cast("long").as("id"), col(lenCol).cast("long").as("len"))
    // per-stratum 0-based doc rank = global id in (stratum, id) order
    // minus the stratum's first global id (|strata|-row broadcast)
    val ranked = globalRowIds(base, Seq("s", "id"))
    val strataBase = ranked.groupBy("s").agg(min("global_id").as("_base"))
    val seg = ranked.join(broadcast(strataBase), Seq("s"))
      .withColumn("seg",
        expr(s"(global_id - _base) div ${segmentRows}L"))
    val packedLocal = seg
      .select(col("s"), col("seg"), struct(col("id"), col("len")).as("x"))
      .groupBy("s", "seg")
      .agg(array_sort(collect_list(col("x"))).as("xs"))
      .as[(String, Long, Seq[(Long, Long)])]
      .flatMap { case (src, g, xs) =>
        packFold(xs, capacity).map { case (id, len, sq, off) =>
          (src, g, id, len, sq, off) }
      }
      .toDF("s", "seg", "id", "len", "local_seq", "seq_offset")
    // splice: each segment's sequence-id base = total sequences in
    // earlier segments of its stratum; the window runs over one row
    // per SEGMENT, never over the corpus
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("s").orderBy("seg")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val segBases = packedLocal.groupBy("s", "seg")
      .agg((max(col("local_seq")) + 1L).as("_n_seqs"))
      .withColumn("_seq_base", coalesce(sum(col("_n_seqs")).over(w), lit(0L)))
      .select("s", "seg", "_seq_base")
    packedLocal.join(segBases, Seq("s", "seg"))
      .select(col("s").as(strataCol), col("id").as(idCol), col("len"),
        (col("_seq_base") + col("local_seq")).as("seq_id"),
        col("seq_offset"))
  }

  /** CONTINUED [[packSequences]] — the incremental form a daily
    * refresh runs: yesterday's pack pass left each stratum mid-fill;
    * today's docs append in id order starting from that carried
    * (seq, fill) state, first topping up yesterday's final partial
    * sequence. `carry` has ≤1 row per stratum
    * (strataCol, carry_seq, carry_fill) — [[packCarry]] derives it
    * from a packed frame; strata absent from carry start fresh at
    * (0, 0). Identical to running ONE fold over
    * yesterday-then-today (the fold state is exactly (seq, fill)),
    * which the continuation spec pins. */
  def packSequencesContinued(docs: DataFrame, idCol: String,
      lenCol: String, strataCol: String, capacity: Long,
      carry: DataFrame): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(strataCol).cast("string").as("s"),
        col(idCol).cast("long").as("_1"), col(lenCol).cast("long").as("_2"))
      .groupBy("s")
      .agg(array_sort(collect_list(struct(col("_1"), col("_2")))).as("xs"))
      .join(carry.select(col(strataCol).cast("string").as("s"),
        col("carry_seq").cast("long").as("_cs"),
        col("carry_fill").cast("long").as("_cf")), Seq("s"), "left")
      .select(col("s"), col("xs"),
        coalesce(col("_cs"), lit(0L)).as("_cs"),
        coalesce(col("_cf"), lit(0L)).as("_cf"))
      .as[(String, Seq[(Long, Long)], Long, Long)]
      .flatMap { case (src, xs, cs, cf) =>
        require(xs.size <= MaxStratumRows,
          s"stratum '$src' has ${xs.size} docs — the per-stratum fold " +
            s"is bounded (<= $MaxStratumRows); use " +
            "packSequencesSegmentedContinued")
        packFold(xs, capacity, cs, cf).map { case (id, len, seq, off) =>
          (src, id, len, seq, off) }
      }
      .toDF(strataCol, idCol, "len", "seq_id", "seq_offset")
  }

  /** SEGMENT-PACKED [[packSequencesContinued]] — the unbounded-DELTA
    * form, closing the API asymmetry between the batch pair
    * ([[packSequences]] / [[packSequencesSegmented]]) and the
    * incremental form: an over-bound delta stratum previously had no
    * path (the continued fold fails loudly at [[MaxStratumRows]]).
    * Composition of the two existing pieces: the FIRST segment of
    * each stratum seeds its fold from the stratum's carried
    * (seq, fill) state — producing ABSOLUTE sequence ids, exactly as
    * [[packSequencesContinued]] would — and every later segment packs
    * fresh and splices through the same per-SEGMENT summary window as
    * [[packSequencesSegmented]] (segment 0's absolute max feeds the
    * cumulative base, so later segments continue the numbering).
    * Differs from the continued fold only at segment boundaries
    * (≤ capacity − 1 waste per boundary, the q365-priced curve); with
    * `segmentRows` ≥ every stratum's row count the output is
    * BIT-IDENTICAL to [[packSequencesContinued]] (spec-pinned). */
  def packSequencesSegmentedContinued(docs: DataFrame, idCol: String,
      lenCol: String, strataCol: String, capacity: Long,
      segmentRows: Long, carry: DataFrame): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(segmentRows >= 1, s"segmentRows must be >= 1, got $segmentRows")
    // this IS the escape hatch packSequencesContinued's over-bound
    // error directs callers to — but each SEGMENT still goes through
    // the same per-group collect_list/packFold, so the bounded-fold
    // contract must hold per segment or the guard it exists to
    // provide is silently lost (round-16 advice item).
    require(segmentRows <= MaxStratumRows,
      s"segmentRows ($segmentRows) must be <= MaxStratumRows " +
        s"($MaxStratumRows): each segment is folded on one task")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(strataCol).cast("string").as("s"),
      col(idCol).cast("long").as("id"), col(lenCol).cast("long").as("len"))
    val ranked = globalRowIds(base, Seq("s", "id"))
    val strataBase = ranked.groupBy("s").agg(min("global_id").as("_base"))
    val seg = ranked.join(broadcast(strataBase), Seq("s"))
      .withColumn("seg",
        expr(s"(global_id - _base) div ${segmentRows}L"))
    // carry joins per stratum; only segment 0 consumes it
    val packedLocal = seg
      .select(col("s"), col("seg"), struct(col("id"), col("len")).as("x"))
      .groupBy("s", "seg")
      .agg(array_sort(collect_list(col("x"))).as("xs"))
      .join(carry.select(col(strataCol).cast("string").as("s"),
        col("carry_seq").cast("long").as("_cs"),
        col("carry_fill").cast("long").as("_cf")), Seq("s"), "left")
      .select(col("s"), col("seg"), col("xs"),
        when(col("seg") === 0L, coalesce(col("_cs"), lit(0L)))
          .otherwise(0L).as("_cs"),
        when(col("seg") === 0L, coalesce(col("_cf"), lit(0L)))
          .otherwise(0L).as("_cf"))
      .as[(String, Long, Seq[(Long, Long)], Long, Long)]
      .flatMap { case (src, g, xs, cs, cf) =>
        packFold(xs, capacity, cs, cf).map { case (id, len, sq, off) =>
          (src, g, id, len, sq, off) }
      }
      .toDF("s", "seg", "id", "len", "local_seq", "seq_offset")
    // splice — identical window to packSequencesSegmented: segment 0's
    // "_n_seqs" is max(local_seq)+1, which is ABSOLUTE (its fold
    // started at carry_seq), so the cumulative base hands segment 1
    // exactly (last absolute seq of segment 0) + 1, and the carried
    // numbering propagates through every later segment.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("s").orderBy("seg")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val segBases = packedLocal.groupBy("s", "seg")
      .agg((max(col("local_seq")) + 1L).as("_n_seqs"))
      .withColumn("_seq_base", coalesce(sum(col("_n_seqs")).over(w), lit(0L)))
      .select("s", "seg", "_seq_base")
    packedLocal.join(segBases, Seq("s", "seg"))
      .select(col("s").as(strataCol), col("id").as(idCol), col("len"),
        (col("_seq_base") + col("local_seq")).as("seq_id"),
        col("seq_offset"))
  }

  /** QUOTA-admission for the absorb loop — the data-mixing knob: per
    * stratum, admit docs in id order while the CUMULATIVE offered
    * token mass stays within the stratum's budget (FIFO
    * prefix-truncation: the stream is cut at the budget point and
    * everything behind it waits — order-preserving, so yesterday's
    * backlog, having smaller ids, is automatically offered first when
    * tomorrow's union re-runs the same rule). Windowable and
    * oracle-replayable precisely BECAUSE admission depends on the
    * offered prefix, not the admitted subset (greedy skip-if-too-big
    * admission is sequential state, the packSequences cost class).
    * A doc larger than its stratum's whole budget blocks the stratum
    * until budgets grow — production budgets sit far above any single
    * document, and the audit makes the blockage visible rather than
    * silently skipping. `budgets`: (strataCol, budget), missing
    * strata = unlimited. Adds cum_before and admitted. */
  def quotaAdmitPrefix(docs: DataFrame, idCol: String, tokCol: String,
      strataCol: String, budgets: DataFrame): DataFrame =
    quotaAdmitPrefix(docs, Seq(idCol), tokCol, strataCol, budgets)

  /** Multi-column FIFO order — the two-day ledger's (offered_day,
    * doc_id) priority expressed as the window's own sort instead of a
    * packed arithmetic key (a `day * 10^12 + id` encoding silently
    * inverts once ids cross 10^12; ordering by the columns directly
    * has no such cliff — round-16 advice item). */
  def quotaAdmitPrefix(docs: DataFrame, orderCols: Seq[String],
      tokCol: String, strataCol: String,
      budgets: DataFrame): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must name >= 1 column")
    // the two output columns and the internal budget alias are
    // reserved: a caller frame already carrying one would be silently
    // shadowed (or make the budget join ambiguous) — fail loudly
    require(Seq("cum_before", "admitted", "_quota_budget")
        .forall(r => !docs.columns.contains(r)),
      "docs must not already carry cum_before/admitted/_quota_budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(orderCols.map(col): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    docs
      .withColumn("cum_before",
        coalesce(sum(col(tokCol)).over(w), lit(0L)))
      .join(broadcast(budgets.select(col(strataCol),
        col("budget").cast("long").as("_quota_budget"))),
        Seq(strataCol), "left")
      // missing stratum = unlimited (admit), and the finite check is
      // rearranged so cum_before + tok never evaluates: under ANSI
      // mode a near-Long.MaxValue budget (or the old MaxValue
      // sentinel) would overflow-throw on the addition; tok <= budget
      // guarantees budget - tok is non-negative and exact
      .withColumn("admitted",
        col("_quota_budget").isNull ||
          (col(tokCol) <= col("_quota_budget") &&
            col("cum_before") <= col("_quota_budget") - col(tokCol)))
      .drop("_quota_budget")
  }

  /** Carry reconciliation across refresh days: strata touched by the
    * newer pack pass take its carry; untouched strata keep the older
    * one — the per-stratum fold state a K-day absorb loop threads
    * forward. Both inputs are (strataCol, carry_seq, carry_fill). */
  def packCarryMerge(newer: DataFrame, older: DataFrame,
      strataCol: String): DataFrame = {
    val cols = Seq(col(strataCol), col("carry_seq"), col("carry_fill"))
    newer.select(cols: _*).unionByName(
      older.join(newer.select(strataCol), Seq(strataCol), "left_anti")
        .select(cols: _*))
  }

  /** Per-stratum carry state from a packed frame: the fold state
    * after its LAST doc (max id — the fold order is id asc), i.e.
    * (its seq_id, its seq_offset + len). |strata| rows. */
  def packCarry(packed: DataFrame, idCol: String,
      strataCol: String): DataFrame =
    // round-16: one max_by aggregation replaces the max-id groupBy +
    // self-join + filter (packed scanned once, one exchange; ids are
    // unique per stratum so max_by is deterministic)
    packed.groupBy(strataCol)
      .agg(max_by(struct(col("seq_id").as("carry_seq"),
        (col("seq_offset") + col("len")).as("carry_fill")),
        col(idCol)).as("_c"))
      .select(col(strataCol), col("_c.carry_seq").as("carry_seq"),
        col("_c.carry_fill").as("carry_fill"))
}
