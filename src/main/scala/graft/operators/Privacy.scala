package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differentially-private aggregate release with REPRODUCIBLE noise.
  *
  * Production DP releases need an audit trail: the same release job
  * re-run over the same snapshot must publish the same numbers, so the
  * noise is drawn from a keyed PRF of the release key, not from an
  * ambient RNG (the deterministic-noise practice of DP deployments
  * with replayable pipelines). Here the PRF is the repo's PORTABLE
  * polynomial hash (the q132/q26 convention: exact bigint arithmetic
  * mod 1e9+7, replayable in any SQL engine), so the entire release —
  * counts, uniforms, Laplace inversion — is oracle-checkable
  * bit-for-bit.
  *
  * Laplace inversion: u ∈ (0,1) from the PRF, centered t = u − 0.5,
  * noise = −b·sign(t)·ln(1 − 2·|t|) with b = sensitivity/ε (count
  * queries: sensitivity 1). Released value quantizes to DECIMAL(18,9)
  * — the lnp9 convention absorbing ln's last ulp across engines.
  *
  * Privacy note: reusing one key's noise across re-releases does not
  * degrade ε (same query, same answer); composing DIFFERENT releases
  * still composes ε as usual. The seed must stay secret from the
  * analyst for the guarantee to hold — it plays the role of the DP
  * curator's RNG state.
  *
  * Scale shape: noise is a per-GROUP scalar expression over the
  * already-aggregated counts — zero extra shuffles on top of the
  * underlying groupBy.
  */
object Privacy {

  private val P = 1000000007L

  /** Keyed PRF → uniform in (0, 1): two rounds of (a·x + b) mod p
    * over the group key and seed, then (h + 0.5) / p — exactly
    * representable arithmetic until the final division, identical in
    * any engine with 64-bit integers. */
  private def uniform(key: Column, seed: Long): Column = {
    val h1 = (key % P * 48271L + seed) % P
    val h2 = (h1 * 16807L + 12345L) % P
    (h2.cast("double") + 0.5) / P
  }

  /** ε-DP noisy COUNT per group: (group, n, released) where released
    * = n + Laplace(1/ε) noise, DECIMAL(18,9)-quantized (returned as
    * double). `n` is carried for the oracle/spec; a real release
    * would drop it. */
  def noisyCounts(df: DataFrame, groupCol: String, epsilon: Double,
                  seed: Long): DataFrame = {
    val u = uniform(col(groupCol).cast("long"), seed)
    val t = u - 0.5
    // sign(t) * ln(1 - 2|t|): identical left-assoc shape in the twin
    val noise = (lit(-1.0 / epsilon) * signum(t) *
      log(lit(1.0) - lit(2.0) * abs(t)))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("released",
        (col("n") + noise).cast("decimal(18,9)").cast("double"))
  }

  /** Deterministic keyed pseudonym for an integer identifier — the
    * tokenization step of a PII release (stable across runs and
    * tables, so referential integrity survives: pseudonymize the key
    * on BOTH sides of a join and the join still works, while the raw
    * key never appears in the output). The two affine rounds mod the
    * prime are each bijections of Z_p (48271 and 16807 are invertible
    * mod p), so distinct keys below p can never collide. Portable
    * arithmetic end to end — the DuckDB oracle replays tokens
    * bit-for-bit. NOT encryption: reversal is trivial with the
    * constants; the operator models linkable de-identification
    * (the GDPR "pseudonymisation" tier), not secrecy — swap the PRF
    * for keyed SipHash/HMAC when the mapping itself is sensitive. */
  def pseudonym(key: Column, prefix: String, seed: Long): Column = {
    val token = ((key % P * 48271L + seed) % P * 16807L + 12345L) % P
    concat(lit(prefix), lpad(token.cast("string"), 10, "0"))
  }

  /** k-anonymity audit over a set of quasi-identifier expressions:
    * one row per equivalence class with its size and whether it meets
    * the k threshold — the pre-release check that decides which
    * classes need suppression or generalization before a dataset
    * ships (Sweeney's k-anonymity, the standard PII-release gate).
    *
    * Quasi-identifiers are EXPRESSIONS, not just columns, because
    * generalization IS expression choice: auditing `floor(acctbal /
    * 1000)` instead of `acctbal` evaluates the coarsened release
    * directly — re-run the audit per generalization ladder rung until
    * every class passes.
    *
    * Scale shape: one hash-partial groupBy on the quasi tuple — the
    * cheapest possible full-table audit; no windows, no joins. The
    * violating-row total is `sum(class_size) filter (class_size < k)`
    * downstream if needed — kept out of here so the per-class frame
    * stays one-pass. */
  def kAnonymity(df: DataFrame, quasi: Seq[(String, Column)],
                 k: Int): DataFrame =
    df.groupBy(quasi.map { case (name, e) => e.as(name) }: _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("k_anonymous", col("class_size") >= k)

  /** l-diversity audit — k-anonymity's companion check (Machanavajjhala
    * et al. 2007): a class can clear k yet leak the sensitive value
    * outright if all its rows share one. Per equivalence class:
    * size, DISTINCT sensitive values, and the l threshold flag.
    * Same single hash-groupBy shape as [[kAnonymity]]; the distinct
    * count is a partial-aggregating count(DISTINCT) on the class key,
    * so the audit still costs one shuffle. */
  def lDiversity(df: DataFrame, quasi: Seq[(String, Column)],
                 sensitive: Column, l: Int): DataFrame =
    df.groupBy(quasi.map { case (name, e) => e.as(name) }: _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("n_sensitive"))
      .withColumn("l_diverse", col("n_sensitive") >= l)

  /** t-closeness audit — the third rung of the anonymity ladder (Li,
    * Li & Venkatasubramanian 2007) after [[kAnonymity]] and
    * [[lDiversity]]: a class can clear both k and l yet still leak by
    * its sensitive-value DISTRIBUTION skewing far from the table's
    * (all-high-earners classes, say). For an ORDERED sensitive
    * attribute the paper's distance is the 1-D earth mover's:
    * EMD = (1/(m−1))·Σ_{i<m} |Σ_{j≤i} (p_j − q_j)| over the m ordered
    * bins, class distribution p vs global q.
    *
    * Published in the engine's quantized-integer form: per-bin masses
    * are floored to ppm FIRST (p_ppm = (10^6·g_j) div G, likewise q
    * over the global total), then emd_ppm = (Σ_{i<m} |cum_i|) div
    * (m−1) — every intermediate is ≤ 10^6·m regardless of table
    * size (the unquantized cross products g_j·N overflow 2^63 on a
    * 100 TB table), and DuckDB replays the same floors exactly.
    *
    * Scale shape: one groupBy for the global histogram (m rows,
    * broadcast), one groupBy on (class, bin), a broadcast expansion
    * to all m bins per class (so absent bins contribute their full
    * deficit — skipping them understates EMD), and a per-class
    * window over the m bins (bounded partitions — never a global
    * window). */
  def tCloseness(df: DataFrame, quasi: Seq[(String, Column)],
                 sensitiveBin: Column, tPpm: Long): DataFrame = {
    val qCols = quasi.map { case (name, e) => e.as(name) }
    val qNames = quasi.map(_._1)
    val binned = df.select(qCols :+ sensitiveBin.as("sbin"): _*)
    val global = binned.groupBy("sbin")
      .agg(count(lit(1)).as("nj"))
    val gtot = global.agg(sum(col("nj")).as("n_total"),
      count(lit(1)).as("m"))
    val globalPpm = global.crossJoin(broadcast(gtot))
      .select(col("sbin"), col("m"),
        expr("(1000000 * nj) div n_total").as("q_ppm"))
    val classBin = binned.groupBy(qNames.map(col) :+ col("sbin"): _*)
      .agg(count(lit(1)).as("gj"))
    val classTot = classBin.groupBy(qNames.map(col): _*)
      .agg(sum(col("gj")).as("class_size"))
    // every class x every global bin; absent bins carry gj = 0
    val full = classTot.crossJoin(broadcast(globalPpm))
      .join(classBin, qNames :+ "sbin", "left")
      .withColumn("p_ppm",
        expr("(1000000 * coalesce(gj, 0)) div class_size"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qNames.map(col): _*).orderBy(col("sbin"))
    full
      .withColumn("cum", sum(col("p_ppm") - col("q_ppm")).over(w))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") < col("m")) // Σ over the first m-1 cumuls
      .groupBy(qNames.map(col) :+ col("class_size") :+ col("m"): _*)
      .agg(sum(abs(col("cum"))).as("cum_abs"))
      .withColumn("emd_ppm", // degenerate single-bin table: EMD = 0
        expr("CASE WHEN m > 1 THEN cum_abs div (m - 1) ELSE 0 END"))
      .withColumn("t_close", col("emd_ppm") <= tPpm)
      .select(qNames.map(col) :+ col("class_size") :+
        col("emd_ppm") :+ col("t_close"): _*)
  }

  /** Luhn checksum validity of one digit string (mod-10, Luhn 1954) —
    * the check that separates a random digit run from a plausible
    * payment-card number, which is what turns a "13–19 digits" regex
    * from a false-positive firehose into a usable PII detector.
    * Folds left over positions with right-aligned parity: doubling
    * applies to every second digit FROM THE RIGHT. Pure integer
    * HOFs, oracle-replayable. */
  def luhnValid(digits: Column): Column = {
    val n = length(digits)
    val sum = aggregate(
      sequence(lit(1), n), lit(0),
      (acc, i) => {
        val d = ascii(substring(digits, i, lit(1))) - 48
        // position from the right; double at even offsets
        val fromRight = n - i + 1
        acc + when(fromRight % 2 === 0,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      })
    sum % 10 === 0
  }

  /** Scan documents for payment-card-shaped PII: extract contiguous
    * 13–19 digit runs, validate each with [[luhnValid]], report
    * counts — the high-precision companion to [[TextAnalysis
    * .piiScrub]]'s pattern masks (a masking pass would replace
    * exactly the valid runs). Map-only: one regexp extraction + one
    * integer fold per candidate, no shuffle, no UDF.
    *
    * Output: (doc_id, n_candidates, n_luhn_valid, has_pan). */
  def luhnScan(docs: DataFrame, idCol: String,
               textCol: String): DataFrame = {
    val cands = regexp_extract_all(col(textCol), lit("[0-9]{13,19}"),
      lit(0))
    docs.select(col(idCol).as("doc_id"), cands.as("cands"))
      .select(col("doc_id"),
        size(col("cands")).cast("long").as("n_candidates"),
        size(filter(col("cands"), c => luhnValid(c))).cast("long")
          .as("n_luhn_valid"))
      .withColumn("has_pan", col("n_luhn_valid") > 0)
  }
}
