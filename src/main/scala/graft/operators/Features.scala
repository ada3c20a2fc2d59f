package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ML feature-engineering operators over raw corpus/fact tables —
  * the "turn a 100 TB table into model inputs" surface: target
  * encoding with leakage control and the hashing-trick vectorizer.
  * Both follow the house exactness conventions (integer ppm
  * publications, the portable char-fold hash of the winnowing /
  * content-chunk family) so every output is oracle-replayable. */
object Features {

  /** Leave-one-out target encoding (the standard high-cardinality
    * categorical encoder, e.g. Micci-Barreca 2001 §3 with the
    * self-exclusion that kills target leakage): each row's encoding
    * is the target mean of ALL OTHER rows in its category,
    * loo = (Σ target − own) / (n − 1), published as exact integer ppm
    * (DIV). Rows in singleton categories get NULL (no peers — the
    * honest answer; callers impose their own prior fallback).
    *
    * Scale shape: one groupBy on the category + a join back —
    * category aggregate frames are tiny (|distinct categories|), so
    * AQE broadcasts the join; NO per-row window sort. The encoding
    * depends only on (category, own target), so downstream rollups
    * collapse to |cats|·|target values| rows.
    *
    * `target` must be an integer 0/1 column (binary target — the ppm
    * domain keeps (Σ−own)·1e6 < 2^63 for any realistic n). */
  def looTargetEncode(df: DataFrame, catCol: String, targetCol: String,
                      scale: Long = 1000000L): DataFrame = {
    val stats = df.groupBy(col(catCol))
      .agg(count(lit(1)).as("n_cat"),
        sum(col(targetCol).cast("long")).as("sum_t"))
    df.join(stats, Seq(catCol))
      .withColumn("loo_ppm",
        when(col("n_cat") > 1,
          expr(s"(($scale * (sum_t - CAST($targetCol AS BIGINT))) " +
            "div (n_cat - 1))"))
          .otherwise(lit(null).cast("long")))
      .drop("sum_t")
  }

  /** Hashing-trick vectorization (Weinberger et al. 2009): every
    * token occurrence lands in bucket h mod dim with sign
    * (−1)^bit(h), so the D-dimensional projection preserves inner
    * products in expectation without any vocabulary state — THE
    * fixed-memory featurizer for unbounded token domains. Token hash
    * is the portable char fold (acc·31 + codepoint) mod 1e9+7 (the
    * winnowing/q202 convention), bucket = h mod dim, sign from the
    * next base-dim digit ((h div dim) mod 2) — all replayable in
    * plain SQL.
    *
    * Scale shape: explode + one groupBy (doc, bucket) — map-side
    * combine does the heavy lifting since buckets are few; output is
    * at most |docs|·dim rows. Signed cancellations legitimately
    * produce val = 0 rows (kept — they are part of the vector).
    *
    * Output: (doc_id, bucket, val, n_tokens) per touched bucket. */
  def featureHash(docs: DataFrame, idCol: String, textCol: String,
                  dim: Int): DataFrame = {
    require(dim >= 2, s"featureHash: dim must be >= 2, got $dim")
    // the native codegen'd fold — bit-equal to the declarative
    // aggregate/split idiom (NativeExprSpec pins it), zero per-token
    // array allocation on the hot path
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(filter(split(lower(col(textCol)), " "), t => t =!= ""))
          .as("tok"))
      .select(col("doc_id"),
        org.apache.spark.sql.graft.CharFoldHash.column(col("tok"))
          .as("h"))
      .select(col("doc_id"), (col("h") % dim).as("bucket"),
        // integer div, not `/` (which is floating-point in Column math)
        (lit(1L) - lit(2L) * expr(s"(h div $dim) % 2")).as("sign"))
      .groupBy("doc_id", "bucket")
      .agg(sum("sign").as("val"), count(lit(1)).as("n_tokens"))
  }
}
