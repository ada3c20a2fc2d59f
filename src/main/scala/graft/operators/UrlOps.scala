package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level deduplication — the web-corpus
  * front door (every crawl pipeline dedups by canonical URL before
  * touching content; CCNet/RefinedWeb treat it as step zero). All
  * pure Column expression composition: regexp field extraction,
  * higher-order array filter/sort for the query string, string
  * reassembly — fully inside whole-stage codegen, no UDFs, and every
  * step replayable by the DuckDB oracle (simple RE2-compatible
  * patterns only).
  *
  * Canonical form:
  *  - fragment dropped,
  *  - scheme unified to http (dedup identity, not a fetch address),
  *  - host lowercased, leading `www.` stripped,
  *  - path: trailing `/` stripped, empty → `/`,
  *  - query: tracking params removed (`utm_*`, `fbclid`, `gclid`),
  *    remainder sorted for order-independence, empty query dropped.
  *
  * Scale shape: canonicalization is map-side; the dedup group-by
  * shuffles the (short) canonical string once — at crawl scale the
  * canonical key is the natural partition/bucket key for everything
  * downstream, which is exactly why it is computed first.
  */
object UrlOps {

  private val trackingRe = "^(utm_[a-z]+|fbclid|gclid)="

  /** Canonical URL from a raw URL column (see object doc for the
    * normal form). */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val host = lower(regexp_extract(noFrag, "^[a-zA-Z]+://([^/?#]+)", 1))
    val bareHost = regexp_replace(host, "^www\\.", "")
    val rawPath = regexp_extract(noFrag, "^[a-zA-Z]+://[^/?#]+([^?#]*)", 1)
    val path = when(
      regexp_replace(rawPath, "/$", "") === "", lit("/"))
      .otherwise(regexp_replace(rawPath, "/$", ""))
    val rawQuery = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val keptParams = array_sort(filter(split(rawQuery, "&"),
      p => p =!= "" && !p.rlike(trackingRe)))
    val query = array_join(keptParams, "&")
    concat(lit("http://"), bareHost, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
  }

  /** URL-level duplicate groups: one row per canonical URL with the
    * raw-variant fan-in. Output: (canon_url, n_urls, n_raw_distinct,
    * min_id) — min_id is the deterministic survivor (the exact-dedup
    * convention). */
  def urlDedupGroups(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(urlCol).as("url"),
        canonicalize(col(urlCol)).as("canon_url"))
      .groupBy("canon_url")
      .agg(count(lit(1)).as("n_urls"),
        count_distinct(col("url")).as("n_raw_distinct"),
        min(col("id")).as("min_id"))
}
