package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-level LZ77 factorization (Ziv & Lempel 1977) per document —
  * the classic dictionary-compression parse and the standard
  * "Lempel–Ziv complexity" text-redundancy probe (fewer factors =
  * more internally repetitive text; the bzip2-side twin is
  * [[SuffixArray.bwtRuns]]'s run profile). Greedy leftmost parse:
  * at position i the next factor is the longest prefix of the suffix
  * starting at i that also occurs starting at some j < i (any
  * overlap allowed — the DEFLATE copy semantics, where a match may
  * run past its own source and reproduce a periodic extension; a
  * common-prefix compare of the two suffixes computes exactly that
  * length); if no previous occurrence matches even one token, the
  * factor is a single literal.
  *
  * Match lengths are CAPPED at `maxMatch` tokens (DEFLATE caps at
  * 258 bytes for the same reason): the per-position compare cost is
  * then O(maxMatch), never O(doc length), and a greedy parse with
  * capped factors is still a valid LZ parse — a factor that would
  * have been longer splits into ⌈len/maxMatch⌉ factors.
  *
  * Scale shape: documents are independent, so the whole computation
  * is ONE map over the corpus — per-doc nested higher-order
  * functions (transform/aggregate over the token array), zero
  * shuffles, trivially corpus-parallel on 1000 executors. The
  * longest-previous-factor table costs O(L² · maxMatch) per doc with
  * a first-token short-circuit (mismatching first tokens never enter
  * the prefix fold), bounded by the document-length contract the
  * whole text family assumes (docs are pages/paragraphs, not
  * gigabyte blobs — the same bound that sizes the suffix-array
  * maxSpan cap). The greedy walk is an O(L) fold over the
  * precomputed LPF array inside the same projection.
  *
  * Output per doc: (doc_id, n_pos, n_factors, n_literals,
  * max_factor_len) — n_literals counts factors with no previous
  * match (LPF = 0), and Σ factor lengths = n_pos by construction
  * (any parse mistake breaks that telescope, which is what the
  * replay oracle checks). */
object Lz {

  def lzFactors(docs: DataFrame, idCol: String, textCol: String,
                maxMatch: Int = 32): DataFrame = {
    require(maxMatch >= 1)
    val toks = SuffixArray.tokenized(docs, idCol, textCol)
    val spark = toks.sparkSession
    import spark.implicits._
    val mm = maxMatch
    // Round-12: the same map-only shape, but the per-doc kernel is a
    // plain local loop instead of nested Catalyst higher-order
    // functions — the HOF form re-evaluated interpreted lambda trees
    // per (i, j, k) triple (~2.3x slower at sf0.1 for identical
    // output); the parse itself is unchanged (first-token
    // short-circuit, capped stopped compare, greedy walk).
    toks.select(col("doc_id"), col("ws")).as[(Long, Seq[String])]
      .map { case (docId, ws) =>
        val arr = ws.toArray
        val n = arr.length
        // lpf(i) = longest capped common prefix of suffix i with any
        // suffix j < i (0-based; overlap allowed, DEFLATE semantics)
        val lpf = new Array[Int](n)
        var i = 1
        while (i < n) {
          var best = 0
          val cap = math.min(mm, n - i)
          var j = 0
          while (j < i) {
            if (arr(j) == arr(i) && best < cap) {
              var k = 1 // arr(j) == arr(i) already checked
              while (k < cap && arr(j + k) == arr(i + k)) k += 1
              if (k > best) best = k
            }
            j += 1
          }
          lpf(i) = best
          i += 1
        }
        // greedy walk: factor at cur spans max(lpf, 1) tokens
        var cur = 0; var nf = 0L; var nl = 0L; var mx = 0L
        while (cur < n) {
          val l = math.max(lpf(cur), 1)
          nf += 1
          if (lpf(cur) == 0) nl += 1
          if (l > mx) mx = l.toLong
          cur += l
        }
        (docId, n.toLong, nf, nl, mx)
      }
      .toDF("doc_id", "n_pos", "n_factors", "n_literals",
        "max_factor_len")
  }
}
