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
    // lpf[i] = longest (capped) common prefix of suffix i with any
    // suffix j < i; 0 when nothing matches. The inner fold is the
    // stopped-fold convention ([[SuffixArray.repeatedSpans]] adj
    // compare): acc advances only while every prior token matched
    // and the source stays in bounds (j+k < i+k ≤ n keeps the
    // earlier occurrence in bounds for free).
    val lpf = expr(
      s"""transform(sequence(1, size(ws)), i ->
         |  CASE WHEN i = 1 THEN 0 ELSE
         |    aggregate(sequence(1, i - 1), 0, (best, j) ->
         |      CASE WHEN element_at(ws, j) != element_at(ws, i)
         |           THEN best
         |           ELSE greatest(best,
         |             aggregate(sequence(0, ${maxMatch - 1}), 0,
         |               (acc, k) ->
         |                 CASE WHEN acc = k AND i + k <= size(ws)
         |                       AND element_at(ws, j + k)
         |                         = element_at(ws, i + k)
         |                      THEN acc + 1 ELSE acc END))
         |      END)
         |  END)""".stripMargin)
    // greedy walk over the LPF array: one fold carrying
    // (next factor start, n_factors, n_literals, max len); positions
    // that are not factor starts pass the state through untouched.
    val walk = expr(
      """aggregate(sequence(1, size(ws)),
        |  named_struct('cur', 1L, 'nf', 0L, 'nl', 0L, 'mx', 0L),
        |  (st, t) ->
        |    IF(t = st.cur,
        |       named_struct(
        |         'cur', t + greatest(element_at(lpf, t), 1),
        |         'nf', st.nf + 1L,
        |         'nl', st.nl + IF(element_at(lpf, t) = 0, 1L, 0L),
        |         'mx', greatest(st.mx,
        |                 CAST(greatest(element_at(lpf, t), 1)
        |                      AS BIGINT))),
        |       st))""".stripMargin)
    toks
      .withColumn("lpf", lpf)
      .withColumn("st", walk)
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_pos"),
        col("st.nf").as("n_factors"),
        col("st.nl").as("n_literals"),
        col("st.mx").as("max_factor_len"))
  }
}
