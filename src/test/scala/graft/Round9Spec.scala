package graft

import org.apache.spark.sql.functions._

/** Round-9 additions: the q224 single-scan refactor, the IVFADC
  * composite, Fellegi–Sunter EM fitting, the SA→span-removal
  * pipeline, the ADC routed fallback, the coreset running-minimum
  * form, and the broadened PNG profiles. */
class Round9Spec extends SparkSpec {
  import spark.implicits._

  // --- suffix array: shared-scan refactor (advice item 1) ---------------
  test("tokenSuffixRanks: pre-tokenized overload ≡ the docs entry point") {
    val docs = Tables.documents(spark, sf).limit(30)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    val viaDocs = graft.operators.SuffixArray
      .tokenSuffixRanks(docs, "doc_id", "text")
      .collect().map(key).toSet
    val toks = graft.operators.SuffixArray
      .tokenized(docs, "doc_id", "text")
    val viaToks = graft.operators.SuffixArray.tokenSuffixRanks(toks)
      .collect().map(key).toSet
    assert(viaDocs == viaToks && viaDocs.nonEmpty)
  }
}
