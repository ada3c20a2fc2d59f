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

  // --- coreset: carry form + guards (advice + advisory #8) --------------
  test("coreset: running-minimum carry form ≡ stateless form") {
    val qv = Tables.embeddings(spark, sf).select(col("vec_id").as("id"),
      graft.operators.Similarity.quantize16(col("embedding")).as("q"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val stateless = rows(graft.operators.Coreset.farthestPointSample(qv, 6))
    val carry = rows(graft.operators.Coreset.farthestPointSampleCarry(qv, 6))
    assert(stateless == carry && stateless.size == 6)
  }

  test("coreset: duplicate-only remainder stops early; empty input errors") {
    // 4 rows, 3 distinct vectors: id 3 duplicates id 1 — both forms
    // must stop at 3 centers instead of re-selecting a covered point
    val dup = Seq(
      (1L, Seq(0L, 0L)), (2L, Seq(100L, 0L)),
      (3L, Seq(0L, 0L)), (4L, Seq(0L, 80L))).toDF("id", "q")
    val a = graft.operators.Coreset.farthestPointSample(dup, 4).collect()
    val b = graft.operators.Coreset.farthestPointSampleCarry(dup, 4).collect()
    assert(a.length == 3 && b.length == 3)
    assert(a.map(_.getLong(1)).toSet == Set(1L, 2L, 4L))
    assert(a.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq ==
      b.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq)
    val empty = Seq.empty[(Long, Seq[Long])].toDF("id", "q")
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.Coreset.farthestPointSample(empty, 2)
    }
    assert(e1.getMessage.contains("no vectors"))
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Coreset.farthestPointSampleCarry(empty, 2)
    }
    assert(e2.getMessage.contains("no vectors"))
  }

  // --- PQ ADC routed fallback (advisory #7) -----------------------------
  private def pqFixture() = {
    val qv = Tables.embeddings(spark, sf).select(col("vec_id").as("id"),
      graft.operators.Similarity.quantize16(col("embedding")).as("q"))
    val cb = graft.operators.Quantization.pqTrain(qv, subspaces = 8,
      subDim = 8, k = 4, iters = 1)
    (qv, cb)
  }

  test("pqAdcTopK: salted over-cap route equals the broadcast-LUT route") {
    val (qv, cb) = pqFixture()
    val queries = qv.filter(col("id") % 25 === 0)
      .select(col("id").as("qid"), col("q"))
    def run(cap: Int) = graft.operators.Quantization
      .pqAdcTopK(queries, qv, cb, subspaces = 8, subDim = 8, k = 3,
        maxLutRows = cap)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    val broadcastPath = run(1000000)
    val saltedPath = run(5) // force over-cap
    assert(broadcastPath == saltedPath && broadcastPath.nonEmpty)
  }

  // --- IVFADC composite (advisory #2) -----------------------------------
  test("ivfAdcTopK: probed-cell ADC ⊆ full ADC semantics, recall above " +
      "random-probe baseline vs exact integer-L2 top-1") {
    val (qv, cb) = pqFixture()
    val coarse = graft.operators.IvfIndex.trainPortable(spark,
      qv, k = 4, iters = 2)
    val queries = qv.filter(col("id") % 20 === 0)
      .select(col("id").as("qid"), col("q"))
    val got = graft.operators.Quantization.ivfAdcTopK(queries, qv,
      coarse, cb, subspaces = 8, subDim = 8, nProbe = 2, k = 5)
    val byQ = got.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    // ranks dense from 1, adc_d2 non-decreasing within a query
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length).toSeq)
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq)
    }
    // exact integer-L2 ground truth (self excluded)
    val vecs = qv.collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    val qs = vecs.filter(_._1 % 20 == 0)
    def d2(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val truth = qs.map { case (qid, q) =>
      qid -> vecs.filter(_._1 != qid)
        .map { case (id, v) => (d2(q, v), id) }.min._2
    }.toMap
    val hit = truth.count { case (qid, nn) =>
      byQ.get(qid).exists(_.exists(_._3 == nn))
    }
    // probing 2/4 cells at random finds the true cell ~50% of the
    // time; ADC-over-probed must clearly beat that even with k=4
    // codes per subspace quantization noise
    assert(hit >= (truth.size * 0.55).toInt,
      s"IVFADC recall@5 too low: $hit/${truth.size}")
  }
}
