package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round 16 (optimization round): every operator whose INTERNALS were
  * reshaped for performance is pinned here against its pre-round
  * reference form, re-implemented inline — map-side-distinct shingle
  * postings + sign-once signatures + candidate-sliced verifies vs the
  * old corpus-wide shapes, the fused delta near-dup pass vs the union
  * of the standalone operators, the inlined-literal Lloyd assignment
  * vs the window argmin, the weighted piece-vocab count, the depth
  * ledger vs the six-join form, and the max_by pack carry. */
class OptimizeR16Spec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[String] = {
    val cs = df.columns.sorted
    df.select(cs.head, cs.tail: _*).collect().map(_.toString).sorted.toSeq
  }

  private def corpus(seed: Int): DataFrame = {
    val (docRows, _) = PipelineFixtures.cleanFamilyCorpus(seed)
    docRows.toDF("doc_id", "text", "source").localCheckpoint()
  }

  // --- reference forms (the pre-round shapes, verbatim semantics) ----

  /** Pre-round portable near-dup reference: corpus-wide distinct
    * postings, separate signature + sizes aggregations, two band
    * joins, full-posting verify with size joins. */
  private def nearDupsReference(docs: DataFrame): DataFrame = {
    val PortA = Seq(131L, 137L, 139L, 149L, 151L, 157L, 163L, 167L)
    val PortB = Seq(17L, 29L, 47L, 71L, 89L, 107L, 131L, 151L)
    val PortP = 1000000007L
    val toks = docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), size(col("ws")) - 3),
          i => concat_ws(" ",
            element_at(col("ws"), i + 1),
            element_at(col("ws"), i + 2),
            element_at(col("ws"), i + 3)))).as("tok"))
      .distinct()
    val hashed = toks.withColumn("h",
      org.apache.spark.sql.graft.CharFoldHash.column(col("tok")))
    val minAggs = (0 until 8).map { j =>
      min(pmod(col("h") * PortA(j) + PortB(j), lit(PortP))).as(s"m$j")
    }
    val sig = hashed.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
    def bandPairs(cols: Seq[String]): DataFrame = {
      val a = sig.select(("doc_id" +: cols).map(col): _*)
        .toDF("a" +: cols: _*)
      val b = sig.select(("doc_id" +: cols).map(col): _*)
        .toDF("b" +: cols: _*)
      a.join(b, cols).filter(col("a") < col("b")).select("a", "b")
    }
    val cands = bandPairs(Seq("m0", "m1", "m2", "m3"))
      .union(bandPairs(Seq("m4", "m5", "m6", "m7"))).distinct()
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
    cands
      .join(toks.toDF("a", "tok"), Seq("a"))
      .join(toks.toDF("b", "tok"), Seq("b", "tok"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
      .join(sizes.toDF("a", "na"), Seq("a"))
      .join(sizes.toDF("b", "nb"), Seq("b"))
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .filter(col("inter") * 2 >= col("uni"))
      .select("a", "b", "inter", "uni")
  }

  test("nearDuplicatesPortable (sign-once, map-side-distinct toks, " +
    "candidate-sliced verify, fused band join) is row-identical to " +
    "the pre-round reference shape") {
    for (seed <- Seq(1611, 1612)) {
      val docs = corpus(seed)
      val got = operators.MinHashLSH.nearDuplicatesPortable(
        docs, "doc_id", "text")
      assert(rows(got) === rows(nearDupsReference(docs)))
      assert(rows(got).nonEmpty, "fixture must exercise near-dup pairs")
    }
  }

  test("portableSignatureStore's n_toks equals the exact distinct " +
    "3-shingle count per doc (the artifact contract survives the " +
    "occurrence-stream signature)") {
    val docs = corpus(1613)
    val store = operators.MinHashLSH.portableSignatureStore(
      docs, "doc_id", "text")
    val truth = docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), size(col("ws")) - 3),
          i => concat_ws(" ",
            element_at(col("ws"), i + 1),
            element_at(col("ws"), i + 2),
            element_at(col("ws"), i + 3)))).as("tok"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_truth"))
    val joined = store.join(truth, Seq("doc_id"), "full")
    assert(joined.filter(col("n_toks").isNull || col("n_truth").isNull
      || col("n_toks") =!= col("n_truth")).count() === 0L)
  }

  test("deltaNearDropIds (one batch signature pass, fused verifies, " +
    "guarded single store join) equals the union of the standalone " +
    "cross-from-store and within-batch operators") {
    val store = corpus(1614).filter(col("doc_id") % 3 =!= 0)
      .localCheckpoint()
    val batch = corpus(1614).filter(col("doc_id") % 3 === 0)
      .localCheckpoint()
    val sigStore = operators.MinHashLSH.portableSignatureStore(
      store, "doc_id", "text").localCheckpoint()
    val got = operators.MinHashLSH.deltaNearDropIds(
      sigStore, store, batch, "doc_id", "text")
    val want = operators.MinHashLSH.crossNearDuplicatesFromStore(
        sigStore, store, batch, "doc_id", "text")
      .select(col("b_id").as("doc_id"))
      .union(operators.MinHashLSH.nearDuplicatesPortable(
          batch, "doc_id", "text")
        .select(col("b").as("doc_id")))
      .distinct()
    assert(rows(got) === rows(want))
    assert(rows(got).nonEmpty, "fixture must exercise delta drops")
  }

  test("deltaNearDropIds keeps the loud artifact/store drift guard: " +
    "a banded candidate whose store doc was removed raises instead " +
    "of silently vanishing (the guard must survive filter " +
    "reordering around the candidate tokenize)") {
    val mk = (ids: Seq[Long]) => ids.map(i =>
      (i, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val store = mk(Seq(1L, 2L))
    val sigs = operators.MinHashLSH.portableSignatureStore(store,
      "doc_id", "text").localCheckpoint()
    val batch = mk(Seq(10L))
    val ex = intercept[Exception] {
      operators.MinHashLSH.deltaNearDropIds(sigs,
        store.filter(col("doc_id") === 1L), batch, "doc_id", "text")
        .count()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(c => Option(c.getMessage).getOrElse("")).toSeq
    assert(chain(ex).exists(_.contains("artifact/store drift")))
  }

  test("assignPortableInlinedWithDist is row-identical to the lazy " +
    "window-argmin assignPortableWithDist, ties included, and empty " +
    "centroid tables assign nothing") {
    val rnd = new scala.util.Random(1615)
    val vecs = ((1 to 60).map { i =>
      (i.toLong, Seq.fill(8)(rnd.nextInt(1000).toLong))
    } ++ Seq((61L, Seq.fill(8)(7L)), (62L, Seq.fill(8)(7L))))
      .toDF("id", "q").localCheckpoint()
    // duplicated centroids force d2 ties -> the cluster_id tie-break
    val cents = Seq(
      (0L, Seq.fill(8)(100L)), (1L, Seq.fill(8)(100L)),
      (2L, Seq.fill(8)(500L)), (3L, Seq.fill(8)(900L)))
      .toDF("cluster_id", "c").localCheckpoint()
    val got = operators.IvfIndex.assignPortableInlinedWithDist(vecs, cents)
    val want = operators.IvfIndex.assignPortableWithDist(vecs, cents)
    assert(rows(got) === rows(want))
    val empty = cents.filter(lit(false))
    assert(operators.IvfIndex
      .assignPortableInlinedWithDist(vecs, empty).count() === 0L)
  }

  test("pieceVocab's distinct-word-weighted count equals the " +
    "occurrence-explode reference (piece, cnt, score all exact)") {
    val docs = corpus(1616)
    val got = operators.UnigramSegment.pieceVocab(docs, "text")
    val maxPieceLen = 4
    val ref = docs.select(
        explode(filter(split(lower(col("text")), " "), t => t =!= ""))
          .as("tok"))
      .select(explode(expr(
        s"""flatten(transform(sequence(1, length(tok)), s ->
           |  filter(transform(sequence(1, $maxPieceLen), l ->
           |    CASE WHEN s + l - 1 <= length(tok)
           |         THEN substring(tok, s, l) END),
           |    x -> x IS NOT NULL)))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(count(lit(1)).as("cnt"))
      .filter(length(col("piece")) === 1 || col("cnt") >= 2L)
      .withColumn("score",
        col("cnt") * length(col("piece")) * length(col("piece")))
    assert(rows(got) === rows(ref))
  }

  test("stageDepthLedger equals the six-left-join disposition form on " +
    "random nested stage subsets") {
    val rnd = new scala.util.Random(1617)
    val all = (1L to 120L).map(i => Tuple1(i)).toDF("doc_id")
      .localCheckpoint()
    // nested subsets: each stage keeps a random ~80% of the previous
    var prev = (1L to 120L).toSet
    val stages = (1 to 5).map { _ =>
      prev = prev.filter(_ => rnd.nextDouble() < 0.8)
      prev
    }
    val stageDfs = stages.map(s =>
      s.toSeq.map(Tuple1(_)).toDF("doc_id").localCheckpoint())
    val packed = stages.last.toSeq.sorted.zipWithIndex.map {
      case (id, i) => (id, i.toLong / 4L, (i % 4).toLong * 64L)
    }.toDF("doc_id", "seq_id", "seq_offset").localCheckpoint()
    val got = SparkEntry.stageDepthLedger(all, stageDfs, packed)
    def mark(df: DataFrame, name: String) =
      df.select(col("doc_id")).withColumn(name, lit(true))
    val want = all.select("doc_id")
      .join(mark(stageDfs(0), "_g1"), Seq("doc_id"), "left")
      .join(mark(stageDfs(1), "_g2"), Seq("doc_id"), "left")
      .join(mark(stageDfs(2), "_g3"), Seq("doc_id"), "left")
      .join(mark(stageDfs(3), "_g4"), Seq("doc_id"), "left")
      .join(mark(stageDfs(4), "_g5"), Seq("doc_id"), "left")
      .join(packed.select(col("doc_id"), col("seq_id"),
        col("seq_offset")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("_g1").isNull, "short")
          .when(col("_g2").isNull, "exact_dup")
          .when(col("_g3").isNull, "near_dup")
          .when(col("_g4").isNull, "semantic_dup")
          .when(col("_g5").isNull, "contaminated")
          .otherwise("kept").as("disposition"),
        coalesce(col("seq_id"), lit(-1L)).as("seq_id"),
        coalesce(col("seq_offset"), lit(-1L)).as("seq_offset"))
    assert(rows(got) === rows(want))
  }

  test("packCarry's max_by form equals the max-id join form") {
    val rnd = new scala.util.Random(1618)
    val docs = (1L to 200L).map(i =>
      (i, 1L + rnd.nextInt(300).toLong, s"s${rnd.nextInt(5)}"))
      .toDF("doc_id", "len", "source").localCheckpoint()
    val packed = operators.Curation.packSequences(docs, "doc_id",
      "len", "source", capacity = 256L).localCheckpoint()
    val got = operators.Curation.packCarry(packed, "doc_id", "source")
    val last = packed.groupBy("source").agg(max(col("doc_id")).as("_mx"))
    val want = packed.join(last, Seq("source"))
      .filter(col("doc_id") === col("_mx"))
      .select(col("source"), col("seq_id").as("carry_seq"),
        (col("seq_offset") + col("len")).as("carry_fill"))
    assert(rows(got) === rows(want))
  }
}
