package graft

/** Shared synthetic corpora for the pipeline-store property suites
  * (Round15Spec's K-day fold equivalence, Round16Spec's retrain and
  * absorb-idempotence pins).
  *
  * Clean-family corpus: duplicate relations are CLOSED within each
  * family (exact families share one text; near families have exactly
  * 2 members, so the banded catch-or-miss is pairwise and identical
  * in every scenario; semantic families share one embedding vector,
  * cos = 1); bench docs are singletons so contamination never
  * entangles with dedup; day splits are id-ordered, so first-arrival
  * == min-id and an absorbed fold must equal one batch fold over the
  * union, bit for bit. */
object PipelineFixtures {

  def cleanFamilyCorpus(seed: Int): (Seq[(Long, String, String)],
      Seq[(Long, Array[Long])]) = {
    val rnd = new scala.util.Random(seed)
    val vocab = (0 until 200).map(i => s"w$i")
    def words(n: Int): Seq[String] =
      Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
    val docs = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String)]
    val vecs = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Array[Long])]
    var id = 1L
    def nextId(): Long = { // family members never sit on the %10 bench
      id += 1; while (id % 10 == 0) id += 1; id
    }
    val sources = Seq("s1", "s2")
    def src(): String = sources(rnd.nextInt(sources.length))
    // exact families (any size: text equality is transitive)
    (0 until 8).foreach { _ =>
      val t = words(50).mkString(" ")
      (0 until 2 + rnd.nextInt(3)).foreach { _ =>
        docs += ((nextId(), t, src()))
      }
    }
    // near families of EXACTLY 2 (pairwise catch-or-miss is
    // scenario-independent; size 2 forbids transitivity gaps)
    (0 until 6).foreach { _ =>
      val base = words(50)
      val t1 = base.mkString(" ")
      val t2 = (base.take(47) ++ words(3)).mkString(" ")
      docs += ((nextId(), t1, src())); docs += ((nextId(), t2, src()))
    }
    // semantic families: unique texts, one shared one-hot vector
    (0 until 4).foreach { f =>
      (0 until 2 + rnd.nextInt(2)).foreach { _ =>
        val i = nextId()
        docs += ((i, words(50).mkString(" "), src()))
        vecs += ((i, Array.tabulate(64)(d =>
          if (d == f * 3 + 1) 32768L else 0L)))
      }
    }
    // singletons, shorts, and two bench docs (unique text, id % 10 = 0)
    (0 until 6).foreach { _ =>
      docs += ((nextId(), words(50).mkString(" "), src()))
    }
    (0 until 3).foreach { _ =>
      docs += ((nextId(), words(10).mkString(" "), src()))
    }
    (0 until 2).foreach { k =>
      id = (id / 10 + 1 + k) * 10
      docs += ((id, words(50).mkString(" "), src()))
    }
    (docs.toSeq, vecs.toSeq)
  }
}
