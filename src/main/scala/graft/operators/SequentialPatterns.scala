package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential-pattern mining over per-entity event sequences — the
  * GSP/PrefixSpan family (Srikant & Agrawal 1996; Pei et al. 2001)
  * restricted to patterns of length ≤ 3 over a bounded alphabet (the
  * event-funnel case: "signup → view → purchase, gaps allowed"):
  * a sequence supports ⟨a⟩ iff a occurs, ⟨a,b⟩ iff some a occurs
  * strictly before some b, ⟨a,b,c⟩ iff some b occurs strictly
  * between them. Support = fraction of entities whose sequence
  * contains the pattern, published as exact ppm.
  *
  * The first/last-occurrence reduction does all the work without
  * enumerating subsequences: with positions from the per-entity
  * total order (ts, tie),
  *
  *   ⟨a,b⟩  ⊆ seq  ⟺  firstPos(a) < lastPos(b)
  *   ⟨a,b,c⟩ ⊆ seq ⟺  ∃ pos(b) with firstPos(a) < pos(b) < lastPos(c)
  *
  * (witness positions can always be pushed to the extremes). a = b
  * repeats are included (⟨a,a⟩ ⟺ the entity saw a twice).
  *
  * Scale shape: ONE per-entity window (bounded partitions — an
  * entity's history, the q14 sessionization contract) assigns
  * positions; everything after is keyed joins whose fan-out is
  * alphabet-bounded (|types|² pattern candidates per entity, |types|³
  * for triples via one positions join) — never sequence-length-
  * quadratic. The support rollup is a hash aggregate.
  *
  * Output: (pattern "a>b>c", len, n_entities, support_ppm), support
  * ≥ minSupPpm of the entity universe, every published number an
  * exact integer. */
object SequentialPatterns {

  def mine(events: DataFrame, entityCol: String, typeCol: String,
           tsCol: String, tieCol: String,
           minSupPpm: Long): DataFrame = {
    val w = Window.partitionBy("u").orderBy(col("ts"), col("tie"))
    val pos = events.select(col(entityCol).as("u"),
        col(typeCol).as("t"), col(tsCol).as("ts"),
        col(tieCol).as("tie"))
      .withColumn("p", row_number().over(w).cast("long"))
      .select("u", "t", "p")
      .localCheckpoint()
    val n = pos.select(col("u")).distinct().count()
    val ends = pos.groupBy("u", "t")
      .agg(min(col("p")).as("fp"), max(col("p")).as("lp"))
      .localCheckpoint()
    val len1 = ends.groupBy(col("t"))
      .agg(countDistinct(col("u")).as("n_entities"))
      .select(col("t").as("pattern"), lit(1L).as("len"),
        col("n_entities"))
    val len2 = ends.select(col("u"), col("t").as("ta"),
        col("fp").as("fa"))
      .join(ends.select(col("u"), col("t").as("tb"),
        col("lp").as("lb")), Seq("u"))
      .filter(col("fa") < col("lb"))
      .groupBy("ta", "tb")
      .agg(countDistinct(col("u")).as("n_entities"))
      .select(concat_ws(">", col("ta"), col("tb")).as("pattern"),
        lit(2L).as("len"), col("n_entities"))
    val len3 = ends.select(col("u"), col("t").as("ta"),
        col("fp").as("fa"))
      .join(ends.select(col("u"), col("t").as("tc"),
        col("lp").as("lc")), Seq("u"))
      .join(pos.select(col("u"), col("t").as("tb"), col("p")),
        Seq("u"))
      .filter(col("p") > col("fa") && col("p") < col("lc"))
      .groupBy("ta", "tb", "tc")
      .agg(countDistinct(col("u")).as("n_entities"))
      .select(concat_ws(">", col("ta"), col("tb"), col("tc"))
        .as("pattern"), lit(3L).as("len"), col("n_entities"))
    len1.unionByName(len2).unionByName(len3)
      .filter(col("n_entities") * 1000000L >= lit(minSupPpm) * n)
      .withColumn("support_ppm",
        expr(s"(1000000 * n_entities) div $n"))
  }
}
