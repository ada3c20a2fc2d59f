package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Item-item collaborative filtering (Sarwar et al. 2001, the
  * "customers who bought X also bought Y" workhorse): items are
  * binary basket vectors, similarity is the cosine
  * co(a,b) / √(n_a·n_b), and each item publishes its top-k neighbors.
  *
  * Integer contract: the published score is cos²·10⁶ by one exact
  * floor — cos2_ppm = 10⁶·co² div (n_a·n_b) — so ranking and values
  * replay bit-for-bit (co ≤ min basket count keeps 10⁶·co² far under
  * 2⁶³). Ranking ties break on the neighbor id, so top-k is
  * deterministic on both engines.
  *
  * Scale shape: candidate pairs come ONLY from co-occurrence — the
  * posting self-join per basket (fan-out bounded by basket size², the
  * q123 shape), never item×item; a min-support filter (co ≥ minCo)
  * drops the long tail before normalization; the top-k is the rank
  * window the optimizer rewrites to WindowGroupLimit (map-side
  * partial limits). Basket-size skew is the one hazard at 100 TB —
  * cap or salt giant baskets upstream (TPC-H orders are ≤ 7 lines). */
object Recommend {

  /** baskets: (basketCol, itemCol). Output: one row per (item,
    * neighbor) in the item's top-k, both directions published. */
  def itemItemTopK(baskets: DataFrame, basketCol: String,
                   itemCol: String, minCo: Long = 3L,
                   k: Int = 3): DataFrame = {
    val bi = baskets.select(col(basketCol).as("bk"),
        col(itemCol).as("it"))
      .distinct()
      .localCheckpoint()
    val nPer = bi.groupBy("it").agg(count(lit(1)).as("n"))
    val co = bi.toDF("bk", "a").join(bi.toDF("bk", "b"), Seq("bk"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCo)
    val scored = co
      .join(nPer.select(col("it").as("a"), col("n").as("na")), "a")
      .join(nPer.select(col("it").as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"), col("co"), col("na"), col("nb"),
        expr("(1000000 * co * co) div (na * nb)").as("cos2_ppm"))
    // both directions so every item ranks its own neighborhood
    val directed = scored.select(col("a").as("item"),
        col("b").as("nbr"), col("co"), col("cos2_ppm"))
      .unionByName(scored.select(col("b").as("item"),
        col("a").as("nbr"), col("co"), col("cos2_ppm")))
    directed
      .withColumn("rk", row_number().over(Window.partitionBy("item")
        .orderBy(col("cos2_ppm").desc, col("nbr").asc)))
      .filter(col("rk") <= k)
      .select(col("item"), col("rk").cast("long").as("rk"),
        col("nbr"), col("co"), col("cos2_ppm"))
  }
}
