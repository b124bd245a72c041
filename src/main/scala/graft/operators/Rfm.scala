package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load

/** RFM segmentation (recency / frequency / monetary) — the classic
  * customer-base profile every activation/churn pipeline starts
  * from, and a good stress of POSITIONAL bucketing semantics across
  * engines (quintiles by `ntile` must agree exactly, not just
  * statistically).
  *
  * Per customer off ONE pass over orders: recency = days between the
  * customer's last order and the corpus' last order (exact integer),
  * frequency = order count, monetary = exact cent sum. Each
  * dimension is quintiled by `ntile(5)` over a TOTAL order (metric,
  * then custkey — the positional-pick discipline of
  * [[Temporal.eventsMad]]: ties cannot move a boundary, so both
  * engines bucket identically; ntile's remainder-to-early-buckets
  * rule is the same SQL-standard behavior in Spark and DuckDB).
  * Bucket 1 is best (most recent / most orders / highest spend).
  *
  * Graded `orders_rfm` emits the segment matrix: per (r, f, m)
  * bucket triple, customer count and average spend (one IEEE
  * division of exact integers, round 6) — 125 rows max at any scale.
  *
  * Scale shape: one map-side-combinable per-customer aggregation
  * (the only corpus-sized shuffle), one 1-row broadcast for the
  * corpus max date, then three global ntile windows over the
  * CUSTOMER frame. The unpartitioned ntile is the known serial point
  * at extreme scale; the relaxation is the [[DistributedPrefix]]
  * two-phase rank (count below each range-partition boundary) that
  * already powers Pack/Shuffle — exact quantile ranks without a
  * single-task sort. At customer-table sizes (≤ billions of 24-byte
  * rows) the windowed form holds; the segment matrix never grows.
  */
object Rfm {

  /** Quantile buckets per dimension. */
  val Buckets = 5

  def ordersRfm(s: SparkSession, dir: String): DataFrame = {
    val o = load(s, dir, "orders")
      .select(col("o_custkey").cast("long").as("custkey"),
        col("o_orderdate"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val per = o.groupBy(col("custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(col("cents")).as("monetary_cents"))
    val corpusMax = o.agg(max(col("o_orderdate")).as("corpus_last"))
    val scored = per.crossJoin(broadcast(corpusMax))
      .select(col("custkey"),
        datediff(col("corpus_last"), col("last_order")).cast("long")
          .as("recency_days"),
        col("frequency"), col("monetary_cents"))
      .withColumn("r", ntile(Buckets).over(Window
        .orderBy(col("recency_days"), col("custkey"))))
      .withColumn("f", ntile(Buckets).over(Window
        .orderBy(col("frequency").desc, col("custkey"))))
      .withColumn("m", ntile(Buckets).over(Window
        .orderBy(col("monetary_cents").desc, col("custkey"))))
    scored.groupBy(col("r"), col("f"), col("m"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("monetary_cents")).as("segment_cents"))
      .select(col("r"), col("f"), col("m"), col("n_customers"),
        round(col("segment_cents").cast("double")
          / col("n_customers").cast("double") / 100.0, 6)
          .as("avg_spend"))
      .orderBy(col("r"), col("f"), col("m"))
  }
}
