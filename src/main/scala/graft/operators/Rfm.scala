package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** RFM segmentation (recency / frequency / monetary) — the classic
  * customer-base profile every activation/churn pipeline starts
  * from, and a good stress of POSITIONAL bucketing semantics across
  * engines (quintiles must agree exactly, not just statistically).
  *
  * Per customer off ONE pass over orders: recency = days between the
  * customer's last order and the corpus' last order (exact integer),
  * frequency = order count, monetary = exact cent sum. Each
  * dimension is quintiled in a TOTAL order (metric, then custkey —
  * the positional-pick discipline of [[Temporal.eventsMad]]: ties
  * cannot move a boundary, so both engines bucket identically).
  * Bucket 1 is best (most recent / most orders / highest spend).
  *
  * Graded `orders_rfm` emits the segment matrix: per (r, f, m)
  * bucket triple, customer count and average spend (one IEEE
  * division of exact integers, round 6) — 125 rows max at any scale.
  *
  * Scale shape: one map-side-combinable per-customer aggregation
  * (the only corpus-sized shuffle), one 1-row broadcast for the
  * corpus max date, then — instead of `ntile` over an unpartitioned
  * Window, which silently serializes the WHOLE customer frame
  * through one task per dimension — three [[DistributedPrefix]]
  * exclusive-rank passes (range-partition + per-partition offsets +
  * streaming counter), each fully parallel with only a P-row offsets
  * frame on the driver path. The rank→bucket map then reproduces SQL
  * `ntile` EXACTLY in closed form: with q = ⌊N/B⌋ and r = N mod B,
  * the first r buckets take q+1 rows and the rest take q — a pure
  * function of the 0-based rank, so the output is bit-identical to
  * the windowed form (RfmSpec pins the parity; PlanSpec pins that no
  * unpartitioned Window node survives in the plan). The segment
  * matrix never grows past B³ rows.
  */
object Rfm {

  /** Quantile buckets per dimension. */
  val Buckets = 5

  /** SQL-standard `ntile(b)` as a closed-form function of the 0-based
    * rank in the total order: remainder buckets come first, one row
    * wider. Exact integer arithmetic — ranks and cuts are longs; the
    * divisions are floored on non-negative operands.
    */
  private[operators] def ntileOfRank(rank: Column, n: Long, b: Int): Column = {
    val q = n / b
    val r = n % b
    val cut = r * (q + 1)
    val bucket =
      if (q == 0) rank // n < b: one row per bucket, bucket = rank
      else if (r == 0) floor(rank / lit(q)).cast("long")
      else when(rank < cut, floor(rank / lit(q + 1)).cast("long"))
        .otherwise(lit(r) + floor((rank - cut) / lit(q)).cast("long"))
    (bucket + 1).cast("int")
  }

  /** The per-customer (custkey, recency_days, frequency,
    * monetary_cents) frame — CACHED: the driver-side size probe and
    * the three rank passes each consume it, and it is the narrow
    * customer-grain frame (32 B/row), never the orders corpus.
    */
  private def scoredCustomers(s: SparkSession, dir: String): DataFrame = {
    val o = load(s, dir, "orders")
      .select(col("o_custkey").cast("long").as("custkey"),
        col("o_orderdate"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val per = o.groupBy(col("custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(col("cents")).as("monetary_cents"))
    val corpusMax = o.agg(max(col("o_orderdate")).as("corpus_last"))
    per.crossJoin(broadcast(corpusMax))
      .select(col("custkey"),
        datediff(col("corpus_last"), col("last_order")).cast("long")
          .as("recency_days"),
        col("frequency"), col("monetary_cents"))
      .cache()
  }

  def ordersRfm(s: SparkSession, dir: String): DataFrame = {
    val scored = scoredCustomers(s, dir)
    // ONE driver-side scalar (customer count) parameterizes the
    // closed-form ntile — the KMeans/rootsFor discipline: KB-scale
    // driver decisions, the corpus stays out.
    val n = scored.count()
    val ranked = Seq[(Seq[Column], String)](
      (Seq(col("recency_days"), col("custkey")), "r_rank"),
      (Seq(col("frequency").desc, col("custkey")), "f_rank"),
      (Seq(col("monetary_cents").desc, col("custkey")), "m_rank"))
      .foldLeft(scored) { case (df, (order, out)) =>
        DistributedPrefix.exclusiveSum(df, order, lit(1L), out)
      }
    ranked
      .select(col("monetary_cents"),
        ntileOfRank(col("r_rank"), n, Buckets).as("r"),
        ntileOfRank(col("f_rank"), n, Buckets).as("f"),
        ntileOfRank(col("m_rank"), n, Buckets).as("m"))
      .groupBy(col("r"), col("f"), col("m"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("monetary_cents")).as("segment_cents"))
      .select(col("r"), col("f"), col("m"), col("n_customers"),
        round(col("segment_cents").cast("double")
          / col("n_customers").cast("double") / 100.0, 6)
          .as("avg_spend"))
      .orderBy(col("r"), col("f"), col("m"))
  }
}
