package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables.load

/** RFM segmentation: the DistributedPrefix rank form must reproduce
  * the unpartitioned-ntile reference bit-for-bit (the sf0.01 DuckDB
  * oracle is the value gate; this pins the plan swap at spec time,
  * the MixSpec discipline).
  */
class RfmSpec extends SparkSpec {
  import spark.implicits._

  test("closed-form ntileOfRank equals SQL ntile for every n mod b") {
    // n from 1 to 23 sweeps every remainder class of b=5 including
    // n < b (q=0) and n divisible by b (r=0)
    for (n <- Seq(1, 3, 5, 7, 10, 12, 23)) {
      val ranks = (0L until n.toLong).toDF("rank")
      val got = ranks
        .select(col("rank"), Rfm.ntileOfRank(col("rank"), n, 5).as("b"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = ranks
        .withColumn("b", ntile(5).over(Window.orderBy(col("rank"))))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == want, s"n=$n: $got vs $want")
    }
  }

  test("segment matrix ≡ the unpartitioned-ntile reference (the plan " +
      "swap changed the shape, not the contract)") {
    val o = load(spark, sf, "orders")
      .select(col("o_custkey").cast("long").as("custkey"),
        col("o_orderdate"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val per = o.groupBy(col("custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(col("cents")).as("monetary_cents"))
    val corpusMax = o.agg(max(col("o_orderdate")).as("corpus_last"))
    val reference = per.crossJoin(broadcast(corpusMax))
      .select(col("custkey"),
        datediff(col("corpus_last"), col("last_order")).cast("long")
          .as("recency_days"),
        col("frequency"), col("monetary_cents"))
      .withColumn("r", ntile(Rfm.Buckets).over(Window
        .orderBy(col("recency_days"), col("custkey"))))
      .withColumn("f", ntile(Rfm.Buckets).over(Window
        .orderBy(col("frequency").desc, col("custkey"))))
      .withColumn("m", ntile(Rfm.Buckets).over(Window
        .orderBy(col("monetary_cents").desc, col("custkey"))))
      .groupBy(col("r"), col("f"), col("m"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("monetary_cents")).as("segment_cents"))
      .select(col("r"), col("f"), col("m"), col("n_customers"),
        round(col("segment_cents").cast("double")
          / col("n_customers").cast("double") / 100.0, 6).as("avg_spend"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    val ours = Rfm.ordersRfm(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(ours.nonEmpty)
    assert(ours == reference)
  }

  test("no ntile and no customer-frame unpartitioned Window in the " +
      "graded plan (the windows left are the P-row offset folds)") {
    val df = Rfm.ordersRfm(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ntile("), "ntile survived the plan swap")
    // the only Window nodes allowed are DistributedPrefix's offset
    // folds, which sit directly on the per-PARTITION totals aggregate
    // (one row per task, never the customer frame)
    outerPlanNodes(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.foreach { w =>
      // outerPlanNodes pierces the AQE stage boundaries plain .find
      // cannot see through
      // (the grouping key itself prints as `_nondeterministic` —
      // spark_partition_id is projected before the agg — so the pin
      // matches the aggregate's OUTPUT attribute)
      val overPid = outerPlanNodes(w).exists {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
          a.output.exists(_.name == "pid")
        case _ => false
      }
      assert(overPid, s"Window over a non-offsets frame:\n$w")
    }
  }
}
