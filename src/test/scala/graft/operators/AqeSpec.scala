package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Adaptive Query Execution — the runtime half of the scale story:
  * plans re-shape themselves from actual shuffle statistics. Salting
  * (Skew.scala) is the plan-level tool for KNOWN hot keys; AQE handles
  * the unknown ones and right-sizes reducer counts.
  */
class AqeSpec extends SparkSpec {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) =>
      k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE coalesces an over-partitioned shuffle from runtime stats") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "64") {
      val df = Tables.load(spark, sf, "orders")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      df.collect() // execute so the adaptive plan finalizes
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead"), plan)
      assert(plan.contains("coalesced"), plan)
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      import spark.implicits._
      // one hot key dominating the left side
      val hot = (1 to 40000).map(i => (if (i % 20 == 0) i.toLong else 7L,
        s"v$i")).toDF("k", "payload")
      val dim = (1L to 50000L).map(k => (k, s"d$k")).toDF("k2", "name")
      val j = hot.join(dim, col("k") === col("k2"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew="), plan)
      assert(plan.contains("skew=true") ||
        plan.contains("isSkew=true"), plan)
    }
  }
}
