package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Bucketed fact⋈fact join: the write pays the partitioning once;
  * every later join reads co-located buckets with NO exchange on
  * either side — the plan property the `bucketed_join` oracle can't
  * see.
  */
class BucketedJoinSpec extends SparkSpec {

  private def nodes(p: SparkPlan): Seq[SparkPlan] = outerPlanNodes(p)

  test("join of two bucketed tables is a SortMergeJoin with zero " +
      "exchanges below it; result equals the plain join") {
    val base = Files.createTempDirectory("bkt").toString
    val (lt, ot) = Bucketed.writeBucketed(spark, sf, base)
    val joined = Bucketed.joinOver(spark, lt, ot)

    // correctness: identical to the layout-blind join
    val plain = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
    assert(joined.collect().map(_.toSeq).toSeq ==
      plain.collect().map(_.toSeq).toSeq)

    // the plan property: a sort-merge join whose subtree has NO
    // exchange — the bucket layout satisfied the join's distribution
    joined.count() // finalize AQE
    val plan = joined.queryExecution.executedPlan
    val smj = nodes(plan).collectFirst { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, s"no SortMergeJoin in:\n$plan")
    val exchangesBelow = nodes(smj.get).collect { case e: Exchange => e }
    assert(exchangesBelow.isEmpty,
      s"bucketed join still shuffles: $exchangesBelow")

    // the plain join DOES shuffle both sides — the baseline the
    // bucket layout removes
    plain.count()
    val plainSmj = nodes(plain.queryExecution.executedPlan)
      .collectFirst { case j: SortMergeJoinExec => j }
    if (plainSmj.nonEmpty) { // (AQE may pick another join entirely)
      val plainEx = nodes(plainSmj.get).collect { case e: Exchange => e }
      assert(plainEx.nonEmpty, "baseline join unexpectedly shuffle-free")
    }
  }
}
