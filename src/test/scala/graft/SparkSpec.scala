package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per suite, lazy). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"

  /** Every node of the EXECUTED plan, piercing AQE wrappers and
    * materialized query stages but NOT descending into
    * `InMemoryRelation` cached plans — so the returned set is exactly
    * the work the query re-executes itself, with cached subtrees
    * opaque. Plan-shape pins assert on these nodes instead of plan
    * STRINGS: under AQE a reused stage prints as a bare reference
    * (no repeated `InMemoryTableScan` line), so string counting
    * undercounts reuse — the r6 pin failure mode.
    */
  def outerPlanNodes(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val kids = plan match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    plan +: kids.flatMap(outerPlanNodes)
  }

  /** Run `body` with a session conf temporarily overridden (restored
    * even on failure — the suite session is shared).
    */
  def withConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val b = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
    Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    b.getOrCreate()
  }
}
