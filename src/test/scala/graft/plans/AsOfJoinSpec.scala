package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Temporal

/** The first-class as-of operator: planted semantics, equivalence with
  * the union+window composition on the graded corpus, and the physical
  * contract (merge exec present, co-partitioning exchanges reused when
  * the inputs are already hash-partitioned on the key).
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def nodes(p: SparkPlan): Seq[SparkPlan] = outerPlanNodes(p)

  private def lefts = Seq(
    (1L, 100L, "buy-a"), // after both clicks of user 1
    (1L, 50L, "buy-b"),  // between the two clicks
    (1L, 9L, "buy-c"),   // before any click → drops
    (2L, 10L, "buy-d"),  // exactly AT user 2's click → tie matches
    (3L, 10L, "buy-e")   // user with no clicks at all → drops
  ).toDF("k", "t", "tag")

  private def rights = Seq(
    (1L, 10L, "click-1"), (1L, 60L, "click-2"), (2L, 10L, "click-3")
  ).toDF("ck", "ct", "ctag")

  test("latest-at-or-before semantics, ties match, unmatched drop") {
    val out = AsOf.join(lefts, rights, "k", "t", "ck", "ct")
      .select(col("tag"), col("ctag")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map(
      "buy-a" -> "click-2", // 60 <= 100, latest
      "buy-b" -> "click-1", // 10 <= 50 < 60
      "buy-d" -> "click-3"  // tie: 10 <= 10
    ), out.toString)
  }

  test("tied right rows at one instant: exactly ONE match emitted, " +
      "from the tie set") {
    val l = Seq((1L, 50L, "buy")).toDF("k", "t", "tag")
    val r = Seq((1L, 10L, "c1"), (1L, 10L, "c2")).toDF("ck", "ct", "ctag")
    val out = AsOf.join(l, r, "k", "t", "ck", "ct")
      .select(col("tag"), col("ctag")).collect()
    assert(out.length == 1, s"expected one match, got ${out.length}")
    assert(Set("c1", "c2").contains(out.head.getString(1)))
  }

  test("duplicate column names on a side are an ERROR, not a silent " +
      "first-match bind (the analyzer's AMBIGUOUS_REFERENCE rule)") {
    val dupLeft = lefts.select(col("k"), col("t"), col("t").as("k"))
    val e = intercept[IllegalArgumentException] {
      graft.plans.AsOf.join(dupLeft, rights, "k", "t", "ck", "ct")
    }
    assert(e.getMessage.contains("ambiguous"), e.getMessage)
  }

  test("NULL keys and times drop on both sides (inner discipline)") {
    val l = Seq((Some(1L), Some(20L), "ok"), (None, Some(20L), "nk"),
      (Some(1L), None, "nt")).toDF("k", "t", "tag")
    val r = Seq((Some(1L), Some(10L), "c"), (None, Some(5L), "cn"),
      (Some(1L), None, "ct0")).toDF("ck", "ct", "ctag")
    val out = AsOf.join(l, r, "k", "t", "ck", "ct")
      .select(col("tag"), col("ctag")).collect()
      .map(x => (x.getString(0), x.getString(1)))
    assert(out.toSeq == Seq(("ok", "c")), out.mkString(","))
  }

  test("native operator equals the union+window composition at sf") {
    val native = Temporal.asOfJoinNative(spark, sf).collect()
      .map(_.toSeq).sortBy(_.toString)
    val window = Temporal.asOfJoin(spark, sf)
      .orderBy(col("user_id"), col("buy_ts")).collect()
      .map(_.toSeq).sortBy(_.toString)
    assert(native.length == window.length,
      s"${native.length} vs ${window.length}")
    native.zip(window).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
  }

  test("optimizer rule: a left-side filter above the join reaches the " +
      "parquet scan's PushedFilters") {
    val e = graft.Tables.events(spark, sf)
    val buys = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("bt"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("ct"))
    val q = AsOf.join(buys, clicks, "user_id", "bt", "c_user", "ct")
      .filter(col("value") > 15.0)
    // semantics: pushed ≡ filtered-after (compute the reference with
    // the filter applied before the join manually)
    val ref = AsOf.join(buys.filter(col("value") > 15.0), clicks,
      "user_id", "bt", "c_user", "ct")
    assert(q.count() == ref.count() && q.count() > 0)
    // the filter sits below the join in the optimized plan...
    val opt = q.queryExecution.optimizedPlan
    val joinNode = opt.collectFirst { case j: AsOfJoin => j }.get
    assert(opt.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.toString.contains("15.0") => f }.isEmpty
      || joinNode.left.exists {
           case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
             f.condition.toString.contains("15.0")
           case _ => false },
      s"value filter not below AsOfJoin:\n$opt")
    // ...and reaches the scan
    val planStr = q.queryExecution.executedPlan.toString()
    assert(planStr.contains("PushedFilters") &&
      planStr.replaceAll("\\s", "").contains("GreaterThan(value,15.0)"),
      s"filter did not reach the scan:\n$planStr")
  }

  test("optimizer rule: right-side filters are NOT pushed — pushing " +
      "would change which right row matches") {
    // user 1: clicks c1@10, c2@60; buy@100. Filtering ctag='c1' above
    // the join must yield NOTHING (the match is c2); a wrong pushdown
    // would re-match c1.
    val l = Seq((1L, 100L, "buy")).toDF("k", "t", "tag")
    val r = Seq((1L, 10L, "c1"), (1L, 60L, "c2")).toDF("ck", "ct", "ctag")
    val q = AsOf.join(l, r, "k", "t", "ck", "ct")
      .filter(col("ctag") === "c1")
    assert(q.count() == 0L,
      "right-side filter was pushed below the as-of join (wrong answers)")
    val joinNode = q.queryExecution.optimizedPlan
      .collectFirst { case j: AsOfJoin => j }.get
    assert(!joinNode.right.exists {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.toString.contains("c1")
      case _ => false
    }, "ctag filter found below the join's right side")
  }

  test("physical contract: merge exec planned; pre-partitioned inputs " +
      "join without any extra exchange") {
    val out = AsOf.join(lefts, rights, "k", "t", "ck", "ct")
    out.count() // finalize AQE
    val plan = out.queryExecution.executedPlan
    val exec = nodes(plan).collectFirst { case e: AsOfJoinExec => e }
    assert(exec.nonEmpty, s"no AsOfJoinExec in:\n$plan")

    // both sides already hash-partitioned on the key: the only
    // exchanges in the plan are those two repartitions — the operator
    // adds none of its own
    val pre = AsOf.join(lefts.repartition(4, col("k")),
      rights.repartition(4, col("ck")), "k", "t", "ck", "ct")
    pre.count()
    val prePlan = pre.queryExecution.executedPlan
    val preExec = nodes(prePlan).collectFirst { case e: AsOfJoinExec => e }
    assert(preExec.nonEmpty, s"no AsOfJoinExec in:\n$prePlan")
    val exchanges = nodes(prePlan).collect { case e: Exchange => e }
    assert(exchanges.length == 2,
      s"expected only the 2 explicit repartitions, got:\n$prePlan")
  }
}
