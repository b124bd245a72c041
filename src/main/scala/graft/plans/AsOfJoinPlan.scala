package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Ascending, Attribute, BindReferences, Expression, JoinedRow, PredicateHelper, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** AS-OF JOIN as a first-class Catalyst operator — the (c)-tier
  * extension point (custom `LogicalPlan` + `SparkStrategy` + physical
  * `SparkPlan`, SURVEY.md §2.3): for every left row, the LATEST right
  * row with the same key and time ≤ the left row's time (kdb/DuckDB
  * ASOF semantics, inner form — left rows with no prior right row
  * drop).
  *
  * Why a whole-operator plan instead of composing built-ins: the
  * union+window formulation ([[graft.operators.Temporal.asOfJoin]])
  * works when both sides fit one schema, but carries every RIGHT
  * column through the window as a `last(_, ignoreNulls)` per column —
  * k window passes for k carried columns. The native operator does
  * ONE per-partition merge over the two sorted children and carries
  * the whole right row at once, with the textbook physical contract:
  *
  *   - `requiredChildDistribution` = ClusteredDistribution on each
  *     side's key → EnsureRequirements co-partitions the sides
  *     exactly like a shuffled join (and REUSES an existing
  *     hash-partitioning on the key — a pre-bucketed/repartitioned
  *     input joins with zero exchanges, pinned in spec);
  *   - `requiredChildOrdering` = (key, time) ascending per side →
  *     sorts are planned only when the child isn't already sorted;
  *   - `doExecute` = one forward-only merge per partition: O(|L|+|R|),
  *     no per-row lookback, no window buffer, no fanout — the same
  *     wall-clock shape at any scale.
  *
  * v1 contract: key and time expressions must be LongType (timestamps
  * enter as `unix_micros(ts)`); extraction is interpreted `eval` (two
  * long columns per row — not the hot path the projection is).
  * Ties (right.time == left.time) match, like ASOF's `>=`. NULL key
  * or time on either side drops the row (inner-join discipline).
  * MULTIPLE right rows at the same (key, time): exactly one matches,
  * chosen arbitrarily among the tied rows (the sort order below the
  * exec is total only on (key, time)) — the same contract as SQL
  * ASOF JOIN everywhere; callers needing a deterministic pick should
  * pre-aggregate the right side to one row per instant.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Filter pushdown through [[AsOfJoin]] — the custom
  * `Rule[LogicalPlan]` tier of the extension surface: Catalyst's
  * generic `PushDownPredicates` skips node types it doesn't know, so
  * without this rule a `WHERE` above an as-of join filters AFTER the
  * merge and the scan reads every row.
  *
  * Only LEFT-side conjuncts are eligible, and that asymmetry is the
  * operator's semantics, not a limitation: a predicate over the
  * right side's columns filters matched PAIRS — pushing it into the
  * right child would instead make the join pick the latest SURVIVING
  * right row (an earlier click), silently changing answers. The spec
  * pins both directions: left conjuncts reach the parquet scan's
  * `PushedFilters`; right conjuncts stay above the join and a planted
  * case shows the pushed-down variant would differ.
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan]
    with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoin) =>
      val (pushable, kept) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic
          && p.references.subsetOf(j.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Plans [[AsOfJoin]] to [[AsOfJoinExec]]; injected via
  * `GraftExtensions` (and `spark.experimental.extraStrategies` for
  * already-running sessions).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(lk, lt, rk, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan)
  extends SparkPlan with BinaryExecNode {

  require(leftKey.dataType == LongType && leftTime.dataType == LongType
    && rightKey.dataType == LongType && rightTime.dataType == LongType,
    "as-of v1 requires LongType keys and times (use unix_micros)")

  override def output: Seq[Attribute] = left.output ++ right.output

  /** Both sides cluster on their key — EnsureRequirements co-partitions
    * them (or reuses an existing compatible partitioning).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  /** (key, time) ascending per side — the merge's precondition; sorts
    * appear only when a child isn't already sorted.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  /** Rows pass through left's partitioning untouched. */
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val allOut = output
    val lkE = leftKey; val ltE = leftTime
    val rkE = rightKey; val rtE = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lk = BindReferences.bindReference(lkE, lOut)
      val lt = BindReferences.bindReference(ltE, lOut)
      val rk = BindReferences.bindReference(rkE, rOut)
      val rt = BindReferences.bindReference(rtE, rOut)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(allOut, allOut)
      val rPeek = rIter.buffered
      // latest right row at or before the merge frontier (a copy —
      // iterator rows are reused buffers)
      var curR: InternalRow = null
      var curRKey = 0L
      var curRTime = 0L
      def advanceTo(key: Long, time: Long): Unit = {
        var go = true
        while (go && rPeek.hasNext) {
          val h = rPeek.head
          val hk = rk.eval(h)
          val ht = rt.eval(h)
          if (hk == null || ht == null) { rPeek.next(); () }
          else {
            val k = hk.asInstanceOf[Long]
            val t = ht.asInstanceOf[Long]
            if (k < key || (k == key && t <= time)) {
              curR = rPeek.next().copy()
              curRKey = k
              curRTime = t
            } else go = false
          }
        }
      }
      lIter.flatMap { lrow =>
        val lkAny = lk.eval(lrow)
        val ltAny = lt.eval(lrow)
        if (lkAny == null || ltAny == null) Iterator.empty
        else {
          val k = lkAny.asInstanceOf[Long]
          val t = ltAny.asInstanceOf[Long]
          advanceTo(k, t)
          if (curR != null && curRKey == k && curRTime <= t)
            Iterator.single[InternalRow](proj(joined(lrow, curR)))
          else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry: `AsOf.join(purchases, clicks, "user_id",
  * "t_micros")` — key/time resolved by name per side, right-side
  * attributes re-aliased when the sides share a lineage (the analyzer
  * does this for built-in joins; we bypass it, so we dedup exprIds
  * ourselves).
  */
object AsOf {

  def join(left: DataFrame, right: DataFrame, leftKeyCol: String,
      leftTimeCol: String, rightKeyCol: String,
      rightTimeCol: String): DataFrame = {
    val spark = left.sparkSession
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    // self-join hygiene: fresh exprIds for the right side when shared
    val rPlan =
      if (rPlan0.outputSet.intersect(lPlan.outputSet).isEmpty) rPlan0
      else Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
    // resolve by name, FAILING on ambiguity: binding the first of
    // several same-named attributes would silently join on the wrong
    // column (the analyzer raises AMBIGUOUS_REFERENCE for built-in
    // joins; we bypass it, so we enforce the same rule)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.filter(_.name == name) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"as-of column '$name' not in ${plan.output.map(_.name)}")
        case many => throw new IllegalArgumentException(
          s"as-of column '$name' is ambiguous: ${many.size} attributes " +
            s"share the name in ${plan.output.map(_.name)}")
      }
    val node = AsOfJoin(lPlan, rPlan,
      attr(lPlan, leftKeyCol), attr(lPlan, leftTimeCol),
      attr(rPlan, rightKeyCol), attr(rPlan, rightTimeCol))
    org.apache.spark.sql.GraftPlanApi.ofRows(spark, node)
  }
}
