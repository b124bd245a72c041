package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bloom-prefiltered join: the properties the plain-join oracle can't
  * state — the prefilter passes EVERY true match (no false negatives,
  * the exactness hinge), its selectivity sits near the true match
  * rate (the reduction is real, within fpp slack), and the membership
  * test evaluates BELOW the join in the plan (rows drop before the
  * exchange, which is the entire point of the pattern).
  */
class BloomSpec extends SparkSpec {

  test("prefilter is a superset of true matches and close to their " +
      "rate (fpp slack only)") {
    val qualifying = Tables.load(spark, sf, "supplier")
      .filter(col("s_acctbal") > 4000)
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val li = Tables.load(spark, sf, "lineitem")
    val trueMatches = li.filter(col("l_suppkey").isin(qualifying.toSeq: _*))
      .count()
    val pre = Bloom.prefilteredLineitem(spark, sf)
    val preCount = pre.count()
    // no false negatives: every true match survives the prefilter
    assert(preCount >= trueMatches,
      s"prefilter dropped true matches: $preCount < $trueMatches")
    val missed = pre.filter(col("l_suppkey").isin(qualifying.toSeq: _*))
      .count()
    assert(missed == trueMatches, "a qualifying row failed might_contain")
    // the reduction is real: false positives bounded by fpp with wide
    // slack (binomial noise on a small corpus)
    val total = li.count()
    val fpObserved = (preCount - trueMatches).toDouble /
      math.max(total - trueMatches, 1L)
    info(f"prefilter: $preCount of $total rows pass " +
      f"($trueMatches true, observed fp rate $fpObserved%.4f)")
    assert(fpObserved <= Bloom.Fpp * 5 + 0.01,
      f"false-positive rate $fpObserved%.4f far above fpp ${Bloom.Fpp}")
  }

  test("membership test sits below the join: fact rows drop before " +
      "the exchange") {
    val plan = Bloom.bloomJoin(spark, sf).queryExecution.optimizedPlan
    // walk the optimized plan: the Filter carrying might_contain must
    // be strictly inside a Join's subtree, never above it
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
    def hasBloomFilter(p: LogicalPlan): Boolean = p.collect {
      case f: Filter if f.condition.toString.contains("might_contain") => f
    }.nonEmpty
    val joins = plan.collect { case j: Join => j }
    assert(joins.nonEmpty, "plan lost its join")
    assert(joins.exists(j => j.children.exists(hasBloomFilter)),
      "bloom prefilter is not below the join")
    // and the join output itself is never re-filtered by the bloom
    val aboveJoin = plan.collect {
      case f: Filter if f.condition.toString.contains("might_contain") &&
        f.child.isInstanceOf[Join] => f
    }
    assert(aboveJoin.isEmpty, "bloom test evaluated above the join")
  }

  test("filter bytes are deterministic (order-free construction), so " +
      "the plan fingerprint is run-stable") {
    val a = Bloom.supplierBloom(spark, sf)
    val b = Bloom.supplierBloom(spark, sf)
    assert(java.util.Arrays.equals(a, b), "bloom bytes differ across builds")
  }
}
