package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `sorted_bucket(v, boundaries)` — the index of `v` in an ascending
  * boundary array: the count of boundaries ≤ v, found by binary
  * search. With k boundaries the result is a bucket id in [0, k]:
  * equi-DEPTH bucketing when the boundaries are quantiles, which is
  * what rescues Z-order layouts from skewed keys (min-max
  * normalization collapses a zipf key into a handful of hot Morton
  * cells; quantile buckets hold the equal-population contract by
  * construction).
  *
  * Why an Expression and not a HOF chain: the declarative form
  * `aggregate(filter(bs, b -> b <= v), 0, acc -> acc + 1)` walks all
  * k boundaries per row through the interpreted lambda machinery —
  * O(k) with allocation, ~1000 comparisons per row per dimension at
  * layout-write scale. This compiles to a tight O(log k) loop inside
  * whole-stage codegen. Monotone in `v` (ties resolve upward), so
  * range probes can map box corners through the same function.
  *
  * `v` is a double (callers cast); boundaries are array<double>,
  * assumed sorted ascending and null-free. Null inputs propagate.
  */
case class SortedBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = left.dataType == DoubleType && (right.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_bucket expects (double, array<double>), got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(v: Any, bs: Any): Any = {
    val a = bs.asInstanceOf[ArrayData]
    val x = v.asInstanceOf[Double]
    var lo = 0
    var hi = a.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a.getDouble(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (v, bs) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val get = CodeGenerator.getValue(bs, DoubleType, mid)
      s"""
         |int $lo = 0;
         |int $hi = $bs.numElements();
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if (($get) <= $v) { $lo = $mid + 1; } else { $hi = $mid; }
         |}
         |${ev.value} = (long) $lo;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedBucket =
    copy(left = newLeft, right = newRight)
}
