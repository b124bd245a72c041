package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `vec_l2sq(a, b)` — squared L2 distance between two numeric arrays
  * as a native codegen expression (r16; the [[VecDot]] recipe applied
  * to the PQ family's hottest expression).
  *
  * Why: `Pq.l2sq` was the declarative
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, _+_)` — and
  * higher-order-function lambdas evaluate INTERPRETED, per element,
  * with boxing. The expression runs once per (vector, codebook-entry)
  * pair in every PQ/OPQ/IVF-PQ encode and LUT build, which a stack
  * sample of the warm OPQ serving path showed dominating executor
  * time (`ArrayAggregate.eval`/`ZipWith.eval`). This compiles to the
  * fused loop `d = (double)a[i] - (double)b[i]; sum += d*d`.
  *
  * Bit-identity: the SAME left-to-right IEEE double accumulation from
  * 0.0 as the HOF form and the DuckDB oracle's `list_reduce` fold —
  * each term is ((double)a_i − (double)b_i)² with one rounding per
  * subtract/multiply/add, in the same order. VecL2SqSpec pins
  * equality against the HOF form on random float/double arrays.
  *
  * Accepts float and/or double element types; null arrays propagate
  * null; vectors are assumed null-element-free (embedding slices are).
  *
  * Length-mismatch behavior, stated plainly (r17, the r16 advisor's
  * note): the fold runs over min(|a|, |b|) elements and returns that
  * partial distance, where the replaced `aggregate(zip_with(...))`
  * form returned NULL (zip_with pads with nulls, poisoning the sum) —
  * same convention as [[VecDot]]. Every call site slices both arrays
  * from the same fixed-dimension geometry, so the case is unreachable
  * in queries; a malformed codebook surfaces as a wrong distance, not
  * a null. VecL2SqSpec pins this contract.
  */
case class VecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_l2sq expects array<float|double>, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    val (lt, rt) = (elemType(left), elemType(right))
    var sum = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lt == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rt == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      sum += d * d
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val d = ctx.freshName("d")
      val getA = CodeGenerator.getValue(a, elemType(left), i)
      val getB = CodeGenerator.getValue(b, elemType(right), i)
      s"""
         |int $n = $a.numElements() < $b.numElements()
         |    ? $a.numElements() : $b.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double)($getA) - (double)($getB);
         |  $sum += $d * $d;
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}
