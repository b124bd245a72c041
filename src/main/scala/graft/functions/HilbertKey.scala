package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `hilbert_key(x, y, bits)` — the Hilbert-curve index of a 2-D point
  * on the 2^bits × 2^bits grid (the classic xy→d transform: walk bit
  * planes from the top, accumulate the quadrant's offset, rotate the
  * frame so every step between consecutive d values moves one cell).
  * Morton order is cheaper to compute but takes long jumps between
  * quadrant boundaries; Hilbert's unit-step continuity covers a query
  * box with fewer, longer runs of consecutive keys — tighter per-file
  * bounding boxes for the same file count (ZorderSpec measures the
  * two side by side).
  *
  * A native expression because the transform is an inherently
  * sequential per-row loop with two mutable coordinates and a frame
  * rotation — a Column-fold unrolling would build a ~100-node
  * expression tree per dimension; this compiles to the loop itself.
  *
  * Inputs are bucket ids in [0, 2^bits) (callers mask/normalize, as
  * for [[SortedBucket]]/zValue); outputs fill [0, 4^bits). Like every
  * key function here it is deterministic and engine-independent —
  * the ZorderSpec reference implementation pins the values.
  */
case class HilbertKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType &&
        bits >= 1 && bits <= 31)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hilbert_key expects (bigint, bigint) and 1<=bits<=31, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}, " +
          s"bits=$bits")

  override def nullSafeEval(xv: Any, yv: Any): Any =
    HilbertKey.xy2d(1L << bits, xv.asInstanceOf[Long], yv.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv) => {
      val cls = HilbertKey.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.xy2d(${1L << bits}L, $xv, $yv);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKey =
    copy(left = newLeft, right = newRight)
}

object HilbertKey {
  /** The standard iterative xy→d walk (public-domain classic). Static
    * so generated code calls it directly — one invokestatic per row,
    * loop JIT-compiled once.
    */
  def xy2d(n: Long, x0: Long, y0: Long): Long = {
    var (x, y) = (x0, y0)
    var d = 0L
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the lower quadrant's frame
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }
}
