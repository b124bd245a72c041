package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `lsh_buckets(vec)` — all random-hyperplane LSH bucket ids of an
  * embedding in ONE fused pass: `array<long>` of `NumTables` entries,
  * entry *t* packing `BitsPerTable` sign bits of the vector's dot
  * products with that table's hyperplanes.
  *
  * Replaces `NumTables × BitsPerTable` separate `vec_dot(vec, lit(h))`
  * calls: each of those re-walked the vector through per-call literal
  * `ArrayData` plumbing, and expression-tree overhead dominated the
  * actual 64×64 multiply-adds. Here the hyperplane matrix is one flat
  * baked `double[]` walked row-major in a single generated loop —
  * identical arithmetic (left-to-right accumulation per plane, `>= 0`
  * sign test) so bucket ids match the composed form bit-for-bit.
  *
  * Seeded deterministically: every executor, run, and engine sees the
  * same planes — bucketing is reproducible like everything else the
  * oracle checks.
  */
case class LshBuckets(child: Expression) extends UnaryExpression {
  import LshBuckets._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_buckets expects array<float|double>, got ${other.simpleString}")
    }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), Dim)
    val isFloat = elemType == FloatType
    val out = new Array[Long](NumTables)
    var t = 0
    while (t < NumTables) {
      var bucket = 0L
      var j = 0
      while (j < BitsPerTable) {
        val base = (t * BitsPerTable + j) * Dim
        var sum = 0.0
        var i = 0
        while (i < n) {
          val xv = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
          sum += Planes(base + i) * xv
          i += 1
        }
        if (sum >= 0) bucket |= 1L << j
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planes = ctx.addReferenceObj("planes", Planes, "double[]")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val bucket = ctx.freshName("bucket")
      val base = ctx.freshName("base")
      val getV = CodeGenerator.getValue(v, elemType, i)
      s"""
         |int $n = $v.numElements() < $Dim ? $v.numElements() : $Dim;
         |long[] $out = new long[$NumTables];
         |for (int $t = 0; $t < $NumTables; $t++) {
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $BitsPerTable; $j++) {
         |    int $base = ($t * $BitsPerTable + $j) * $Dim;
         |    double $sum = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $sum += $planes[$base + $i] * (double)($getV);
         |    }
         |    if ($sum >= 0) $bucket |= 1L << $j;
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : LshBuckets = copy(child = newChild)
}

object LshBuckets {
  val Dim = 64
  val NumTables = 16
  val BitsPerTable = 4

  /** Seeded gaussian hyperplanes, row-major `double[tables*bits][dim]`
    * flattened — the exact sequence the composed `vec_dot` form drew
    * (Random(4242), row-by-row), so bucket ids are unchanged.
    */
  val Planes: Array[Double] = {
    val rng = new scala.util.Random(4242)
    Array.fill(NumTables * BitsPerTable * Dim)(rng.nextGaussian())
  }
}
