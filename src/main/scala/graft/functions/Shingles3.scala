package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `shingles3(text)` — distinct 3-token shingles of a space-separated
  * text, in one native pass.
  *
  * Semantics are exactly the declarative form it replaced
  * (`array_distinct(transform(sequence(1, size(toks)-2), i =>
  * concat_ws(" ", toks[i], toks[i+1], toks[i+2])))` with a whole-text
  * fallback under 3 tokens) and exactly the oracle's
  * `list_distinct([toks[i]||' '||toks[i+1]||' '||toks[i+2] ...])`:
  * split on the literal single space, first-occurrence dedup.
  *
  * Why native: `split(text,' ')` referenced inside a lambda is NOT
  * common-subexpression-eliminated — every `element_at(toks, i)`
  * re-splits the whole text, making the declarative shingling
  * O(tokens²) per document (19 s at sf0.1 on its own). Here the text
  * is split once and shingles are built in O(tokens).
  */
case class Shingles3(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingles3 expects string, got ${other.simpleString}")
    }

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    val toks = text.split(space, -1)
    if (toks.length < 3)
      return new GenericArrayData(Array[Any](text.clone()))
    val seen = new mutable.LinkedHashSet[UTF8String]
    var i = 0
    while (i + 2 < toks.length) {
      seen.add(UTF8String.concatWs(space, toks(i), toks(i + 1), toks(i + 2)))
      i += 1
    }
    new GenericArrayData(seen.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Shingles3 = copy(child = newChild)
}
