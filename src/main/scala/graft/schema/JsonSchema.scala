package graft.schema

import org.apache.spark.sql.types._

/** `StructType` → draft-07 JSON Schema serializer.
  *
  * Mirrors the shape the reference stores after inference
  * (`/root/reference/src/comlake/core/extract/metadata.clj:48-53`):
  * a document titled by the CID whose top level is an *array* of row
  * objects. The reference's CSV inference has a two-type lattice —
  * `"number"` and `"string"`, where blank cells don't demote
  * (`metadata.clj:26-28,41-47`); we map every Spark numeric type to
  * `"number"` accordingly, and keep the richer JSON types Spark infers
  * (boolean/object/array) which the reference also emits via its JSON
  * path (`metadata.clj:30-34`).
  */
object JsonSchema {

  def forRows(title: String, schema: StructType): String =
    obj(
      "$schema" -> str("http://json-schema.org/draft-07/schema#"),
      "title" -> str(title),
      "type" -> str("array"),
      "items" -> objectType(schema))

  def typeOf(dt: DataType): String = dt match {
    case _: NumericType => "number"
    case BooleanType => "boolean"
    case _: StructType => "object"
    case _: ArrayType => "array"
    case _ => "string" // strings, dates, binary: stringly, like the ref
  }

  private def objectType(st: StructType): String =
    obj(
      "type" -> str("object"),
      "properties" -> obj(st.fields.toSeq.map(f => f.name -> field(f.dataType)): _*))

  private def field(dt: DataType): String = dt match {
    case st: StructType => objectType(st)
    case ArrayType(el, _) => obj("type" -> str("array"), "items" -> field(el))
    case other => obj("type" -> str(typeOf(other)))
  }

  private def str(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => s"${str(k)}: $v" }
      .mkString("{", ", ", "}")
}
