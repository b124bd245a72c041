package graft.qast

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._
import scala.util.Try

/** QAST — the reference's JSON-array s-expression predicate language.
  *
  * Shape (reference `doc/qast.md:3-8`): a JSON array in prefix notation
  * `[op, operand...]`; any non-array JSON value is a literal; a JSON
  * array whose head is not a known operator is an array literal.
  *
  * We parse into a small ADT and validate arity at parse time, mirroring
  * the reference compilers returning nil on malformed input
  * (`src/comlake/core/qast.clj:56-60,67-73`) which the HTTP layer turns
  * into 400 "malformed query".
  */
sealed trait Ast
object Ast {
  case class QNum(value: Double, integral: Boolean) extends Ast
  case class QStr(value: String) extends Ast
  case class QBool(value: Boolean) extends Ast
  case object QNull extends Ast
  /** Array literal (a JSON array not led by a known operator). */
  case class QArr(items: List[Ast]) extends Ast
  /** Object literal (string-keyed). */
  case class QObj(fields: List[(String, Ast)]) extends Ast
  /** Operator application `[op, args...]`. */
  case class QOp(op: String, args: List[Ast]) extends Ast

  final case class QastError(message: String)
      extends RuntimeException(message)
  def malformed: QastError = QastError("malformed query")

  /** Operator table: name -> arity check. Mirrors `qast.clj:31-50`. */
  val arities: Map[String, Int => Boolean] = Map(
    "$" -> (_ == 0),
    "." -> (_ >= 2),
    "~" -> (_ == 2),
    "+" -> (_ >= 1),
    "-" -> (_ >= 1),
    "*" -> (_ >= 1),
    "/" -> (_ >= 1),
    "%" -> (_ == 2),
    "==" -> (_ >= 2),
    "!=" -> (_ >= 2),
    ">" -> (_ >= 2),
    ">=" -> (_ >= 2),
    "<" -> (_ >= 2),
    "<=" -> (_ >= 2),
    "&&" -> (_ == 2),
    "&" -> (_ >= 0),
    "|" -> (_ >= 0),
    "!" -> (_ == 1),
    // beyond-reference extensions (the reference QAST is predicate-only):
    // ["group", pred, [key...], agg...] — relational rollup;
    // ["having", group-form, pred] — output-row filter over a rollup;
    // ["top", k, [sort...], inner] — order + limit over an inner frame
    // query (a group/having rollup or a plain predicate). Recognized as
    // operators ONLY at the ROOT of a query (fromJson's `root` flag) or
    // in the one INNER frame position of having/top: anywhere else,
    // ["group", ...]/["top", ...] stay ordinary array literals, so
    // existing predicates whose DATA arrays happen to start with these
    // plain-English words keep parsing exactly as before. Aggregate and
    // sort specs are plain arrays (["count"] / ["sum", expr] /
    // ["desc", expr]), NOT operators, for the same reason.
    "group" -> (_ >= 3),
    "having" -> (_ == 2),
    "top" -> (_ == 3),
    // ["project", [[name, expr]...], inner?] — computed columns over an
    // inner frame query (or the whole frame when absent)
    "project" -> (n => n == 1 || n == 2))

  /** Operators legal only as the OUTERMOST form of a query (or in the
    * inner frame-query slot of another frame verb). */
  private val rootOnly: Set[String] = Set("group", "having", "top", "project")

  /** Index of the argument that is itself a frame query (parsed with
    * root = true) — having's rollup, top's inner, project's optional
    * inner. -1 = none. */
  private def innerFrameIdx(op: String, n: Int): Int = op match {
    case "having" => 0
    case "top" => n - 1
    case "project" => if (n == 2) 1 else -1
    case _ => -1
  }

  /** Deterministic output name of a group key/agg expression — SHARED
    * by both backends so their rollup schemas can never drift: the
    * last string segment of a plain row path, else the positional
    * fallback; `prefix` carries the aggregate name.
    */
  def pathName(ast: Ast, fallback: String, prefix: String = ""): String =
    ast match {
      case QOp(".", parts) =>
        parts.reverse.collectFirst { case QStr(s) => prefix + s }
          .getOrElse(prefix + fallback)
      case _ => prefix + fallback
    }

  private val mapper = new ObjectMapper()

  /** Parse a QAST from its JSON text. Left("malformed query") on
    * unparseable JSON or bad operator arity, like the reference.
    */
  def parse(json: String): Either[QastError, Ast] =
    Try(mapper.readTree(json)).toEither.left
      .map(_ => malformed)
      .flatMap(n => if (n == null) Left(malformed)
                    else fromJson(n, root = true))

  def fromJson(node: JsonNode, root: Boolean = false)
      : Either[QastError, Ast] = node match {
    case n if n.isNull => Right(QNull)
    case n if n.isBoolean => Right(QBool(n.asBoolean))
    case n if n.isNumber =>
      Right(QNum(n.asDouble, n.isIntegralNumber))
    case n if n.isTextual => Right(QStr(n.asText))
    case n if n.isObject =>
      sequence(n.properties.asScala.toList.map(e =>
        fromJson(e.getValue).map(v => e.getKey -> v))).map(QObj(_))
    case n if n.isArray =>
      val items = n.elements.asScala.toList
      items match {
        case head :: rest if head.isTextual &&
            arities.contains(head.asText) &&
            (root || !rootOnly.contains(head.asText)) =>
          val op = head.asText
          if (!arities(op)(rest.length)) Left(malformed)
          else {
            val inner = innerFrameIdx(op, rest.length)
            sequence(rest.zipWithIndex.map { case (n, i) =>
              fromJson(n, root = i == inner)
            }).map(QOp(op, _))
          }
        case _ => sequence(items.map(fromJson(_))).map(QArr(_))
      }
    case _ => Left(malformed)
  }

  private def sequence[A](xs: List[Either[QastError, A]])
      : Either[QastError, List[A]] =
    xs.foldRight(Right(Nil): Either[QastError, List[A]]) { (e, acc) =>
      for { h <- e; t <- acc } yield h :: t
    }
}
