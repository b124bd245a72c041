package graft.qast

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import Ast._

/** QAST → Catalyst `Column` compiler.
  *
  * The reference compiles the same AST twice — to a PostgreSQL WHERE
  * fragment (`qast.clj:52-65`) and to a row-predicate closure
  * (`qast.clj:120-129`). On Spark one compiler serves both callers
  * (metadata search and content extraction): a `Column` *is* a Catalyst
  * expression tree, so predicate pushdown, codegen and three-valued null
  * logic come for free. Null propagation of the closure backend
  * (`qast.clj:75-80`: any nil operand -> nil result -> row rejected) is
  * exactly Spark's SQL null semantics under `filter`.
  *
  * Where the reference's two backends disagree (SURVEY.md §2.1.1) we fix
  * one semantics:
  *   - `~`  : WHOLE-string regex match (closure `re-matches`), i.e.
  *            `regexp_like(s, "^(?:" + p + ")$")`.
  *   - `<`-family: true chained comparison, pairwise AND-folded
  *            (closure backend; the SQL emit is not even valid for >2).
  *   - `/`  : double division (Clojure exact ratios are not
  *            representable; SQL integer truncation loses data).
  *   - `!=` : NOT(all-equal), matching Clojure `not=`.
  *   - `&&` : array overlap for both paths (`arrays_overlap`), fixing
  *            the closure backend's TODO (`qast.clj:113`).
  */
object Compiler {

  /** Compile a parsed AST to a Column. */
  def compile(ast: Ast): Either[QastError, Column] = ast match {
    case QNum(v, integral) => Right(if (integral) lit(v.toLong) else lit(v))
    case QStr(s) => Right(lit(s))
    case QBool(b) => Right(lit(b))
    case QNull => Right(lit(null))
    case QArr(items) => mapEither(items)(compile).map(cs => array(cs: _*))
    case QObj(fields) =>
      // object literal → struct: fields keep heterogeneous types (a
      // Spark map would coerce all values to one type), and `.` access
      // resolves struct fields exactly like JSON object gets.
      mapEither(fields) { case (k, v) => compile(v).map(_.as(k)) }
        .map(cs => struct(cs: _*))
    case QOp(op, args) => compileOp(op, args)
  }

  /** Parse JSON text and compile in one step (the `/find` + `/extract`
    * entry point).
    */
  def fromJson(json: String): Either[QastError, Column] =
    Ast.parse(json).flatMap(compile)

  private def compileOp(op: String, args: List[Ast])
      : Either[QastError, Column] = op match {
    case "$" =>
      // The row itself is only addressable through `.`; a bare `($)` in
      // value position has no meaning on a columnar engine.
      Left(QastError("malformed query"))

    case "." => compilePath(args)

    case "~" =>
      for { s <- compile(args.head); p <- anchored(args(1)) }
        yield regexp_like(s, p)

    case "+" => foldArith(args, _ + _, identity)
    case "-" => foldArith(args, _ - _, c => -c)
    case "*" => foldArith(args, _ * _, identity)
    case "/" =>
      mapEither(args)(a => compile(a).map(_.cast("double"))).map {
        case single :: Nil => lit(1.0) / single // Clojure (/ x) = 1/x
        case cs => cs.reduceLeft(_ / _)
      }
    case "%" =>
      for { a <- compile(args.head); b <- compile(args(1)) } yield a % b

    case "==" => mapEither(args)(compile).map(cs => allAdjacent(cs, _ === _))
    case "!=" => mapEither(args)(compile).map(cs => !allAdjacent(cs, _ === _))
    case ">" => mapEither(args)(compile).map(cs => allAdjacent(cs, _ > _))
    case ">=" => mapEither(args)(compile).map(cs => allAdjacent(cs, _ >= _))
    case "<" => mapEither(args)(compile).map(cs => allAdjacent(cs, _ < _))
    case "<=" => mapEither(args)(compile).map(cs => allAdjacent(cs, _ <= _))

    case "&&" =>
      for { a <- compile(args.head); b <- compile(args(1)) }
        yield arrays_overlap(a, b)

    case "&" =>
      mapEither(args)(compile).map {
        case Nil => lit(true)
        case cs => cs.reduceLeft(_ && _)
      }
    case "|" =>
      mapEither(args)(compile).map {
        case Nil => lit(false)
        case cs => cs.reduceLeft(_ || _)
      }
    case "!" => compile(args.head).map(c => !c)

    // frame-level verb in value position — like a bare ["$"], it has
    // no meaning as a Column (use compileGroup at the query top)
    case "group" => Left(QastError("malformed query"))

    case _ => Left(QastError("malformed query"))
  }

  /** Compiled form of the top-level `group` verb: filter → groupBy →
    * agg, each half an ordinary Catalyst expression list. Key/agg
    * output names are deterministic so callers (and oracles) can
    * address them: a plain path keeps its LAST segment; anything else
    * is positional (`k0…`/`a0…`); `["count"]` is `n`; `[fn, path]` is
    * `fn_<segment>`. [[GroupQuery.apply]] runs the rollup on any frame
    * with a key-ordered output (deterministic endpoint streaming).
    */
  final case class GroupQuery(pred: Column, keyNames: List[String],
      keys: List[Column], aggs: List[Column]) {
    def apply(df: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      df.filter(pred).groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
        .orderBy(keyNames.map(col): _*)
  }

  /** Compile the beyond-reference rollup verb
    * `["group", pred, [key...], agg...]`:
    *
    *   - `pred`: any QAST predicate (`true` for "no filter") — the
    *     same compiler as `/find`/`/extract`, so pushdown through the
    *     scan is unchanged;
    *   - `[key...]`: grouping expressions (usually paths);
    *   - `agg...` (≥ 1): `["count"]`, or `[fn, expr]` with fn ∈
    *     count_distinct | sum | min | max | avg.
    *
    * Anything else is "malformed query" — arity is validated at parse
    * time like every reference operator, shapes here. Returns the
    * pieces rather than a DataFrame: the engine applies them to
    * whatever frame the endpoint serves (content extraction or the
    * metadata snapshot), exactly as predicate compilation is
    * frame-agnostic.
    */
  def compileGroup(ast: Ast): Either[QastError, GroupQuery] = ast match {
    case QOp("group", predAst :: QArr(keyAsts) :: aggAsts)
        if keyAsts.nonEmpty && aggAsts.nonEmpty =>
      for {
        pred <- compile(predAst)
        names = keyAsts.zipWithIndex.map { case (k, i) =>
          Ast.pathName(k, s"k$i")
        }
        keys <- mapEither(keyAsts.zip(names)) { case (k, n) =>
          compile(k).map(_.as(n))
        }
        aggs <- mapEither(aggAsts.zipWithIndex) { case (a, i) =>
          compileAgg(a, i)
        }
        all = names ++ aggAsts.zipWithIndex.map { case (a, i) =>
          aggName(a, i)
        }
        // output-name collisions (two keys with the same last segment,
        // a key named "n" next to ["count"], ...) must be a 400
        // "malformed query" at compile, not an AMBIGUOUS_REFERENCE 500
        // when the rollup's orderBy executes
        _ <- if (all.distinct.length == all.length) Right(())
             else Left(QastError("malformed query"))
      } yield GroupQuery(pred, names, keys, aggs)
    case _ => Left(QastError("malformed query"))
  }

  /** Parse + compile a group query in one step. */
  def groupFromJson(json: String): Either[QastError, GroupQuery] =
    Ast.parse(json).flatMap(compileGroup)

  /** The aggregate functions the group verb exposes — exact-arithmetic
    * first (count/sum/min/max are engine-deterministic; avg is the one
    * IEEE division of a deterministic sum).
    */
  val aggFns: Set[String] =
    Set("count", "count_distinct", "sum", "min", "max", "avg")

  /** Output name of an aggregate spec — shared by [[compileAgg]], the
    * collision check, and the closure backend. */
  private[qast] def aggName(ast: Ast, i: Int): String = ast match {
    case QArr(QStr("count") :: Nil) => "n"
    case QArr(QStr(fn) :: arg :: Nil) =>
      Ast.pathName(arg, s"a$i", prefix = fn + "_")
    case _ => s"a$i"
  }

  private def compileAgg(ast: Ast, i: Int): Either[QastError, Column] =
    ast match {
      case QArr(QStr("count") :: Nil) => Right(count(lit(1)).as("n"))
      case QArr(QStr(fn) :: arg :: Nil) if aggFns.contains(fn) =>
        compile(arg).map { c =>
          val agged = fn match {
            case "count" => count(c)
            case "count_distinct" => count_distinct(c)
            case "sum" => sum(c)
            case "min" => min(c)
            case "max" => max(c)
            case "avg" => avg(c)
          }
          agged.as(aggName(ast, i))
        }
      case _ => Left(QastError("malformed query"))
    }

  /** `[".", ["$"], "a", "b", ...]` — nested field access rooted at the
    * row (reference `getter-psql`, `qast.clj:23-29`; closure
    * `reduce get`, `:93-96`). `col(a)(b)(c)` resolves struct fields,
    * map keys and array indices alike.
    */
  private def compilePath(args: List[Ast]): Either[QastError, Column] = {
    def steps(rest: List[Ast], base: Column): Either[QastError, Column] =
      rest.foldLeft(Right(base): Either[QastError, Column]) {
        case (acc, QStr(name)) => acc.map(_.apply(name))
        case (acc, QNum(v, true)) => acc.map(_.apply(v.toInt))
        case (_, _) => Left(QastError("malformed query"))
      }
    args match {
      case QOp("$", Nil) :: QStr(first) :: rest => steps(rest, col(first))
      case head :: rest => compile(head).flatMap(steps(rest, _))
      case Nil => Left(QastError("malformed query"))
    }
  }

  /** Whole-string anchoring of the regex pattern. `\A(?s:p)\z` is
    * exactly `String.matches("(?s)(?:p)")` — the Evaluator backend's
    * semantics: absolute anchors (no `$`-before-trailing-newline
    * quirk) and DOTALL so `.` crosses newlines. Both backends must
    * agree on newline-bearing text (QastBackendsSpec).
    */
  private def anchored(pattern: Ast): Either[QastError, Column] =
    pattern match {
      case QStr(p) => Right(lit("\\A(?s:" + p + ")\\z"))
      case other =>
        compile(other).map(c => concat(lit("\\A(?s:"), c, lit(")\\z")))
    }

  private def foldArith(args: List[Ast], two: (Column, Column) => Column,
      one: Column => Column): Either[QastError, Column] =
    mapEither(args)(compile).map {
      case single :: Nil => one(single)
      case cs => cs.reduceLeft(two)
    }

  /** Chained adjacent-pairs comparison AND-folded:
    * `[<, a, b, c]` => `a < b AND b < c`.
    */
  private def allAdjacent(cs: List[Column],
      cmp: (Column, Column) => Column): Column =
    cs.zip(cs.tail).map { case (a, b) => cmp(a, b) }.reduceLeft(_ && _)

  private def mapEither[A, B](xs: List[A])(f: A => Either[QastError, B])
      : Either[QastError, List[B]] =
    xs.foldRight(Right(Nil): Either[QastError, List[B]]) { (x, acc) =>
      for { h <- f(x); t <- acc } yield h :: t
    }
}
