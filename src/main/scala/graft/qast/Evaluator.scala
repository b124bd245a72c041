package graft.qast

import Ast._

/** QAST → row-closure compiler — the engine's second backend.
  *
  * The reference's "query polymorphism" compiles one AST two ways: to
  * SQL for the metadata store and to a JVM closure for row extraction
  * (`qast.clj:90-129`). Our primary backend is the Catalyst `Column`
  * (Compiler.scala), which serves both roles distributed; this closure
  * backend is the driver-local fast path for metadata-scale search
  * (sub-millisecond per row vs a per-request Spark job) and the
  * cross-check partner in tests, mirroring the reference's own
  * dual-backend test strategy (`eval.tex:199-205`).
  *
  * Semantics match the unified SURVEY.md §2.1.1 choices, i.e. the
  * `Column` backend exactly:
  *   - null handling is Spark/SQL three-valued logic: Kleene `&`/`|`/
  *     `!`, null-propagation elsewhere (NOT the reference closure's
  *     blanket nil-propagation, which diverged from its own SQL
  *     backend on `["|", null, true]`);
  *   - `~` is whole-string match; comparisons chain pairwise;
  *   - `/` is double division; `%` is rem;
  *   - `&&` is array overlap.
  *
  * Values: rows are `Map[String, Any]` with String / Long / Double /
  * Boolean / Seq / Map values (the shapes `DataFrame.collect` and JSON
  * produce). Numeric comparisons coerce Long/Double; mixed
  * number-vs-string comparisons yield null (row rejected), matching
  * Spark's cast-null behavior.
  */
object Evaluator {

  type Row = Map[String, Any]

  /** Compile to a closure returning the predicate value (null ⇒ row
    * rejected by `filter`, like SQL WHERE).
    */
  def compile(ast: Ast): Either[QastError, Row => Any] = ast match {
    case QNum(v, integral) =>
      val lit: Any = if (integral) v.toLong else v
      Right(_ => lit)
    case QStr(s) => Right(_ => s)
    case QBool(b) => Right(_ => b)
    case QNull => Right(_ => null)
    case QArr(items) =>
      mapEither(items)(compile).map(fs => row => fs.map(_(row)))
    case QObj(fields) =>
      mapEither(fields) { case (k, v) => compile(v).map(k -> _) }
        .map(fs => row => fs.map { case (k, f) => k -> f(row) }.toMap)
    case QOp(op, args) => compileOp(op, args)
  }

  def fromJson(json: String): Either[QastError, Row => Any] =
    Ast.parse(json).flatMap(compile)

  /** Filter rows like `df.filter`: keep only where the value is
    * exactly true.
    */
  def filter(rows: Seq[Row], json: String): Either[QastError, Seq[Row]] =
    fromJson(json).map(f => rows.filter(r => f(r) == true))

  /** The closure-backend twin of `Compiler.compileGroup` — the group
    * verb over materialized rows (the `/find` metadata snapshot),
    * QastBackendsSpec pins it row-equal to the Column backend.
    * Aggregate null semantics match SQL: `count(expr)`/`distinct`/
    * `sum`/`min`/`max`/`avg` ignore nulls; sum/min/max of an all-null
    * group is null; `["count"]` counts rows. Grouping normalizes
    * Long/Double numerically (SQL equality), but emits each key's
    * first raw value.
    */
  def group(rows: Seq[Row], json: String): Either[QastError, Seq[Row]] =
    Ast.parse(json).flatMap(groupOf).map(f => f(rows))

  private def groupOf(ast: Ast)
      : Either[QastError, Seq[Row] => Seq[Row]] = ast match {
    case QOp("group", predAst :: QArr(keyAsts) :: aggAsts)
        if keyAsts.nonEmpty && aggAsts.nonEmpty =>
      for {
        pred <- compile(predAst)
        keys <- mapEither(keyAsts.zipWithIndex) { case (k, i) =>
          compile(k).map((Ast.pathName(k, s"k$i"), _))
        }
        aggs <- mapEither(aggAsts.zipWithIndex) { case (a, i) =>
          compileAgg(a, i)
        }
        all = keys.map(_._1) ++ aggs.map(_._1)
        // same collision rule as the Column backend (a dup would also
        // silently collapse in the row Map below)
        _ <- if (all.distinct.length == all.length) Right(())
             else Left(QastError("malformed query"))
      } yield (rows: Seq[Row]) => {
        import scala.math.Ordering.Implicits._
        val kept = rows.filter(r => pred(r) == true)
        kept.groupBy(r => keys.map { case (_, f) => norm(f(r)) })
          .toSeq.map { case (_, grp) =>
            (keys.map { case (n, f) => n -> f(grp.head) } ++
              aggs.map { case (n, f) => n -> f(grp) }).toMap
          }
          // key-ordered like the Column backend's orderBy
          .sortBy(r => keys.map { case (n, _) => ordKey(r(n)) })
      }
    case _ => Left(QastError("malformed query"))
  }

  private def compileAgg(ast: Ast, i: Int)
      : Either[QastError, (String, Seq[Row] => Any)] = ast match {
    case QArr(QStr("count") :: Nil) =>
      Right(("n", grp => grp.size.toLong))
    case QArr(QStr(fn) :: arg :: Nil) if Compiler.aggFns(fn) =>
      compile(arg).map { f =>
        val name = Compiler.aggName(ast, i)
        val agg: Seq[Row] => Any = grp => {
          val vals = grp.map(f).filter(_ != null)
          // numeric aggs operate on the NUMERIC subset only, like the
          // Column backend (a non-castable value is null there and
          // drops out of numerator AND denominator)
          lazy val nums = vals.flatMap(num)
          fn match {
            case "count" => vals.size.toLong
            case "count_distinct" => vals.map(norm).distinct.size.toLong
            case "sum" =>
              if (nums.isEmpty) null
              // exact Long arithmetic for integral inputs — a Double
              // detour would round above 2^53 where sum(LongType)
              // stays exact
              else if (vals.forall(isIntegral))
                vals.collect {
                  case l: Long => l
                  case x: Int => x.toLong
                }.sum
              else nums.sum
            case "avg" =>
              if (nums.isEmpty) null else nums.sum / nums.size
            case "min" => if (vals.isEmpty) null else vals.minBy(ordKey)
            case "max" => if (vals.isEmpty) null else vals.maxBy(ordKey)
          }
        }
        (name, agg)
      }
    case _ => Left(QastError("malformed query"))
  }

  /** Sort key for min/max and the key ordering: nulls FIRST (Spark's
    * ascending default), then numbers, then strings. */
  private def ordKey(a: Any): (Int, Double, String) = a match {
    case null => (-1, 0.0, "")
    case _ => num(a) match {
      case Some(d) => (0, d, "")
      case None => (1, 0.0, String.valueOf(a))
    }
  }

  private def norm(a: Any): Any = num(a).getOrElse(a)

  private def compileOp(op: String, args: List[Ast])
      : Either[QastError, Row => Any] = op match {
    case "$" => Left(QastError("malformed query"))
    case "." => compilePath(args)

    case "~" => binary(args) { (s, p) =>
      (s, p) match {
        case (s: String, p: String) => s.matches("(?s)" + nonCapturing(p))
        case _ => null
      }
    }

    case "+" => foldNum(args, _ + _, identity)
    case "-" => foldNum(args, _ - _, x => -x)
    case "*" => foldNum(args, _ * _, identity)
    case "/" => foldNum(args, _ / _, x => 1.0 / x, forceDouble = true)
    case "%" => binary(args) { (a, b) =>
      (num(a), num(b)) match {
        case (Some(x), Some(y)) =>
          if (isIntegral(a) && isIntegral(b)) (x.toLong % y.toLong): Any
          else x % y
        case _ => null
      }
    }

    case "==" => chained(args)(valueEq)
    case "!=" =>
      chained(args)(valueEq).map(f => (row: Row) => f(row) match {
        case b: Boolean => !b
        case _ => null
      })
    case ">" => chained(args)(cmp(_ > 0))
    case ">=" => chained(args)(cmp(_ >= 0))
    case "<" => chained(args)(cmp(_ < 0))
    case "<=" => chained(args)(cmp(_ <= 0))

    case "&&" => binary(args) { (a, b) =>
      (a, b) match {
        case (x: Seq[_], y: Seq[_]) => x.exists(y.contains)
        case _ => null
      }
    }

    case "&" => kleene(args, and = true)
    case "|" => kleene(args, and = false)
    case "!" => compile(args.head).map(f => (row: Row) => f(row) match {
      case b: Boolean => !b
      case _ => null
    })

    case _ => Left(QastError("malformed query"))
  }

  /** `[".", ["$"], "a", "b"]` — nested get through maps/seqs. */
  private def compilePath(args: List[Ast]): Either[QastError, Row => Any] = {
    def step(cur: Any, key: Ast): Any = (cur, key) match {
      case (null, _) => null
      case (m: Map[_, _], QStr(k)) =>
        m.asInstanceOf[Map[String, Any]].getOrElse(k, null)
      case (s: Seq[_], QNum(i, true)) =>
        if (i >= 0 && i < s.length) s(i.toInt) else null
      case _ => null
    }
    def validKey(k: Ast): Boolean = k match {
      case QStr(_) => true
      case QNum(_, true) => true
      case _ => false
    }
    args match {
      case QOp("$", Nil) :: rest if rest.nonEmpty && rest.forall(validKey) =>
        Right(row => rest.foldLeft(row: Any)(step))
      case QOp("$", Nil) :: _ => Left(QastError("malformed query"))
      case head :: rest if rest.forall(validKey) =>
        compile(head).map(f => (row: Row) => rest.foldLeft(f(row))(step))
      case _ => Left(QastError("malformed query"))
    }
  }

  // --- helpers -------------------------------------------------------

  private def nonCapturing(p: String) = "(?:" + p + ")"

  private def num(a: Any): Option[Double] = a match {
    case x: Long => Some(x.toDouble)
    case x: Int => Some(x.toDouble)
    case x: Double => Some(x)
    case x: Float => Some(x.toDouble)
    case x: java.math.BigDecimal => Some(x.doubleValue)
    case _ => None
  }

  private def isIntegral(a: Any): Boolean = a match {
    case _: Long | _: Int => true
    case _ => false
  }

  private def valueEq(a: Any, b: Any): Any = (num(a), num(b)) match {
    case (Some(x), Some(y)) => x == y
    case _ if a == null || b == null => null
    case _ => a == b
  }

  private def cmp(ok: Int => Boolean)(a: Any, b: Any): Any =
    (num(a), num(b)) match {
      case (Some(x), Some(y)) => ok(x.compareTo(y))
      case _ => (a, b) match {
        case (x: String, y: String) => ok(x.compareTo(y))
        case _ => null
      }
    }

  private def binary(args: List[Ast])(f: (Any, Any) => Any)
      : Either[QastError, Row => Any] =
    for { a <- compile(args.head); b <- compile(args(1)) }
      yield (row: Row) => {
        val (x, y) = (a(row), b(row))
        if (x == null || y == null) null else f(x, y)
      }

  private def foldNum(args: List[Ast], two: (Double, Double) => Double,
      one: Double => Double, forceDouble: Boolean = false)
      : Either[QastError, Row => Any] =
    mapEither(args)(compile).map { fs => (row: Row) =>
      val vals = fs.map(_(row))
      if (vals.exists(_ == null)) null
      else {
        val nums = vals.map(num)
        if (nums.exists(_.isEmpty)) null
        else {
          val ds = nums.map(_.get)
          val result = ds match {
            case d :: Nil => one(d)
            case _ => ds.reduceLeft(two)
          }
          if (!forceDouble && vals.forall(isIntegral) && result.isWhole)
            result.toLong
          else result
        }
      }
    }

  /** Chained adjacent-pairs comparison AND-folded with 3VL. */
  private def chained(args: List[Ast])(pair: (Any, Any) => Any)
      : Either[QastError, Row => Any] =
    mapEither(args)(compile).map { fs => (row: Row) =>
      val vals = fs.map(_(row))
      vals.zip(vals.tail).map { case (a, b) =>
        if (a == null || b == null) null else pair(a, b)
      }.foldLeft(true: Any)(kleeneAnd)
    }

  private def kleeneAnd(a: Any, b: Any): Any = (a, b) match {
    case (false, _) | (_, false) => false
    case (null, _) | (_, null) => null
    case (x: Boolean, y: Boolean) => x && y
    case _ => null
  }

  private def kleeneOr(a: Any, b: Any): Any = (a, b) match {
    case (true, _) | (_, true) => true
    case (null, _) | (_, null) => null
    case (x: Boolean, y: Boolean) => x || y
    case _ => null
  }

  private def kleene(args: List[Ast], and: Boolean)
      : Either[QastError, Row => Any] =
    mapEither(args)(compile).map { fs => (row: Row) =>
      fs.map(_(row)).foldLeft((if (and) true else false): Any)(
        if (and) kleeneAnd else kleeneOr)
    }

  private def mapEither[A, B](xs: List[A])(f: A => Either[QastError, B])
      : Either[QastError, List[B]] =
    xs.foldRight(Right(Nil): Either[QastError, List[B]]) { (x, acc) =>
      for { h <- f(x); t <- acc } yield h :: t
    }
}
