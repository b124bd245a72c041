package graft.qast

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Compiler totality properties (SURVEY.md §5): arbitrary JSON never
  * crashes the parser — it returns Right(ast) or Left(malformed), the
  * exact two behaviors of the reference compilers
  * (`qast.clj:56-60,67-73`); generated *valid* ASTs always parse and
  * compile to a Column.
  */
class CompilerPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  // --- generator for arbitrary JSON text (valid and broken) ----------

  private val jsonScalar: Gen[String] = Gen.oneOf(
    Gen.chooseNum(-1e6, 1e6).map(_.toString),
    Gen.alphaNumStr.map(s => "\"" + s + "\""),
    Gen.oneOf("true", "false", "null"))

  private def jsonValue(depth: Int): Gen[String] =
    if (depth <= 0) jsonScalar
    else Gen.frequency(
      3 -> jsonScalar,
      2 -> Gen.listOfN(2, jsonValue(depth - 1))
        .map(_.mkString("[", ",", "]")),
      1 -> Gen.alphaStr.flatMap(k => jsonValue(depth - 1)
        .map(v => s"""{"$k": $v}""")))

  private val garbage: Gen[String] =
    Gen.oneOf(Gen.asciiPrintableStr, jsonValue(3).map(_.drop(1)))

  test("property: parse is total — Right or Left(malformed), no throw") {
    check(Prop.forAll(Gen.oneOf(jsonValue(4), garbage)) { s =>
      Ast.parse(s) match {
        case Right(_) => true
        case Left(e) => e.message == "malformed query"
      }
    })
  }

  // --- generator for structurally valid QAST --------------------------

  private val field: Gen[String] = Gen.oneOf("a", "b", "c")

  private def validAst(depth: Int): Gen[String] = {
    val leaf: Gen[String] = Gen.oneOf(
      Gen.chooseNum(-100, 100).map(_.toString),
      Gen.const("""[".", ["$"], "a"]"""),
      field.map(f => "\"" + f + "\""))
    if (depth <= 0) leaf
    else {
      def sub = validAst(depth - 1)
      Gen.frequency(
        3 -> leaf,
        1 -> Gen.zip(sub, sub).map { case (x, y) => s"""["+", $x, $y]""" },
        1 -> Gen.zip(sub, sub).map { case (x, y) => s"""["<", $x, $y]""" },
        1 -> Gen.zip(sub, sub).map { case (x, y) => s"""["&", $x, $y]""" },
        1 -> sub.map(x => s"""["!", $x]"""))
    }
  }

  test("property: valid ASTs always parse and compile to a Column") {
    check(Prop.forAll(validAst(4)) { s =>
      Compiler.fromJson(s).isRight
    })
  }

  test("property: operator arity violations are rejected, never thrown") {
    val badArity: Gen[String] = Gen.oneOf(
      Gen.const("""["%", 1]"""), Gen.const("""["~", "x"]"""),
      Gen.const("""["!", 1, 2]"""), Gen.const("""["$", 9]"""),
      Gen.const("""["."]"""), Gen.const("""["+"]"""),
      Gen.const("""["having", 1]"""), Gen.const("""["top", 1, []]"""))
    check(Prop.forAll(badArity) { s =>
      Ast.parse(s) == Left(Ast.malformed)
    })
  }

  // --- frame verbs (group / having / top): same totality contract ----

  private def frameAst(depth: Int): Gen[String] = {
    val key: Gen[String] = field.map(f => s"""[".", ["$$"], "$f"]""")
    val agg: Gen[String] = Gen.oneOf(
      Gen.const("""["count"]"""),
      key.map(k => s"""["sum", $k]"""),
      key.map(k => s"""["avg", $k]"""),
      key.map(k => s"""["min", $k]"""),
      key.map(k => s"""["count_distinct", $k]"""))
    val group: Gen[String] = for {
      pred <- validAst(2)
      k1 <- key
      a1 <- agg
      a2 <- agg
    } yield s"""["group", $pred, [$k1], $a1, $a2]"""
    val sort: Gen[String] = Gen.oneOf(
      key, key.map(k => s"""["desc", $k]"""),
      key.map(k => s"""["asc", $k]"""))
    if (depth <= 0) group
    else Gen.frequency(
      2 -> group,
      1 -> Gen.zip(frameAst(depth - 1), validAst(1)).map { case (g, p) =>
        s"""["having", $g, $p]""" },
      1 -> Gen.zip(Gen.chooseNum(1, 9), sort, frameAst(depth - 1))
        .map { case (k, so, in) => s"""["top", $k, [$so], $in]""" },
      1 -> Gen.zip(Gen.chooseNum(1, 9), sort, validAst(1))
        .map { case (k, so, p) => s"""["top", $k, [$so], $p]""" })
  }

  test("property: frame verbs parse and compile (or reject as " +
      "malformed) — compileFrame is total, no throw") {
    check(Prop.forAll(frameAst(2)) { s =>
      Ast.parse(s) match {
        case Left(e) => e.message == "malformed query"
        case Right(ast) => Compiler.compileFrame(ast) match {
          case Right(_) => true
          // duplicate output names etc. reject as malformed
          case Left(e) => e.message == "malformed query"
        }
      }
    })
  }
}
