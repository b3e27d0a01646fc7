package graft.jq

import org.scalatest.funsuite.AnyFunSuite

/** The strict (evalOne) path must agree with the generic stream path on
  * outputs AND error behavior for every program, on every input. */
class StrictPathSpec extends AnyFunSuite {

  private val inputs = Seq(
    """{"k": 87, "s": "txt", "a": [1,2,3], "o": {"x": 1}}""",
    """{"k": null}""", "[]", "{}", "null", "42", "\"str\"", "[1,[2,[3]]]",
    """{"region":"Asia","timezones":[{"name":"Tokyo","offset":540}]}""")

  private val programs = Seq(
    ".", ".k", ".k + 1", ".a[0] // 0", "{k, twice: (.k * 2)}",
    """"v=\(.k)"""", "[.a[]? | . + 1]", ".a | length", "(.k // 0) | tostring",
    ".o.x // .k // -1", "if .k then .k * 10 else -1 end",
    "reduce (.a[]?) as $x (0; . + $x)", ".s // \"d\" | ascii_upcase",
    """{("key" + "1"): (.k // 0)}""", ".k as $x | {orig: $x}",
    ".a[1:] // []", "(.k // 2) * 3 - 1", "[limit(2; .a[]?)]",
    ".missing.deep?", "try (.k + \"x\") catch \"type-err\"",
    ".nonexistent | not", "(.a // []) | map(. * 2) | add // 0",
    "(.o // {}) | keys", "[paths] | length", "del(.k)",
    ".k |= (. // 0) + 1", "(.a // [1])[0]", "getpath([\"o\",\"x\"]) // null",
    "tojson | fromjson", "[.[]?] | length",
    // ≤1-cardinality (Semi) lane: select/empty pipelines
    "select(.k)", "select(.k > 50)", ".k | select(. > 50) | . * 2",
    "[.a[]? | select(. > 1) | . + 10]", "select(.k) // \"none\"",
    "empty // 7", "select(.missing) // 0",
    "if .k then select(.k > 100) else -1 end",
    "try (select(.k) | .k + \"x\") catch \"typed\"",
    "[.a[]? | select(. % 2 == 1)] | length",
    ".k | select(. != null) | tostring",
    "(select(.k) | .k) // -5", "-(select(.k))",
    "select(.k) and true", "select(.k > 1000) or false",
    // user-redefined select/empty must keep USER semantics in every lane
    "def select(f): 123; .o | select(.b)", "def f(empty): empty; f(5)",
    "def empty: 9; [empty]")

  test("strict and stream paths produce identical outputs") {
    for (p <- programs; in <- inputs) {
      val rewritten = new CompiledJq(StrictRewrite(Parser.parse(p)))
      val raw = new CompiledJq(Parser.parse(p))
      val a = try Right(rewritten.applyToText(in).map(Json.serialize).toList)
              catch { case e: JqError => Left(e.getMessage) }
      val b = try Right(raw.applyToText(in).map(Json.serialize).toList)
              catch { case e: JqError => Left(e.getMessage) }
      assert(a == b, s"divergence for program <$p> on input <$in>: strict=$a stream=$b")
    }
  }

  test("strict path is actually used for typical extraction programs") {
    val ast = StrictRewrite(Parser.parse("{k, d: (.k * 2)}"))
    assert(ast.isInstanceOf[JqExpr.Strict], s"expected Strict root, got $ast")
  }

  test("stream-only constructs are not wrapped") {
    val ast = StrictRewrite(Parser.parse(".[] | select(.x)"))
    assert(!ast.isInstanceOf[JqExpr.Strict])
  }

  test("select pipelines get the Semi (at-most-one) lane") {
    val ast = StrictRewrite(Parser.parse(".[] | select(.x > 1) | {y: .x}"))
    // the per-element body right of the iterator must be Semi-wrapped
    def hasSemi(e: JqExpr): Boolean = e match {
      case JqExpr.Semi(_) => true
      case JqExpr.Pipe(l, r) => hasSemi(l) || hasSemi(r)
      case _ => false
    }
    assert(hasSemi(ast), s"no Semi lane in $ast")
  }
}
