package graft.jq

import org.scalatest.funsuite.AnyFunSuite

/** Soundness tests for the parse-projection footprint analysis: the
  * pruned-parse lane must be OBSERVABLY IDENTICAL to the full parse on
  * every certified program — outputs, errors, $error binding, trailing-
  * garbage rejection — and must refuse certification for any program
  * that can observe the whole input. */
class FootprintSpec extends AnyFunSuite {

  private def fpOf(prog: String): Option[Set[String]] = Jq.compile(prog).footprint

  test("footprint identifies top-level field sets") {
    assert(fpOf(".k") == Some(Set("k")))
    assert(fpOf("{k}") == Some(Set("k")))
    assert(fpOf("{k, d: (.k*2), s: (.k|tostring)}") == Some(Set("k")))
    assert(fpOf(".a.b.c") == Some(Set("a")))
    assert(fpOf(".a[0].b") == Some(Set("a")))
    assert(fpOf(".a[] | .x") == Some(Set("a")))
    assert(fpOf(""".["weird key"]""") == Some(Set("weird key")))
    assert(fpOf(".a, .b") == Some(Set("a", "b")))
    assert(fpOf("[.xs[] | . + 1]") == Some(Set("xs")))
    assert(fpOf("if .a > 1 then .b else .c end") == Some(Set("a", "b", "c")))
    assert(fpOf(""""\(.name): \(.age)"""") == Some(Set("name", "age")))
    assert(fpOf(".a as $x | .b + $x") == Some(Set("a", "b")))
    assert(fpOf("reduce .xs[] as $i (.init; . + $i)") == Some(Set("xs", "init")))
    assert(fpOf(".k | select(. > 2)") == Some(Set("k")))
    assert(fpOf("42") == Some(Set.empty[String]))
    assert(fpOf(".a // .b") == Some(Set("a", "b")))
    assert(fpOf("try .a catch .b") == Some(Set("a", "b")))
    assert(fpOf(".missing?") == Some(Set("missing")))
  }

  test("footprint refuses whole-input programs") {
    assert(fpOf(".") == None)
    assert(fpOf("..") == None)
    assert(fpOf(".[]") == None)
    assert(fpOf("keys") == None)
    assert(fpOf("length") == None)
    assert(fpOf("to_entries") == None)
    assert(fpOf("select(.k > 2)") == None) // outputs the WHOLE input
    assert(fpOf("if .a then .b end") == None) // missing else = `.` passthrough
    assert(fpOf(".a = 1") == None) // returns the modified whole input
    assert(fpOf(".a |= . + 1") == None)
    assert(fpOf("{(.k): 1, a: 2}") == Some(Set("k"))) // computed key reads only .k
    assert(fpOf("tojson") == None)
    assert(fpOf("@json") == None)
    assert(fpOf("def f: .x; f") == None) // user defs not tracked
    assert(fpOf(".[.k]") == None) // dynamic index on the input
    assert(fpOf(". as $x | .a | $x") == None)
  }

  test("pruned lane agrees with the full parse on outputs, errors, and $error") {
    val programs = Seq(
      ".k", "{k}", "{k, d: (.k*2), s: (.k|tostring)}", ".a.b", ".a[0]",
      ".a[] | . + 1", ".a, .k", "if .k > 5 then \"big\" else \"small\" end",
      ".k | select(. > 2)", "[.a[] | {v: .}]", ".miss", ".miss?",
      "\"k=\\(.k)\"", ".a as $x | ($x | length) + .k",
      "reduce .a[] as $i (0; . + $i)", "try (.k + \"x\") catch \"caught\"",
      "if $error == null then .k else -1 end")
    val inputs = Seq(
      """{"k": 7, "a": [1,2,3], "z": {"deep": [true, null]}, "s": "txt"}""",
      """{"k": 1}""",
      """{"a": [], "k": 99, "extra1": 1, "extra2": [1,2], "extra3": {"x": 1}}""",
      """{"k": "str", "a": 3}""", // wrong types: errors must match
      """{}""",
      """[1, 2, 3]""", // non-object input
      """42""",
      """"plain string"""",
      """null""",
      """{"k": 1} trailing""", // trailing garbage → $error
      """{"k": """, // truncated → $error
      """not json at all""",
      """{"k": 1, "k": 2}""", // duplicate key: last wins in both lanes
      null)
    for (p <- programs; in <- inputs) {
      val c = Jq.compile(p)
      assert(c.footprint.isDefined, s"program '$p' should be footprint-eligible")
      def run(parse: String => (com.fasterxml.jackson.databind.JsonNode,
                                com.fasterxml.jackson.databind.JsonNode)): Either[String, List[String]] =
        try {
          val (v, err) = parse(in)
          Right(c(v, Map("error" -> err)).map(Json.serialize).toList)
        } catch { case e: JqError => Left(e.getMessage) }
      val full = run(Jq.parseWithError)
      val pruned = run(Jq.parsePrunedWithError(_, c.footprint.get))
      assert(full == pruned, s"lane mismatch for program '$p' on input '$in': $full vs $pruned")
    }
  }

  test("pruned parse builds nodes only for the needed fields") {
    val node = Jq.parsePruned("""{"keep": {"a": [1,2]}, "drop": {"big": [1,2,3,4]}, "x": 9}""",
      Set("keep"))
    assert(node.isObject && node.size() == 1 && node.has("keep"))
    assert(Json.serialize(node.get("keep")) == """{"a":[1,2]}""")
  }

  test("pruned parse still rejects malformed content inside skipped fields") {
    val (v, err) = Jq.parsePrunedWithError("""{"keep": 1, "drop": {"bad": }}""", Set("keep"))
    assert(v.isNull && err.isObject, "malformed skipped field must still fail the row")
    val (_, err2) = Jq.parsePrunedWithError("""{"keep": 1} extra""", Set("keep"))
    assert(err2.isObject, "trailing garbage must still fail the row")
  }
}
