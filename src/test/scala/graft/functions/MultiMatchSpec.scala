package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Aho–Corasick automaton against a naive position scan — overlap,
  * nesting, fail-link transfer, and the Spark expression path. */
class MultiMatchSpec extends AnyFunSuite {

  private def naive(text: String, pat: String): Long =
    (0 to text.length - pat.length)
      .count(i => text.regionMatches(i, pat, 0, pat.length)).toLong

  private def check(text: String, pats: Seq[String]): Unit = {
    val got = AhoCorasick.build(pats).countAll(text)
    pats.zipWithIndex.foreach { case (p, i) =>
      assert(got(i) == naive(text, p), s"pattern '$p' on '$text'")
    }
  }

  test("overlapping and nested patterns all count") {
    // overlaps: "aa" in "aaaa" occurs at 3 start positions
    check("aaaa", Seq("aa", "aaa", "a"))
    // nesting: tab/table/able all fire on "table"
    check("a table is stable", Seq("tab", "table", "able", "a"))
    // fail-link transfer: after mismatching "tablX" the suffix must
    // still catch patterns starting inside the consumed prefix
    check("tabtabtable", Seq("tab", "table", "btab"))
    check("ababab", Seq("aba", "bab", "abab"))
  }

  test("misses, unicode, and edge shapes") {
    check("no hits here", Seq("xyzzy", "qq"))
    check("", Seq("a"))
    check("héllo héllo", Seq("héllo", "llo", "é"))
    check("x", Seq("x", "xx"))
    // a pattern equal to the whole text
    check("whole", Seq("whole"))
  }

  test("builder guards: empty list, empty pattern, duplicates fail loudly") {
    intercept[IllegalArgumentException](AhoCorasick.build(Seq.empty))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("a", "")))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("a", "a")))
  }

  test("Spark expression: one pass emits (pattern, n) per hit, batch == naive") {
    val spark = graft.operators.SharedSpark.session
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftshim.{GraftShim => E}
    val pats = Seq("scan", "table", "tab", "aa")
    val rows = Seq((1L, "scan the table, tab by tab"), (2L, "aaa"),
      (3L, "nothing")).toDF("id", "text")
    val got = rows.select(col("id"),
        explode(E.column(MultiMatch(E.expression(col("text")), pats))).as("h"))
      .select(col("id"), col("h.pattern"), col("h.n"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "scan", 1L), (1L, "table", 1L), (1L, "tab", 3L),
      (2L, "aa", 2L)), s"$got")
  }
}
