package graft.jq

import org.scalatest.funsuite.AnyFunSuite

import graft.jq.JqStream.Deferrer

/** Direct evaluation-accounting tests for JqStream — the laziness contract
  * the interpreter relies on (limit/first/break must not run the element
  * after the last one consumed) plus cell memoization. The jq-level
  * equivalents live in JqEngineSpec ("streams never evaluate one element
  * beyond what is consumed"); these pin the class itself. */
class JqStreamSpec extends AnyFunSuite {

  /** 0,1,2,… up to `limit`, bumping `evals` once per element COMPUTED. */
  private def counting(limit: Int)(onEval: Int => Unit): JqStream = {
    def from(i: Int): JqStream = JqStream.defer { () =>
      if (i >= limit) JqStream.empty
      else { onEval(i); Json.num(i) #:: from(i + 1) }
    }
    from(0)
  }

  test("take(n) evaluates exactly n elements") {
    var evals = 0
    val s = counting(100)(_ => evals += 1)
    assert(s.take(3).toList.map(_.intValue()) == List(0, 1, 2))
    assert(evals == 3, s"take(3) computed $evals elements")
  }

  test("iterator evaluates only what is pulled") {
    var evals = 0
    val it = counting(100)(_ => evals += 1).iterator
    assert(it.next().intValue() == 0)
    assert(it.next().intValue() == 1)
    assert(evals == 2, s"two pulls computed $evals elements")
  }

  test("flatMap + take does not look ahead into the source") {
    var evals = 0
    val s = counting(100)(_ => evals += 1)
    val out = s.flatMap(v => JqStream(v)).take(1).toList
    assert(out.map(_.intValue()) == List(0))
    assert(evals == 1, s"flatMap/take(1) computed $evals source elements")
  }

  test("filter skips without over-advancing past the first match") {
    var evals = 0
    val s = counting(100)(_ => evals += 1)
    val first = s.filter(_.intValue() % 5 == 4).take(1).toList
    assert(first.map(_.intValue()) == List(4))
    assert(evals == 5, s"finding the first match computed $evals elements")
  }

  test("cells memoize: re-traversal computes nothing") {
    var evals = 0
    val s = counting(10)(_ => evals += 1)
    assert(s.toList.size == 10 && evals == 10)
    assert(s.toList.size == 10)
    assert(evals == 10, "second traversal recomputed elements")
  }

  test("deep all-empty expansions do not overflow the stack") {
    val n = 200000
    val src = JqStream.from(Iterator.tabulate(n)(i => Json.num(i.toDouble)))
    val out = src.flatMap(v => if (v.intValue() == n - 1) JqStream(v) else JqStream.empty)
    assert(out.toList.map(_.intValue()) == List(n - 1))
  }
}
