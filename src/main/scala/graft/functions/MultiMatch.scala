package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matching (Aho & Corasick, CACM 1975) —
  * the single-pass answer to "screen 100 TB of text against a
  * blocklist": N literal patterns compile into one goto/fail automaton
  * and every document is scanned ONCE, counting every occurrence of
  * every pattern (including overlaps and patterns nested inside each
  * other — "tab", "table" and "able" all hit on "table"). The
  * alternative — N `LIKE`/regex predicates — re-scans the corpus per
  * pattern; at blocklist sizes (hundreds of terms) that is the
  * difference between one pass and a hundred.
  *
  * Counting semantics: `n` = number of START positions at which the
  * pattern occurs (equivalently end positions — overlapping
  * occurrences all count), exactly replayable by a position-scan
  * oracle. Matching is over Java chars (UTF-16 code units) on literal
  * patterns — no regex, no case folding (normalize upstream). */
object AhoCorasick {

  /** Immutable automaton: per-state goto maps, fail links, and the
    * pattern indices terminating at each state (fail-closure merged). */
  final class Automaton private[AhoCorasick] (
      private[AhoCorasick] val goto_ : Array[java.util.HashMap[Character, Integer]],
      private[AhoCorasick] val fail: Array[Int],
      private[AhoCorasick] val out: Array[Array[Int]],
      val nPatterns: Int) {

    /** Scan `text` once; returns per-pattern occurrence counts. */
    def countAll(text: String): Array[Long] = {
      val counts = new Array[Long](nPatterns)
      var st = 0
      var i = 0
      val n = text.length
      while (i < n) {
        val c = Character.valueOf(text.charAt(i))
        var g = goto_(st).get(c)
        while (g == null && st != 0) { st = fail(st); g = goto_(st).get(c) }
        st = if (g == null) 0 else g.intValue()
        val o = out(st)
        var j = 0
        while (j < o.length) { counts(o(j)) += 1; j += 1 }
        i += 1
      }
      counts
    }
  }

  /** Build the automaton: trie insert, BFS fail links, output sets
    * merged through the fail closure (the standard construction). */
  def build(patterns: Seq[String]): Automaton = {
    require(patterns.nonEmpty, "AhoCorasick needs at least one pattern")
    require(patterns.forall(_.nonEmpty), "empty pattern")
    require(patterns.distinct.size == patterns.size,
      s"duplicate patterns: ${patterns.diff(patterns.distinct).mkString(", ")}")
    val goto_ = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val outB = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var st = 0
      p.foreach { ch =>
        val c = Character.valueOf(ch)
        val nxt = goto_(st).get(c)
        if (nxt == null) {
          goto_ += new java.util.HashMap[Character, Integer]()
          outB += scala.collection.mutable.ArrayBuffer.empty[Int]
          goto_(st).put(c, goto_.size - 1)
          st = goto_.size - 1
        } else st = nxt.intValue()
      }
      outB(st) += pi
    }
    val fail = new Array[Int](goto_.size)
    val queue = new java.util.ArrayDeque[Int]()
    goto_(0).forEach((_, s) => { fail(s) = 0; queue.add(s) })
    while (!queue.isEmpty) {
      val u = queue.poll()
      goto_(u).forEach { (c, v) =>
        queue.add(v)
        var f = fail(u)
        var g = goto_(f).get(c)
        while (g == null && f != 0) { f = fail(f); g = goto_(f).get(c) }
        // g is always shallower than v (the fail walk only descends one
        // level from a proper suffix), so g can never be v itself
        fail(v) = if (g == null) 0 else g.intValue()
        outB(v) ++= outB(fail(v))
      }
    }
    new Automaton(goto_.toArray, fail, outB.map(_.toArray).toArray,
      patterns.size)
  }
}

/** multi_match(text) → array<struct<pattern string, n bigint>> — the
  * [[AhoCorasick]] single-pass screen as a scalar expression over a
  * CONSTANT pattern list (baked into the plan like a broadcast; the
  * automaton builds once per executor via the transient lazy). Only
  * patterns with n > 0 are emitted, in pattern-list order. */
case class MultiMatch(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val ac = AhoCorasick.build(patterns)
  @transient private lazy val patUtf8 =
    patterns.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any = {
    val counts = ac.countAll(input.asInstanceOf[UTF8String].toString)
    val hits = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < counts.length) {
      if (counts(i) > 0) hits += InternalRow(patUtf8(i), counts(i))
      i += 1
    }
    new GenericArrayData(hits.toArray)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"multi_match expects STRING, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pattern", StringType, nullable = false),
    StructField("n", LongType, nullable = false))),
    containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): MultiMatch =
    copy(child = newChild)
  override def prettyName: String = "multi_match"
}
