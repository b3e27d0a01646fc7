package graft.jq

import com.fasterxml.jackson.databind.JsonNode

/** Minimal memoizing lazy stream of JsonNode — the interpreter's output
  * representation (`Interp.S`).
  *
  * Exists because `scala.LazyList` costs ~400 ns per generated element on
  * the generator-heavy paths (`range`, `.[]`, `recurse`): every cell is a
  * state-machine object whose head AND tail are synchronized lazy thunks.
  * jq evaluation is strictly single-threaded per input row (one Spark task
  * evaluates one row at a time; `CompiledJq` shares only the immutable
  * AST), so the synchronization buys nothing. This class keeps exactly the
  * laziness jq semantics need — tails are deferred and memoized, so
  * infinite generators (`repeat`, `recurse`, unbounded `range`) compose
  * with `limit/first` — with plain-field memoization and strict heads.
  *
  * NOT thread-safe by design; do not share a partially-forced stream
  * across threads. All combinators skip empty sub-streams iteratively so
  * degenerate shapes (a million `empty` outputs in a row) cannot build
  * deep thunk stacks.
  */
sealed abstract class JqStream extends IterableOnce[JsonNode] {
  def isEmpty: Boolean
  def head: JsonNode
  def tail: JqStream
  override def knownSize: Int = -1

  @inline final def nonEmpty: Boolean = !isEmpty
  final def headOption: Option[JsonNode] = if (isEmpty) None else Some(head)

  final def map(f: JsonNode => JsonNode): JqStream =
    if (isEmpty) JqStream.empty else new JqStream.Cons(f(head), () => tail.map(f))

  final def flatMap(f: JsonNode => JqStream): JqStream = {
    var s: JqStream = this
    while (!s.isEmpty) {
      val fs = f(s.head)
      if (!fs.isEmpty) {
        // capture the SOURCE cell, not s.tail: forcing the source's next
        // element here would evaluate one element beyond what the consumer
        // asked for (an error/break/divergence there must not fire before
        // this expansion's outputs are delivered)
        val src = s
        return new JqStream.Cons(fs.head, () => JqStream.flatCont(fs.tail, src, f))
      }
      s = s.tail
    }
    JqStream.empty
  }

  final def filter(p: JsonNode => Boolean): JqStream = {
    var s: JqStream = this
    while (!s.isEmpty) {
      if (p(s.head)) return new JqStream.Cons(s.head, () => s.tail.filter(p))
      s = s.tail
    }
    JqStream.empty
  }
  final def filterNot(p: JsonNode => Boolean): JqStream = filter(v => !p(v))
  final def withFilter(p: JsonNode => Boolean): JqStream = filter(p)

  final def take(n: Int): JqStream =
    if (n <= 0 || isEmpty) JqStream.empty
    // n == 1 must NOT thunk `tail.take(0)`: forcing tail would evaluate
    // element n+1, which limit/first promise never to touch
    else if (n == 1) new JqStream.Cons(head, JqStream.emptyThunk)
    else new JqStream.Cons(head, () => tail.take(n - 1))

  final def drop(n: Int): JqStream = {
    var s: JqStream = this
    var i = n
    while (i > 0 && !s.isEmpty) { s = s.tail; i -= 1 }
    s
  }

  final def slice(from: Int, until: Int): JqStream =
    if (until <= from) JqStream.empty else drop(from).take(until - from)

  final def takeWhile(p: JsonNode => Boolean): JqStream =
    if (isEmpty || !p(head)) JqStream.empty
    else new JqStream.Cons(head, () => tail.takeWhile(p))

  final def foreach[U](f: JsonNode => U): Unit = {
    var s: JqStream = this
    while (!s.isEmpty) { f(s.head); s = s.tail }
  }

  final def foldLeft[B](z: B)(op: (B, JsonNode) => B): B = {
    var acc = z
    var s: JqStream = this
    while (!s.isEmpty) { acc = op(acc, s.head); s = s.tail }
    acc
  }

  final def exists(p: JsonNode => Boolean): Boolean = {
    var s: JqStream = this
    while (!s.isEmpty) { if (p(s.head)) return true; s = s.tail }
    false
  }
  final def forall(p: JsonNode => Boolean): Boolean = !exists(v => !p(v))

  final def find(p: JsonNode => Boolean): Option[JsonNode] = {
    var s: JqStream = this
    while (!s.isEmpty) { if (p(s.head)) return Some(s.head); s = s.tail }
    None
  }

  final def iterator: Iterator[JsonNode] = {
    val self = this
    new Iterator[JsonNode] {
      // advance lazily on the NEXT pull, not when the current head is
      // returned — `s = s.tail` inside next() would force the following
      // element's computation one pull early
      private[this] var s: JqStream = self
      private[this] var consumed = false
      private[this] def settle(): Unit =
        if (consumed) { s = s.tail; consumed = false }
      def hasNext: Boolean = { settle(); !s.isEmpty }
      def next(): JsonNode = { settle(); val h = s.head; consumed = true; h }
    }
  }

  final def toList: List[JsonNode] = {
    val b = List.newBuilder[JsonNode]
    foreach(b += _)
    b.result()
  }
  final def toSeq: Seq[JsonNode] = toList
  final def toVector: Vector[JsonNode] = {
    val b = Vector.newBuilder[JsonNode]
    foreach(b += _)
    b.result()
  }

  final def size: Int = foldLeft(0)((n, _) => n + 1)
  final def length: Int = size

  final def lastOption: Option[JsonNode] = {
    var s: JqStream = this
    var last: Option[JsonNode] = None
    while (!s.isEmpty) { last = Some(s.head); s = s.tail }
    last
  }

  final def ++(that: => JqStream): JqStream = JqStream.concat(this, () => that)

  final def zip(that: JqStream): Iterator[(JsonNode, JsonNode)] =
    iterator.zip(that.iterator)
}

object JqStream {
  private object Empty extends JqStream {
    def isEmpty: Boolean = true
    def head: JsonNode = throw new NoSuchElementException("head of empty JqStream")
    def tail: JqStream = throw new UnsupportedOperationException("tail of empty JqStream")
  }

  /** Memoizing cons cell: the tail thunk runs at most once; no locking —
    * single-threaded evaluation is the class contract. */
  final class Cons(val head: JsonNode, t0: () => JqStream) extends JqStream {
    private[this] var thunk: () => JqStream = t0
    private[this] var tl: JqStream = _
    def isEmpty: Boolean = false
    def tail: JqStream = {
      val t = thunk
      if (t ne null) { tl = t(); thunk = null }
      tl
    }
  }

  val empty: JqStream = Empty

  def apply(v: JsonNode): JqStream = new Cons(v, emptyThunk)
  private val emptyThunk: () => JqStream = () => Empty // companion-visible

  /** Fully deferred stream: nothing — not even the first element — is
    * computed until the stream is probed. For sites that must not run any
    * evaluation at construction time (e.g. the strict-path single cell,
    * whose errors must surface on forcing). Memoized like a cell. */
  def defer(t0: () => JqStream): JqStream = new Defer(t0)

  private final class Defer(t0: () => JqStream) extends JqStream {
    private[this] var thunk: () => JqStream = t0
    private[this] var v: JqStream = _
    private def forced: JqStream = {
      val t = thunk
      if (t ne null) { v = t(); thunk = null }
      v
    }
    def isEmpty: Boolean = forced.isEmpty
    def head: JsonNode = forced.head
    def tail: JqStream = forced.tail
  }

  def from(vs: IterableOnce[JsonNode]): JqStream = fromIterator(vs.iterator)

  /** The iterator is captured and advanced as cells force — safe because
    * each cell's thunk runs exactly once (memoized). */
  def fromIterator(it: Iterator[JsonNode]): JqStream =
    if (!it.hasNext) Empty else new Cons(it.next(), () => fromIterator(it))

  def continually(v: JsonNode): JqStream = new Cons(v, () => continually(v))

  def concat(a: JqStream, b: () => JqStream): JqStream = {
    if (!a.isEmpty) new Cons(a.head, () => concat(a.tail, b))
    else b()
  }

  /** flatMap continuation: drain `cur`, then resume flat-mapping the
    * elements after `src` (the source cell whose expansion `cur` is) —
    * `src.tail` is forced only HERE, when the consumer actually pulls past
    * the current expansion. The resume goes through flatMap's iterative
    * empty-skipping loop, so consecutive empty expansions never nest the
    * stack. */
  private def flatCont(cur: JqStream, src: JqStream,
                       f: JsonNode => JqStream): JqStream =
    if (!cur.isEmpty) new Cons(cur.head, () => flatCont(cur.tail, src, f))
    else src.tail.flatMap(f)

  /** `h #:: s` / `pre #::: s` with LazyList-like syntax; the right operand
    * is by-name (deferred until the cell's tail is forced). */
  implicit final class Deferrer(s: => JqStream) {
    def #::(h: JsonNode): JqStream = new Cons(h, () => s)
    def #:::(pre: JqStream): JqStream = concat(pre, () => s)
  }
}
