package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word n-gram expressions — the ShingleSet pattern applied to
  * the WORD-gram family (repetition signals, bigram LM, inverted-index /
  * decontamination gram hashing).
  *
  * Why not built-ins: the `transform(sequence(0, size(w) - n),
  * i -> ...slice(w, i+1, n)...)` formulation references the tokenizer array
  * `w = split(lower(text), "\s+")` inside the lambda, and after
  * CollapseProject inlines it the FULL split re-evaluates on every lambda
  * invocation — O(n_words) work per gram, O(n_words²) per document. At
  * bench doc sizes (~150 words) that is invisible; on a heavy-tailed web
  * corpus one 100k-word document costs ~10^10 word-copies inside a single
  * task — a straggler that stalls the whole stage. These expressions
  * tokenize ONCE and slide a window: O(total output chars) per document.
  *
  * Tokenization replicates `filter(split(lower(text), "\\s+"), length > 0)`
  * EXACTLY (lowercase first via [[WordTok.lowerLikeSpark]], the
  * UTF8String.toLowerCase replica; split on java-regex \s runs =
  * [ \t\n\x0B\f\r]; empty tokens dropped) so the DuckDB oracles that mirror
  * that built-in pipeline keep matching hash-for-hash.
  */
object WordTok {
  @inline private def isWs(c: Char): Boolean = // java regex \s
    c == ' ' || c == '\t' || c == '\n' || c == '' || c == '\f' || c == '\r'

  /** Replica of Spark's `lower()` (UTF8String.toLowerCase): all-ASCII
    * strings lower per-char via Character.toLowerCase — locale-INDEPENDENT,
    * where a bare String#toLowerCase under a Turkish/Azeri default locale
    * would map ASCII 'I' → 'ı' and break hash parity with the built-in
    * pipeline — and only non-ASCII strings take the String#toLowerCase
    * slow path (default locale, exactly like UTF8String.toLowerCaseSlow). */
  def lowerLikeSpark(s: String): String = {
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (!ascii) s.toLowerCase
    else {
      val out = new Array[Char](s.length)
      var j = 0
      while (j < s.length) { out(j) = Character.toLowerCase(s.charAt(j)); j += 1 }
      new String(out)
    }
  }

  /** Whitespace-run tokens of the lowercased text. */
  def tokens(s0: String): Array[String] = {
    val s = lowerLikeSpark(s0)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      while (i < s.length && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < s.length && !isWs(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.toArray
  }

  /** Space-joined window w(i..i+n-1). */
  @inline def joinGram(w: Array[String], i: Int, n: Int): UTF8String = {
    var len = n - 1
    var j = 0
    while (j < n) { len += w(i + j).length; j += 1 }
    val sb = new java.lang.StringBuilder(len)
    j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      sb.append(w(i + j))
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Clean analysis-time error (instead of an execution-time ClassCastException)
  * when a text expression is fed a non-string child. */
trait RequiresStringInput extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${other.catalogString}")
  }
}

/** word_grams(text, n) → array<string>: ALL space-joined word n-grams in
  * document order (length = n_words − n + 1; empty array below n words) —
  * the single-pass equivalent of
  * `transform(sequence(0, size(w) - n), i -> array_join(slice(w, i+1, n), ' '))`. */
case class WordGrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback with RequiresStringInput {
  require(n > 0)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val w = WordTok.tokens(v.asInstanceOf[UTF8String].toString)
    if (w.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](w.length - n + 1)
      var i = 0
      while (i < out.length) { out(i) = WordTok.joinGram(w, i, n); i += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
  override def prettyName: String = "word_grams"
}

/** word_grams_tagged(text, ns) → array<struct<n:int, g:string>>: the grams
  * of EVERY size in `ns`, tagged with their size, from ONE tokenize pass —
  * for consumers that explode multiple gram sizes together (repetition
  * signals needs 2-grams and 3-grams of the same document). */
case class WordGramsTagged(child: Expression, ns: Seq[Int])
    extends UnaryExpression with CodegenFallback with RequiresStringInput {
  require(ns.nonEmpty && ns.forall(_ > 0))
  // duplicate sizes would silently emit every gram of that size twice,
  // skewing downstream count-based repetition metrics
  require(ns.distinct.length == ns.length, s"duplicate gram sizes in $ns")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("g", StringType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val w = WordTok.tokens(v.asInstanceOf[UTF8String].toString)
    var total = 0
    ns.foreach { n => if (w.length >= n) total += w.length - n + 1 }
    val out = new Array[Any](total)
    var k = 0
    ns.foreach { n =>
      if (w.length >= n) {
        var i = 0
        while (i <= w.length - n) {
          val row = new GenericInternalRow(2)
          row.update(0, n)
          row.update(1, WordTok.joinGram(w, i, n))
          out(k) = row: InternalRow
          k += 1
          i += 1
        }
      }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordGramsTagged =
    copy(child = newChild)
  override def prettyName: String = "word_grams_tagged"
}

/** word_chunks(text, n[, stride]) → array<string>: n-token windows of the
  * RAW whitespace split, starting every `stride` tokens — `stride = n`
  * (the default) is NON-overlapping chunking; `stride < n` is the RAG-
  * style overlapping window (`n - stride` tokens of context repeat
  * between neighbors). The non-overlapping form replicates
  * `transform(sequence(0, ceil(size(arr)/n)-1), i -> array_join(slice(
  * arr, i*n+1, n), ' '))` over `arr = split(text, "\\s+")` EXACTLY: java
  * split with limit -1 (no lowercasing, no empty-token filtering; leading
  * whitespace yields an empty first token, empty text yields one ""
  * chunk), so the text_chunks DuckDB oracle keeps matching; the
  * overlapping form covers every token with the last window starting at
  * the latest stride multiple that still reaches new tokens. Single
  * pass — the lambda form re-evaluates the split once per CHUNK
  * (O(n_words²/n) per document on the heavy tail). */
case class WordChunks(child: Expression, n: Int, strideOpt: Option[Int] = None)
    extends UnaryExpression with CodegenFallback with RequiresStringInput {
  require(n > 0)
  private val stride = strideOpt.getOrElse(n)
  require(stride > 0 && stride <= n,
    s"stride must be in [1, n=$n], got $stride (stride > n would DROP tokens)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[UTF8String].toString.split("\\s+", -1)
    // ceil((len - n) / stride) + 1 windows once len > n; always >= 1
    val nChunks =
      if (toks.length <= n) 1
      else (toks.length - n + stride - 1) / stride + 1
    val out = new Array[Any](nChunks)
    var c = 0
    while (c < nChunks) {
      val from = c * stride
      val until = math.min(from + n, toks.length)
      var len = until - from - 1
      var j = from
      while (j < until) { len += toks(j).length; j += 1 }
      val sb = new java.lang.StringBuilder(math.max(len, 0))
      j = from
      while (j < until) {
        if (j > from) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(c) = UTF8String.fromString(sb.toString)
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordChunks =
    copy(child = newChild)
  override def prettyName: String = "word_chunks"
}

/** word_gram_hashes(text, n) → array<bigint>: DISTINCT xxhash64 values of
  * the space-joined word n-grams, first-occurrence order — the single-pass
  * equivalent of `array_distinct(transform(..., i -> xxhash64(array_join(
  * slice(w, i+1, n), ' '))))`. Hashing goes through Spark's own
  * XxHash64Function (seed 42), so values are bit-identical to the built-in
  * `xxhash64` — existing tables/specs keyed on those hashes keep matching. */
case class WordGramHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback with RequiresStringInput {
  require(n > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val w = WordTok.tokens(v.asInstanceOf[UTF8String].toString)
    if (w.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i <= w.length - n) {
        seen.add(XxHash64Function.hash(WordTok.joinGram(w, i, n), StringType, 42L))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordGramHashes =
    copy(child = newChild)
  override def prettyName: String = "word_gram_hashes"
}

/** word_gram_hashes_pos(text, n) → array<bigint>: [[WordGramHashes]]
  * WITHOUT the dedup — one hash per gram POSITION (index i = the gram
  * starting at word i), so downstream ops can reason about WHERE matches
  * sit (contiguous runs, coverage spans), which the distinct set erases.
  * Same tokenizer, same xxhash64(seed 42) per joined gram. */
case class WordGramHashesPos(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback with RequiresStringInput {
  require(n > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val w = WordTok.tokens(v.asInstanceOf[UTF8String].toString)
    if (w.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](w.length - n + 1)
      var i = 0
      while (i <= w.length - n) {
        out(i) = XxHash64Function.hash(WordTok.joinGram(w, i, n), StringType, 42L)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordGramHashesPos =
    copy(child = newChild)
  override def prettyName: String = "word_gram_hashes_pos"
}

/** phrase_occurrences(text, phrase) → bigint: occurrences of `phrase` as
  * CONSECUTIVE [[WordTok.tokens]] tokens of the text (the tokenizer the
  * whole text family shares, so index terms, grams, and phrase matches
  * agree). Overlapping occurrences all count; a doc shorter than the
  * phrase counts 0; NULL text → NULL. One tight per-row scan — adjacency
  * is a within-document property, so this is a pure scalar and the
  * phrase operators built on it shuffle nothing. */
case class PhraseOccurrences(child: Expression, phrase: Seq[String])
    extends UnaryExpression with CodegenFallback with RequiresStringInput {
  require(phrase.nonEmpty && phrase.forall(_.nonEmpty),
    s"phrase must be non-empty tokens, got $phrase")
  // the text side tokenizes LOWERCASED (WordTok contract) — phrase terms
  // must join the same space or 'Big Scan' would silently match nothing
  private val normPhrase: Seq[String] = phrase.map(WordTok.lowerLikeSpark)

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val phrase = normPhrase
    val w = WordTok.tokens(v.asInstanceOf[UTF8String].toString)
    val m = w.length - phrase.length
    var c = 0L
    var i = 0
    while (i <= m) {
      var j = 0
      var ok = true
      while (ok && j < phrase.length) {
        if (w(i + j) != phrase(j)) ok = false
        j += 1
      }
      if (ok) c += 1
      i += 1
    }
    c
  }

  override protected def withNewChildInternal(newChild: Expression): PhraseOccurrences =
    copy(child = newChild)
  override def prettyName: String = "phrase_occurrences"
}

/** snippet_around(text, terms, window) → string: the ±`window`-token
  * context around the FIRST occurrence of any query term — the
  * search-result preview. Terms are lowercased through the shared
  * tokenizer contract; the earliest match across all terms anchors the
  * snippet (ties resolved by position, not term order); no match → NULL
  * (a filterable miss, distinct from an empty snippet). One tokenize +
  * one scan per row ([[WordTok]]); pure scalar, stream-safe. */
case class SnippetAround(child: Expression, terms: Seq[String], window: Int)
    extends UnaryExpression with CodegenFallback with RequiresStringInput {
  require(terms.nonEmpty && terms.forall(_.nonEmpty),
    s"terms must be non-empty, got $terms")
  require(window >= 0, s"window must be >= 0, got $window")
  private val normTerms: Set[String] = terms.map(WordTok.lowerLikeSpark).toSet

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val w = WordTok.tokens(v.asInstanceOf[UTF8String].toString)
    var i = 0
    while (i < w.length) {
      if (normTerms.contains(w(i))) {
        val from = math.max(0, i - window)
        // Long math: i + window + 1 overflows Int for window near
        // Int.MaxValue, which would silently yield an EMPTY snippet for a
        // real hit — an oversized window must clamp to the whole doc
        val until = math.min(w.length.toLong, i.toLong + window.toLong + 1L).toInt
        val sb = new java.lang.StringBuilder
        var j = from
        while (j < until) {
          if (j > from) sb.append(' ')
          sb.append(w(j))
          j += 1
        }
        return UTF8String.fromString(sb.toString)
      }
      i += 1
    }
    null
  }

  override protected def withNewChildInternal(newChild: Expression): SnippetAround =
    copy(child = newChild)
  override def prettyName: String = "snippet_around"
}
