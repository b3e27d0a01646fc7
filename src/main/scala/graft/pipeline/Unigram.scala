package graft.pipeline

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{GraftShim => E}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{RequiresStringInput, WordTok}

/** Corpus-trained UNIGRAM-LM tokenizer (Kudo, ACL'18 — the
  * SentencePiece-style trainer most current LLM stacks actually ship)
  * beside [[Bpe]]'s merge learner: where BPE grows tokens bottom-up by
  * greedy pair merges, the unigram model starts from a LARGE seed piece
  * inventory and PRUNES it under an EM loop — segmentation quality is
  * what survives, not merge order.
  *
  * Integerized so the whole lifecycle hash-gates (the engine's standard
  * move where the textbook algorithm is float): piece log-probabilities
  * ride the house lg64 grade — `cost(p) = lg64(total) − lg64(count p)`,
  * a monotone integer −log p — and the E-step is HARD (Viterbi-only)
  * EM: each vocabulary word segments by min total cost with the
  * deterministic tie chain (fewer pieces, then the
  * lexicographically-smallest chr(31)-joined piece path), pieces
  * recount from the Viterbi paths weighted by word frequency, and the
  * M-step's new counts feed the next iteration. Forward-backward soft
  * counts would be IEEE-sum-order-dependent; Viterbi counts are a pure
  * integer function of the input, replayed piece for piece by the
  * DuckDB oracle. Single code points are pinned into the vocabulary
  * with count ≥ 1 (full coverage — no word can fail to segment);
  * pieces at the final prune keep the top `nVocab` by (count, piece).
  *
  * Spark-first split (the [[Bpe.train]] architecture): ONE distributed
  * word-count pass + ONE distributed substring-candidate count
  * (explode → partial-agg — the text_vocab shuffle shape, capped by
  * TakeOrdered), then driver-side EM over the ≤ `maxVocab`-row
  * word-count table (tokenizer trainers work from word frequencies, not
  * raw corpora; the loop is sequential and bounded by the vocab cap,
  * independent of corpus size). Encode is a PURE MAP: the pruned piece
  * table ships as plan-constant state inside [[UnigramEncode]] with a
  * per-task word→pieces cache (Zipf makes it nearly always hit). */
object Unigram {

  /** Piece path separator for the tie-break comparison: ASCII 31 sorts
    * below every printable glyph, so "ab·c" < "a·bc" ordering is decided
    * by the boundary position; ties on piece CONTENT (same boundaries)
    * break on [[cpLess]] code-point order, which equals DuckDB's UTF-8
    * byte collation for every input including astral code points. */
  val Sep = '\u001f'

  final case class Model(pieces: IndexedSeq[(String, Long)], total: Long) {
    require(total >= 1, "model total must be >= 1")
    @transient lazy val costs: Map[String, Long] = {
      val lt = lg64(total)
      pieces.iterator.map { case (p, c) => p -> (lt - lg64(c)) }.toMap
    }
    @transient lazy val maxPieceLen: Int =
      if (pieces.isEmpty) 1
      else pieces.iterator.map(p => p._1.codePointCount(0, p._1.length)).max
    /** Unseen-at-train single glyphs segment at the count-1 cost. */
    @transient lazy val unkCost: Long = lg64(total) - 64L
  }

  /** The house integer log grade ([[graft.functions.Lg64]] arithmetic,
    * driver-side twin). Domain 1 ≤ x < 2^57. */
  private[pipeline] def lg64(x: Long): Long = {
    require(x >= 1 && x < (1L << 57), s"lg64 domain is [1, 2^57), got $x")
    val bl = 64 - java.lang.Long.numberOfLeadingZeros(x)
    64L * bl + (x * 64L) / (1L << (bl - 1)) - 64L
  }

  /** The word as CODE POINTS (one String per point): piece boundaries
    * land between code points, never inside a surrogate pair (the
    * [[Bpe.symbols]] argument — a split pair turns into '?' inside
    * UTF8String and corrupts every astral-plane word), and code-point
    * positions are exactly what DuckDB's character-based substr/len
    * replay. */
  private[pipeline] def codePoints(word: String): Array[String] = {
    val n = word.codePointCount(0, word.length)
    val out = new Array[String](n)
    var i = 0
    var off = 0
    while (i < n) {
      val len = Character.charCount(word.codePointAt(off))
      out(i) = word.substring(off, off + len)
      off += len
      i += 1
    }
    out
  }

  /** Code-point lexicographic comparison — identical to UTF-8 BYTE
    * order (DuckDB's collation), unlike Java's UTF-16 code-unit
    * `compareTo` which ranks U+E000..U+FFFF above supplementary
    * (astral) code points. Every piece/path tie in this trainer breaks
    * on THIS order so both engines resolve ties identically for any
    * input, not just BMP-below-U+E000 corpora. */
  private[pipeline] def cpLess(a: String, b: String): Boolean = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    i >= a.length && j < b.length
  }

  /** [[cpLess]] as an Ordering, for the (count DESC, piece) prune. */
  private[pipeline] val CpOrdering: Ordering[String] =
    (a: String, b: String) =>
      if (cpLess(a, b)) -1 else if (cpLess(b, a)) 1 else 0

  /** Viterbi segmentation under integer costs with the deterministic
    * tie chain: min cost, then fewer pieces, then code-point-smallest
    * Sep-joined path ([[cpLess]] — the UTF-8 byte order the DuckDB
    * oracle's ORDER BY uses). Positions are CODE POINTS. Exposed for
    * spec hand-verification. */
  private[pipeline] def segment(word: String, costOf: String => Option[Long],
                                unkCost: Long, maxLen: Int): Array[String] = {
    val cps = codePoints(word)
    val n = cps.length
    // dp(j) = (cost, nPieces, path) for the best segmentation of [0, j)
    val cost = new Array[Long](n + 1)
    val np = new Array[Int](n + 1)
    val path = new Array[String](n + 1)
    path(0) = ""
    var j = 1
    while (j <= n) {
      var bc = Long.MaxValue; var bn = Int.MaxValue; var bp: String = null
      var i = math.max(0, j - maxLen)
      while (i < j) {
        val piece = cps.slice(i, j).mkString
        val pc = costOf(piece).orElse(
          if (j - i == 1) Some(unkCost) else None)
        pc.foreach { c =>
          if (path(i) != null) {
            val cc = cost(i) + c
            val cn = np(i) + 1
            val cp = if (path(i).isEmpty) piece else path(i) + Sep + piece
            if (cc < bc || (cc == bc && (cn < bn || (cn == bn && cpLess(cp, bp))))) {
              bc = cc; bn = cn; bp = cp
            }
          }
        }
        i += 1
      }
      cost(j) = bc; np(j) = bn; path(j) = bp
      j += 1
    }
    if (path(n) == null) Array(word) // unreachable: singles always cover
    else if (path(n).isEmpty) Array.empty
    else path(n).split(Sep)
  }

  /** The EM-prune core over a word→count table, exposed for spec
    * verification: seed with every ≤ `maxPieceLen` substring (count =
    * occurrence-weighted corpus frequency, top `seedSize` by (count,
    * piece) + all single glyphs), run `iters` hard-EM rounds (Viterbi
    * segment → recount → keep covered singles at ≥ 1), prune to the top
    * `nVocab` by (count, piece) + singles. */
  def trainFromCounts(wordCounts: Seq[(String, Long)], nVocab: Int,
                      maxPieceLen: Int = 4, seedSize: Int = 4096,
                      iters: Int = 2): Model = {
    require(nVocab >= 1 && maxPieceLen >= 1 && seedSize >= 1 && iters >= 0,
      s"bad unigram params ($nVocab, $maxPieceLen, $seedSize, $iters)")
    val singles: Set[String] =
      wordCounts.iterator.flatMap(wc => codePoints(wc._1)).toSet
    // seed: occurrence-weighted substring counts (code-point positions)
    val seedCounts = mutable.HashMap.empty[String, Long]
    wordCounts.foreach { case (w, n) =>
      val cps = codePoints(w)
      var i = 0
      while (i < cps.length) {
        var j = i + 1
        while (j <= math.min(cps.length, i + maxPieceLen)) {
          val p = cps.slice(i, j).mkString
          seedCounts.update(p, seedCounts.getOrElse(p, 0L) + n)
          j += 1
        }
        i += 1
      }
    }
    def cap(m: collection.Map[String, Long], k: Int): Map[String, Long] = {
      val kept = m.toSeq
        .sortBy { case (p, c) => (-c, p) }(Ordering.Tuple2(Ordering.Long, CpOrdering))
        .take(k).toMap
      // singles are pinned for coverage, floored at count 1
      singles.foldLeft(kept)((acc, s) =>
        if (acc.contains(s)) acc else acc + (s -> math.max(m.getOrElse(s, 1L), 1L)))
    }
    var counts: Map[String, Long] = cap(seedCounts, seedSize)
    for (_ <- 1 to iters) {
      val total = math.max(counts.valuesIterator.sum, 1L)
      val lt = lg64(total)
      val costs = counts.map { case (p, c) => p -> (lt - lg64(c)) }
      val usage = mutable.HashMap.empty[String, Long]
      wordCounts.foreach { case (w, n) =>
        segment(w, costs.get, lt - 64L, maxPieceLen).foreach(p =>
          usage.update(p, usage.getOrElse(p, 0L) + n))
      }
      counts = cap(usage, seedSize)
    }
    val pruned = cap(counts, nVocab)
    Model(pruned.toSeq
        .sortBy { case (p, c) => (-c, p) }(Ordering.Tuple2(Ordering.Long, CpOrdering))
        .toIndexedSeq,
      math.max(pruned.valuesIterator.sum, 1L))
  }

  /** Distributed word-count pass + driver EM ([[Bpe.train]] shape). */
  def train(docs: DataFrame, textCol: String, nVocab: Int,
            maxPieceLen: Int = 4, seedSize: Int = 4096, iters: Int = 2,
            maxVocab: Int = 1000000): Model = {
    val counts = docs
      .select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    trainFromCounts(counts, nVocab, maxPieceLen, seedSize, iters)
  }

  /** Tokenize `textCol` with a trained model: the per-word Viterbi
    * pieces concatenated over the document's whitespace words. Pure
    * map — safe on streams. */
  def encode(model: Model, text: Column): Column =
    E.column(UnigramEncode(E.expression(text), model.pieces, model.total))

  /** Persist the pruned piece table (`piece, cnt` parquet) — the
    * [[Bpe.saveModel]] lifecycle: train once, tokenize every later
    * batch or stream (encode is stateless). `total` is NOT stored: it
    * is the sum of the stored counts by construction, recomputed on
    * load so the artifact cannot drift against itself. */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: Model,
                dir: String): Unit = {
    import spark.implicits._
    model.pieces.toDF("piece", "cnt")
      .repartition(1).write.mode("overwrite").parquet(dir)
  }

  def loadModel(spark: org.apache.spark.sql.SparkSession, dir: String): Model = {
    val pieces = spark.read.parquet(dir)
      .select("piece", "cnt")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (p, c) => (-c, p) }(Ordering.Tuple2(Ordering.Long, CpOrdering)).toIndexedSeq
    Model(pieces, math.max(pieces.map(_._2).sum, 1L))
  }
}

/** unigram_encode(text) with the plan-constant pruned piece table: per
  * word, Viterbi min-cost segmentation under the lg64 cost grade (ties:
  * fewer pieces, then smallest Sep-joined path), with a bounded
  * per-task word→pieces cache. */
case class UnigramEncode(child: Expression, pieces: Seq[(String, Long)],
                         total: Long)
    extends UnaryExpression with CodegenFallback with RequiresStringInput {

  @transient private lazy val model =
    Unigram.Model(pieces.toIndexedSeq, total)
  private val MaxCache = 1 << 16
  @transient private lazy val cache = new java.util.HashMap[String, Array[UTF8String]]()

  override def nullSafeEval(input: Any): Any = {
    val words = WordTok.tokens(input.asInstanceOf[UTF8String].toString)
    val out = ArrayBuffer.empty[UTF8String]
    words.foreach { w =>
      var toks = cache.get(w)
      if (toks == null) {
        toks = Unigram.segment(w, model.costs.get, model.unkCost,
          model.maxPieceLen).map(UTF8String.fromString)
        if (cache.size >= MaxCache) cache.clear()
        cache.put(w, toks)
      }
      out ++= toks
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
  override def prettyName: String = "unigram_encode"
}
