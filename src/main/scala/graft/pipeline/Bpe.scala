package graft.pipeline

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{GraftShim => E}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{RequiresStringInput, WordTok}

/** Corpus-trained byte-pair-encoding tokenizer (Sennrich et al., ACL'16)
  * — the `text_tokens` regex count estimates token BUDGETS; this is the
  * real thing a training pipeline runs: train merges on the corpus, then
  * tokenize every document with them.
  *
  * Spark-first split of the work:
  *  - TRAIN: one distributed word-count pass (explode → partial-agg
  *    counts — the same shuffle shape as `text_vocab`), capped to the
  *    top-`maxVocab` words by count (TakeOrdered, no global sort), then
  *    DRIVER-side merge learning over the word→count map. This is how
  *    production tokenizer trainers work (HuggingFace/SentencePiece train
  *    from word frequencies, not the raw corpus): the word-count table is
  *    millions of rows where the corpus is billions of documents, and the
  *    merge loop is inherently sequential — distributing it buys nothing.
  *    The loop recounts pairs per merge: O(nMerges × Σ word lengths),
  *    bounded by the vocab cap, independent of corpus size.
  *  - ENCODE: embarrassingly parallel — the learned merges broadcast as
  *    plan-constant state inside [[BpeEncode]] (a pure map: no shuffle
  *    anywhere in the encode path) with a per-task word→tokens cache that
  *    Zipf's law makes extremely effective.
  *
  * Determinism: pair selection breaks count ties on lexicographic pair
  * order, the vocab cap breaks count ties on word order, so the same
  * corpus always learns the same merges under any partitioning — and
  * encode is a pure function of (merges, text). End-of-word marker is a
  * SPACE (see [[Bpe.EndOfWord]] — collision-free by construction where
  * the classic "</w>" is ambiguous against literal markup); round-trip
  * (concatenating the token stream reproduces the whitespace-normalized
  * document exactly) is spec- and oracle-enforced.
  *
  * Lifecycle mirrors the other persisted artifacts ([[Dedup.buildBloomGate]],
  * `Similarity.buildIvfIndex`): [[Bpe.saveModel]] / [[Bpe.loadModel]]
  * persist the ranked merge table as parquet so a tokenizer trained once
  * tokenizes every later batch (or stream — encode is stateless).
  */
object Bpe {
  /** End-of-word marker: a single SPACE, not the classic "</w>" string.
    * Words come from whitespace splitting, so no symbol can ever contain
    * a space — the marker is PROVABLY collision-free with document
    * content (a literal "</w>" in scraped XML would make the classic
    * marker ambiguous and detokenization lossy), and detokenization is
    * just concatenation: tokens of "low lower" concat to "low lower ". */
  val EndOfWord = " "

  final case class Model(merges: IndexedSeq[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
  }

  /** Symbols of one word: UNICODE CODE POINTS + the end-of-word marker.
    * Code points, not UTF-16 chars — splitting a surrogate pair would
    * emit unpaired-surrogate tokens that UTF8String silently turns into
    * '?', corrupting every emoji/astral-plane word. */
  private[pipeline] def symbols(word: String): Array[String] = {
    val n = word.codePointCount(0, word.length)
    val out = new Array[String](n + 1)
    var i = 0
    var off = 0
    while (i < n) {
      val cp = word.codePointAt(off)
      val len = Character.charCount(cp)
      out(i) = word.substring(off, off + len)
      off += len
      i += 1
    }
    out(n) = EndOfWord
    out
  }

  private def mergeAll(syms: Array[String], a: String, b: String): Array[String] = {
    val out = new ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** The merge-learning core, exposed for spec hand-verification: greedy
    * highest-weighted-pair-count merges over a word→count map, ties on
    * lexicographic pair order. Stops early when no pair occurs twice. */
  def trainFromCounts(wordCounts: Seq[(String, Long)], nMerges: Int): Model = {
    var words: Array[(Array[String], Long)] =
      wordCounts.map { case (w, c) => (symbols(w), c) }.toArray
    val merges = ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < nMerges && !done) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      val best = pairCounts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, (p, c)) => acc match {
          case Some((bp, bc)) if bc > c => acc
          case Some((bp, bc)) if bc == c &&
            (bp._1 < p._1 || (bp._1 == p._1 && bp._2 <= p._2)) => acc
          case _ => Some((p, c))
        }
      }
      best match {
        case Some((p, c)) if c >= 2 =>
          merges += p
          words = words.map { case (syms, cnt) => (mergeAll(syms, p._1, p._2), cnt) }
        case _ => done = true
      }
    }
    Model(merges.toIndexedSeq)
  }

  /** Distributed word-count pass + driver merge learning. */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
            maxVocab: Int = 1000000): Model = {
    val counts = docs
      .select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    trainFromCounts(counts, nMerges)
  }

  /** Tokenize `textCol` with a trained model: array of BPE tokens over
    * the document's whitespace words (each word's final token carries the
    * `</w>` marker). Pure map — safe on streams. */
  def encode(model: Model, text: Column): Column =
    E.column(BpeEncode(E.expression(text), model.merges))

  /** Persist the ranked merge table (`rank, left, right` parquet). */
  def saveModel(spark: SparkSession, model: Model, dir: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "left", "right")
      .repartition(1).write.mode("overwrite").parquet(dir)
  }

  def loadModel(spark: SparkSession, dir: String): Model =
    Model(spark.read.parquet(dir).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toIndexedSeq)
}

/** bpe_encode(text) with plan-constant learned merges: per word, greedily
  * merge the LOWEST-RANK adjacent pair until none applies (the canonical
  * BPE encode), with a bounded per-task word→tokens cache — under a Zipf
  * word distribution nearly every encode is a cache hit. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback with RequiresStringInput {

  @transient private lazy val ranks: java.util.HashMap[(String, String), Integer] = {
    val m = new java.util.HashMap[(String, String), Integer]()
    merges.zipWithIndex.foreach { case (p, r) => m.put(p, r) }
    m
  }
  private val MaxCache = 1 << 16
  @transient private lazy val cache = new java.util.HashMap[String, Array[UTF8String]]()

  private def encodeWord(word: String): Array[UTF8String] = {
    var syms: Array[String] = Bpe.symbols(word)
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get((syms(i), syms(i + 1)))
        if (r != null && r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) continue = false
      else {
        val (a, b) = (syms(bestIdx), syms(bestIdx + 1))
        val out = new ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += a + b; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
      }
    }
    syms.map(UTF8String.fromString)
  }

  override def nullSafeEval(input: Any): Any = {
    val words = WordTok.tokens(input.asInstanceOf[UTF8String].toString)
    val out = ArrayBuffer.empty[UTF8String]
    words.foreach { w =>
      var toks = cache.get(w)
      if (toks == null) {
        toks = encodeWord(w)
        if (cache.size >= MaxCache) cache.clear()
        cache.put(w, toks)
      }
      out ++= toks
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
  override def prettyName: String = "bpe_encode"
}
