package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** compression_ratio_ppm(text) → bigint — deflate(level 6) bytes over
  * raw UTF-8 bytes, in ppm. The classic cheap proxy for redundancy that
  * pairs with the gram-based repetition signals: boilerplate, templated
  * spam, and pathological repetition compress far below normal prose
  * (~300k-600k ppm), while encrypted/binary-in-text junk sits near or
  * above 1e6. Deterministic for a fixed zlib level (the JDK bundles
  * zlib; same bytes → same ratio), so it is spec-pinned by ORDERING
  * contracts (repetitive < prose < random) rather than exact ppm values,
  * and the query is rows-only — no SQL engine can replay deflate.
  * One Deflater PER EXECUTOR THREAD (ThreadLocal, reset between rows):
  * allocation per row would dominate at web scale, and a per-expression-
  * instance Deflater leaks native zlib state between GC cycles on
  * long-lived executors running many tasks — the thread pool bounds the
  * live count to #cores regardless of task churn.
  * NULL → NULL; empty string → 1e6. */
case class CompressionRatioPpm(child: Expression)
    extends UnaryExpression with CodegenFallback with RequiresStringInput {

  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].getBytes
    if (raw.isEmpty) return 1000000L
    val deflater = CompressionRatioPpm.deflaters.get()
    val sink = CompressionRatioPpm.sinks.get()
    deflater.reset()
    deflater.setInput(raw)
    deflater.finish()
    var compressed = 0L
    while (!deflater.finished()) compressed += deflater.deflate(sink)
    compressed * 1000000L / raw.length
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override protected def withNewChildInternal(newChild: Expression): CompressionRatioPpm =
    copy(child = newChild)
  override def prettyName: String = "compression_ratio_ppm"
}

object CompressionRatioPpm {
  // per-thread native zlib state: executor threads are pooled and
  // long-lived, so this is bounded by thread count, not task count
  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, /* nowrap = */ true)
  }
  private val sinks = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
  }
}

/** unicode_normalize(text, form) — Unicode normalization as a scalar
  * expression (Spark has no built-in for it; DuckDB's `nfc_normalize`
  * gates the NFC path cross-engine). The canonical curation step before
  * any hashing/dedup/tokenizing pass: the SAME text arrives from the web
  * both composed (é = U+00E9) and decomposed (e + U+0301), and every
  * downstream equality — content hashes, shingles, BPE merges, exact
  * dedup — silently misses unless one form is pinned first. NFC for
  * general text; NFKC additionally folds compatibility forms (ligatures,
  * full-width digits) — the aggressive variant quality classifiers
  * usually want. Skips the (costly) normalizer entirely for strings that
  * are already-normalized ASCII — the overwhelming bulk of a web corpus —
  * via the JDK's quick-check. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with CodegenFallback with RequiresStringInput {
  private val nf = form.toUpperCase match {
    case "NFC" => Normalizer.Form.NFC
    case "NFD" => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
    case other => throw new IllegalArgumentException(
      s"unicode_normalize form must be NFC|NFD|NFKC|NFKD, got '$other'")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, nf)) input
    else UTF8String.fromString(Normalizer.normalize(s, nf))
  }

  override def dataType: DataType = StringType
  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
  override def prettyName: String = "unicode_normalize"
}
