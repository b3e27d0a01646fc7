package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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
