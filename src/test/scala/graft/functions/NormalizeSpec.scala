package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedSpark

/** Unicode normalization forms and the dedup-equality motivation. */
class NormalizeSpec extends AnyFunSuite {

  lazy val spark = SharedSpark.session
  import spark.implicits._

  private def norm(s: String, form: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(graft.pipeline.TextAnalysis.normalizeUnicode(col("t"), form))
      .as[String].head()

  test("NFC composes decomposed sequences; equality for dedup follows") {
    val decomposed = "café" // e + combining acute
    val composed = "café"
    assert(norm(decomposed, "NFC") == composed)
    assert(norm(composed, "NFC") == composed, "already-composed text is a no-op")
    // the motivating bug: without normalization these hash differently
    assert(decomposed != composed && norm(decomposed, "NFC") == norm(composed, "NFC"))
  }

  test("NFKC folds compatibility forms (ligatures, full-width) that NFC keeps") {
    assert(norm("ﬁn", "NFC") == "ﬁn", "NFC preserves the fi ligature")
    assert(norm("ﬁn", "NFKC") == "fin", "NFKC folds it")
    assert(norm("１２３", "NFKC") == "123", "full-width digits fold")
  }

  test("invalid form is rejected; NULL passes through; non-string is an analysis error") {
    intercept[IllegalArgumentException] {
      graft.functions.UnicodeNormalize(
        org.apache.spark.sql.graftshim.GraftShim.expression(col("t")), "NFX")
    }
    val n = Seq[Tuple1[String]](Tuple1(null)).toDF("t")
      .select(graft.pipeline.TextAnalysis.normalizeUnicode(col("t"), "NFC"))
      .as[String].head()
    assert(n == null)
    val err = intercept[Exception] {
      Seq(Tuple1(1)).toDF("t")
        .select(graft.pipeline.TextAnalysis.normalizeUnicode(col("t"), "NFC")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"), s"got: ${err.getMessage}")
  }
}
