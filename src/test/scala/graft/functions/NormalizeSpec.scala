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

  test("compression ratio orders repetitive < prose < random, deterministically") {
    def unif(s: Long) = (Mix.splitmix64(s) >>> 11).toDouble / (1L << 53).toDouble
    val repetitive = "the same boilerplate line over and over " * 50
    val prose = (0 until 300).map(i =>
      s"word${(unif(i) * 800).toInt} item${(unif(i + 7000) * 300).toInt}").mkString(" ")
    val random = (0 until 2000).map(i =>
      (0x21 + (unif(i * 31L) * 93).toInt).toChar).mkString
    val df = Seq((1L, repetitive), (2L, prose), (3L, random)).toDF("id", "t")
    val got = df.select(col("id"),
        graft.pipeline.TextAnalysis.compressionRatio(col("t")).as("r"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) < got(2L) && got(2L) < got(3L),
      s"repetitive < prose < random must hold: $got")
    assert(got(1L) < 100000, s"heavy repetition compresses under 10%: ${got(1L)}")
    assert(got(3L) > 700000, s"near-random text barely compresses: ${got(3L)}")
    val again = df.select(col("id"),
        graft.pipeline.TextAnalysis.compressionRatio(col("t")).as("r"))
      .as[(Long, Long)].collect().toMap
    assert(got == again, "fixed-level deflate is deterministic")
    // null -> null; empty -> 1e6 (incompressible by definition)
    val edge = Seq[(java.lang.Long, String)]((10L, null), (11L, ""))
      .toDF("id", "t")
      .select(col("id"), graft.pipeline.TextAnalysis.compressionRatio(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(edge(10L) == null && edge(11L) == 1000000L, s"$edge")
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
  test("SQL surface: unicode_normalize / compression_ratio_ppm / phrase_occurrences") {
    graft.Graft.register(spark)
    import spark.implicits._
    Seq(("e\u0301 big scan big scan", 1)).toDF("t", "x").createOrReplaceTempView("sqlsurf")
    val r = spark.sql("""
      SELECT unicode_normalize(t, 'NFC') AS nfc,
             compression_ratio_ppm(t) AS ratio,
             phrase_occurrences(t, 'big scan') AS n,
             snippet_around(t, 'scan', 1) AS snip
      FROM sqlsurf""").head
    assert(r.getString(0).startsWith("\u00e9"), "NFC composes the accent")
    assert(r.getLong(1) > 0L)
    assert(r.getLong(2) == 2L, s"phrase twice: $r")
    assert(r.getString(3) == "big scan big", s"snippet: $r")
    // constant-argument validation is an ANALYSIS-time error, like jq
    val e = intercept[Exception] {
      spark.sql("SELECT phrase_occurrences(t, t) FROM sqlsurf").collect()
    }
    assert(e.getMessage.contains("constant"), e.getMessage)
  }
}
