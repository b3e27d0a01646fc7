package graft.functions

import org.apache.spark.sql.{AnalysisException, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{GraftShim => E}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.SharedSpark

/** Parity of the single-pass word-gram expressions against the built-in
  * transform(sequence(...)) lambda formulations they replace (the lambda
  * form re-evaluates the tokenizer split per gram — O(n_words²) per doc —
  * but is trivially correct, so it is the reference here). Every output
  * must match ELEMENT FOR ELEMENT: the pipeline's DuckDB oracles were
  * written against the built-in formulation and hash whole result sets. */
class WordGramsSpec extends AnyFunSuite {

  lazy val spark = SharedSpark.session
  import spark.implicits._

  // the exact built-in pipeline the expressions must replicate
  private def wordsB(text: Column): Column =
    filter(split(lower(text), "\\s+"), w => length(w) > 0)
  private def gramsBuiltin(text: Column, n: Int): Column = {
    val w = wordsB(text)
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => array_join(slice(w, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }
  private def hashesBuiltin(text: Column, n: Int): Column = {
    val w = wordsB(text)
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(0), size(w) - n),
        i => xxhash64(array_join(slice(w, i + 1, lit(n)), " ")))))
      .otherwise(array().cast("array<bigint>"))
  }

  private val trickyDocs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "  leading and trailing whitespace  ",
    "tabs\tand\nnewlines\u000Bvertical\ftabs\rcarriage returns",
    "MiXeD CaSe TOKENS Everywhere",
    "double  spaces   and    runs",
    "unicode élève STRAßE İstanbul naïve",
    "one",
    "two words",
    "exactly three words",
    "",
    "   ",
    "a b a b a b a b", // repeated grams (dedup path in WordGramHashes)
    "punct. marks, attached; to words!")

  test("WordGrams(n) equals the built-in formulation element-for-element") {
    val df = trickyDocs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(1, 2, 3, 8)) {
      val got = df.select($"id",
        E.column(WordGrams(E.expression($"text"), n)).as("g"),
        gramsBuiltin($"text", n).as("b")).collect()
      got.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n id=${r.getLong(0)}: ${r.getSeq[String](1)} vs ${r.getSeq[String](2)}")
      }
    }
  }

  test("WordGramHashes(n) equals array_distinct(xxhash64 lambda) bit-for-bit") {
    val df = trickyDocs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(1, 2, 8)) {
      val got = df.select($"id",
        E.column(WordGramHashes(E.expression($"text"), n)).as("g"),
        hashesBuiltin($"text", n).as("b")).collect()
      got.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"n=$n id=${r.getLong(0)}")
      }
    }
  }

  test("WordGramsTagged(ns) equals the concat-of-transforms formulation") {
    val df = trickyDocs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val builtin = concat(
      transform(gramsBuiltin($"text", 2), g => struct(lit(2).as("n"), g.as("g"))),
      transform(gramsBuiltin($"text", 3), g => struct(lit(3).as("n"), g.as("g"))))
    val got = df.select($"id",
      E.column(WordGramsTagged(E.expression($"text"), Seq(2, 3))).as("g"),
      builtin.as("b")).collect()
    got.foreach { r =>
      assert(r.getSeq[org.apache.spark.sql.Row](1) == r.getSeq[org.apache.spark.sql.Row](2),
        s"id=${r.getLong(0)}")
    }
  }

  test("generative parity: random whitespace-heavy strings") {
    // alphabet weighted toward whitespace variety + case + non-ASCII
    val ch = Gen.frequency(
      8 -> Gen.alphaNumChar,
      1 -> Gen.oneOf(' ', '\t', '\n', '', '\f', '\r'),
      1 -> Gen.oneOf('é', 'ß', 'X', 'Q', '.', ','))
    val strGen = Gen.chooseNum(0, 80).flatMap(len => Gen.stringOfN(len, ch))
    // manual sampling — the scalatest-scalacheck bridge isn't in the offline
    // dependency set (same pattern as JqPropertySpec)
    val docs = (0 until 300).map { i =>
      strGen.pureApply(Gen.Parameters.default.withSize(1 + i % 30), Seed(0x60e5L + i))
    }
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select(
      E.column(WordGrams(E.expression($"text"), 2)).as("g2"),
      gramsBuiltin($"text", 2).as("b2"),
      E.column(WordGramHashes(E.expression($"text"), 3)).as("h3"),
      hashesBuiltin($"text", 3).as("c3")).collect()
    got.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
      assert(r.getSeq[Long](2) == r.getSeq[Long](3))
    }
  }

  test("WordChunks equals the raw-split transform formulation (no lower, no filter)") {
    // note: RAW split semantics — unlike the gram family, leading
    // whitespace yields an empty first token and case is preserved
    def chunksBuiltin(text: Column, n: Int): Column = {
      val arr = split(text, "\\s+")
      val nChunks = greatest(ceil(size(arr).cast("double") / n).cast("int"), lit(1))
      transform(sequence(lit(0), nChunks - 1),
        i => array_join(slice(arr, i * n + 1, lit(n)), " "))
    }
    val df = trickyDocs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(1, 3, 8)) {
      val got = df.select($"id",
        E.column(WordChunks(E.expression($"text"), n)).as("g"),
        chunksBuiltin($"text", n).as("b")).collect()
      got.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n id=${r.getLong(0)}: ${r.getSeq[String](1)} vs ${r.getSeq[String](2)}")
      }
    }
  }

  test("null text: explode consumers see zero rows, like the built-in empty array") {
    val df = Seq((0L, null: String), (1L, "a b c")).toDF("id", "text")
    val n = df.select($"id", explode(E.column(WordGrams(E.expression($"text"), 2))).as("g"))
      .groupBy($"id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n == Map(1L -> 2L))
  }

  test("duplicate gram sizes are rejected (they would double-count grams)") {
    assertThrows[IllegalArgumentException] { WordGramsTagged(E.expression(lit("x")), Seq(2, 2)) }
  }

  test("non-string input is an analysis-time error, not a runtime CCE") {
    val df = Seq(1L).toDF("v")
    val ex = intercept[Exception] {
      df.select(E.column(WordGrams(E.expression($"v"), 2))).collect()
    }
    assert(ex.isInstanceOf[AnalysisException] ||
      ex.getMessage.contains("requires a STRING argument"), s"got: $ex")
  }

  test("locale-independent ASCII lowering (UTF8String.toLowerCase replica)") {
    val dflt = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      // under tr_TR, String#toLowerCase("I") == "ı" — the replica must still
      // produce "i" on all-ASCII input, like Spark's lower()
      assert(WordTok.lowerLikeSpark("III") == "iii")
      assert(WordTok.tokens("I AM TITLE").toSeq == Seq("i", "am", "title"))
    } finally java.util.Locale.setDefault(dflt)
  }
  test("overlapping word chunks: stride coverage, boundary straddle, back-compat") {
    import org.apache.spark.sql.functions.col
    val doc = Seq((1L, (1 to 20).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val got = graft.pipeline.TextAnalysis.wordChunksOverlap(doc, "doc_id", "text", 8, 4)
      .select("chunk_id", "chunk").as[(Int, String)].collect().toSeq
    // 20 tokens, window 8, stride 4 → ceil((20-8)/4)+1 = 4 windows
    assert(got.map(_._1) == Seq(0, 1, 2, 3), s"$got")
    assert(got(0)._2.startsWith("w1 ") && got(1)._2.startsWith("w5 "), s"$got")
    // the boundary-straddling pair (w8, w9) is whole in window 1
    assert(got(1)._2.contains("w8 w9"), s"$got")
    // last window clamps at the end and still reaches the final token
    assert(got(3)._2.endsWith("w20"), s"$got")
    // stride == window is bit-identical to the non-overlapping form
    val plain = graft.pipeline.TextAnalysis.wordChunks(doc, "doc_id", "text", 8)
      .select("chunk_id", "chunk").as[(Int, String)].collect().toSeq
    val strided = graft.pipeline.TextAnalysis.wordChunksOverlap(doc, "doc_id", "text", 8, 8)
      .select("chunk_id", "chunk").as[(Int, String)].collect().toSeq
    assert(plain == strided)
    // stride > window would silently drop tokens: loud error
    intercept[IllegalArgumentException] {
      graft.pipeline.TextAnalysis.wordChunksOverlap(doc, "doc_id", "text", 8, 9).collect()
    }
  }
  test("phrase terms are lowercased like the text side (shared tokenizer contract)") {
    import org.apache.spark.sql.functions.col
    val doc = Seq((1L, "Big Scan big scan")).toDF("doc_id", "text")
    val got = graft.pipeline.Search.phraseCount(doc, "doc_id", "text", Seq("Big", "SCAN"))
      .select("n_occurrences").as[Long].collect().toSeq
    assert(got == Seq(2L), s"mixed-case phrase must match the lowercased tokens: $got")
  }
  test("phrase scanner vs naive sliding window — generative agreement") {
    // 500 random (doc, phrase) pairs over a tiny vocab so matches are
    // plentiful: the expression must agree with the obvious reference
    // implementation on every one, including overlapping self-matches
    val rnd = new scala.util.Random(1234)
    val vocab = Vector("a", "b", "ab", "ba", "x")
    (0 until 500).foreach { trial =>
      val doc = (0 until rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(vocab.size)))
      val phrase = (0 to rnd.nextInt(2)).map(_ => vocab(rnd.nextInt(vocab.size))) ++
        Seq(vocab(rnd.nextInt(vocab.size)))
      val expected = (0 to doc.length - phrase.length)
        .count(i => doc.slice(i, i + phrase.length) == phrase)
      // direct expression eval — 500 one-row Spark jobs would test the
      // same scalar code path at 500 scheduler round-trips' cost
      val res = PhraseOccurrences(
        org.apache.spark.sql.catalyst.expressions.Literal(doc.mkString(" ")),
        phrase).eval(null).asInstanceOf[Long]
      assert(res == expected.toLong,
        s"trial $trial: doc=$doc phrase=$phrase expected $expected got $res")
    }
  }
}
