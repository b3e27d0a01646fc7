package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedSpark

/** Unigram-LM tokenizer contracts: the driver lg64 twin, Viterbi
  * segmentation vs a brute-force enumeration (incl. the full tie chain),
  * EM-prune invariants on a hand corpus, the encode expression, and
  * code-point safety on astral-plane text. */
class UnigramSpec extends AnyFunSuite {

  lazy val spark = SharedSpark.session
  import spark.implicits._

  test("driver lg64 twin matches the Lg64 expression contract") {
    // exact at powers of two: lg64(2^k) = 64*(k+1)
    for (k <- 0 to 20) assert(Unigram.lg64(1L << k) == 64L * (k + 1))
    // monotone non-decreasing on a sweep
    val vals = (1L to 5000L).map(Unigram.lg64)
    assert(vals.zip(vals.tail).forall { case (a, b) => a <= b })
    // spot values against the SQL form evaluated by Spark
    val sqlVals = spark.sql(
      s"SELECT ${(Seq(3L, 7L, 100L, 12345L).map(v =>
        graft.functions.Lg64.sql(v.toString))).mkString(", ")}")
      .collect().head
    assert(Seq(3L, 7L, 100L, 12345L).zipWithIndex.forall { case (v, i) =>
      Unigram.lg64(v) == sqlVals.getLong(i) }, sqlVals.toString)
  }

  test("Viterbi segmentation equals brute-force enumeration under the tie chain") {
    val counts = Map("a" -> 10L, "b" -> 8L, "c" -> 2L, "ab" -> 6L,
      "bc" -> 6L, "abc" -> 3L, "bca" -> 3L)
    val total = counts.values.sum
    val lt = Unigram.lg64(total)
    val costs = counts.map { case (p, c) => p -> (lt - Unigram.lg64(c)) }
    def brute(w: String): Seq[String] = {
      def segs(s: String): Seq[Seq[String]] =
        if (s.isEmpty) Seq(Seq.empty)
        else (1 to math.min(3, s.length)).flatMap { l =>
          val p = s.take(l)
          if (costs.contains(p)) segs(s.drop(l)).map(p +: _) else Seq.empty
        }
      segs(w).minBy(seg => (seg.map(costs).sum, seg.length,
        seg.mkString(Unigram.Sep.toString)))(
        Ordering.Tuple3(Ordering.Long, Ordering.Int, Ordering.String))
    }
    for (w <- Seq("abc", "abca", "bcab", "aabbcc", "abcabc", "cab")) {
      val got = Unigram.segment(w, costs.get, lt - 64L, 3).toSeq
      assert(got == brute(w), s"$w: $got vs ${brute(w)}")
    }
  }

  test("tie chain: equal-cost splits prefer fewer pieces, then the smallest path") {
    // uniform costs: every piece costs the same per piece, so fewer
    // pieces wins; among equal counts the path string decides
    val costs = Map("x" -> 5L, "y" -> 5L, "xy" -> 10L, "yx" -> 10L)
    // "xyxy" as [xy, xy] (cost 20, 2 pieces) beats [x, y, x, y] (20, 4)
    assert(Unigram.segment("xyxy", costs.get, 99L, 2).toSeq == Seq("xy", "xy"))
    // "xyx": [xy, x] vs [x, yx] both cost 15, both 2 pieces —
    // path "xyx" < "xyx" (the separator sorts below 'y')
    assert(Unigram.segment("xyx", costs.get, 99L, 2).toSeq == Seq("x", "yx"))
  }

  test("cpLess is code-point (UTF-8 byte) order, not UTF-16 code-unit order") {
    val astral = new String(Character.toChars(0x1F600)) // 😀 U+1F600
    val pua = ""                                   // BMP private-use
    // UTF-16 ranks U+E000 ABOVE the surrogate pair (0xE000 > 0xD83D),
    // but code-point / UTF-8 byte order puts U+E000 < U+1F600
    assert(pua > astral, "precondition: Java order disagrees here")
    assert(Unigram.cpLess(pua, astral) && !Unigram.cpLess(astral, pua))
    // agreement with plain order on BMP-only strings, prefix rule
    assert(Unigram.cpLess("ab", "ac") && !Unigram.cpLess("ac", "ab"))
    assert(Unigram.cpLess("ab", "abc") && !Unigram.cpLess("abc", "ab"))
    assert(!Unigram.cpLess("ab", "ab"))
    assert(Unigram.CpOrdering.compare(pua, astral) == -1)
    assert(Unigram.CpOrdering.compare(pua, pua) == 0)
  }

  test("EM-prune invariants and the frequent-bigram fixture") {
    val wc = Seq(("abab", 10L), ("ab", 5L), ("cd", 3L), ("dddd", 1L))
    val m = Unigram.trainFromCounts(wc, nVocab = 8, maxPieceLen = 2,
      seedSize = 100, iters = 2)
    val pieceSet = m.pieces.map(_._1).toSet
    // singles always covered
    assert(Set("a", "b", "c", "d").subsetOf(pieceSet), pieceSet.toString)
    // total = sum of piece counts, every count >= 1
    assert(m.total == m.pieces.map(_._2).sum && m.pieces.forall(_._2 >= 1))
    // the dominant bigram survives pruning and wins segmentation
    assert(pieceSet.contains("ab"), pieceSet.toString)
    val lt = Unigram.lg64(m.total)
    assert(Unigram.segment("abab", m.costs.get, m.unkCost, 2).toSeq ==
      Seq("ab", "ab"))
    // segmentation round-trips by concatenation for every corpus word
    for ((w, _) <- wc)
      assert(Unigram.segment(w, m.costs.get, m.unkCost, 2).mkString == w)
  }

  test("encode expression matches driver segmentation; NULL text reads NULL") {
    val docs = Seq((1L, "abab cd ab"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val m = Unigram.trainFromCounts(
      Seq(("abab", 10L), ("ab", 5L), ("cd", 3L)), nVocab = 8,
      maxPieceLen = 2, seedSize = 100, iters = 2)
    val got = docs.select($"doc_id", Unigram.encode(m, $"text").as("t"))
      .orderBy("doc_id").collect()
    val exp = Seq("abab", "cd", "ab").flatMap(w =>
      Unigram.segment(w, m.costs.get, m.unkCost, 2))
    assert(got(0).getSeq[String](1) == exp, got(0).toString)
    assert(got(1).isNullAt(1))
    // unseen glyphs fall back to per-char UNK segmentation, never throw
    val unk = Seq((1L, "zq ab")).toDF("doc_id", "text")
      .select(Unigram.encode(m, $"text")).collect().head.getSeq[String](0)
    assert(unk == Seq("z", "q", "ab"), unk.toString)
  }

  test("model save/load round-trips pieces, total, and every encode") {
    val m = Unigram.trainFromCounts(
      Seq(("abab", 10L), ("ab", 5L), ("cd", 3L)), nVocab = 8,
      maxPieceLen = 2, seedSize = 100, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_unigram").toString
    Unigram.saveModel(spark, m, dir)
    val back = Unigram.loadModel(spark, dir)
    assert(back.pieces == m.pieces && back.total == m.total,
      s"${back.pieces} / ${back.total} vs ${m.pieces} / ${m.total}")
    for (w <- Seq("abab", "cd", "abcd"))
      assert(Unigram.segment(w, back.costs.get, back.unkCost, back.maxPieceLen).toSeq ==
        Unigram.segment(w, m.costs.get, m.unkCost, m.maxPieceLen).toSeq, w)
  }

  test("astral-plane words segment on code points, never inside a surrogate pair") {
    val w = "😀a😀" // 😀a😀 — 3 code points, 5 chars
    val m = Unigram.trainFromCounts(Seq((w, 5L)), nVocab = 8,
      maxPieceLen = 2, seedSize = 100, iters = 1)
    // every learned piece is valid UTF-16 (no unpaired surrogates)
    assert(m.pieces.forall { case (p, _) =>
      !p.exists(c => Character.isSurrogate(c)) ||
        p.codePointCount(0, p.length) < p.length })
    val seg = Unigram.segment(w, m.costs.get, m.unkCost, 2)
    assert(seg.mkString == w, seg.mkString("|"))
    assert(seg.forall(p => p.codePointAt(0) >= 0 &&
      !Character.isLowSurrogate(p.charAt(0))), seg.mkString("|"))
  }
}
