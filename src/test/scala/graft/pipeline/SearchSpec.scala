package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedSpark

/** The retrieval family: postings correctness, hand-computed fixed-point
  * BM25, keyword tie order, persisted-index equivalence + bucket pruning,
  * and the bounded-aggregate plan shape (no window in the top-k paths). */
class SearchSpec extends AnyFunSuite {

  lazy val spark = SharedSpark.session
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark join join fast"),
    (2L, "spark scan slow slow slow"),
    (3L, "join hash"),
    (4L, "the the the the")).toDF("doc_id", "text")

  test("postings: tf per (term, doc) and per-doc length") {
    val p = Search.postings(corpus, "doc_id", "text")
      .as[(String, Long, Int, Long)].collect().toSet
    assert(p.contains(("join", 1L, 4, 2L)), s"$p")
    assert(p.contains(("slow", 2L, 5, 3L)), s"$p")
    assert(p.contains(("hash", 3L, 2, 1L)), s"$p")
    // dl is the doc's token count, constant across its terms
    assert(p.filter(_._2 == 1L).forall(_._3 == 4))
  }

  test("bm25TopK matches the fixed-point formula computed by hand") {
    // N = 4 docs, tot = 4+5+2+4 = 15 tokens, avgdl_milli = 15000/4 = 3750
    // query {spark, join}: df(spark)=2, df(join)=2 → q = 4/2 = 2 →
    // idf64 = 64·bitlen(2) + (2·64 DIV 2) − 64 = 128 + 64 − 64 = 128
    // (an exact power of two has mantissa 0: 64× the old bit grade)
    def contrib(tf: Long, dl: Long): Long = {
      val bPpm = 250000L + (750000L * dl * 1000L) / 3750L
      val denom = tf * 1000000L + (12L * bPpm) / 10L
      128L * (tf * 2200000000000L / denom)
    }
    val expected = Map(
      1L -> (contrib(1, 4) + contrib(2, 4)), // spark tf=1, join tf=2
      2L -> contrib(1, 5),                   // spark tf=1
      3L -> contrib(1, 2))                   // join tf=1
    val got = Search.bm25TopK(corpus, "doc_id", "text", Seq("spark", "join"), 10)
      .as[(Int, Long, Long)].collect().toSeq
    assert(got.map(r => r._2 -> r._3).toMap == expected, s"$got")
    // rank order: score desc, doc_id asc; doc 4 (no query term) absent
    assert(got.map(_._2) == expected.toSeq.sortBy { case (id, s) => (-s, id) }.map(_._1))
    assert(got.map(_._1) == (1 to got.length))
  }

  test("keyword ties break on term UTF-8 byte order within equal weights") {
    // one doc, four distinct terms with tf=1, dl=4 → identical weights;
    // top-3 must be the three byte-smallest terms
    val one = Seq((9L, "delta bravo alpha charlie")).toDF("doc_id", "text")
    val kw = Search.keywordsTfIdf(one, "doc_id", "text", 3)
      .as[(Long, Int, String, Long)].collect().toSeq
    assert(kw.map(_._3) == Seq("alpha", "bravo", "charlie"), s"$kw")
    assert(kw.map(_._2) == Seq(1, 2, 3))
    assert(kw.map(_._4).distinct.size == 1, s"equal weights expected: $kw")
  }

  test("keywordsTfIdf ranks rare terms above common ones") {
    val kw = Search.keywordsTfIdf(corpus, "doc_id", "text", 2)
    val doc2 = kw.where(col("doc_id") === 2L).orderBy("rank")
      .as[(Long, Int, String, Long)].collect().toSeq
    // doc 2 = "spark scan slow slow slow": slow (tf 3, df 1) must beat
    // spark (tf 1, df 2); scan (tf 1, df 1) beats spark on idf
    assert(doc2.map(_._3) == Seq("slow", "scan"), s"$doc2")
  }

  test("persisted index: bm25TopKIndexed ≡ in-job bm25TopK, and the scan prunes buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_search_idx").toString
    Search.buildPostingsIndex(corpus, "doc_id", "text", dir, nBuckets = 8)
    val q = Seq("spark", "join")
    val inJob = Search.bm25TopK(corpus, "doc_id", "text", q, 10)
      .as[(Int, Long, Long)].collect().toSeq
    val indexed = Search.bm25TopKIndexed(spark, dir, q, 10)
      .as[(Int, Long, Long)].collect().toSeq
    assert(indexed == inJob, s"persisted $indexed != in-job $inJob")
    // pruning: the filtered read touches at most |query| bucket dirs of 8
    val pruned = spark.read.parquet(s"$dir/postings")
    val allBuckets = pruned.select("__tb").distinct().count()
    val touched = Search.bm25TopKIndexed(spark, dir, q, 10).inputFiles
      .flatMap(f => "__tb=(\\d+)".r.findFirstMatchIn(f).map(_.group(1))).distinct
    assert(touched.length <= q.length,
      s"scan must touch <= ${q.length} of $allBuckets buckets, touched ${touched.mkString(",")}")
  }

  test("top-k paths use bounded aggregates — no window operator in the plan") {
    for (df <- Seq(
      Search.bm25TopK(corpus, "doc_id", "text", Seq("spark"), 5),
      Search.keywordsTfIdf(corpus, "doc_id", "text", 2))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"window-free plan expected:\n$plan")
      assert(plan.contains("ObjectHashAggregate"),
        s"bounded two-phase aggregate expected:\n$plan")
    }
  }

  test("idf64 parity vs ln-idf on df ratios inside one power of two") {
    // the r7 bit-length grade tied every q inside one doubling; the 6-bit
    // mantissa must (a) strictly order qs whose top-7 bits differ, in the
    // same order ln gives, and (b) surface through the PUBLIC ranking:
    // a rarer term must outrank a commoner one at df ratio 5/4 < 2.
    def idf64(q: Long): Long = {
      val bl = 64 - java.lang.Long.numberOfLeadingZeros(q)
      64L * bl + ((q * 64) >> (bl - 1)) - 64
    }
    val N = 1L << 20
    val dfs = Seq(1000L, 950L, 900L, 850L, 800L, 750L, 700L, 650L, 600L, 550L)
    val qs = dfs.map(N / _)
    assert(qs.map(q => 64 - java.lang.Long.numberOfLeadingZeros(q)).distinct.size == 1,
      "crafted dfs must share one bit-length (the regime the old grade tied)")
    val grades = qs.map(idf64)
    assert(grades == grades.sorted && grades.distinct.size == grades.size,
      s"idf64 must strictly increase across these qs: ${qs.zip(grades)}")
    // pairwise order agreement with ln(N/df)
    for (Seq((d1, g1), (d2, g2)) <- dfs.zip(grades).combinations(2).map(_.toSeq)) {
      val lnOrder = math.signum(math.log(N.toDouble / d1) - math.log(N.toDouble / d2))
      assert(math.signum((g1 - g2).toDouble) == lnOrder, s"df $d1 vs $d2")
    }
    // public-API ranking: 12 docs; 'rare' in 4, 'common' in 5 → q = 3 vs 2,
    // SAME bit-length 2, old grade tied them (doc-id decided); idf64 gives
    // 160 vs 128 and the rare-only doc must win even with the LARGER id
    val docs = (
      (1 to 3).map(i => (i.toLong, "rare pad" + i)) ++
      (4 to 7).map(i => (i.toLong, "common pad" + i)) ++
      Seq((8L, "filler a"), (9L, "filler b"), (10L, "common filler"),
        (11L, "filler c"), (12L, "rare only"))
    ).toDF("doc_id", "text")
    // doc 12 (rare, tf 1, dl 2) vs doc 10 (common, tf 1, dl 2): identical
    // tf component, higher idf64 → 12 first despite the larger id
    val top = Search.bm25TopK(docs, "doc_id", "text", Seq("rare", "common"), 12)
      .as[(Int, Long, Long)].collect()
    val score12 = top.find(_._2 == 12L).get._3
    val score10 = top.find(_._2 == 10L).get._3
    assert(score12 > score10,
      s"rare-term doc must outrank common-term doc at df ratio 5/4: $score12 vs $score10")
  }

  test("empty corpus and empty query are loud errors, not empty results") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Search.bm25TopK(empty, "doc_id", "text", Seq("spark"), 5)
    }
    intercept[IllegalArgumentException] {
      Search.bm25TopK(corpus, "doc_id", "text", Seq.empty, 5)
    }
  }
  test("appendPostingsIndex: build(a) + append(b) ≡ in-job over the union") {
    val a = corpus.where(col("doc_id") <= 2)
    val b = corpus.where(col("doc_id") >= 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_search_append").toString
    Search.buildPostingsIndex(a, "doc_id", "text", dir, nBuckets = 4)
    Search.appendPostingsIndex(b, "doc_id", "text", dir)
    val q = Seq("spark", "join", "the")
    val indexed = Search.bm25TopKIndexed(spark, dir, q, 10)
      .as[(Int, Long, Long)].collect().toSeq
    val union = Search.bm25TopK(corpus, "doc_id", "text", q, 10)
      .as[(Int, Long, Long)].collect().toSeq
    assert(indexed == union, s"appended $indexed != union $union")
    val st = spark.read.parquet(s"$dir/stats").head
    assert(st.getAs[Long]("n_docs") == 4L && st.getAs[Long]("total_tokens") == 15L, s"$st")
  }
  test("snippets: earliest match anchors, window clamps, miss is absent") {
    val docs = Seq(
      (1L, "a b c TARGET d e f g"),     // interior match, full window
      (2L, "TARGET x y z"),             // match at the start: clamps left
      (3L, "p q r s target"),           // match at the end: clamps right
      (4L, "nothing to see here"),      // no match: absent
      (5L, "u second v w x first y second")) // first/second: EARLIEST anchors
      .toDF("doc_id", "text")
    val got = Search.snippets(docs, "doc_id", "text", Seq("first", "second", "target"), 2)
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "b c target d e",
      2L -> "target x y",
      3L -> "r s target",
      5L -> "u second v w"), s"$got")
  }

  test("rrfFuse: hand-computed fusion, both-list docs beat single-list docs") {
    // list A ranks docs 1,2,3; list B ranks 2,1,9 — doc 9 is B-only
    val a = Seq((1, 1L), (2, 2L), (3, 3L)).toDF("rank", "doc_id")
    val b = Seq((1, 2L), (2, 1L), (3, 9L)).toDF("rank", "doc_id")
    val got = Search.rrfFuse(Seq(a, b), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // contributions: 1e6 DIV 61 = 16393, DIV 62 = 16129, DIV 63 = 15873
    // doc 1: 16393 + 16129 = 32522; doc 2: 16129 + 16393 = 32522 (tie -> id)
    // doc 3: 15873; doc 9: 15873 (tie -> id)
    assert(got == Seq((1, 1L, 32522L), (2, 2L, 32522L),
      (3, 3L, 15873L), (4, 9L, 15873L)), s"got $got")
  }

  test("rankByScore ranks by score desc then id asc, bounded at k") {
    val df = Seq((10L, 5L), (11L, 9L), (12L, 5L), (13L, 1L)).toDF("id", "s")
    val got = Search.rankByScore(df, "id", "s", 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1, 11L, 9L), (2, 10L, 5L), (3, 12L, 5L)), s"got $got")
  }

  test("rrfFuse validates inputs loudly") {
    val ok = Seq((1, 1L)).toDF("rank", "doc_id")
    intercept[IllegalArgumentException](Search.rrfFuse(Nil, 5))
    intercept[IllegalArgumentException](Search.rrfFuse(Seq(ok), 5, k0 = 0))
    intercept[IllegalArgumentException](
      Search.rrfFuse(Seq(ok.withColumnRenamed("rank", "r")), 5))
    // a doc ranked twice WITHIN one list would silently double-count
    val dup = Seq((1, 7L), (2, 7L)).toDF("rank", "doc_id")
    val eDup = intercept[IllegalArgumentException](Search.rrfFuse(Seq(dup), 5))
    assert(eDup.getMessage.contains("more than once"), eDup.getMessage)
    // rank 0 breaks the 1e6 DIV (k0+rank) contract
    val zero = Seq((0, 7L)).toDF("rank", "doc_id")
    val eZero = intercept[IllegalArgumentException](Search.rrfFuse(Seq(zero), 5))
    assert(eZero.getMessage.contains(">= 1"), eZero.getMessage)
    // string ids must fail loudly, not NULL out through the cast
    val strIds = Seq((1, "doc-1")).toDF("rank", "doc_id")
    val eStr = intercept[IllegalArgumentException](Search.rrfFuse(Seq(strIds), 5))
    assert(eStr.getMessage.contains("integral"), eStr.getMessage)
    // the SAME doc in two DIFFERENT lists is the point of fusion, not an error
    val a = Seq((1, 7L)).toDF("rank", "doc_id")
    val b = Seq((1, 7L)).toDF("rank", "doc_id")
    assert(Search.rrfFuse(Seq(a, b), 5).count() == 1L)
    // all-empty lists fuse to an empty result, not an NPE
    assert(Search.rrfFuse(Seq(a.where(lit(false))), 5).count() == 0L)
  }

  test("rboPrefix: identical = 10⁶, swapped pair = exactly 1/3, disjoint = 0") {
    def lst(q: String, docs: Seq[Long]) =
      docs.zipWithIndex.map { case (doc, i) => (q, doc, i + 1) }
        .toDF("query", "doc_id", "rank")
    // identical rankings normalize to exactly 1.0
    val a1 = lst("q1", Seq(10L, 20L, 30L, 40L))
    assert(Search.rboPrefix(a1, a1, "query", d = 4)
      .head.getLong(2) == 1000000L)
    // d=2, lists [d1,d2] vs [d2,d1]: RBO_min 0.25 over max 0.75 → 1/3
    val x = lst("q1", Seq(1L, 2L))
    val y = lst("q1", Seq(2L, 1L))
    val got = Search.rboPrefix(x, y, "query", d = 2).head
    assert((got.getLong(1), got.getLong(2)) == ((2L, 333333L)), s"$got")
    // disjoint lists: the query still reports, at 0 — it must not vanish
    val z = lst("q1", Seq(8L, 9L))
    val dj = Search.rboPrefix(x, z, "query", d = 2).head
    assert((dj.getLong(1), dj.getLong(2)) == ((0L, 0L)), s"$dj")
    // entries past depth d are outside the prefix, not errors; rank < 1 is loud
    val deep = lst("q1", (1L to 9L))
    assert(Search.rboPrefix(deep, deep, "query", d = 4).head.getLong(2) == 1000000L)
    val bad = Seq(("q1", 5L, 0)).toDF("query", "doc_id", "rank")
    intercept[Exception](Search.rboPrefix(bad, bad, "query", d = 4).collect())
    intercept[IllegalArgumentException](Search.rboPrefix(x, y, "query", d = 17))
    // a doc ranked twice within one list would silently double-count — loud
    val dup = Seq(("q1", 5L, 1), ("q1", 5L, 2)).toDF("query", "doc_id", "rank")
    val eDup = intercept[IllegalArgumentException](
      Search.rboPrefix(dup, lst("q1", Seq(5L)), "query", d = 4).collect())
    assert(eDup.getMessage.contains("more than once"), eDup.getMessage)
  }

  test("rboPrefix agrees with the direct RBO_min prefix formula on random rankings") {
    // the per-doc regrouping is an algebraic identity — verify it against
    // the literal sum over prefixes, on 20 random ranking pairs
    val rnd = new scala.util.Random(13)
    val d = 7
    val lcm = (1 to d).foldLeft(1L)((a, k) => a / BigInt(a).gcd(k).toLong * k)
    val full = lcm * ((1L << d) - 1)
    val cases = (1 to 20).map { q =>
      val docs = rnd.shuffle((1L to 15L).toList)
      (s"q$q", docs.take(d), rnd.shuffle(docs).take(d))
    }
    def frame(f: ((String, List[Long], List[Long])) => List[Long]) =
      cases.flatMap { c => f(c).zipWithIndex.map { case (doc, i) => (c._1, doc, i + 1) } }
        .toDF("query", "doc_id", "rank")
    val got = Search.rboPrefix(frame(_._2), frame(_._3), "query", d)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    cases.foreach { case (q, a, b) =>
      // direct form: sum over k of (lcm/k)·2^(d−k)·|A_k ∩ B_k|, over max
      val direct = (1 to d).map { k =>
        lcm / k * (1L << (d - k)) * a.take(k).toSet.intersect(b.take(k).toSet).size
      }.sum
      assert(got(q) == direct * 1000000 / full,
        s"$q: op ${got(q)} != direct ${direct * 1000000 / full}")
    }
  }

  test("bm25TopKBatch: one corpus pass ≡ per-query bm25TopK, multi-term queries included") {
    val docs = Seq(
      (1L, "spark joins tables fast"),
      (2L, "spark spark spark"),
      (3L, "tables of data and data"),
      (4L, "joins of tables and tables and joins")
    ).toDF("doc_id", "text")
    val queries = Seq("q_spark" -> Seq("spark"), "q_join" -> Seq("joins", "tables"))
    val batch = Search.bm25TopKBatch(docs, "doc_id", "text", queries, k = 3)
      .orderBy("query", "rank")
      .as[(String, Int, Long, Long)].collect().toSeq
    val single = queries.flatMap { case (q, ts) =>
      Search.bm25TopK(docs, "doc_id", "text", ts, k = 3)
        .as[(Int, Long, Long)].collect().toSeq.map(r => (q, r._1, r._2, r._3))
    }.sortBy(r => (r._1, r._2))
    assert(batch == single, s"batch $batch != per-query $single")
    assert(batch.count(_._1 == "q_spark") > 0 && batch.count(_._1 == "q_join") > 0)
    // duplicate query ids are a silent score merge — refused loudly
    intercept[IllegalArgumentException](
      Search.bm25TopKBatch(docs, "doc_id", "text",
        Seq("q" -> Seq("spark"), "q" -> Seq("tables")), k = 3))
  }

  test("rankingEval: hand-computed nDCG/MRR/AP; unjudged queries drop, unrun queries zero") {
    // q1 run: ranks 1,2,3 → docs 10, 11, 12; truth: 10→2, 12→1, 99→3.
    // discounts at ranks 1..3: 64, 96, 128 (lg64(i+1)−64, exact at 2^k);
    // idcg = 7·64e6/64 + 3·64e6/96 + 1·64e6/128 = 9_500_000;
    // dcg = 3·64e6/64 + 0 + 1·64e6/128 = 3_500_000 → ndcg 368421;
    // mrr = 1e6; ap = (1e6/1 + 2e6 DIV 3) DIV 3 = 555555.
    val run = Seq(("q1", 10L, 1), ("q1", 11L, 2), ("q1", 12L, 3),
      ("q3", 5L, 1)) // q3 has no judgments → drops out
      .toDF("query", "doc_id", "rank")
    val truth = Seq(("q1", 10L, 2L), ("q1", 12L, 1L), ("q1", 99L, 3L),
      ("q2", 5L, 1L)) // q2 judged but never run → all-zero metrics
      .toDF("query", "doc_id", "rel")
    val got = Search.rankingEval(run, truth, "query", "doc_id", "rank", "rel", k = 3)
      .orderBy("query")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("q1", 3L, 368421L, 1000000L, 555555L),
      ("q2", 1L, 0L, 0L, 0L)), s"$got")
  }

  test("rankingEval: perfect run scores exactly 1e6 everywhere; bad grades fail loudly") {
    val run = Seq(("q", 1L, 1), ("q", 2L, 2)).toDF("query", "doc_id", "rank")
    val truth = Seq(("q", 1L, 3L), ("q", 2L, 1L)).toDF("query", "doc_id", "rel")
    val got = Search.rankingEval(run, truth, "query", "doc_id", "rank", "rel", k = 5)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("q", 2L, 1000000L, 1000000L, 1000000L)), s"$got")
    val bad = Seq(("q", 1L, 0L)).toDF("query", "doc_id", "rel")
    val e = intercept[Exception](
      Search.rankingEval(run, bad, "query", "doc_id", "rank", "rel", k = 5).collect())
    assert(e.getMessage.contains("relevance grade"), e.getMessage)
  }

  test("rankingEval: tied ranks within one query's run fail loudly (r10 advice)") {
    // two docs at rank 1: the RANGE-framed hits window would count peers
    // and double-apply the rank-1 discount, silently inflating AP/nDCG
    val run = Seq(("q", 1L, 1), ("q", 2L, 1)).toDF("query", "doc_id", "rank")
    val truth = Seq(("q", 1L, 1L), ("q", 2L, 1L)).toDF("query", "doc_id", "rel")
    val e = intercept[IllegalArgumentException](
      Search.rankingEval(run, truth, "query", "doc_id", "rank", "rel", k = 5))
    assert(e.getMessage.contains("tied ranks"), e.getMessage)
    // the same ranks on DIFFERENT queries are fine
    val run2 = Seq(("q", 1L, 1), ("p", 1L, 1)).toDF("query", "doc_id", "rank")
    val truth2 = Seq(("q", 1L, 1L), ("p", 1L, 1L)).toDF("query", "doc_id", "rel")
    val ok = Search.rankingEval(run2, truth2, "query", "doc_id", "rank", "rel", k = 5)
    assert(ok.count() == 2)
  }
}
