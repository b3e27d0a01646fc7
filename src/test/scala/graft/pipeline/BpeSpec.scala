package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedSpark

/** Corpus-trained BPE contracts: the hand-computable merge sequence on the
  * classic fixture, lossless round-trip on arbitrary text, training
  * determinism under partitioning, the persisted-model lifecycle, and the
  * compression effect that justifies training at all. */
class BpeSpec extends AnyFunSuite {

  lazy val spark = SharedSpark.session
  import spark.implicits._

  test("merge learning matches the hand computation on the classic fixture") {
    // Sennrich et al.'s worked example shape: {low:5, lowest:2, newer:6, wider:3}
    val counts = Seq(("low", 5L), ("lowest", 2L), ("newer", 6L), ("wider", 3L))
    val model = Bpe.trainFromCounts(counts, nMerges = 4)
    // pair counts round 1: (e,r)=9 from newer+wider is the max → "er";
    // round 2: (er,' ')=9 → "er " (the space end-of-word marker); round 3:
    // (l,o)=7 from low+lowest → "lo"; round 4: (lo,w)=7 → "low"
    assert(model.merges == IndexedSeq(
      ("e", "r"), ("er", " "), ("l", "o"), ("lo", "w")),
      s"merge sequence diverged from the hand computation: ${model.merges}")
  }

  test("ties break lexicographically: same corpus, same merges, any partitioning") {
    val docs = (0 until 400)
      .map(i => (i.toLong, s"alpha beta gamma delta tok$i alpha beta"))
      .toDF("doc_id", "text")
    val m1 = Bpe.train(docs.repartition(1), "text", nMerges = 50)
    val m2 = Bpe.train(docs.repartition(11), "text", nMerges = 50)
    assert(m1.merges == m2.merges,
      "training must be deterministic under input partitioning")
    assert(m1.merges.nonEmpty)
  }

  test("round-trip: detokenized stream reconstructs every word exactly") {
    val docs = Seq(
      (1L, "The quick    brown fox\tjumps over the lazy dog"),
      (2L, "ünïcödé wörds déjà vu naïve café"),
      (3L, "numbers 12345 and punct!?;: mixed-tokens a,b,c"),
      (4L, "a"),
      (5L, "repetition repetition repetition repetition"),
      // astral-plane code points: splitting into UTF-16 chars would emit
      // unpaired surrogates that UTF8String silently turns into '?'
      (6L, "emoji 🌍🚀 and astral 𝕊𝕡𝕒𝕣𝕜 text"),
      // literal "</w>" in scraped markup: the classic marker would make
      // detokenization ambiguous; the space marker cannot collide
      (7L, "xml tag </w> inside a document"))
      .toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", nMerges = 100)
    val got = docs.select(col("doc_id"),
        rtrim(array_join(Bpe.encode(model, col("text")), ""), " ").as("detok"),
        array_join(TextAnalysis.words(col("text")), " ").as("expected"))
      .as[(Long, String, String)].collect()
    got.foreach { case (id, detok, expected) =>
      assert(detok == expected, s"doc $id round-trip broke: '$detok' != '$expected'")
    }
  }

  test("trained merges compress: frequent words become single tokens") {
    val docs = (0 until 300)
      .map(i => (i.toLong, "internationalization considered essential " * 3))
      .toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", nMerges = 400)
    val toks = docs.limit(1)
      .select(explode(Bpe.encode(model, col("text"))).as("t"))
      .as[String].collect().toSeq
    // every word occurs with the same (maximal) count, so with enough
    // merges each collapses to ONE token: word + marker
    assert(toks.toSet == Set("internationalization ", "considered ", "essential "),
      s"frequent words must collapse to single tokens, got ${toks.toSet}")
    // untrained text still encodes (down to chars where no merge applies)
    val cold = docs.sparkSession.createDataFrame(Seq(Tuple1("zyxw qqq"))).toDF("text")
      .select(Bpe.encode(model, col("text")).as("t")).as[Seq[String]].head()
    assert(cold.mkString("") == "zyxw qqq ", s"cold words must round-trip too: $cold")
  }

  test("persisted model: save/load yields the identical encoding") {
    val docs = (0 until 200).map(i => (i.toLong, s"persist roundtrip vocab item$i persist"))
      .toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", nMerges = 60)
    val dir = java.nio.file.Files.createTempDirectory("bpe_model").toString
    Bpe.saveModel(spark, model, dir)
    val loaded = Bpe.loadModel(spark, dir)
    assert(loaded.merges == model.merges, "merge table must persist rank-exactly")
    val a = docs.select(Bpe.encode(model, col("text")).as("t")).as[Seq[String]].collect().toSeq
    val b = docs.select(Bpe.encode(loaded, col("text")).as("t")).as[Seq[String]].collect().toSeq
    assert(a == b, "persisted model must encode identically")
  }

  test("encode is a pure map: no shuffle in the encode plan") {
    val docs = (0 until 50).map(i => (i.toLong, s"plan shape check $i")).toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", nMerges = 20)
    val plan = org.apache.spark.sql.graftshim.GraftShim.explainString(
      docs.select(col("doc_id"), Bpe.encode(model, col("text")).as("toks")))
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
  }
}
