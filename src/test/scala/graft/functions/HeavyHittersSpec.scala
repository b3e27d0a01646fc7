package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedSpark

/** Misra-Gries frequent-items guarantees: exact in the small-vocabulary
  * regime (oracle-gated in SparkEntry), bounded undercount with guaranteed
  * membership in the approximate regime — under real multi-partition
  * partial aggregation and merges. */
class HeavyHittersSpec extends AnyFunSuite {

  lazy val spark = SharedSpark.session
  import spark.implicits._

  test("exact regime: distinct items < k → counts equal the exact GROUP BY") {
    val docs = Seq((1L, "a b a c a b"), (2L, "b c d d"), (3L, "a")).toDF("id", "text")
    val got = HeavyHitters.topTokens(docs, "text", k = 64)
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", 4L), (2, "b", 3L), (3, "c", 2L), (4, "d", 2L)),
      s"got $got")
  }

  test("approximate regime: guaranteed membership and bounded undercount") {
    // N = 2000 heavy + 5000 singleton-tail items; k = 16 → error <= N/(k+1)
    val k = 16
    val heavy = Seq("alpha" -> 800, "beta" -> 700, "gamma" -> 500)
    val items =
      heavy.flatMap { case (w, n) => Seq.fill(n)(w) } ++
        (0 until 5000).map(i => s"tail$i")
    val n = items.length.toLong
    val bound = n / (k + 1)
    // shuffle deterministically and spread over 8 partitions so both the
    // update overflow path and the merge reduction actually run
    val df = items.zipWithIndex
      .sortBy { case (w, i) => graft.functions.Mix.splitmix64(i.toLong) }
      .map(_._1).toDF("token").repartition(8)
    val agg = org.apache.spark.sql.graftshim.GraftShim.column(
      HeavyHitters(org.apache.spark.sql.graftshim.GraftShim.expression(col("token")), k)
        .toAggregateExpression())
    val out = df.agg(agg.as("hh"))
      .select(explode(col("hh")).as("e")).select("e.token", "e.n")
      .as[(String, Long)].collect().toMap
    heavy.foreach { case (w, trueN) =>
      assert(trueN > bound, s"test setup: $w must be a guaranteed heavy hitter")
      assert(out.contains(w), s"$w (count $trueN > N/(k+1) = $bound) must be present: $out")
      assert(out(w) <= trueN, s"$w estimate ${out(w)} must never overcount $trueN")
      assert(out(w) >= trueN - bound,
        s"$w estimate ${out(w)} undercounts beyond the N/(k+1) bound ($trueN - $bound)")
    }
    assert(out.size <= k, s"summary must hold at most k entries, got ${out.size}")
  }

  test("amortized batch reduction: 50k-cardinality stream, bounds hold, <= k emitted") {
    // the regime the O(1)-amortized update exists for: nearly every item
    // is unseen, so the textbook decrement-all step would fire ~N times;
    // the 2k-capacity buffer instead reduces once per k inserts. The
    // guarantee must be identical: membership above N/(k+1), undercount
    // within the bound, never an overcount, at most k entries out.
    val k = 16
    val heavy = Seq("alpha" -> 9000L, "beta" -> 8000L, "gamma" -> 6000L)
    val items = heavy.flatMap { case (w, n) => Seq.fill(n.toInt)(w) } ++
      (0 until 50000).map(i => s"tail$i")
    val n = items.length.toLong
    val bound = n / (k + 1)
    val df = items.zipWithIndex
      .sortBy { case (w, i) => graft.functions.Mix.splitmix64(0x7e57 + i.toLong) }
      .map(_._1).toDF("token").repartition(8)
    val agg = org.apache.spark.sql.graftshim.GraftShim.column(
      HeavyHitters(org.apache.spark.sql.graftshim.GraftShim.expression(col("token")), k)
        .toAggregateExpression())
    val out = df.agg(agg.as("hh"))
      .select(explode(col("hh")).as("e")).select("e.token", "e.n")
      .as[(String, Long)].collect().toMap
    assert(out.size <= k, s"at most k entries may leave the aggregate, got ${out.size}")
    heavy.foreach { case (w, trueN) =>
      assert(trueN > bound, s"test setup: $w must be a guaranteed heavy hitter")
      assert(out.contains(w), s"$w (count $trueN > $bound) must be present: $out")
      assert(out(w) <= trueN && out(w) >= trueN - bound,
        s"$w estimate ${out(w)} outside [$trueN - $bound, $trueN]")
    }
  }

  test("single-partition overflow path keeps the heavy item") {
    val items = Seq.fill(300)("hot") ++ (0 until 900).map(i => s"cold$i")
    val df = items.zipWithIndex
      .sortBy { case (w, i) => graft.functions.Mix.splitmix64(0xabc + i.toLong) }
      .map(_._1).toDF("token").coalesce(1)
    val agg = org.apache.spark.sql.graftshim.GraftShim.column(
      HeavyHitters(org.apache.spark.sql.graftshim.GraftShim.expression(col("token")), 8)
        .toAggregateExpression())
    val out = df.agg(agg.as("hh"))
      .select(explode(col("hh")).as("e")).select("e.token", "e.n")
      .as[(String, Long)].collect().toMap
    // N = 1200, k = 8 → bound 133; hot = 300 > bound → guaranteed present
    assert(out.contains("hot"), s"hot must survive MG decrements: $out")
    assert(out("hot") >= 300 - 1200 / 9 && out("hot") <= 300)
  }
}
