package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedSpark

/** Pins the shared lg64 grade's contract ONCE for its four consumers
  * (BM25 idf, word entropy, naive Bayes, Kaplan-Meier): exactness at
  * powers of two, the ≤ 6-unit tracking band around 64·(log2 x + 1),
  * and the monotonicity that makes lg64 differences a usable ranking /
  * log-ratio grade. */
class Lg64Spec extends AnyFunSuite {

  lazy val spark = SharedSpark.session
  import spark.implicits._

  private def lg64(xs: Seq[Long]): Map[Long, Long] =
    xs.toDF("x").select(col("x"), expr(Lg64.sql("x")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("lg64: exact at powers of two; tracks 64·(log2 x + 1) within 7 units from below") {
    val xs = (1L to 4096L) ++ Seq(1L << 20, (1L << 20) + 12345L, 1L << 40,
      (1L << 40) + 987654321L, 1L << 56, (1L << 57) - 1) // 2^57 − 1 = domain max
    val g = lg64(xs.distinct)
    for (k <- 0 to 12) assert(g(1L << k) == 64L * (k + 1), s"2^$k")
    for (x <- xs.distinct) {
      // the linear mantissa is the chord under concave log2 (max gap
      // ~0.086 octaves ≈ 5.5 units) minus < 1 floor error, never above
      val ideal = 64.0 * (math.log(x.toDouble) / math.log(2.0) + 1.0)
      assert(g(x) <= ideal + 1e-9 && g(x) >= ideal - 7.0,
        s"x=$x g=${g(x)} ideal=$ideal")
    }
  }

  test("lg64: non-decreasing; strictly increasing past the 1+1/64 worst-case plateau") {
    val xs = (1L to 4096L).toSeq
    val g = lg64(xs)
    for (x <- 1L until 4096L) assert(g(x) <= g(x + 1), s"decreasing at $x")
    // the worst-case tie plateau is 1 + 1/64 ≈ 1.56% wide (octave
    // BOTTOM, where one mantissa unit spans x/64); a 2% ratio must
    // always strictly increase the grade (the BM25 ranking guarantee)
    val pairs = Seq((100L, 102L), (1000L, 1020L), (3000L, 3060L),
      (1L << 30, (1L << 30) + (1L << 30) / 50))
    val g2 = lg64(pairs.flatMap(p => Seq(p._1, p._2)))
    for ((a, b) <- pairs) assert(g2(a) < g2(b), s"$a vs $b")
    // …and the bottom-of-octave plateau is REAL: a 1.1% step there ties
    // (the bound the doc must not overclaim), pinned at 2^19
    val bot = lg64(Seq(1L << 19, (1L << 19) + (1L << 19) / 90))
    assert(bot(1L << 19) == bot((1L << 19) + (1L << 19) / 90), bot.toString)
  }

  test("lg64 differences are a monotone log-ratio grade (the Kaplan-Meier / NB consumption form)") {
    // lg64(a) − lg64(b) must order by a/b: survival steps with a larger
    // death fraction must read a larger negative-log increment
    val g = lg64(Seq(100L, 99L, 90L, 50L, 1000L, 990L, 900L, 500L))
    val steps = Seq(
      g(100L) - g(99L), g(1000L) - g(990L),   // ~1% deaths
      g(100L) - g(90L), g(1000L) - g(900L),   // ~10%
      g(100L) - g(50L), g(1000L) - g(500L))   // 50%
    assert(steps(0) <= steps(2) && steps(2) < steps(4), s"$steps")
    assert(steps(1) <= steps(3) && steps(3) < steps(5), s"$steps")
    assert(steps(4) == 64L && steps(5) == 64L, s"halving = one octave: $steps")
  }
}
