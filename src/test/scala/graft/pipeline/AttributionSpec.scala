package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedSpark

/** Markov removal-effect attribution: an independent BigInt reference
  * iteration on a hand-built three-journey fixture, monotonicity /
  * conservation invariants, and the loud guards. */
class AttributionSpec extends AnyFunSuite {

  lazy val spark = SharedSpark.session
  import spark.implicits._

  // fixture (users are integral per the journeyTransitions contract —
  // A=1, B=2, C=3): A views c0 then c1 and converts (10 cents); B views c1 and
  // doesn't; C views c1 then c0 and converts (20 cents).
  // counts: START->0:1, START->1:2; 0->1:1, 0->CONV:1; 1->CONV:1,
  // 1->NULL:1, 1->0:1. Exact fixpoint: p0 = 0.8, p1 = 0.6, pSTART = 2/3.
  private def fixture = {
    val touches = Seq(
      (1L, 1L, 1L, 0L), (1L, 2L, 2L, 1L),
      (2L, 1L, 3L, 1L),
      (3L, 1L, 4L, 1L), (3L, 2L, 5L, 0L))
      .toDF("user", "ts", "tie", "channel")
    val conv = Seq((1L, 10L), (3L, 20L)).toDF("user", "cents")
    (touches, conv)
  }

  /** Independent reference: the same chain semantics coded from the
    * paper, not from Attribution.scala — counts hard-wired from the
    * journey list above, per-term floor ppm sweeps. */
  private def reference(iters: Int, removed: Long): BigInt = {
    val raw = Seq(
      (-1L, 0L, 1L), (-1L, 1L, 2L), (0L, 1L, 1L), (0L, -2L, 1L),
      (1L, -2L, 1L), (1L, -3L, 1L), (1L, 0L, 1L))
    val red = raw.map { case (s, d, n) => (s, if (d == removed) -3L else d, n) }
      .groupBy(t => (t._1, t._2)).map { case ((s, d), vs) => (s, d, vs.map(_._3).sum) }
      .toSeq
    val tot = red.groupBy(_._1).map { case (s, vs) => s -> BigInt(vs.map(_._3).sum) }
    var p = Map[Long, BigInt](-2L -> BigInt(1000000), -3L -> 0, -1L -> 0,
      0L -> 0, 1L -> 0)
    for (_ <- 1 to iters) {
      p = p.keys.map { s =>
        s -> (if (s == -2L || s == -3L) p(s)
              else red.filter(_._1 == s) match {
                case Nil => p(s)
                case outs => outs.map { case (_, d, n) => BigInt(n) * p(d) / tot(s) }.sum
              })
      }.toMap
    }
    p(-1L)
  }

  test("hand fixture matches an independent reference iteration exactly") {
    val (touches, conv) = fixture
    val out = Attribution.markovRemovalEffects(touches, "user", "ts", "tie",
        "channel", conv, "cents", iters = 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val pFull = reference(16, removed = -99L)
    val p0 = reference(16, removed = 0L)
    val p1 = reference(16, removed = 1L)
    assert(out(-1L) == ((pFull.toLong, 0L, 0L)), s"baseline ${out.get(-1L)}")
    val (r0, r1) = (pFull - p0, pFull - p1)
    assert(out(0L)._1 == p0.toLong && out(1L)._1 == p1.toLong)
    assert(out(0L)._2 == (r0 * 1000000 / pFull).toLong)
    assert(out(1L)._2 == (r1 * 1000000 / pFull).toLong)
    // 30 attributable cents split by removal share, floor per channel
    assert(out(0L)._3 == (BigInt(30) * r0 / (r0 + r1)).toLong)
    assert(out(1L)._3 == (BigInt(30) * r1 / (r0 + r1)).toLong)
    // qualitative: both removals hurt, channel 1 (on every journey) more;
    // fixpoint neighborhood pSTART = 2/3
    assert(r1 > r0 && r0 > 0)
    assert(pFull.toLong > 600000 && pFull.toLong <= 666667, s"pFull $pFull")
  }

  test("touchless conversions don't enter the pot; all-NULL chain attributes zero") {
    // D converts but never touched a channel: excluded from the pot
    val touches = Seq((1L, 1L, 1L, 0L)).toDF("user", "ts", "tie", "channel")
    val conv = Seq((4L, 99L)).toDF("user", "cents")
    val out = Attribution.markovRemovalEffects(touches, "user", "ts", "tie",
        "channel", conv, "cents", iters = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // A's journey ends NULL, so p_full = 0 and everything degrades to 0
    assert(out(-1L) == ((0L, 0L, 0L)) && out(0L) == ((0L, 0L, 0L)), s"got $out")
  }

  test("loud guards: negative channel, NULL channel, cardinality cap") {
    val conv = Seq((1L, 1L)).toDF("user", "cents")
    val neg = Seq((1L, 1L, 1L, -7L)).toDF("user", "ts", "tie", "channel")
    val e1 = intercept[IllegalArgumentException] {
      Attribution.markovRemovalEffects(neg, "user", "ts", "tie", "channel",
        conv, "cents")
    }
    assert(e1.getMessage.contains("negative channel"))
    val nul = Seq((1L, 1L, 1L, Some(1L)), (1L, 2L, 2L, None))
      .toDF("user", "ts", "tie", "channel")
    val e2 = intercept[IllegalArgumentException] {
      Attribution.markovRemovalEffects(nul, "user", "ts", "tie", "channel",
        conv, "cents")
    }
    assert(e2.getMessage.contains("NULL channel"))
    val wide = (0L until 70L).map(c => (1L, c, c, c)).toDF("user", "ts", "tie", "channel")
    val e3 = intercept[IllegalArgumentException] {
      Attribution.markovRemovalEffects(wide, "user", "ts", "tie", "channel",
        conv, "cents")
    }
    assert(e3.getMessage.contains("maxChannels"))
  }
}
