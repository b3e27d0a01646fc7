package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contention self-defense, unit-tested against synthetic
  * baselines. r10's defect: the defense read its 3× baseline from
  * bench_full.json and then OVERWROTE the same file, so back-to-back
  * driver runs ratcheted the baseline to the previous slow run and the
  * defense silently disarmed. The baseline now lives in the COMMITTED
  * bench_baseline.json that Bench only reads — these specs pin the parse
  * and the trigger so the retry path provably arms against a committed
  * baseline regardless of what earlier runs wrote to bench_full.json. */
class BenchSpec extends AnyFunSuite {

  private val baselineTxt =
    """{"metric": "baseline_minima", "note": "committed minima", "unit": "sec",
      | "queries": {"q_fast": 0.05, "q_mid": 1.5, "q_slow": 10.0},
      | "sf": "/root/testdata/sf0.1"}""".stripMargin

  test("parseBaseline reads the committed per-query minima") {
    val m = Bench.parseBaseline(baselineTxt, "/root/testdata/sf0.1")
    assert(m === Map("q_fast" -> 0.05, "q_mid" -> 1.5, "q_slow" -> 10.0))
  }

  test("parseBaseline accepts a different parent dir with the same sf basename") {
    val m = Bench.parseBaseline(baselineTxt, "/somewhere/else/sf0.1")
    assert(m.size === 3)
  }

  test("parseBaseline rejects a baseline recorded at a different scale factor") {
    assert(Bench.parseBaseline(baselineTxt, "/root/testdata/sf0.001") === Map.empty)
    assert(Bench.parseBaseline(baselineTxt, "/root/testdata/sf0.01") === Map.empty)
  }

  test("parseBaseline survives malformed input") {
    assert(Bench.parseBaseline("", "/root/testdata/sf0.1") === Map.empty)
    assert(Bench.parseBaseline("{\"metric\": \"x\"}", "/root/testdata/sf0.1") === Map.empty)
  }

  test("a fake slow timing against a committed baseline trips the retry") {
    val base = Bench.parseBaseline(baselineTxt, "/root/testdata/sf0.1")
    // q_mid at 1.5 s baseline measured at 9 s: > 3x and > 0.5 s absolute
    assert(Bench.suspectedContended(9.0, base("q_mid")))
  }

  test("3x of a timer-noise query does not trip (absolute floor)") {
    val base = Bench.parseBaseline(baselineTxt, "/root/testdata/sf0.1")
    // q_fast 0.05 s baseline at 0.2 s is 4x but only +0.15 s — noise
    assert(!Bench.suspectedContended(0.2, base("q_fast")))
  }

  test("within-3x runs never trip, and a missing baseline disarms") {
    val base = Bench.parseBaseline(baselineTxt, "/root/testdata/sf0.1")
    assert(!Bench.suspectedContended(25.0, base("q_slow"))) // 2.5x
    assert(!Bench.suspectedContended(99.0, base.getOrElse("q_new", -1.0)))
  }
}
