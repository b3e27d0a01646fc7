package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedSpark

/** Compactor-hierarchy quantile guarantees: exact R-7 below capacity
  * (oracle-gated in SparkEntry), bounded rank error at N ≫ k under real
  * multi-partition merges, bounded state, exact total weight. */
class QuantileSketchSpec extends AnyFunSuite {

  lazy val spark = SharedSpark.session
  import spark.implicits._

  private val probs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  private def sketch(vals: Seq[Double], k: Int, parts: Int): Seq[Double] =
    vals.toDF("v").repartition(parts)
      .agg(QuantileSketch.sketchQuantiles(col("v"), k, probs).as("q"))
      .select(explode(col("q"))).as[Double].collect().toSeq

  test("exact regime: equals R-7 quantiles exactly, any partitioning") {
    val vals = (1 to 500).map(i => Mix.splitmix64(i.toLong).toDouble % 1000)
    def r7(p: Double): Double = {
      val s = vals.sorted
      val h = p * (s.length - 1)
      val j = math.floor(h).toInt
      s(j) + (h - j) * (s(math.min(j + 1, s.length - 1)) - s(j))
    }
    val expected = probs.map(r7)
    assert(sketch(vals, k = 4096, parts = 1) == expected, "single partition")
    assert(sketch(vals, k = 4096, parts = 13) == expected,
      "merge path below capacity must stay exact and partition-invariant")
  }

  test("approximate regime: rank error within the compactor bound at N >> k") {
    // 200k values, k=256 → levels ≈ log2(N/k) ≈ 10; empirical KLL-style
    // rank error stays well under eps = 2·log2(N/k)/k ≈ 0.078; assert the
    // analytic-envelope bound AND a tighter empirical ceiling so a
    // regression in compaction parity shows up
    val n = 200000
    val vals = (0 until n).map(i => (Mix.splitmix64(0xabcdL + i) >>> 11).toDouble)
    val got = sketch(vals, k = 256, parts = 8)
    val sorted = vals.sorted
    val eps = 2.0 * (math.log(n.toDouble / 256) / math.log(2)) / 256
    probs.zip(got).foreach { case (p, q) =>
      val rank = sorted.count(_ <= q).toDouble / n
      assert(math.abs(rank - p) <= eps,
        s"p=$p: returned value has rank $rank, outside eps=$eps")
      assert(math.abs(rank - p) <= 0.02,
        s"p=$p: rank error ${math.abs(rank - p)} above the 2% empirical ceiling")
    }
  }

  test("skewed input: heavy-tailed distribution keeps the bound") {
    val n = 100000
    // 90% tiny docs, 10% heavy tail up to ~100k — the web-corpus length shape
    val vals = (0 until n).map { i =>
      val u = (Mix.splitmix64(0x7a11L + i) >>> 11).toDouble / (1L << 53).toDouble
      if (u < 0.9) 10 + (u * 400) else math.pow(10, 2 + u * 3)
    }
    val got = sketch(vals, k = 512, parts = 8)
    val sorted = vals.sorted
    probs.zip(got).foreach { case (p, q) =>
      val rank = sorted.count(_ <= q).toDouble / n
      assert(math.abs(rank - p) <= 0.02, s"p=$p rank ${rank} drifted > 2%")
    }
  }

  test("state stays bounded and weight-exact while N grows 100x") {
    val k = 128
    val st = new QuantState(k)
    var n = 0
    (0 until 100000).foreach { i => st.insert(Mix.splitmix64(i.toLong).toDouble); n += 1 }
    assert(st.totalWeight == n, "odd-leftover compaction must preserve total weight exactly")
    val items = st.levels.map(_.length).sum
    val levels = st.levels.length
    assert(items <= k * levels, s"state items $items exceed k x levels ($k x $levels)")
    assert(levels <= 14, s"level count $levels should be ~log2(N/k) + slack")
  }

  test("nulls ignored; empty group yields NaN") {
    val vals = Seq[(java.lang.Long, java.lang.Double)]((1L, 5.0), (2L, null), (3L, 7.0))
      .toDF("id", "v")
    val got = vals.agg(QuantileSketch.sketchQuantiles(col("v"), 64, Seq(0.5)).as("q"))
      .select(col("q")(0)).as[Double].head()
    assert(got == 6.0, s"median of (5,7) with a null must be 6, got $got")
    val empty = vals.where(col("id") < 0)
      .agg(QuantileSketch.sketchQuantiles(col("v"), 64, Seq(0.5)).as("q"))
      .select(col("q")(0)).as[Double].head()
    assert(empty.isNaN, "empty input must yield NaN")
  }
}
