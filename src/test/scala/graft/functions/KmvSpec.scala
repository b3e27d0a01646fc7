package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedSpark
import graft.pipeline.Sketches

/** KMV / bottom-k distinct synopsis: exact bottom-k vs a brute-force
  * hash sort, partition invariance, the exact regime (< k distinct ⇒
  * sketch IS the distinct hash set), merge composability (the property
  * kmvOverlap rests on), estimator accuracy at n ≫ k, and exact-regime
  * Jaccard from sketches alone. */
class KmvSpec extends AnyFunSuite {

  lazy val spark = SharedSpark.session
  import spark.implicits._

  /** The repo's h60: first 15 md5 hex digits of "kmv:<value>". */
  private def h60(v: Long): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"kmv:$v".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)

  private def sketchOf(vals: Seq[Long], k: Int, parts: Int): Seq[Long] = {
    val df = vals.toDF("v").repartition(parts).withColumn("g", lit("x"))
    Sketches.kmvSketches(df, Seq("g"), "v", k)
      .select(col("kmv")).as[Seq[Long]].collect().head
  }

  test("bottom-k equals the k smallest distinct hashes, ascending, any partitioning") {
    val vals = (1L to 500L).map(i => (Mix.splitmix64(i) >>> 20) % 300)
    val expected = vals.distinct.map(h60).sorted.take(64)
    assert(sketchOf(vals, 64, 1) == expected, "single partition")
    assert(sketchOf(vals, 64, 17) == expected,
      "merge path must be partition-invariant")
  }

  test("exact regime: fewer than k distinct values -> the sketch IS the distinct set") {
    val vals = Seq(1L, 2L, 3L, 2L, 1L, 3L, 3L)
    assert(sketchOf(vals, 64, 3) == Seq(1L, 2L, 3L).map(h60).sorted)
    val est = Sketches.kmvDistinct(
      vals.toDF("v").withColumn("g", lit("x")), Seq("g"), "v", k = 64)
      .select("n_kmv", "n_distinct_est").as[(Long, Long)].collect().head
    assert(est == ((3L, 3L)), "exact regime reports the true count")
  }

  test("sketches compose: bottom-k of a union computable from the two sketches") {
    val a = (1L to 400L).map(i => Mix.splitmix64(i) % 1000)
    val b = (300L to 700L).map(i => Mix.splitmix64(i) % 1000)
    val k = 48
    val sa = sketchOf(a, k, 5)
    val sb = sketchOf(b, k, 5)
    val fused = (sa ++ sb).distinct.sorted.take(k)
    assert(fused == sketchOf(a ++ b, k, 7),
      "union-of-sketches bottom-k must equal the sketch of the union")
  }

  test("estimator: within 4 sigma (1/sqrt(k)) of the true distinct count at n >> k") {
    val n = 5000
    val vals = (0 until n).map(i => Mix.splitmix64(0xbeefL + i))
    val k = 128
    val est = Sketches.kmvDistinct(
      vals.toDF("v").withColumn("g", lit("x")), Seq("g"), "v", k)
      .select("n_distinct_est").as[Long].collect().head
    val sigma = n / math.sqrt(k.toDouble)
    assert(math.abs(est - n) <= 4 * sigma,
      s"estimate $est vs true $n (4 sigma = ${4 * sigma})")
  }

  test("overlap: exact-regime Jaccard and union from sketches alone") {
    // A = 1..60, B = 41..100: |A∩B| = 20, |A∪B| = 100; k = 128 keeps
    // every hash, so inter/union/jaccard are EXACT set arithmetic
    val df = ((1L to 60L).map(("a", _)) ++ (41L to 100L).map(("b", _)))
      .toDF("g", "v")
    val row = Sketches.kmvOverlap(df, "g", "v", k = 128)
      .select("group_a", "group_b", "n_kmv_a", "n_kmv_b", "inter_k",
        "jaccard_ppm", "union_est")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(row == Seq(("a", "b", 60L, 60L, 20L, 200000L, 100L)))
  }

  test("estimators reject k = 1 (the (k-1)-based estimate degenerates to 0)") {
    val df = Seq(1L, 2L).toDF("v").withColumn("g", lit("x"))
    intercept[IllegalArgumentException] {
      Sketches.kmvDistinct(df, Seq("g"), "v", k = 1)
    }
    intercept[IllegalArgumentException] {
      Sketches.kmvOverlap(df, "g", "v", k = 1)
    }
    // the raw sketch itself still accepts k = 1 (pure bottom-k use)
    assert(Sketches.kmvSketches(df, Seq("g"), "v", 1)
      .select(col("kmv")).as[Seq[Long]].collect().head.length == 1)
  }

  test("null values are ignored, not hashed") {
    val df = Seq(Some(1L), None, Some(2L), None).toDF("v")
      .withColumn("g", lit("x"))
    val sk = Sketches.kmvSketches(df, Seq("g"), "v", 8)
      .select(col("kmv")).as[Seq[Long]].collect().head
    assert(sk == Seq(1L, 2L).map(h60).sorted)
  }
}
