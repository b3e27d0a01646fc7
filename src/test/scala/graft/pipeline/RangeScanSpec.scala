package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedSpark

/** RangeScan's contract is bit-equality with the single-reducer global
  * window it replaces — sums, maxes, preceding-only and include-current
  * frames, ascending and descending orders, NULL-prefix semantics — and
  * invariance to the input's physical partitioning (the determinism bar
  * every graft operator carries). */
class RangeScanSpec extends AnyFunSuite {

  lazy val spark = SharedSpark.session
  import spark.implicits._

  // 10k distinct keys, deterministic pseudo-random values incl. negatives
  // (a running max over negatives catches a coalesce-to-zero shortcut)
  private def frame(parts: Int) = spark.range(10000)
    .repartition(parts)
    .selectExpr("id AS v",
      "CAST(pmod(xxhash64(id), 1000) - 500 AS BIGINT) AS a",
      "CAST(pmod(xxhash64(id, 7), 97) AS BIGINT) AS b")

  test("running sums and maxes match the global window bit-for-bit") {
    val df = frame(32)
    val got = RangeScan.runningAgg(df, Seq(col("v")), Seq(
        RangeScan.Scan(col("a"), "sum_pre"),
        RangeScan.Scan(col("a"), "sum_inc", includeCurrent = true),
        RangeScan.Scan(col("a"), "max_pre", isMax = true),
        RangeScan.Scan(col("a") + col("b"), "max_inc", isMax = true,
          includeCurrent = true)))
      .select("v", "sum_pre", "sum_inc", "max_pre", "max_inc")
    val pre = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    val inc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    val want = df
      .withColumn("sum_pre", sum("a").over(pre))
      .withColumn("sum_inc", sum("a").over(inc))
      .withColumn("max_pre", max("a").over(pre))
      .withColumn("max_inc", max(col("a") + col("b")).over(inc))
      .select("v", "sum_pre", "sum_inc", "max_pre", "max_inc")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "range scan diverged from the global window")
    // first row's preceding-only sums/maxes are NULL, like the window's
    val first = got.orderBy("v").limit(1).collect()(0)
    assert(first.isNullAt(1) && first.isNullAt(3))
  }

  test("descending order matches the global DESC window") {
    val df = frame(16)
    val got = RangeScan.runningAgg(df, Seq(col("v").desc), Seq(
        RangeScan.Scan(col("b"), "cum", includeCurrent = true),
        RangeScan.Scan(col("a"), "mx", isMax = true)))
      .select("v", "cum", "mx")
    val pre = Window.orderBy(col("v").desc).rowsBetween(Window.unboundedPreceding, -1)
    val inc = Window.orderBy(col("v").desc).rowsBetween(Window.unboundedPreceding, 0)
    val want = df
      .withColumn("cum", sum("b").over(inc))
      .withColumn("mx", max("a").over(pre))
      .select("v", "cum", "mx")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("result is invariant to input partitioning (3 vs 32)") {
    def run(parts: Int) = RangeScan.runningAgg(frame(parts), Seq(col("v")),
        Seq(RangeScan.Scan(col("a"), "s", includeCurrent = true)))
      .select("v", "s")
    val a = run(3)
    val b = run(32)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("DECIMAL(38,0) sums stay exact through the bucket combine") {
    val df = spark.range(2000).selectExpr("id AS v",
      "CAST(1000000000000000000 AS DECIMAL(38,0)) + CAST(id AS DECIMAL(38,0)) AS d")
    val got = RangeScan.runningAgg(df, Seq(col("v")),
        Seq(RangeScan.Scan(col("d"), "cum", includeCurrent = true)))
      .agg(max("cum")).as[java.math.BigDecimal].collect()(0)
    // Σ (1e18 + i) for i in [0, 2000) = 2000·1e18 + 1999·2000/2
    val want = new java.math.BigDecimal("2000000000000000000000")
      .add(new java.math.BigDecimal(1999L * 2000 / 2))
    assert(got.compareTo(want) == 0, s"got $got want $want")
  }

  test("empty and single-row frames survive") {
    val empty = frame(4).where("v < 0")
    assert(RangeScan.runningAgg(empty, Seq(col("v")),
      Seq(RangeScan.Scan(col("a"), "s"))).count() == 0)
    val one = frame(4).where("v = 17")
    val row = RangeScan.runningAgg(one, Seq(col("v")), Seq(
        RangeScan.Scan(col("a"), "s"),
        RangeScan.Scan(col("a"), "m", isMax = true, includeCurrent = true)))
      .select("s", "m", "a").collect()(0)
    assert(row.isNullAt(0) && row.getLong(1) == row.getLong(2))
  }

  test("keyed scans restart per partition key and equal the partitioned window") {
    // few-keys × huge-frame shape: the scan must equal
    // Window.partitionBy(g).orderBy(v) bit-for-bit, including the
    // NULL-prefix contract per key
    val df = spark.range(4000).selectExpr(
      "CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN 'b' ELSE 'c' END AS g",
      "id AS v", "id % 7 AS a")
    val got = RangeScan.runningAgg(df, Seq(col("v")), Seq(
        RangeScan.Scan(col("a"), "s"),
        RangeScan.Scan(col("a"), "m", isMax = true, includeCurrent = true)),
        partitionBy = Seq("g"))
      .select("g", "v", "s", "m").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3))).sortBy(x => (x._1, x._2))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("v")
    val want = df
      .withColumn("s", sum("a").over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
      .withColumn("m", max("a").over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select("g", "v", "s", "m").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3))).sortBy(x => (x._1, x._2))
    assert(got.length == 4000 && got.sameElements(want))
  }

  test("reserved __rs_* input columns fail loudly (r12 advice: a composed " +
      "second scan must not silently corrupt the combines)") {
    val tainted = frame(4).withColumn("__rs_b", col("v"))
    val e = intercept[IllegalArgumentException] {
      RangeScan.runningAgg(tainted, Seq(col("v")),
        Seq(RangeScan.Scan(col("a"), "s")))
    }
    assert(e.getMessage.contains("__rs_b"))
  }
}
