package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedSpark

/** Incremental HLL distinct ledger: estimates within the sketch's error
  * envelope, cross-batch union correctness (overlap is not double-
  * counted), and idempotent per-batch re-runs. */
class LedgerSpec extends AnyFunSuite {

  lazy val spark = SharedSpark.session
  import spark.implicits._

  test("ledger distinct across overlapping batches matches the exact union within 3%") {
    val dir = java.nio.file.Files.createTempDirectory("ledger").toString
    // batch 1: users 0..59999; batch 2: 40000..99999 (20k overlap)
    val b1 = spark.range(0, 60000).toDF("user_id")
    val b2 = spark.range(40000, 100000).toDF("user_id")
    Ledger.update(b1, "user_id", "2026-08-01", dir)
    Ledger.update(b2, "user_id", "2026-08-02", dir)
    val est = Ledger.distinct(spark, dir)
    assert(math.abs(est - 100000.0) / 100000.0 < 0.03,
      s"union estimate $est outside 3% of the exact 100000")
    val estB1 = Ledger.distinct(spark, dir, col("batch_id") === "2026-08-01")
    assert(math.abs(estB1 - 60000.0) / 60000.0 < 0.03, s"batch-1 estimate $estB1")
  }

  test("per-batch re-run is idempotent: overwriting a batch cannot double-count") {
    val dir = java.nio.file.Files.createTempDirectory("ledger_idem").toString
    val b = spark.range(0, 30000).toDF("user_id")
    Ledger.update(b, "user_id", "d1", dir)
    Ledger.update(b, "user_id", "d1", dir) // the re-run
    assert(spark.read.parquet(dir).count() == 1, "one sketch row per batch_id")
    val est = Ledger.distinct(spark, dir)
    assert(math.abs(est - 30000.0) / 30000.0 < 0.03, s"estimate $est after re-run")
  }

  test("empty filter yields 0; mixed-precision batches stay unionable") {
    val dir = java.nio.file.Files.createTempDirectory("ledger_mixed").toString
    Ledger.update(spark.range(0, 10000).toDF("u"), "u", "d1", dir, lgConfigK = 12)
    Ledger.update(spark.range(5000, 20000).toDF("u"), "u", "d2", dir, lgConfigK = 14)
    assert(Ledger.distinct(spark, dir, col("batch_id") === "no-such-batch") == 0L,
      "a filter matching nothing must answer 0, not NPE")
    val est = Ledger.distinct(spark, dir)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.05,
      s"mixed-lgConfigK union must stay readable (coarsest precision), got $est")
  }

  test("report: per-batch and cumulative estimates from sketches only") {
    val dir = java.nio.file.Files.createTempDirectory("ledger_rep").toString
    Ledger.update(spark.range(0, 20000).toDF("u"), "u", "d1", dir)
    Ledger.update(spark.range(10000, 30000).toDF("u"), "u", "d2", dir)
    Ledger.update(spark.range(0, 5000).toDF("u"), "u", "d3", dir) // fully seen
    val rows = Ledger.report(spark, dir)
      .as[(String, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq("d1", "d2", "d3"))
    val cum = rows.map(_._3)
    assert(math.abs(cum(1) - 30000.0) / 30000.0 < 0.03,
      s"cumulative after d2 must be ~30000, got ${cum(1)}")
    assert(cum(2) == cum(1),
      "a batch of already-seen keys must not move the cumulative estimate")
  }
  test("overlap: inclusion-exclusion over sketches, exact in the coupon regime") {
    import spark.implicits._
    val a = (0L until 300L).toDF("k")             // 300 keys
    val b = (200L until 500L).toDF("k")           // 300 keys, 100 shared
    val (da, db, ov) = Ledger.overlap(a, b, "k")
    // small cardinalities ride the Datasketches coupon path: exact
    assert(da == 300L && db == 300L, s"($da, $db)")
    assert(ov == 100L, s"overlap must be exact at coupon cardinalities: $ov")
    // disjoint sets clamp at zero, never negative
    val (_, _, none) = Ledger.overlap(a, (1000L until 1300L).toDF("k"), "k")
    assert(none == 0L, s"$none")
    // empty side: zero everywhere
    val (ea, eb, eo) = Ledger.overlap(a.where($"k" < 0), b, "k")
    assert(ea == 0L && eo == 0L && eb == 300L, s"($ea, $eb, $eo)")
  }
}
