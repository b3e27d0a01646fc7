package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedSpark

/** Bucketed-table co-located join: the 100 TB answer for repeated
  * fact-fact joins. Writing both tables bucketed by the join key lets
  * SortMergeJoin read them with zero Exchange — the shuffle happens once
  * at write time and is amortized over every subsequent join. This spec
  * proves the plan shape (no Exchange above either scan) and that the
  * co-located join returns exactly the rows of the shuffle join. */
class BucketedJoinSpec extends AnyFunSuite {

  lazy val spark = SharedSpark.session

  test("bucketed orders+lineitem join plans without an Exchange and matches shuffle join") {
    val sf = "/root/testdata/sf0.001"
    val wh = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    spark.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")

    // force the fact-fact join shape (at real scale neither side broadcasts)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val joined = spark.table("b_orders").join(
      spark.table("b_lineitem"),
      col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity").cast("long")).as("qty"))

    val plan = GraftShim.explainString(joined)
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey")
        && !plan.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed join still shuffles on the join key:\n$plan")
    assert(plan.contains("SelectedBucketsCount"), s"scan not bucket-aware:\n$plan")

    // same rows as the plain shuffle join over the raw parquet
    val shuffled = spark.read.parquet(s"$sf/orders.parquet").join(
        spark.read.parquet(s"$sf/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bucketed = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bucketed == shuffled)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
