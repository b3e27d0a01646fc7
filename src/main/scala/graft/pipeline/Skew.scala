package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salting utilities for skew-heavy aggregations.
  *
  * Spark's map-side partial aggregation already flattens skew for
  * algebraic aggregates (sum/count/min/max) — the reducer for a hot key
  * receives one partial per map task, not one row per input row. The
  * aggregations that DO melt a reducer at 100 TB are the holistic ones,
  * `count(DISTINCT x)` first among them: every distinct value of the hot
  * key's x lands on one task. These helpers spread that work.
  *
  * `saltedDistinct` exploits that distinct-counting is disjoint-unionable:
  * salting by `hash(x) % salts` sends every occurrence of the same value
  * to the same salt, so per-salt distinct counts sum to the exact global
  * distinct count — two ordinary shuffles, no exactness loss, hot key
  * spread over `salts` reducers.
  *
  * `saltedAgg` is the generic two-stage shape for algebraic aggregates
  * (useful when partial aggregation is defeated, e.g. high-cardinality
  * group keys combined with a few monster keys).
  */
object Skew {

  /** Exact per-key count(DISTINCT valueCol), hot keys spread over `salts`
    * reducers. Result is identical to
    * `df.groupBy(keys).agg(countDistinct(valueCol))`. */
  def saltedDistinct(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     salts: Int = 16, resultCol: String = "n_distinct"): DataFrame = {
    require(salts > 0)
    val keys = keyCols.map(col)
    df.withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(salts)))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(count_distinct(col(valueCol)).as("__partial"))
      .groupBy(keys: _*)
      .agg(sum(col("__partial")).as(resultCol))
  }

  /** Two-stage salted sum: stage 1 aggregates on (keys, salt), stage 2
    * combines partials. Identical result to a direct groupBy-sum. */
  def saltedSum(df: DataFrame, keyCols: Seq[String], value: Column,
                salts: Int = 16, resultCol: String = "sum"): DataFrame = {
    require(salts > 0)
    val keys = keyCols.map(col)
    // any deterministic spread works — hash the value expression itself so
    // the salt needs no extra columns and stays stable across retries
    df.withColumn("__v", value)
      .withColumn("__salt", pmod(xxhash64(col("__v")), lit(salts)))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(sum(col("__v")).as("__partial"))
      .groupBy(keys: _*)
      .agg(sum(col("__partial")).as(resultCol))
  }
}
