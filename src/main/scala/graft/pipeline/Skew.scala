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

  /** Skew-safe equi join by SALT-AND-REPLICATE: the big side's hot join
    * keys melt one reducer in a plain shuffle join (every row of the hot
    * key lands on a single task); here each big row is salted
    * DETERMINISTICALLY (hash of the whole row — stable across task
    * retries, no `rand()` whose replay could route a row differently mid
    * job) and the small side is replicated once per salt, so the hot key
    * spreads over `replication` reducers. Result is identical to
    * `big.join(small, keys, joinType)` — the salt only changes routing.
    *
    * Use when the small side is past the broadcast cap but far smaller
    * than the big side (the replicated small side costs
    * `replication × |small|` shuffle bytes — that is the price of the
    * spread) and AQE's skew-join splitting is unavailable or defeated
    * (e.g. the skew emerges only after upstream filters with stale
    * stats). `joinType` is restricted to the LEFT-preserving joins —
    * replicating the small side would duplicate its unmatched rows under
    * right/full outer. */
  def replicatedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                     replication: Int = 8,
                     joinType: String = "inner"): DataFrame = {
    require(replication >= 1 && replication <= 4096,
      s"replication must be in [1, 4096], got $replication")
    require(keys.nonEmpty, "need at least one join key")
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    require(allowed.contains(joinType.toLowerCase),
      s"joinType must be left-preserving (${allowed.mkString("/")}), got $joinType")
    val bigCols = big.columns
    require(!bigCols.contains("__salt") && !small.columns.contains("__salt"),
      "inputs must not already carry a __salt column")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(bigCols.map(col): _*)), lit(replication)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(replication - 1L))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
