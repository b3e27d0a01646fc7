package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental DISTINCT-count ledger — the "how many unique users/docs/
  * urls ever" metric a pipeline reports daily at 100 TB without ever
  * re-scanning history: each batch contributes one HLL sketch row
  * (Spark's built-in Datasketches `hll_sketch_agg` — bounded state,
  * mergeable), the ledger is a tiny parquet table of (batch_id, sketch),
  * and any range's distinct estimate is one `hll_union_agg` over KB-sized
  * sketches. An exact recount would re-shuffle every batch ever ingested;
  * the ledger answers from sketches alone — the cross-batch twin of the
  * in-query `approx_count_distinct`.
  *
  * Built-ins only: no custom expression, whole lifecycle is three
  * one-liners over `functions._`. Estimates carry the standard HLL error
  * (~1.6% at lgConfigK=12 default; raise it for tighter bounds —
  * spec-asserted). `update` is idempotent per batch_id (overwrite of that
  * partition), so re-running a day's job cannot double-count it. */
object Ledger {

  /** Append/overwrite one batch's sketch. Partitioned by batch_id: a
    * re-run replaces its own row only. The dynamic overwrite mode is set
    * as a WRITER option, never on the shared session conf — a session-
    * conf toggle races under concurrent updates, and losing that race
    * means a STATIC overwrite that deletes every prior batch's sketch. */
  def update(batch: DataFrame, keyCol: String, batchId: String, dir: String,
             lgConfigK: Int = 14): Unit =
    batch.agg(hll_sketch_agg(col(keyCol), lit(lgConfigK)).as("sketch"))
      .withColumn("batch_id", lit(batchId))
      .repartition(1)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dir)

  /** Distinct estimate across every batch (or a batch_id predicate) —
    * reads only the sketch rows, never the data. 0 when the filter
    * matches nothing. Unions tolerate batches written at different
    * lgConfigK (the union downgrades to the coarsest precision — a
    * ledger must stay readable after its owner tightens the setting). */
  def distinct(spark: SparkSession, dir: String,
               batchFilter: org.apache.spark.sql.Column = lit(true)): Long = {
    val row = spark.read.parquet(dir)
      .where(batchFilter)
      .agg(hll_sketch_estimate(
        hll_union_agg(col("sketch"), lit(true))).as("d"))
      .head
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }

  /** Estimated key overlap between two corpora by inclusion-exclusion
    * over HLL sketches: |A∩B| ≈ |A| + |B| − |A∪B| — "how many users/docs/
    * urls do these two sources share" with ONE bounded-state aggregate
    * per side and a sketch union, never a join (the exact intersect of
    * two 100 TB key sets is a full co-shuffle of both). Returns
    * (distinctA, distinctB, estOverlap). Error compounds across the three
    * estimates (spec-asserted envelope); overlap is clamped to
    * [0, min(|A|,|B|)] — inclusion-exclusion on independent sketch
    * errors can go slightly negative on disjoint sets and slightly past
    * the smaller corpus when A ⊂ B. For small corpora the Datasketches
    * coupon regime makes the estimates exact (spec-pinned). */
  def overlap(a: DataFrame, b: DataFrame, keyCol: String,
              lgConfigK: Int = 14): (Long, Long, Long) = {
    // ONE corpus scan per side: the KB sketches collect to the driver and
    // every estimate/union below runs on local literals
    val spark = a.sparkSession
    import spark.implicits._
    def sketchOf(df: DataFrame): Array[Byte] =
      df.agg(hll_sketch_agg(col(keyCol), lit(lgConfigK)).as("s"))
        .head.getAs[Array[Byte]]("s")
    val (sa, sb) = (sketchOf(a), sketchOf(b))
    def est(sk: Array[Byte]*): Long = {
      val r = sk.toSeq.toDF("s")
        .agg(hll_sketch_estimate(hll_union_agg(col("s"), lit(true)))).head
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    val (da, db, u) = (est(sa), est(sb), est(sa, sb))
    // clamp both ends: independent sketch errors can push the
    // inclusion-exclusion estimate below 0 (disjoint sets) or above
    // min(|A|,|B|) (A ⊂ B) — neither is a possible overlap
    (da, db, math.min(math.max(0L, da + db - u), math.min(da, db)))
  }

  /** Per-batch distinct estimates next to the running cumulative estimate
    * — the daily-report query (one row per batch, sketches only). */
  def report(spark: SparkSession, dir: String): DataFrame = {
    val sketches = spark.read.parquet(dir)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("batch_id").rowsBetween(Long.MinValue, 0)
    sketches
      .select(col("batch_id"),
        hll_sketch_estimate(col("sketch")).as("batch_distinct"),
        hll_sketch_estimate(hll_union_agg(col("sketch"), lit(true)).over(w))
          .as("cumulative_distinct"))
      .orderBy("batch_id")
  }
}
