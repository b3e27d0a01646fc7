package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan pruning — the write-path
  * companion to predicate pushdown. Parquet readers skip whole files /
  * row groups from footer min-max stats, but stats only prune when the
  * layout gives each file a TIGHT value range: a corpus sorted by one
  * column prunes that column only. Z-ORDER (Morton-curve) clustering
  * interleaves the bits of several columns so every file covers a small
  * hyper-rectangle of the combined space — a selective filter on ANY of
  * the z-columns skips most files (the Delta/Iceberg `OPTIMIZE ZORDER`
  * idea, built here from plain Spark ops: bucket → bit-interleave →
  * repartitionByRange → sortWithinPartitions → parquet).
  *
  * At 100 TB this is the difference between "read 3 files" and "read the
  * corpus" for the daily point-lookup / small-range workloads that hit a
  * curated dataset (doc_id × time, user × day, part × supplier).
  *
  * Buckets are equi-width over the driver-collected min/max (one tiny agg
  * pass). Heavily skewed columns should be pre-transformed (log, rank) or
  * bucketed by quantile boundaries instead — equi-width keeps the bucket
  * map a pure codegen'd arithmetic expression with no boundary table.
  * Everything here is `functions._` arithmetic: whole-stage codegen, no
  * UDF, no custom expression.
  */
object Layout {

  /** `bits`-bit equi-width bucket of `c` given the column's [lo, hi]. */
  private def bucket(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val buckets = 1L << bits
    val span = math.max(hi - lo, Double.MinPositiveValue)
    // clamp into [0, buckets-1]; NULL → bucket 0 (sorts first, stats stay correct)
    least(lit(buckets - 1), greatest(lit(0L),
      floor((coalesce(c.cast("double"), lit(lo)) - lit(lo)) * lit(buckets.toDouble) / lit(span))
        .cast("long")))
  }

  /** Morton z-value: interleaves the `bits`-bit buckets of each column
    * (first column takes the highest bit of each group). Pure LONG
    * arithmetic — requires `cols.size * bits <= 63`. */
  def zValue(colsWithRange: Seq[(Column, Double, Double)], bits: Int): Column = {
    require(colsWithRange.nonEmpty, "zValue needs at least one column")
    require(colsWithRange.size * bits <= 63,
      s"${colsWithRange.size} cols x $bits bits exceeds a signed long")
    val bs = colsWithRange.map { case (c, lo, hi) => bucket(c, lo, hi, bits) }
    val d = bs.length
    // bit (bits-1-level) of every column, packed per level
    (0 until bits).foldLeft(lit(0L)) { (acc, level) =>
      bs.zipWithIndex.foldLeft(shiftleft(acc, d)) { case (a, (b, i)) =>
        a.bitwiseOR(shiftleft(
          shiftright(b, bits - 1 - level).bitwiseAND(lit(1L)), d - 1 - i))
      }
    }
  }

  /** Z-order `df` by `cols` and write parquet: one min/max pass sizes the
    * buckets, `repartitionByRange` on the z-value carves contiguous
    * Morton-curve segments (one per output file), and an in-partition sort
    * tightens row-group stats inside each file. `numFiles` follows the
    * [[Maintenance.compactParquet]] sizing discipline: pick it from the
    * data volume (bytes / target file size). */
  def zorderWrite(df: DataFrame, cols: Seq[String], dir: String,
                  numFiles: Int, bits: Int = 16): Unit = {
    require(cols.nonEmpty && numFiles > 0)
    val aggCols = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val stats = df.agg(aggCols.head, aggCols.tail: _*).head()
    val ranges = cols.zipWithIndex.map { case (c, i) =>
      val lo = Option(stats.get(2 * i)).fold(0.0)(_.asInstanceOf[Double])
      val hi = Option(stats.get(2 * i + 1)).fold(0.0)(_.asInstanceOf[Double])
      (col(c), lo, hi)
    }
    df.withColumn("__z", zValue(ranges, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }

  /** Per-file min/max of `cols` for a parquet dir — the same stats a
    * reader's footer pruning sees, surfaced as a DataFrame so layout
    * effectiveness is measurable (and spec-assertable) instead of guessed:
    * a file prunes for predicate `c BETWEEN a AND b` iff its [min,max]
    * misses [a,b]. */
  /** Deterministic GLOBAL training shuffle, materialized as shard +
    * within-shard position — the "shuffle the corpus before the trainer
    * streams it" op. Epoch-over-epoch identical, resumable, and
    * replayable in any engine: order is the md5-derived
    * `h60("shuf:" ∥ epoch ∥ ":" ∥ id)` hash (a uniform pseudo-random
    * permutation keyed by `epoch` — a new epoch is a NEW independent
    * shuffle, no state), `shard = h mod nShards`, `pos` = rank within
    * the shard by `(h, id)`.
    *
    * Scale shape: this is sort-by-hash sharding, not a global sort —
    * one exchange on `shard` and a per-shard window sort, parallel
    * across shards; pick `nShards` ≥ the writer parallelism so each
    * shard is one task's worth (the trainer reads shards concurrently
    * and walks `pos` within each, which is exactly the layout
    * `partitionBy(shard) + sortWithinPartitions(pos)` writes). No
    * random() anywhere — re-running any slice of the pipeline yields
    * the identical order, so a mid-epoch restart resumes instead of
    * reshuffling. Output: idCol, `shard`, `pos`. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
                    epoch: Int = 0): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val h = conv(substring(md5(
      concat(lit(s"shuf:$epoch:"), col(idCol).cast("string"))), 1, 15), 16, 10)
      .cast("long")
    val w = Window.partitionBy("shard").orderBy("__h", idCol)
    df.select(col(idCol), h.as("__h"))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  def fileStats(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Count of files a conjunction of closed-interval predicates CANNOT
    * skip (footer-stats overlap test), next to the total file count. */
  def filesTouched(spark: SparkSession, dir: String,
                   box: Seq[(String, Double, Double)]): (Long, Long) = {
    val stats = fileStats(spark, dir, box.map(_._1))
    val overlap = box.map { case (c, lo, hi) =>
      col(s"max_$c").cast("double") >= lo && col(s"min_$c").cast("double") <= hi
    }.reduce(_ && _)
    (stats.where(overlap).count(), stats.count())
  }
}
