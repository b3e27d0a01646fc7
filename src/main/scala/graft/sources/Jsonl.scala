package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) corpus I/O — the interchange format
  * crawl dumps and annotation vendors actually ship. Reference surface:
  * the reference engine consumes JSON strings from table columns
  * (JsonQueryUDTF.java:49-107); a standalone engine also needs the
  * FILE-level form, with the property that a corrupt line is ACCOUNTED
  * FOR, never silently dropped — at 100 TB, "the parser skipped 2% of
  * the crawl" must be a number somebody sees, not a quiet default.
  *
  * Scale: both directions are plain distributed text I/O (gzip-codec
  * part files; Spark's line-based JSON reader splits bare .jsonl by
  * line offset — gzipped parts parallelize per FILE, so write many).
  */
object Jsonl {

  /** Write `df` as gzip JSONL part files (one JSON object per line,
    * fields in `df`'s column order — deterministic, so round-trips and
    * cross-engine reads hash stably). */
  def write(df: DataFrame, path: String, numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.repartition(numFiles)
      .write.mode("overwrite").option("compression", "gzip").json(path)
  }

  /** Read a JSONL corpus under an EXPLICIT schema, keeping corrupt lines:
    * parse failures land in `_corrupt` (the raw line) with every data
    * column NULL, so `where(col("_corrupt").isNotNull)` is the reject
    * stream and [[corruptStats]] the one-pass audit. (Spark refuses a
    * scan whose ONLY referenced column is the corrupt record — when
    * extracting rejects, keep at least one data column in the select,
    * as corruptStats itself does.) An inferred-schema read is refused
    * by design — schema inference samples the data, and a schema that
    * drifts with the batch is how a renamed field silently NULLs a
    * column for a month. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt"),
      "the schema must not itself define _corrupt")
    spark.read
      .schema(schema.add("_corrupt", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
  }

  /** Streaming twin of [[read]]: tail a landing directory of JSONL files
    * as a Structured Streaming source under the same explicit-schema +
    * corrupt-retention contract — each newly landed file becomes a
    * micro-batch, rejects ride the same `_corrupt` column into
    * foreachBatch accounting. */
  def readStream(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt"),
      "the schema must not itself define _corrupt")
    spark.readStream
      .schema(schema.add("_corrupt", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
  }

  /** One-pass ingest audit: (good, corrupt) line counts. Deliberately
    * also references a data column — Spark's JSON scan refuses a plan
    * whose pruned schema is the corrupt column alone. */
  def corruptStats(parsed: DataFrame): (Long, Long) = {
    val dataCol = parsed.columns.find(_ != "_corrupt").getOrElse(
      sys.error("corruptStats: frame carries no data columns"))
    val r = parsed.agg(
      sum(when(col("_corrupt").isNull, 1L).otherwise(0L)),
      sum(when(col("_corrupt").isNotNull, 1L).otherwise(0L)),
      count(col(dataCol))).head
    (if (r.isNullAt(0)) 0L else r.getLong(0),
      if (r.isNullAt(1)) 0L else r.getLong(1))
  }
}
