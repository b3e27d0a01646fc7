package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV corpus I/O under the [[Jsonl]] contract: explicit schema only,
  * corrupt rows retained in `_corrupt` and ACCOUNTED (a row with the
  * wrong column count or an unparsable value is a number somebody sees,
  * not a silent drop), gzip part files, streaming twin. CSV adds the
  * quoting/escaping dimension JSONL doesn't have — the writer pins
  * RFC-ish double-quote escaping so the round-trip (and the DuckDB
  * cross-read) is byte-stable. */
object Csv {

  def write(df: DataFrame, path: String, numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.repartition(numFiles)
      .write.mode("overwrite")
      .option("compression", "gzip").option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      .csv(path)
  }

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt"),
      "the schema must not itself define _corrupt")
    spark.read
      .schema(schema.add("_corrupt", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      .csv(path)
  }

  def readStream(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt"),
      "the schema must not itself define _corrupt")
    spark.readStream
      .schema(schema.add("_corrupt", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      .csv(path)
  }

  /** One-pass ingest audit, same shape (and same corrupt-only-scan
    * workaround) as [[Jsonl.corruptStats]]. */
  def corruptStats(parsed: DataFrame): (Long, Long) = Jsonl.corruptStats(parsed)
}
