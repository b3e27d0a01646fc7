package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Avro corpus I/O — the Kafka-adjacent interchange format (the row
  * format event logs and CDC feeds actually arrive in; Spark 4 bundles
  * the connector in spark-sql, so this is contract, not plumbing): the
  * [[Jsonl]]/[[Csv]]/[[Orc]] source contract — explicit schema on read
  * (Avro files are self-describing, but drift-safety is the point:
  * Spark resolves Avro fields BY NAME against the supplied schema, and a
  * renamed upstream field must surface as a NULL column the
  * expectations audit catches, not silently re-type the frame), pinned
  * deflate part files (pure-JVM codec — reads back anywhere, no native
  * snappy dependency), streaming twin tailing a landing directory.
  * The provider is addressed by its full class name: this Spark build
  * ships the avro module's classes inside spark-sql but does NOT list
  * them in the DataSourceRegister service file, so the "avro" shortname
  * fails lookup while the class itself loads fine.
  *
  * 100 TB posture: Avro is a ROW container — no column pruning, no
  * predicate pushdown (`PushedFilters` stays empty by format, unlike
  * the parquet/ORC scans). That is WHY the pipeline treats it as a
  * landing format: one pass off the Kafka archive, rewritten columnar
  * before anything analytical runs. Splits are block-aligned (sync
  * markers), so big files still parallelize across executors. */
object Avro {

  private val Provider = "org.apache.spark.sql.avro.AvroFileFormat"

  def write(df: DataFrame, path: String, numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.repartition(numFiles)
      .write.mode("overwrite")
      .option("compression", "deflate")
      .format(Provider).save(path)
  }

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).format(Provider).load(path)

  def readStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).format(Provider).load(path)
}
