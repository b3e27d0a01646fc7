package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC corpus I/O — the other Hadoop-native columnar format a
  * Hive-adjacent shop's tables already live in (the reference is a Hive
  * UDTF; its users' warehouses are ORC at least as often as parquet).
  * Spark carries the reader/writer natively, so this is contract, not
  * plumbing: explicit schema on read (self-describing files do NOT make
  * schema drift safe — a renamed column silently NULLs under the lax
  * by-name resolution, same argument as [[Jsonl]]), zlib part files,
  * streaming twin for the landing-directory tail. ORC is a binary
  * columnar container, so there is no per-LINE corrupt-retention
  * dimension (a torn file fails at the stripe/footer level, loudly) —
  * the `_corrupt` contract stays with the text formats.
  *
  * 100 TB posture: columnar + predicate pushdown ≡ the parquet path
  * (Spark's OrcScan pushes filters and prunes columns the same way);
  * writer pins zlib (the ORC default codec everywhere) so files read
  * back anywhere. */
object Orc {

  def write(df: DataFrame, path: String, numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.repartition(numFiles)
      .write.mode("overwrite")
      .option("compression", "zlib")
      .orc(path)
  }

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def readStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).orc(path)
}
