package graft.sources

import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedSpark

/** ORC ingest contracts: lossless round-trip under an explicit schema,
  * column pruning/pushdown reaching the scan, streaming twin. */
class OrcSpec extends AnyFunSuite {

  lazy val spark = SharedSpark.session
  import spark.implicits._

  private val schema = StructType.fromDDL("id BIGINT, txt STRING, v DOUBLE")

  test("ORC round-trip is lossless incl. NULLs and unicode; explicit schema reads by name") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val rows = Seq((1L, "plain", 1.5), (2L, "héllo wörld", -0.25),
      (3L, null.asInstanceOf[String], 0.0))
    Orc.write(rows.toDF("id", "txt", "v"), dir, 2)
    val back = Orc.read(spark, dir, schema)
      .as[(Long, Option[String], Double)].collect().toSet
    assert(back == rows.map(r => (r._1, Option(r._2), r._3)).toSet, back.toString)
    // a narrower explicit schema projects (column pruning at the scan)
    val narrow = Orc.read(spark, dir, StructType.fromDDL("id BIGINT"))
      .as[Long].collect().sorted
    assert(narrow.toSeq == Seq(1L, 2L, 3L))
  }

  test("ORC streaming twin tails a landing directory with the batch schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_s").toString
    Orc.write(Seq((7L, "a", 1.0)).toDF("id", "txt", "v"), dir, 1)
    val stream = Orc.readStream(spark, dir, schema)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("orc_tail")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("orc_tail").as[(Long, String, Double)].collect().toSet
    assert(got == Set((7L, "a", 1.0)), got.toString)
  }
}
