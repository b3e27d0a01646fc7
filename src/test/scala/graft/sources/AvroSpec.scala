package graft.sources

import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedSpark

/** Avro ingest contracts: lossless round-trip under an explicit schema,
  * by-name resolution (a renamed upstream field NULLs loudly rather
  * than silently re-typing), streaming twin. */
class AvroSpec extends AnyFunSuite {

  lazy val spark = SharedSpark.session
  import spark.implicits._

  private val schema = StructType.fromDDL("id BIGINT, txt STRING, v DOUBLE")

  test("Avro round-trip is lossless incl. NULLs and unicode; explicit schema reads by name") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro").toString
    val rows = Seq((1L, "plain", 1.5), (2L, "héllo wörld", -0.25),
      (3L, null.asInstanceOf[String], 0.0))
    Avro.write(rows.toDF("id", "txt", "v"), dir, 2)
    val back = Avro.read(spark, dir, schema)
      .as[(Long, Option[String], Double)].collect().toSet
    assert(back == rows.map(r => (r._1, Option(r._2), r._3)).toSet, back.toString)
    // a narrower explicit schema projects by name
    val narrow = Avro.read(spark, dir, StructType.fromDDL("id BIGINT"))
      .as[Long].collect().sorted
    assert(narrow.toSeq == Seq(1L, 2L, 3L))
    // schema drift: a field the files don't carry reads as NULL — the
    // expectations-audit contract, never a silent re-type
    val drifted = Avro.read(spark, dir,
        StructType.fromDDL("id BIGINT, renamed STRING"))
      .as[(Long, Option[String])].collect().toSet
    assert(drifted == Set((1L, None), (2L, None), (3L, None)), drifted.toString)
  }

  test("Avro binary columns survive the round-trip byte-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_b").toString
    val payload = Array[Byte](0, 1, -1, 127, -128, 42)
    Avro.write(Seq((1L, payload)).toDF("id", "blob"), dir, 1)
    val back = Avro.read(spark, dir, StructType.fromDDL("id BIGINT, blob BINARY"))
      .as[(Long, Array[Byte])].collect()
    assert(back.length == 1 && back.head._2.sameElements(payload))
  }

  test("Avro streaming twin tails a landing directory with the batch schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_s").toString
    Avro.write(Seq((7L, "a", 1.0)).toDF("id", "txt", "v"), dir, 1)
    val stream = Avro.readStream(spark, dir, schema)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("avro_tail")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("avro_tail").as[(Long, String, Double)].collect().toSet
    assert(got == Set((7L, "a", 1.0)), got.toString)
  }
}
