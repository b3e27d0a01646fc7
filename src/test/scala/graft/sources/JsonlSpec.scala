package graft.sources

import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedSpark

/** JSONL ingest contracts: corrupt lines are retained and counted, never
  * silently dropped; the write→read round-trip is lossless; inferred
  * schemas are refused. */
class JsonlSpec extends AnyFunSuite {

  lazy val spark = SharedSpark.session
  import spark.implicits._

  private val schema = StructType.fromDDL("id BIGINT, txt STRING")

  test("round-trip is lossless and corrupt lines are accounted, not dropped") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    Jsonl.write(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "txt"), dir, 2)
    val clean = Jsonl.read(spark, dir, schema)
    assert(Jsonl.corruptStats(clean) == ((3L, 0L)))
    assert(clean.where($"_corrupt".isNull).select("id", "txt")
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))

    // plant garbage lines among good ones (bare text file, no codec)
    val dirtyDir = java.nio.file.Files.createTempDirectory("graft_jsonl2").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dirtyDir, "part-0.jsonl"),
      """{"id": 1, "txt": "ok"}
        |not json at all
        |{"id": 2, "txt": "also ok"}
        |{"id": 3, "txt": <<<
        |""".stripMargin)
    val dirty = Jsonl.read(spark, dirtyDir, schema)
    assert(Jsonl.corruptStats(dirty) == ((2L, 2L)), s"${Jsonl.corruptStats(dirty)}")
    // the reject stream carries the raw offending line (a data column
    // rides along — a corrupt-only projection is refused by Spark)
    val rejects = dirty.where($"_corrupt".isNotNull)
      .select("_corrupt", "id").as[(String, Option[Long])].collect().map(_._1).toSet
    assert(rejects.contains("not json at all"), s"$rejects")
    // good rows parse normally alongside the corrupt ones
    assert(dirty.where($"_corrupt".isNull).select("id").as[Long]
      .collect().toSet == Set(1L, 2L))
  }

  test("readStream tails landed JSONL files; rejects are accounted per micro-batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_s").toString
    var good = 0L; var bad = 0L
    val q = Jsonl.readStream(spark, dir, schema).writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val (g, b) = Jsonl.corruptStats(batch)
        good += g; bad += b; ()
      }.start()
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "a.jsonl"),
        "{\"id\": 1, \"txt\": \"x\"}\nbroken\n")
      q.processAllAvailable()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "b.jsonl"),
        "{\"id\": 2, \"txt\": \"y\"}\n")
      q.processAllAvailable()
      assert((good, bad) == ((2L, 1L)), s"($good, $bad)")
    } finally q.stop()
  }

  test("a schema that claims _corrupt, and an empty corpus, are handled") {
    intercept[IllegalArgumentException](Jsonl.read(spark, "/tmp/x",
      StructType.fromDDL("_corrupt STRING, id BIGINT")))
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl3").toString
    Jsonl.write(Seq.empty[(Long, String)].toDF("id", "txt"), dir, 1)
    assert(Jsonl.corruptStats(Jsonl.read(spark, dir, schema)) == ((0L, 0L)))
    intercept[IllegalArgumentException](
      Jsonl.write(Seq((1L, "a")).toDF("id", "txt"), dir, 0))
  }
}
