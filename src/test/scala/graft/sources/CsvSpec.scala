package graft.sources

import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedSpark

/** CSV ingest contracts: quoting round-trips, corrupt rows counted. */
class CsvSpec extends AnyFunSuite {

  lazy val spark = SharedSpark.session
  import spark.implicits._

  private val schema = StructType.fromDDL("id BIGINT, txt STRING")

  test("quoted commas and embedded quotes round-trip; corrupt rows accounted") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val rows = Set((1L, """plain"""), (2L, """a,b"""), (3L, """say "hi", ok"""))
    Csv.write(rows.toSeq.toDF("id", "txt"), dir, 2)
    val back = Csv.read(spark, dir, schema)
    assert(Csv.corruptStats(back) == ((3L, 0L)))
    assert(back.where($"_corrupt".isNull).select("id", "txt")
      .as[(Long, String)].collect().toSet == rows)

    // a row with an unparsable id lands in the reject stream
    val dirtyDir = java.nio.file.Files.createTempDirectory("graft_csv2").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dirtyDir, "p.csv"),
      "id,txt\n1,ok\nnot_a_number,bad\n2,fine\n")
    val dirty = Csv.read(spark, dirtyDir, schema)
    assert(Csv.corruptStats(dirty) == ((2L, 1L)), s"${Csv.corruptStats(dirty)}")
    intercept[IllegalArgumentException](Csv.read(spark, dirtyDir,
      StructType.fromDDL("_corrupt STRING")))
  }
}
