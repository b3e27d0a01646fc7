package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** ZIP central-directory walk + verified extraction against bytes from
  * the JDK writer and hand-corrupted variants: the torn/hostile
  * contract (EOCD at the tail, CRC/length gates), both methods, and
  * the Spark explode path. */
class ZipSpec extends AnyFunSuite {

  private def zip(entries: (String, String, Boolean)*): Array[Byte] =
    Zip.build(entries.map { case (n, c, st) => (n, c.getBytes("UTF-8"), st) })

  test("entries + verified extract round-trip STORED and DEFLATED") {
    val b = zip(("a.txt", "alpha content", false), ("b.txt", "beta", true))
    val es = Zip.entries(b)
    assert(es.map(_.name) == Seq("a.txt", "b.txt"), s"$es")
    assert(es(0).method == 8 && es(1).method == 0, s"$es")
    assert(es(0).uncompressedSize == 13L && es(1).uncompressedSize == 4L)
    assert(new String(Zip.extract(b, es(0)), "UTF-8") == "alpha content")
    assert(new String(Zip.extract(b, "b.txt"), "UTF-8") == "beta")
    assert(Zip.extract(b, "missing.txt") == null)
    // highly-compressible content exercises a real inflate ratio
    val big = zip(("z.txt", "x" * 50000, false))
    val ez = Zip.entries(big).head
    assert(ez.compressedSize < 1000 && ez.uncompressedSize == 50000L, s"$ez")
    assert(Zip.extract(big, ez).length == 50000)
  }

  test("torn tails lose the index (EOCD at the END); garbage never throws") {
    val b = zip(("doc.txt", "some document text", false))
    // cutting anywhere strips the EOCD → no entries, never a throw
    for (cut <- 0 until b.length by 3) {
      assert(Zip.entries(b.take(cut)).isEmpty, s"cut=$cut")
    }
    assert(Zip.entries("not a zip at all".getBytes).isEmpty)
    assert(Zip.entries(null).isEmpty)
    assert(Zip.entries(Array.emptyByteArray).isEmpty)
  }

  test("bit rot fails the CRC gate: entry listed, content null") {
    val b = zip(("doc.txt", "payload that will rot", true))
    val en = Zip.entries(b).head
    val dataOff = (en.offset + 30 + "doc.txt".length).toInt
    val rotten = b.clone(); rotten(dataOff + 3) = 'X'.toByte
    assert(Zip.entries(rotten).size == 1) // directory still reads
    assert(Zip.extract(rotten, Zip.entries(rotten).head) == null)
    // same for a DEFLATED stream (corruption inside the deflate bytes)
    val d = zip(("doc.txt", "payload that will rot in deflate" * 10, false))
    val ed = Zip.entries(d).head
    val dOff = (ed.offset + 30 + "doc.txt".length).toInt
    val dr = d.clone(); dr(dOff + 5) = (dr(dOff + 5) ^ 0x55).toByte
    assert(Zip.extract(dr, Zip.entries(dr).head) == null)
  }

  test("hostile directories stop clean; unsupported methods extract null") {
    val b = zip(("doc.txt", "content", true))
    val en = Zip.entries(b).head
    // method rewritten to something unsupported (e.g. 99 = AES marker)
    val hostile = en.copy(method = 99)
    assert(Zip.extract(b, hostile) == null)
    // declared sizes past the blob
    assert(Zip.extract(b, en.copy(compressedSize = 1L << 40)) == null)
    assert(Zip.extract(b, en.copy(uncompressedSize = 1L << 40)) == null)
    // ZIP64 markers are out of scope → null, not garbage
    assert(Zip.extract(b, en.copy(uncompressedSize = 0xffffffffL,
      compressedSize = 0xffffffffL)) == null)
    // offset pointing at non-local-header bytes
    assert(Zip.extract(b, en.copy(offset = 1L)) == null)
    // declared STORED size disagreeing with csize
    assert(Zip.extract(b, en.copy(method = 0, compressedSize = 3L)) == null)
  }

  test("Spark read path: explode + extract, torn/garbage blobs yield no rows") {
    val spark = graft.operators.SharedSpark.session
    import spark.implicits._
    val good = zip(("d.txt", "hello zip", false), ("m.txt", "k=v", true))
    val torn = good.take(good.length - 25)
    val rows = Seq((1L, good), (2L, torn), (3L, "garbage".getBytes("US-ASCII")))
      .toDF("id", "payload")
    val got = Zip.read(rows, "payload")
      .select($"id", $"name", $"method",
        $"content".cast("string").as("c"))
      .as[(Long, String, Int, String)].collect().toSet
    assert(got == Set((1L, "d.txt", 8, "hello zip"), (1L, "m.txt", 0, "k=v")), s"$got")
    // header-only listing agrees
    val ls = Zip.list(rows, "payload").select($"id", $"name")
      .as[(Long, String)].collect().toSet
    assert(ls == Set((1L, "d.txt"), (1L, "m.txt")), s"$ls")
  }
}
