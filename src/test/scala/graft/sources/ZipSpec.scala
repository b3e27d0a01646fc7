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

  test("ZIP64: EOCD64 + locator + 0x0001 extras resolve the 32-bit markers") {
    // hand-assembled minimal ZIP64 archive: one STORED entry whose CD
    // record carries 0xFFFFFFFF size/offset markers resolved by the
    // zip64 extra, and a classic EOCD whose count/offset route through
    // the EOCD64. (Real >4 GB archives aren't buildable in a spec; the
    // MARKER PLUMBING is what the walk must get right.)
    val content = "hello zip64".getBytes("US-ASCII")
    val name = "z64.txt".getBytes("US-ASCII")
    val crc = { val c = new java.util.zip.CRC32(); c.update(content); c.getValue }
    def le(v: Long, n: Int): Array[Byte] =
      Array.tabulate[Byte](n)(i => ((v >> (8 * i)) & 0xff).toByte)
    val local = "PK".getBytes("US-ASCII") ++ le(20, 2) ++
      le(0, 2) ++ le(0, 2) ++ le(0, 4) ++ le(crc, 4) ++
      le(content.length.toLong, 4) ++ le(content.length.toLong, 4) ++
      le(name.length.toLong, 2) ++ le(0, 2) ++ name ++ content
    val extra = le(1, 2) ++ le(24, 2) ++ // id 0x0001, 24 data bytes
      le(content.length.toLong, 8) ++ le(content.length.toLong, 8) ++ le(0, 8)
    val cd = "PK".getBytes("US-ASCII") ++ le(45, 2) ++ le(45, 2) ++
      le(0, 2) ++ le(0, 2) ++ le(0, 4) ++ le(crc, 4) ++
      le(0xffffffffL, 4) ++ le(0xffffffffL, 4) ++ // csize/usize markers
      le(name.length.toLong, 2) ++ le(extra.length.toLong, 2) ++ le(0, 2) ++
      le(0, 2) ++ le(0, 2) ++ le(0, 4) ++
      le(0xffffffffL, 4) ++ // offset marker
      name ++ extra
    val cdOff = local.length.toLong
    val eocd64 = "PK".getBytes("US-ASCII") ++ le(44, 8) ++
      le(45, 2) ++ le(45, 2) ++ le(0, 4) ++ le(0, 4) ++
      le(1, 8) ++ le(1, 8) ++ le(cd.length.toLong, 8) ++ le(cdOff, 8)
    val locator = "PK".getBytes("US-ASCII") ++ le(0, 4) ++
      le(cdOff + cd.length, 8) ++ le(1, 4)
    val eocd = "PK".getBytes("US-ASCII") ++ le(0, 2) ++ le(0, 2) ++
      le(0xffffL, 2) ++ le(0xffffL, 2) ++ le(cd.length.toLong, 4) ++
      le(0xffffffffL, 4) ++ le(0, 2)
    val zip64 = local ++ cd ++ eocd64 ++ locator ++ eocd
    val es = Zip.entries(zip64)
    assert(es.size == 1, s"$es")
    val en = es.head
    assert(en.name == "z64.txt" && en.uncompressedSize == content.length &&
      en.compressedSize == content.length && en.offset == 0L, s"$en")
    assert(new String(Zip.extract(zip64, en), "US-ASCII") == "hello zip64")
    // markers WITHOUT a resolving extra stay hostile: listed, null extract
    val noExtraCd = cd.take(30) ++ le(0, 2) /* xlen 0 */ ++
      cd.slice(32, 46) ++ name
    val brokenEocd64 = eocd64.patch(40, le(noExtraCd.length.toLong, 8), 8)
    val broken = local ++ noExtraCd ++ brokenEocd64 ++
      ("PK".getBytes("US-ASCII") ++ le(0, 4) ++
        le(cdOff + noExtraCd.length, 8) ++ le(1, 4)) ++ eocd
    val bs = Zip.entries(broken)
    assert(bs.size == 1 && bs.head.uncompressedSize == 0xffffffffL, s"$bs")
    assert(Zip.extract(broken, bs.head) == null)
    // a torn locator (classic markers, no PK67 behind them) lists nothing
    val tornLoc = local ++ cd ++ eocd
    assert(Zip.entries(tornLoc).isEmpty)
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
