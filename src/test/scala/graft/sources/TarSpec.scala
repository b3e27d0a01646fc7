package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** ustar walk against the deterministic builder and hand-corrupted
  * variants: checksum self-check, complete-entries-only torn contract,
  * the per-entry cap's listed-with-null-content behavior, gzip twins,
  * and the Spark explode path. */
class TarSpec extends AnyFunSuite {

  private def tar(entries: (String, String)*): Array[Byte] =
    Tar.build(entries.map { case (n, c) => (n, c.getBytes("UTF-8")) })

  test("build + parse round-trip, plain and gzip") {
    val b = tar(("a.txt", "alpha"), ("dir/b.txt", "b" * 700))
    val got = Tar.parse(b)
    assert(got.map(_.name) == Seq("a.txt", "dir/b.txt"), s"$got")
    assert(got.map(_.size) == Seq(5L, 700L))
    assert(new String(got(0).content, "UTF-8") == "alpha")
    assert(new String(got(1).content, "UTF-8") == "b" * 700)
    assert(got.forall(_.typeflag == "0"))
    val gz = Tar.buildGz(Seq(("a.txt", "alpha".getBytes("UTF-8"))))
    assert((gz(0) & 0xff) == 0x1f)
    val g = Tar.parse(gz)
    assert(g.size == 1 && new String(g.head.content, "UTF-8") == "alpha", s"$g")
  }

  test("torn archives keep exactly the complete entries; counts monotone") {
    val b = tar(("one.txt", "x" * 600), ("two.txt", "y" * 100))
    var prev = 0
    for (cut <- 0 to b.length by 7) {
      val k = Tar.parse(b.take(cut)).size
      assert(k >= prev && k <= 2, s"cut=$cut k=$k")
      prev = math.max(prev, k)
    }
    // a cut inside entry 2's content keeps entry 1 only
    val cut = 512 + 1024 + 512 + 50 // hdr1 + padded(600) + hdr2 + partial
    val torn = Tar.parse(b.take(cut))
    assert(torn.size == 1 && torn.head.name == "one.txt", s"$torn")
  }

  test("checksum corruption stops the walk; garbage and null never throw") {
    val b = tar(("a.txt", "data"), ("b.txt", "more"))
    val rot = b.clone(); rot(20) = 'Z'.toByte // inside mode field of hdr 1
    assert(Tar.parse(rot).isEmpty) // hdr1 checksum now wrong → stop
    // corrupt only the SECOND header: first entry survives
    val rot2 = b.clone(); rot2(1024 + 20) = 'Z'.toByte
    assert(Tar.parse(rot2).map(_.name) == Seq("a.txt"))
    assert(Tar.parse("not a tar".getBytes).isEmpty)
    assert(Tar.parse(null).isEmpty)
    assert(Tar.parse(new Array[Byte](1024)).isEmpty) // all-zero = end marker
  }

  test("over-cap entries are LISTED with null content; the walk continues") {
    val b = tar(("big.txt", "z" * 5000), ("small.txt", "ok"))
    val got = Tar.parse(b, maxEntryBytes = 1024)
    assert(got.map(_.name) == Seq("big.txt", "small.txt"), s"$got")
    assert(got(0).content == null && got(0).size == 5000L)
    assert(new String(got(1).content, "UTF-8") == "ok")
  }

  test("Spark read path: explode + gz twin, torn/garbage blobs yield no rows") {
    val spark = graft.operators.SharedSpark.session
    import spark.implicits._
    val good = Tar.buildGz(Seq(("d.txt", "hello tar".getBytes("UTF-8"))))
    val rows = Seq((1L, good), (2L, "garbage".getBytes("US-ASCII")),
      (3L, tar(("t.txt", "x")).take(400)))
      .toDF("id", "payload")
    val got = Tar.read(rows, "payload")
      .select($"id", $"name", $"content".cast("string").as("c"))
      .as[(Long, String, String)].collect().toSet
    assert(got == Set((1L, "d.txt", "hello tar")), s"$got")
  }
}
