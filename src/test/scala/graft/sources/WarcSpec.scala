package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** WARC record-walk against hand-assembled bytes per ISO 28500: the
  * complete-records-only contract, torn members, hostile lengths, both
  * WARC versions, and the Spark explode + binaryFile read path. Byte
  * tests need no Spark session; the read path uses the shared one. */
class WarcSpec extends AnyFunSuite {

  private def member(recs: (String, String, String)*): Array[Byte] =
    Warc.buildMember(recs.map { case (t, u, p) => (t, u, p.getBytes("UTF-8")) })

  test("complete members parse every record with typed fields") {
    val b = member(
      ("response", "https://a.io/x", "hello world"),
      ("metadata", "https://a.io/x", "fetch=1"))
    val got = Warc.parse(b)
    assert(got.size == 2, s"$got")
    assert(got(0).warcType == "response" && got(0).targetUri == "https://a.io/x")
    assert(got(0).contentLength == 11L &&
      new String(got(0).payload, "UTF-8") == "hello world")
    assert(got(1).warcType == "metadata" && got(1).contentLength == 7L)
  }

  test("WARC/1.1 parses; unknown versions stop the walk") {
    val v11 = member(("response", "u", "abc"))
    val patched = ("WARC/1.1" + new String(v11, "US-ASCII").substring(8)).getBytes("US-ASCII")
    assert(Warc.parse(patched).size == 1)
    val v09 = ("WARC/0.9" + new String(v11, "US-ASCII").substring(8)).getBytes("US-ASCII")
    assert(Warc.parse(v09).isEmpty)
  }

  test("torn members keep exactly the records that fully arrived") {
    val b = member(("response", "u1", "payload one"), ("metadata", "u1", "tail"))
    // every truncation point parses without throwing; count is monotone
    var prev = 0
    for (cut <- 0 to b.length) {
      val k = Warc.parse(b.take(cut)).size
      assert(k >= prev && k <= 2, s"cut=$cut k=$k")
      prev = math.max(prev, k)
    }
    // a cut inside record 2's payload keeps record 1 only
    val torn = Warc.parse(b.take(b.length - 5))
    assert(torn.size == 1 && torn.head.targetUri == "u1", s"$torn")
    // the full member reads both
    assert(Warc.parse(b).size == 2)
  }

  test("hostile inputs never throw and never hang") {
    // declared length far past the buffer
    val big = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 99999999999999\r\n\r\nxx").getBytes("US-ASCII")
    assert(Warc.parse(big).isEmpty)
    // negative / non-numeric lengths
    val neg = ("WARC/1.0\r\nContent-Length: -7\r\n\r\n\r\n\r\n").getBytes("US-ASCII")
    assert(Warc.parse(neg).isEmpty)
    val nan = ("WARC/1.0\r\nContent-Length: lots\r\n\r\n\r\n\r\n").getBytes("US-ASCII")
    assert(Warc.parse(nan).isEmpty)
    // header line without a colon stops cleanly
    val bad = ("WARC/1.0\r\nnocolonhere\r\n\r\n").getBytes("US-ASCII")
    assert(Warc.parse(bad).isEmpty)
    // missing trailing CRLF CRLF = incomplete, not a record
    val m = member(("response", "u", "abc"))
    assert(Warc.parse(m.dropRight(1)).isEmpty)
    // garbage / null / empty
    assert(Warc.parse("not a warc at all...".getBytes).isEmpty)
    assert(Warc.parse(null).isEmpty)
    assert(Warc.parse(Array.emptyByteArray).isEmpty)
  }

  test("gzip members: per-record .warc.gz concatenation inflates and parses") {
    val recs = Seq(
      ("response", "https://a.io/g1", "gz doc one".getBytes("UTF-8")),
      ("metadata", "https://a.io/g1", "fetch=g".getBytes("UTF-8")))
    val gz = Warc.buildMemberGz(recs)
    assert((gz(0) & 0xff) == 0x1f && (gz(1) & 0xff) == 0x8b)
    val got = Warc.parse(gz)
    assert(got.size == 2 && got(0).warcType == "response" &&
      new String(got(0).payload, "UTF-8") == "gz doc one" &&
      got(1).warcType == "metadata", s"$got")
    // plain and gzip forms of the same records parse identically
    val plain = Warc.parse(Warc.buildMember(recs))
    assert(got.map(r => (r.warcType, r.targetUri, r.contentLength)) ==
      plain.map(r => (r.warcType, r.targetUri, r.contentLength)))
    // torn gzip (cut mid-member) never throws; unknown is never partial
    for (cut <- 1 until gz.length by 13) Warc.parse(gz.take(cut))
    // gzip magic but corrupt body → no records
    val corrupt = gz.clone(); corrupt(10) = 0x55
    Warc.parse(corrupt) // must not throw
  }

  test("STREAMING walk: total inflated size far past the per-record cap parses everything") {
    // the r15 finding: the whole-member inflate cap silently dropped
    // valid members whose TOTAL inflated size crossed it (real Common
    // Crawl members are ~1 GB gzip → several GB inflated). The walk now
    // streams gzip members and applies the cap per RECORD: 40 records
    // × 2000 bytes = 80 kB inflated against a 4 kB cap — every record
    // parses, zero drops.
    val recs = (1 to 40).map(i =>
      ("response", s"https://a.io/s$i", ("x" * 2000).getBytes("UTF-8")))
    val gz = Warc.buildMemberGz(recs)
    val (got, dropped) = Warc.parseWithStats(gz, maxRecordBytes = 4096)
    assert(got.size == 40 && dropped == 0L, s"n=${got.size} dropped=$dropped")
    assert(got.map(_.targetUri) == (1 to 40).map(i => s"https://a.io/s$i"))
    assert(got.forall(_.contentLength == 2000L))
  }

  test("a declared-oversize record is skipped AND counted; the walk continues behind it") {
    val recs = Seq(
      ("response", "keep1", ("a" * 100).getBytes("UTF-8")),
      ("response", "big", ("b" * 5000).getBytes("UTF-8")),
      ("response", "keep2", ("c" * 100).getBytes("UTF-8")))
    for (bytes <- Seq(Warc.buildMember(recs), Warc.buildMemberGz(recs))) {
      val (got, dropped) = Warc.parseWithStats(bytes, maxRecordBytes = 1024)
      assert(got.map(_.targetUri) == Seq("keep1", "keep2"), s"$got")
      assert(dropped == 1L, s"dropped=$dropped")
    }
    // a tear INSIDE the skipped span still counts the declared record
    // (it was declared complete — mid-skip loss is never silent)
    val two = Warc.buildMember(recs.take(2))
    val torn = two.take(two.length - 50)
    val (kept, droppedTorn) = Warc.parseWithStats(torn, maxRecordBytes = 1024)
    assert(kept.map(_.targetUri) == Seq("keep1") && droppedTorn == 1L,
      s"$kept $droppedTorn")
  }

  test("gzip tail loss keeps the records that fully inflated (no all-or-nothing)") {
    val recs = Seq(
      ("response", "u1", "one".getBytes("UTF-8")),
      ("response", "u2", "two".getBytes("UTF-8")))
    val gz = Warc.buildMemberGz(recs)
    // trailing garbage after the valid members: both records kept
    val trailing = gz ++ "garbage tail, not gzip".getBytes("US-ASCII")
    assert(Warc.parseWithStats(trailing)._1.map(_.targetUri) == Seq("u1", "u2"))
    // tear inside the SECOND gzip member: the first member's record
    // survives (the old whole-blob inflate dropped everything here)
    val m2 = {
      var i = 2
      while (!((gz(i) & 0xff) == 0x1f && (gz(i + 1) & 0xff) == 0x8b &&
        (gz(i + 2) & 0xff) == 0x08)) i += 1
      i
    }
    for (cut <- Seq(m2 + 8, m2 + 14)) {
      val (got, dropped) = Warc.parseWithStats(gz.take(cut))
      assert(got.map(_.targetUri) == Seq("u1") && dropped == 0L,
        s"cut=$cut $got $dropped")
    }
  }

  test("warc_scan accounting agrees with the record walk (Spark path)") {
    val spark = graft.operators.SharedSpark.session
    import spark.implicits._
    val blobs = Seq(
      (1L, member(("response", "u1", "ok"), ("metadata", "u1", "m"))),
      (2L, Warc.buildMember(Seq(("response", "u2", ("z" * 2000).getBytes("UTF-8"))))),
      (3L, "not a warc".getBytes("US-ASCII")))
      .toDF("id", "payload")
    val got = Warc.scanStats(blobs, "payload", maxRecordBytes = 1024)
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 0L, 3L), (2L, 0L, 1L, 0L), (3L, 0L, 0L, 0L)), s"$got")
  }

  test("HTTP split: status, content-type, body; non-HTTP payloads read null") {
    val spark = graft.operators.SharedSpark.session
    import spark.implicits._
    val ok = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
      "Content-Length: 5\r\n\r\n<p>x<").getBytes("US-ASCII")
    val notFound = "HTTP/1.0 404 X\r\n\r\nmissing".getBytes("US-ASCII")
    val junk = "%PDF-1.4 not http".getBytes("US-ASCII")
    val torn = "HTTP/1.1 200 OK\r\nContent-Type: text".getBytes("US-ASCII")
    val rows = Seq((1L, ok), (2L, notFound), (3L, junk), (4L, torn))
      .toDF("id", "payload")
    val got = Warc.httpSplit(rows, "payload")
      .select($"id", $"status", $"content_type",
        $"body".cast("string").as("b"))
      .as[(Long, Option[Int], Option[String], Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, Some(200), Some("text/html; charset=utf-8"), Some("<p>x<")),
      (2L, Some(404), None, Some("missing")),
      (3L, None, None, None),
      (4L, None, None, None)), s"$got")
  }

  test("explode + binaryFile read round-trip the builder's records") {
    val spark = graft.operators.SharedSpark.session
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warcspec").toFile
    try {
      val b1 = member(("response", "https://a.io/1", "doc one"),
        ("metadata", "https://a.io/1", "fetch=1"))
      val b2 = member(("response", "https://a.io/2", "doc two"))
      java.nio.file.Files.write(new java.io.File(dir, "m1.warc").toPath, b1)
      java.nio.file.Files.write(new java.io.File(dir, "m2.warc").toPath, b2)
      val got = Warc.read(spark, dir.getAbsolutePath)
        .select($"warc_type", $"target_uri",
          $"payload".cast("string").as("t"))
        .as[(String, String, String)].collect().toSet
      assert(got == Set(
        ("response", "https://a.io/1", "doc one"),
        ("metadata", "https://a.io/1", "fetch=1"),
        ("response", "https://a.io/2", "doc two")), s"$got")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
