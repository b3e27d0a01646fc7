package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class HttpBodySpec extends AnyFunSuite {

  private def ascii(s: String) = s.getBytes("US-ASCII")

  test("dechunk: sizes, extensions, terminator, trailers ignored") {
    val s = "5\r\nhello\r\n6;ext=1\r\n world\r\n0\r\nTrailer: x\r\n\r\n"
    val (bytes, n, term) = Warc.dechunk(ascii(s), 0)
    assert(new String(bytes, "US-ASCII") == "hello world")
    assert(n == 2 && term)
    // hex sizes incl. uppercase
    val (b2, n2, t2) = Warc.dechunk(ascii("A\r\n0123456789\r\n0\r\n\r\n"), 0)
    assert(new String(b2, "US-ASCII") == "0123456789" && n2 == 1 && t2)
  }

  test("dechunk: torn streams keep complete chunks, flag unterminated") {
    // half a chunk: size declared, data short
    val (b, n, term) = Warc.dechunk(ascii("5\r\nhello\r\n8\r\nwor"), 0)
    assert(new String(b, "US-ASCII") == "hello" && n == 1 && !term)
    // torn inside the size line
    val (b2, n2, t2) = Warc.dechunk(ascii("5\r\nhello\r\n1"), 0)
    assert(new String(b2, "US-ASCII") == "hello" && n2 == 1 && !t2)
    // missing chunk-data CRLF is malformed: stop before it
    val (b3, _, t3) = Warc.dechunk(ascii("5\r\nhelloXX0\r\n\r\n"), 0)
    assert(new String(b3, "US-ASCII") == "" && !t3)
    // empty input
    val (b4, n4, t4) = Warc.dechunk(Array.emptyByteArray, 0)
    assert(b4.isEmpty && n4 == 0 && !t4)
  }

  test("dechunk: hostile sizes bounded, never throw") {
    // 9 hex digits = past the 8-digit bound
    val (_, n, term) = Warc.dechunk(ascii("fffffffff\r\nx\r\n0\r\n\r\n"), 0)
    assert(n == 0 && !term)
    // huge declared size vs tiny data
    val (_, n2, t2) = Warc.dechunk(ascii("ffffffff\r\nhi"), 0)
    assert(n2 == 0 && !t2)
  }

  test("gunzipEntity: round-trip, rot refused, bomb capped") {
    val raw = "the quick brown fox".getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(raw); g.close()
    val gz = bos.toByteArray
    assert(java.util.Arrays.equals(Warc.gunzipEntity(gz), raw))
    val rot = gz.clone()
    rot(gz.length / 2) = (rot(gz.length / 2) ^ 0x55).toByte
    assert(Warc.gunzipEntity(rot) == null)
    assert(Warc.gunzipEntity(gz.take(gz.length - 4)) == null) // torn
    assert(Warc.gunzipEntity("junk".getBytes("US-ASCII")) == null)
    assert(Warc.gunzipEntity(null) == null)
  }

  test("Spark path: the four routes and both plants decode as declared") {
    val spark = graft.operators.SharedSpark.session
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val text205 = (1 to 41).map(_ => "abcd").mkString(" ") // 204 chars
    val rows = Seq(
      (0L, "garbage"), (4L, "plain route"), (1L, text205), (2L, "gzip route"),
      (3L, "both routes"), (5L, text205), (11L, "rotted gzip"),
      (15L, text205)) // 15%4==3: gzip+chunked, no plants
      .toDF("doc_id", "text")
    val blobs = Warc.synthesizeWarcHttpEncodedPayloads(rows, "doc_id", "text")
    val got = Warc.httpBody(
        Warc.records(blobs, "payload")
          .where(col("warc_type") === "response").drop("content_type"),
        "payload")
      .select(col("doc_id"), col("was_chunked"), col("was_gzip"),
        col("n_chunks"), col("truncated"), col("body").cast("string"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        Option(r.get(3)), r.getBoolean(4), Option(r.getString(5))))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, true, false, Some(3), false, Some(text205)),   // 3 chunks of 100 chars
      (2L, false, true, None, false, Some("gzip route")),
      (3L, true, true, Some(4), false, Some("both routes")),
      (4L, false, false, None, false, Some("plain route")),
      (5L, true, false, Some(2), true, Some(text205.substring(0, 200))), // torn
      (11L, true, true, Some(4), true, None),              // gzip rot: refused
      (15L, true, true, Some(4), false, Some(text205))))
  }
}
