package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class HttpTextSpec extends AnyFunSuite {

  test("charset ladder: header beats BOM beats meta beats default") {
    def r(ct: String, body: Array[Byte]) = Warc.resolveCharset(ct, body)
    assert(r("text/html; charset=UTF-8", "x".getBytes("US-ASCII"))
      == ("utf-8", "header", 0))
    assert(r("text/html; charset=\"Windows-1252\"", Array[Byte](1))
      == ("windows-1252", "header", 0))
    // header wins over a BOM
    val bomBody = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte, 'a')
    assert(r("text/html; charset=windows-1252", bomBody)._2 == "header")
    // BOM wins over meta
    val bomMeta = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      "<meta charset=windows-1252>".getBytes("US-ASCII")
    assert(r("text/html", bomMeta) == ("utf-8", "bom", 3))
    assert(r(null, Array[Byte](0xfe.toByte, 0xff.toByte, 0, 'a'))
      == ("utf-16be", "bom", 2))
    assert(r(null, Array[Byte](0xff.toByte, 0xfe.toByte, 'a', 0))
      == ("utf-16le", "bom", 2))
    // meta forms
    assert(r("text/html", "<META CHARSET='utf-8'>".getBytes("US-ASCII"))
      == ("utf-8", "meta", 0))
    assert(r("text/html",
      ("<meta http-equiv=\"Content-Type\" " +
        "content=\"text/html; charset=utf-8\">").getBytes("US-ASCII"))
      == ("utf-8", "meta", 0))
    // nothing declared: the HTML5 legacy default
    assert(r("text/html", "plain".getBytes("US-ASCII"))
      == ("windows-1252", "default", 0))
    assert(r(null, null) == ("windows-1252", "default", 0))
  }

  test("alias rule: iso-8859-1 labels decode as cp1252, so 0x80 is €") {
    val (cs, src, _) = Warc.resolveCharset("text/html; charset=iso-8859-1",
      Array[Byte](0x80.toByte))
    assert(cs == "windows-1252" && src == "header")
    assert(new String(Array[Byte](0x80.toByte), Warc.javaCharset(cs)) == "€")
    // same for latin1 / us-ascii labels
    assert(Warc.resolveCharset("x; charset=latin1", null)._1 == "windows-1252")
    assert(Warc.resolveCharset("x; charset=US-ASCII", null)._1 == "windows-1252")
  }

  test("unknown labels fall through the ladder") {
    // unknown header label → meta rung
    assert(Warc.resolveCharset("text/html; charset=klingon",
      "<meta charset=utf-8>".getBytes("US-ASCII")) == ("utf-8", "meta", 0))
    // unknown everywhere → default
    assert(Warc.resolveCharset("text/html; charset=klingon",
      "<meta charset=vulcan>".getBytes("US-ASCII"))._2 == "default")
  }

  test("Spark path: the six routes decode to their exact strings") {
    val spark = graft.operators.SharedSpark.session
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = (0L to 6L).toDF("doc_id")
    val blobs = Warc.synthesizeWarcHttpCharsetPayloads(docs, "doc_id")
    val got = Warc.httpText(
        Warc.records(blobs, "payload")
          .where(col("warc_type") === "response").drop("content_type"),
        "payload")
      .select("doc_id", "charset", "charset_source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "windows-1252", "header", "Café œuvre €99 – dash 1"),
      (2L, "windows-1252", "header", "Alias € äöü 2"),
      (3L, "utf-8", "meta", "<meta charset=\"utf-8\"><p>Mütze δ 3</p>"),
      (4L, "windows-1252", "default", "Plain fallback ± 4"),
      (5L, "utf-8", "bom", "Bom ✓ 5"),
      (6L, "utf-8", "header", "Café № δοκιμή 😀 6")))
  }
}
