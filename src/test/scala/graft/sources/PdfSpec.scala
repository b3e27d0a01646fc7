package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class PdfSpec extends AnyFunSuite {

  private val sample =
    "PDF extraction test line one\nsecond line with (parens) and \\ backslash\n\nfourth after an empty line"

  test("round-trip: plain and FlateDecode content streams") {
    for (defl <- Seq(false, true)) {
      val b = Pdf.build(sample, deflatePages = defl)
      val d = Pdf.parse(b)
      assert(d != null)
      assert(d.text == sample, s"deflate=$defl")
      assert(d.nPages == 1 && d.nStreams == 1 && !d.encrypted)
      assert(d.nObjects == 5) // catalog, pages, font, page, content
    }
  }

  test("multi-page: 12 lines per page, page order from the Kids tree") {
    val text = (1 to 30).map(i => s"line $i").mkString("\n")
    val b = Pdf.build(text, deflatePages = true)
    val d = Pdf.parse(b)
    assert(d.nPages == 3 && d.nStreams == 3)
    assert(d.text == text)
    assert(d.nObjects == 3 + 6)
  }

  test("unicode and escapes survive the literal-string round trip") {
    val text = "café 中文 😀\ntabs\tand (nested (parens)) \\\\ends\\"
    val d = Pdf.parse(Pdf.build(text, deflatePages = false))
    assert(d.text == text)
    val d2 = Pdf.parse(Pdf.build(text, deflatePages = true))
    assert(d2.text == text)
  }

  test("empty text is one empty line, not null") {
    val d = Pdf.parse(Pdf.build("", deflatePages = false))
    assert(d.nPages == 1 && d.text == "")
  }

  test("hex strings, octal escapes, continuations, and raw EOLs decode per spec") {
    // hand-built content stream exercising string forms the builder never emits
    val content = "BT\n72 720 Td\n<48656c6c6F> Tj\n0 -14 Td\n" +
      "(\\110\\151\\41) Tj\n0 -14 Td\n(a\\\nb) Tj\n0 -14 Td\n(r\raw) Tj\nET"
    val body =
      s"""%PDF-1.4
1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj
4 0 obj << /Length ${content.length} >>
stream
$content
endstream endobj
trailer << /Size 5 /Root 1 0 R >>
%%EOF
"""
    val d = Pdf.parse(body.getBytes("ISO-8859-1"))
    // \110\151\41 = Hi!; a\<newline>b = line continuation; r\raw: raw CR → \n
    assert(d.text == "Hello\nHi!\nab\nr\naw", s"got: ${d.text}")
  }

  test("TJ arrays, quote ops, and T* line semantics") {
    val content = "BT\n[(ab) -120 (cd)] TJ\n(ef) '\nT*\n(gh) Tj\nET"
    val pdf =
      s"""%PDF-1.4
1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj
4 0 obj << /Length ${content.length} >>
stream
$content
endstream endobj
trailer << /Size 5 /Root 1 0 R >>
%%EOF
"""
    val d = Pdf.parse(pdf.getBytes("ISO-8859-1"))
    assert(d.text == "abcd\nef\ngh", s"got: ${d.text}")
  }

  test("truncation sweep: never throws, text is a page-prefix, counts monotone-safe") {
    val text = (1 to 24).map(i => s"truncation line number $i").mkString("\n")
    val full = Pdf.build(text, deflatePages = true)
    val fullText = Pdf.parse(full).text
    assert(fullText == text)
    var step = 0
    while (step < full.length) {
      val d = Pdf.parse(full.take(step))
      if (d != null && d.text != null) {
        // complete-objects contract: whatever survives is a prefix of
        // the document at PAGE granularity (pages are 12-line groups)
        assert(text.startsWith(d.text), s"step=$step")
        val n = d.text.split("\n", -1).length
        assert(n % 12 == 0 || n == 24, s"step=$step lines=$n")
      }
      step += 7
    }
  }

  test("garbage and non-PDF bytes parse to null, never throw") {
    assert(Pdf.parse(null) == null)
    assert(Pdf.parse(Array.emptyByteArray) == null)
    assert(Pdf.parse("not a pdf at all".getBytes("US-ASCII")) == null)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest("x".getBytes("US-ASCII"))
    assert(Pdf.parse(md5 ++ md5 ++ md5) == null)
  }

  test("encrypted: structure legible, text withheld") {
    val b = Pdf.build(sample, deflatePages = false, encrypted = true)
    val d = Pdf.parse(b)
    assert(d.encrypted)
    assert(d.text == null)
    assert(d.nPages == 1)
    assert(d.nObjects == 6) // + the /Encrypt stub
  }

  test("hostile /Length degrades to the endstream recovery scan") {
    val content = "BT\n72 720 Td\n(still here) Tj\nET"
    def pdf(len: String) =
      s"""%PDF-1.4
1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj
4 0 obj << /Length $len >>
stream
$content
endstream endobj
trailer << /Size 5 /Root 1 0 R >>
%%EOF
""".getBytes("ISO-8859-1")
    // overshooting, lying-short, and indirect lengths all recover
    assert(Pdf.parse(pdf("999999")).text == "still here")
    assert(Pdf.parse(pdf("7 0 R")).text == "still here")
    // a length that lies SHORT truncates mid-operator — recovery keeps
    // whatever tokenizes; here the short span must not fabricate text
    val shortD = Pdf.parse(pdf("3"))
    assert(shortD == null || shortD.text == null || shortD.text.isEmpty ||
      "still here".startsWith(shortD.text.stripSuffix("\n")))
  }

  test("broken deflate stream yields a structural row with null text") {
    val good = Pdf.build("some deflated text", deflatePages = true)
    // bit-rot inside the one content stream's zlib bytes
    val s = {
      var i = 0
      var at = -1
      while (at < 0 && i < good.length - 7) {
        if (good(i) == 's' && new String(good, i, 7, "ISO-8859-1") == "stream\n") at = i
        i += 1
      }
      at + 10
    }
    val rot = good.clone()
    rot(s) = (rot(s) ^ 0x55).toByte
    rot(s + 1) = (rot(s + 1) ^ 0x55).toByte
    val d = Pdf.parse(rot)
    assert(d != null && d.nPages == 1)
    assert(d.text == null)
  }

  test("duplicate object numbers: the appended update wins") {
    val content = "BT\n(old) Tj\nET"
    val content2 = "BT\n(new) Tj\nET"
    val pdf =
      s"""%PDF-1.4
1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj
4 0 obj << /Length ${content.length} >>
stream
$content
endstream endobj
4 0 obj << /Length ${content2.length} >>
stream
$content2
endstream endobj
trailer << /Size 5 /Root 1 0 R >>
%%EOF
"""
    val d = Pdf.parse(pdf.getBytes("ISO-8859-1"))
    assert(d.text == "new")
    assert(d.nObjects == 4)
  }

  test("per-stream inflate cap: a zlib bomb reads null text, structure stands") {
    // ~300 MB of zeros deflates to ~300 KB — past the 128 MB cap
    val bomb = {
      val d = new java.util.zip.Deflater(6)
      d.setInput(new Array[Byte](1 << 20))
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](65536)
      var rounds = 0
      while (rounds < 300) { // feed 300 MB total
        while (!d.needsInput()) bos.write(buf, 0, d.deflate(buf))
        if (rounds < 299) d.setInput(new Array[Byte](1 << 20)) else d.finish()
        rounds += 1
      }
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end()
      bos.toByteArray
    }
    val pdf = new java.io.ByteArrayOutputStream()
    def w(x: String): Unit = pdf.write(x.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${bomb.length} /Filter /FlateDecode >>\nstream\n")
    pdf.write(bomb)
    w("\nendstream endobj\ntrailer << /Size 5 /Root 1 0 R >>\n%%EOF\n")
    val d = Pdf.parse(pdf.toByteArray)
    assert(d != null && d.nPages == 1 && d.nStreams == 1)
    assert(d.text == null)
  }

  test("info dictionary: UTF-16/Latin-1/hex strings, torn loses it, encrypted withholds") {
    val info = Seq(("Title", "Tïtle 中", true), ("Author", "Aüthor", false),
      ("Producer", "graft 1.0", false), ("CreationDate", "D:20260101", false))
    val b = Pdf.build("body text", deflatePages = false, info = info)
    val d = Pdf.parse(b)
    assert(d.title == "Tïtle 中" && d.author == "Aüthor")
    assert(d.producer == "graft 1.0" && d.created == "D:20260101")
    // hex-string form
    val hexTitle = "FEFF" + "Hi!".getBytes("UTF-16BE").map("%02X".format(_)).mkString
    val pdf =
      s"""%PDF-1.4
1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
3 0 obj << /Type /Page /Parent 2 0 R >> endobj
4 0 obj << /Title <$hexTitle> >> endobj
trailer << /Size 5 /Root 1 0 R /Info 4 0 R >>
%%EOF
"""
    assert(Pdf.parse(pdf.getBytes("ISO-8859-1")).title == "Hi!")
    // torn: the info object rides LAST, the cut in the first content
    // stream loses it (metadata goes first on a torn download)
    val cut = {
      var i = 0; var at = -1
      while (at < 0 && i < b.length - 7) {
        if (b(i) == 's' && new String(b, i, 7, "ISO-8859-1") == "stream\n") at = i
        i += 1
      }
      at + 17
    }
    val torn = Pdf.parse(b.take(cut))
    assert(torn.title == null && torn.producer == null && torn.nPages == 1)
    // encrypted: structure stands, strings withheld
    val enc = Pdf.parse(Pdf.build("x", deflatePages = false,
      encrypted = true, info = info))
    assert(enc.encrypted && enc.title == null && enc.created == null)
  }

  test("object streams: embedded page tree round-trips, direct wins collisions") {
    val text = (1 to 30).map(i => s"objstm line $i").mkString("\n")
    for (defl <- Seq(false, true)) {
      val b = Pdf.buildObjStm(text, deflatePages = defl)
      val d = Pdf.parse(b)
      assert(d.text == text, s"deflate=$defl")
      assert(d.nPages == 3 && d.nObjects == 10 && d.nStreams == 4)
    }
    // a direct object with the same number as an embedded one wins:
    // append a direct update for page-dict 5 pointing at a new stream
    val base = Pdf.buildObjStm("one page only", deflatePages = false)
    val newContent = "BT\n(updated) Tj\nET"
    val patch = (s"9 0 obj << /Length ${newContent.length} >>\nstream\n" +
      newContent + "\nendstream endobj\n" +
      "5 0 obj << /Type /Page /Parent 3 0 R /Contents 9 0 R >> endobj\n")
      .getBytes("ISO-8859-1")
    // splice the update before the trailer
    val at = {
      var i = 0; var t = -1
      while (t < 0 && i < base.length - 7) {
        if (base(i) == 't' && new String(base, i, 7, "ISO-8859-1") == "trailer") t = i
        i += 1
      }
      t
    }
    val updated = base.take(at) ++ patch ++ base.drop(at)
    assert(Pdf.parse(updated).text == "updated")
    // hostile N / offsets: bounded, never a throw
    val hostile = ("%PDF-1.5\n1 0 obj << /Type /ObjStm /N 99999999 /First 4 " +
      "/Length 8 /Filter /FlateDecode >>\nstream\nXXXXXXXX\nendstream endobj\n" +
      "trailer << /Size 2 /Root 2 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    val hd = Pdf.parse(hostile)
    assert(hd != null && hd.nPages == 0 && hd.text == null)
  }

  test("object streams: torn inside the container loses the whole page tree") {
    val full = Pdf.buildObjStm("torn\nobjstm\ndoc", deflatePages = true)
    var step = 0
    while (step < full.length) {
      val d = Pdf.parse(full.take(step))
      if (d != null && d.text != null)
        assert("torn\nobjstm\ndoc".startsWith(d.text), s"step=$step")
      step += 7
    }
    val cut = {
      var i = 0; var at = -1
      while (at < 0 && i < full.length - 7) {
        if (full(i) == 's' && new String(full, i, 7, "ISO-8859-1") == "stream\n") at = i
        i += 1
      }
      at + 17
    }
    val torn = Pdf.parse(full.take(cut))
    assert(torn.nPages == 0 && torn.text == null && torn.nObjects == 0)
  }

  test("Spark read path: plants fall out exactly as declared") {
    val spark = graft.operators.SharedSpark.session
    import spark.implicits._
    val rows = Seq(
      (0L, "garbage doc"), (2L, "two\nlines"), (5L, "torn doc\nbody"),
      (17L, "secret text"), (36L, (1 to 13).map(i => s"l$i").mkString("\n")))
      .toDF("doc_id", "text")
    val blobs = Pdf.synthesizePdfPayloads(rows, "doc_id", "text")
    val got = Pdf.read(blobs, "payload")
      .select("doc_id", "n_pages", "encrypted", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2),
        Option(r.getString(3)))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (2L, 1, false, Some("two\nlines")),
      (5L, 1, false, None),          // torn: page 1 dict survives, content lost
      (17L, 1, true, None),          // encrypted: structure only
      (36L, 2, false, Some((1 to 13).map(i => s"l$i").mkString("\n")))))
  }
}
