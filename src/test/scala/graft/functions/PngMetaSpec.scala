package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import MediaFormats.{buildPngChunk, pngInsertChunks, probePngMeta}

class PngMetaSpec extends AnyFunSuite {

  private def latin(s: String) = s.getBytes("ISO-8859-1")

  private def deflateBytes(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6)
    d.setInput(raw); d.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    bos.toByteArray
  }

  // a minimal REAL png via ImageIO
  private def basePng(w: Int = 5, h: Int = 3): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("all three text forms round-trip; IHDR dims on the same pass") {
    val png = pngInsertChunks(basePng(7, 4), Seq(
      buildPngChunk("tEXt", latin("Title") ++ Array[Byte](0) ++ latin("T1")),
      buildPngChunk("zTXt", latin("Description") ++ Array[Byte](0, 0) ++
        deflateBytes(latin("D says ü"))),
      buildPngChunk("iTXt", latin("Author") ++ Array[Byte](0, 0, 0) ++
        Array[Byte](0) ++ Array[Byte](0) ++ "Aüthor 中".getBytes("UTF-8")),
      buildPngChunk("iTXt", latin("Software") ++ Array[Byte](0, 1, 0) ++
        Array[Byte](0) ++ Array[Byte](0) ++
        deflateBytes("compressed sw".getBytes("UTF-8")))))
    val m = probePngMeta(png)
    assert(m.hasPng && m.width == 7 && m.height == 4)
    assert(m.title == "T1" && m.description == "D says ü")
    assert(m.author == "Aüthor 中" && m.software == "compressed sw")
    assert(m.nTextChunks == 4 && m.nBadCrc == 0)
  }

  test("bit-rot isolates one chunk: CRC catches it, neighbors keep") {
    val title = buildPngChunk("tEXt", latin("Title") ++ Array[Byte](0) ++ latin("gone"))
    val author = buildPngChunk("tEXt", latin("Author") ++ Array[Byte](0) ++ latin("kept"))
    val rot = title.clone()
    rot(9) = (rot(9) ^ 0x55).toByte
    val m = probePngMeta(pngInsertChunks(basePng(), Seq(rot, author)))
    assert(m.title == null && m.author == "kept")
    assert(m.nBadCrc == 1 && m.nTextChunks == 1)
  }

  test("truncation sweep: never throws, complete chunks only") {
    val full = pngInsertChunks(basePng(), Seq(
      buildPngChunk("tEXt", latin("Title") ++ Array[Byte](0) ++ latin("X"))))
    var step = 0
    while (step <= full.length) {
      val m = probePngMeta(java.util.Arrays.copyOfRange(full, 0, step))
      if (m.hasPng) assert(m.nBadCrc == 0)
      step += 3
    }
    assert(probePngMeta(full).title == "X")
  }

  test("broken deflate and malformed chunks drop from the text count, never garbage") {
    val badZ = buildPngChunk("zTXt", latin("Description") ++ Array[Byte](0, 0) ++
      Array[Byte](1, 2, 3, 4)) // not a zlib stream
    val noTerm = buildPngChunk("tEXt", latin("NoTerminator"))
    val badMethod = buildPngChunk("zTXt", latin("D2") ++ Array[Byte](0, 9) ++
      deflateBytes(latin("x"))) // method 9 unsupported
    val ok = buildPngChunk("tEXt", latin("Title") ++ Array[Byte](0) ++ latin("ok"))
    val m = probePngMeta(pngInsertChunks(basePng(), Seq(badZ, noTerm, badMethod, ok)))
    assert(m.title == "ok" && m.description == null)
    assert(m.nTextChunks == 1 && m.nBadCrc == 0)
  }

  test("non-PNG bytes read has_png false, all null") {
    val m = probePngMeta("not a png".getBytes("US-ASCII"))
    assert(!m.hasPng && m.width == null && m.nTextChunks == null)
    assert(probePngMeta(null).hasPng == false)
    assert(probePngMeta(Array.emptyByteArray).hasPng == false)
  }

  test("Spark path: plants fall out exactly as declared") {
    val spark = graft.operators.SharedSpark.session
    import spark.implicits._
    val docs = Seq(0L, 2L, 3L, 5L, 6L).toDF("doc_id")
    val media = graft.pipeline.Multimodal.synthesizePngMetaPayloads(docs, "doc_id")
    val got = graft.pipeline.Multimodal.probePngMeta(media, "payload")
      .select("doc_id", "has_png", "width", "title", "author",
        "description", "software", "n_text_chunks", "n_bad_crc")
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        Option(r.get(2)), Option(r.getString(3)), Option(r.getString(4)),
        Option(r.getString(5)), Option(r.getString(6)),
        Option(r.get(7)), Option(r.get(8)))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, false, None, None, None, None, None, None, None),
      (2L, true, Some(18), Some("Image 2"), None, Some("Desc 2"), None,
        Some(2), Some(0)),
      (3L, true, Some(19), Some("Image 3"), Some("Author 3"), None,
        Some("graft 3"), Some(3), Some(0)),
      (5L, true, Some(21), None, Some("Author 5"), None, None,
        Some(1), Some(1)), // Title bit-rot: CRC counted, neighbors keep
      (6L, true, Some(22), Some("Image 6"), None, Some("Desc 1"),
        Some("graft 6"), Some(3), Some(0))))
  }
}
