package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class HeifSpec extends AnyFunSuite {

  private def be32a(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def bx(tp: String, p: Array[Byte]): Array[Byte] =
    be32a(8L + p.length) ++ tp.getBytes("US-ASCII") ++ p
  private def ascii(s: String) = s.getBytes("US-ASCII")

  private def heif(brand: String, ispes: Seq[(Int, Int)]): Array[Byte] = {
    val ftyp = bx("ftyp", ascii(brand) ++ be32a(0) ++ ascii(brand))
    val props = ispes.map { case (w, h) =>
      bx("ispe", be32a(0) ++ be32a(w) ++ be32a(h)) }
      .foldLeft(Array.emptyByteArray)(_ ++ _)
    ftyp ++ bx("meta", be32a(0) ++ bx("iprp", bx("ipco", props)))
  }

  test("brand routing and ispe dims, largest-area wins over thumbnails") {
    val a = MediaFormats.probe(heif("avif", Seq((320, 240))))
    assert(a.format == "avif" && a.width == 320 && a.height == 240)
    val h = MediaFormats.probe(heif("heic", Seq((8, 8), (1024, 768), (64, 64))))
    assert(h.format == "heic" && h.width == 1024 && h.height == 768)
    assert(MediaFormats.probe(heif("mif1", Seq((5, 7)))).format == "heif")
    // the movie path is untouched: a plain mp4 brand still routes there
    val mp4ish = bx("ftyp", ascii("isom") ++ be32a(0) ++ ascii("isom"))
    assert(MediaFormats.probe(mp4ish ++ bx("mdat", be32a(0))).format == "mp4")
  }

  test("fullbox offset: meta children start 4 bytes in") {
    // omit the version/flags word: iprp must NOT be found at offset 0
    val broken = bx("ftyp", ascii("avif") ++ be32a(0)) ++
      bx("meta", bx("iprp", bx("ipco",
        bx("ispe", be32a(0) ++ be32a(9) ++ be32a(9)))))
    val p = MediaFormats.probe(broken)
    assert(p.format == "avif" && p.width == null) // misaligned walk finds nothing
  }

  test("torn and hostile files keep the brand, dims null, never throw") {
    val full = heif("avif", Seq((100, 50)))
    var step = 12 // keep the dispatchable ftyp prefix
    while (step <= full.length) {
      val p = MediaFormats.probe(java.util.Arrays.copyOfRange(full, 0, step))
      assert(p.format == "avif")
      if (p.width != null) assert(p.width == 100 && p.height == 50)
      step += 3
    }
    // zero-dim ispe is hostile: skipped
    assert(MediaFormats.probe(heif("avif", Seq((0, 10)))).width == null)
  }

  test("Spark fixture path: plants fall out exactly as declared") {
    val spark = graft.operators.SharedSpark.session
    import spark.implicits._
    val docs = Seq(0L, 2L, 3L, 5L, 6L).toDF("doc_id")
    val media = graft.pipeline.Multimodal.synthesizeHeifPayloads(docs, "doc_id")
    val got = graft.pipeline.Multimodal.probeMeta(media, "payload")
      .select("doc_id", "format", "width", "height")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3)))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, "unknown", None, None),
      (2L, "avif", Some(66), Some(50)),
      (3L, "heic", Some(67), Some(51)),   // id%3==0: thumb present, primary wins
      (5L, "heic", None, None),           // torn ipco: brand keeps
      (6L, "avif", Some(70), Some(54))))  // id%3==0 thumb case on avif
  }
}
