package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Container-header parsing against REAL bytes: the canonical 1×1
  * transparent PNG that ships in half the web's tracking pixels, hand-
  * assembled JPEG/GIF/BMP/WAV headers per the specs, and the
  * corrupt-input contract (never throw, report unknown). Pure byte-level
  * unit tests — no Spark session needed. */
class MediaProbeSpec extends AnyFunSuite {

  test("the canonical 1x1 transparent PNG parses (real-world bytes)") {
    val b64 = "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
    val p = MediaFormats.probe(java.util.Base64.getDecoder.decode(b64))
    assert(p.format == "png" && p.width == 1 && p.height == 1, s"$p")
    assert(p.bits == 8 && p.channels == 4, s"bit depth 8, RGBA: $p")
  }

  test("JPEG: marker walk skips APP segments and reads the SOF0 frame header") {
    // FFD8 | APP0 len=16 "JFIF".. | SOF0 len=17: precision 8, h=480, w=640, 3 comp
    val bb = java.nio.ByteBuffer.allocate(2 + 2 + 2 + 16 + 2 + 2 + 6)
    bb.put(Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte))
    bb.putShort(18.toShort) // APP0 length (incl. itself)
    bb.put("JFIF".getBytes("US-ASCII")); bb.put(new Array[Byte](12))
    bb.put(Array(0xff, 0xc0).map(_.toByte))
    bb.putShort(17.toShort)
    bb.put(8.toByte)          // precision
    bb.putShort(480.toShort)  // height
    bb.putShort(640.toShort)  // width
    bb.put(3.toByte)          // components
    val p = MediaFormats.probe(bb.array())
    assert(p.format == "jpeg" && p.width == 640 && p.height == 480 &&
      p.channels == 3 && p.bits == 8, s"$p")
  }

  test("GIF and BMP: little-endian screen/bitmap dimensions") {
    val gif = java.nio.ByteBuffer.allocate(13).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    gif.put("GIF89a".getBytes("US-ASCII")); gif.putShort(320.toShort); gif.putShort(200.toShort)
    val g = MediaFormats.probe(gif.array())
    assert(g.format == "gif" && g.width == 320 && g.height == 200, s"$g")

    val bmp = java.nio.ByteBuffer.allocate(30).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bmp.put("BM".getBytes("US-ASCII")); bmp.position(14)
    bmp.putInt(40) // BITMAPINFOHEADER
    bmp.putInt(1024); bmp.putInt(-768) // top-down bitmap: negative height
    val b = MediaFormats.probe(bmp.array())
    assert(b.format == "bmp" && b.width == 1024 && b.height == 768,
      s"negative (top-down) height must report its magnitude: $b")
  }

  test("GIF with a zero logical-screen dimension is corrupt → unknown") {
    // same validation convention as PNG/BMP: non-positive dims reject
    for ((w, h) <- Seq((0, 200), (320, 0), (0, 0))) {
      val gif = java.nio.ByteBuffer.allocate(13).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      gif.put("GIF89a".getBytes("US-ASCII"))
      gif.putShort(w.toShort); gif.putShort(h.toShort)
      val g = MediaFormats.probe(gif.array())
      assert(g.format == "unknown", s"${w}x$h must be unknown: $g")
    }
  }

  test("WAV: fmt + data chunk walk yields channels, rate, and sample count") {
    // 44.1k stereo 16-bit, header-only (data chunk declared, payload absent)
    val bb = java.nio.ByteBuffer.allocate(48).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + 4 * 1000)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1.toShort); bb.putShort(2.toShort); bb.putInt(44100)
    bb.putInt(44100 * 4); bb.putShort(4.toShort); bb.putShort(16.toShort)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(4 * 1000)
    val p = MediaFormats.probe(bb.array())
    assert(p.format == "wav" && p.channels == 2 && p.sampleRate == 44100 &&
      p.bits == 16 && p.nSamples == 1000L, s"$p")
  }

  test("JPEG fill bytes before markers are skipped, not parsed as segments") {
    // FFD8 | FF FF FF (fill) | FFC0 SOF0
    val bb = java.nio.ByteBuffer.allocate(2 + 3 + 2 + 2 + 6)
    bb.put(Array(0xff, 0xd8, 0xff, 0xff, 0xff).map(_.toByte))
    bb.put(Array(0xff, 0xc0).map(_.toByte))
    bb.putShort(17.toShort); bb.put(8.toByte)
    bb.putShort(100.toShort); bb.putShort(200.toShort); bb.put(3.toByte)
    val p = MediaFormats.probe(bb.array())
    assert(p.format == "jpeg" && p.width == 200 && p.height == 100, s"$p")
  }

  test("OS/2 BITMAPCOREHEADER parses its 16-bit dims; bogus DIB headers are unknown") {
    val core = java.nio.ByteBuffer.allocate(26).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    core.put("BM".getBytes("US-ASCII")); core.position(14)
    core.putInt(12); core.putShort(100.toShort); core.putShort(50.toShort)
    val c = MediaFormats.probe(core.array())
    assert(c.format == "bmp" && c.width == 100 && c.height == 50,
      s"core header dims are u16 at 18/20, not s32: $c")
    val bogus = java.nio.ByteBuffer.allocate(30).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bogus.put("BM".getBytes("US-ASCII")); bogus.position(14)
    bogus.putInt(99); bogus.putInt(640); bogus.putInt(480)
    assert(MediaFormats.probe(bogus.array()).format == "unknown",
      "an unrecognized DIB header size must not be parsed as INFOHEADER")
  }

  test("hostile WAV chunk sizes terminate (no hang) and corrupt rates are unknown") {
    def wav(tail: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(1000); bb.put("WAVE".getBytes)
      tail(bb); bb.array()
    }
    // size 0xFFFFFFF8: as a signed int this was a -8, a zero-advance hang
    val hostile = wav { bb =>
      bb.put("junk".getBytes); bb.putInt(0xfffffff8)
    }
    assert(MediaFormats.probe(hostile).format == "unknown", "must terminate, not hang")
    // fmt chunk with rate >= 2^31: reported as unknown, never negative
    val badRate = wav { bb =>
      bb.put("fmt ".getBytes); bb.putInt(16)
      bb.putShort(1.toShort); bb.putShort(2.toShort); bb.putInt(0x80000000)
      bb.putInt(0); bb.putShort(4.toShort); bb.putShort(16.toShort)
    }
    assert(MediaFormats.probe(badRate).format == "unknown",
      s"a wrapped sample rate must not classify as wav: ${MediaFormats.probe(badRate)}")
  }

  test("corrupt/truncated/unknown bytes never throw — they report unknown") {
    val cases = Seq[Array[Byte]](
      null,
      Array.empty,
      Array[Byte](1, 2, 3),
      "just some text pretending to be a blob".getBytes("UTF-8"),
      MediaFormats.PngSig, // signature but no IHDR
      Array(0xff, 0xd8, 0x00).map(_.toByte), // JPEG SOI then garbage
      {
        val b = java.nio.ByteBuffer.allocate(16)
        b.put("RIFF".getBytes); b.putInt(0); b.put("WAVE".getBytes); b.array()
      }) // RIFF/WAVE with no fmt chunk
    cases.foreach { c =>
      val p = MediaFormats.probe(c)
      assert(p.format == "unknown", s"expected unknown, got $p")
    }
  }
  test("ID3v2 text frames: v2.3 vs v2.4 sizes, encodings, torn tags keep complete frames") {
    def frame(fid: String, text: String, enc: Int, cs: String,
              syncsafe: Boolean): Array[Byte] = {
      val body = Array(enc.toByte) ++ text.getBytes(cs)
      val h = java.nio.ByteBuffer.allocate(10)
      h.put(fid.getBytes("US-ASCII"))
      val n = body.length
      if (syncsafe) {
        h.put(((n >> 21) & 0x7f).toByte); h.put(((n >> 14) & 0x7f).toByte)
        h.put(((n >> 7) & 0x7f).toByte); h.put((n & 0x7f).toByte)
      } else h.putInt(n)
      h.putShort(0)
      h.array() ++ body
    }
    def tag(ver: Int, frames: Array[Byte]): Array[Byte] = {
      val h = java.nio.ByteBuffer.allocate(10)
      h.put("ID3".getBytes("US-ASCII")); h.put(ver.toByte); h.put(0.toByte)
      h.put(0.toByte)
      val n = frames.length
      h.put(((n >> 21) & 0x7f).toByte); h.put(((n >> 14) & 0x7f).toByte)
      h.put(((n >> 7) & 0x7f).toByte); h.put((n & 0x7f).toByte)
      h.array() ++ frames
    }
    // v2.3 plain sizes, a >127-byte body, UTF-16 with BOM, UTF-16BE,
    // and a trailing NUL terminator that must strip
    val long = "T" * 200
    val v3 = tag(3, frame("TIT2", long, 0, "ISO-8859-1", syncsafe = false) ++
      frame("TPE1", "Artíst\u0000", 3, "UTF-8", syncsafe = false) ++
      frame("TALB", "Albüm", 1, "UTF-16", syncsafe = false) ++
      frame("TCON", "G", 2, "UTF-16BE", syncsafe = false))
    val t3 = MediaFormats.probeId3(v3)
    assert(t3.hasId3 && t3.version == 3 && t3.nFrames == 4L, s"$t3")
    assert(t3.title == long && t3.artist == "Artíst" && t3.album == "Albüm", s"$t3")
    // the SAME >127-byte frame under v2.4 must parse via syncsafe sizes
    val v4 = tag(4, frame("TIT2", long, 3, "UTF-8", syncsafe = true) ++
      frame("TALB", "A4", 0, "ISO-8859-1", syncsafe = true))
    val t4 = MediaFormats.probeId3(v4)
    assert(t4.version == 4 && t4.title == long && t4.album == "A4" &&
      t4.nFrames == 2L, s"$t4")
    // a v2.4 reader applying PLAIN sizes to that tag would mis-hop:
    // prove the builder actually wrote diverging bytes
    assert((201 >> 7) > 0) // body length needs two syncsafe septets
    // torn mid-frame: complete frames keep their fields
    val torn = MediaFormats.probeId3(v3.take(10 +
      (10 + 201) + (10 + 8) + 4))
    assert(torn.nFrames == 2L && torn.title == long &&
      torn.artist == "Artíst" && torn.album == null, s"$torn")
    // padding NULs end the walk; garbage is not a tag
    val padded = MediaFormats.probeId3(tag(3,
      frame("TIT2", "x", 0, "ISO-8859-1", syncsafe = false) ++
        new Array[Byte](32)))
    assert(padded.nFrames == 1L && padded.title == "x", s"$padded")
    assert(!MediaFormats.probeId3("random bytes".getBytes).hasId3)
    assert(!MediaFormats.probeId3(null).hasId3)
    // v2.2 is identified but not walked
    val v22 = MediaFormats.probeId3(tag(2, Array.emptyByteArray))
    assert(v22.hasId3 && v22.version == 2 && v22.nFrames == null, s"$v22")
  }

  test("MP3 Xing/Info header: O(1) declared frame count; flag-clear falls back to the walk") {
    // MPEG1 stereo 128 kbps @ 44100: side info 32, frame length 417
    def first(tag: String, flags: Int, declared: Int, mono: Boolean): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(417)
      bb.put(Array(0xff.toByte, 0xfb.toByte, ((9 << 4) | 0).toByte,
        (if (mono) 0xc0 else 0x40).toByte))
      bb.position(4 + (if (mono) 17 else 32))
      bb.put(tag.getBytes("US-ASCII")); bb.putInt(flags); bb.putInt(declared)
      bb.array()
    }
    val plain = Array(0xff.toByte, 0xfb.toByte, ((9 << 4) | 0).toByte,
      0x40.toByte) ++ new Array[Byte](413)
    // Xing declares 5000 frames; only 2 physical frames follow
    val vbr = first("Xing", 1, 5000, mono = false) ++ plain
    assert(MediaFormats.probe(vbr).nSamples == 5000L * 1152, s"${MediaFormats.probe(vbr)}")
    // Info (CBR) declares too; mono side-info offset is 17
    val monoPlain = Array(0xff.toByte, 0xfb.toByte, ((9 << 4) | 0).toByte,
      0xc0.toByte) ++ new Array[Byte](413)
    val cbr = first("Info", 1, 300, mono = true) ++ monoPlain
    assert(MediaFormats.probe(cbr).nSamples == 300L * 1152, s"${MediaFormats.probe(cbr)}")
    // frames flag CLEAR: the declaration is ignored, the walk counts
    val noflag = first("Xing", 0, 5000, mono = false) ++ plain ++ plain
    assert(MediaFormats.probe(noflag).nSamples == 3L * 1152, s"${MediaFormats.probe(noflag)}")
    // garbage where the tag would sit: plain walk
    val noTag = first("Zing", 1, 5000, mono = false) ++ plain
    assert(MediaFormats.probe(noTag).nSamples == 2L * 1152)
  }

  test("MP3 frame walk: complete frames × spf, torn tails keep whole frames") {
    // MPEG1 L3 128 kbps @ 44100: frame length 144000*128/44100 = 417
    val f = Array(0xff.toByte, 0xfb.toByte, ((9 << 4) | (0 << 2)).toByte,
      0x40.toByte) ++ new Array[Byte](413)
    val b = f ++ f ++ f
    assert(MediaFormats.probe(b).nSamples == 3 * 1152L, s"${MediaFormats.probe(b)}")
    // torn 10 bytes into the last frame: two complete frames count
    assert(MediaFormats.probe(b.take(b.length - 10)).nSamples == 2 * 1152L)
    // a bare header (no complete frame) estimates nothing
    assert(MediaFormats.probe(f.take(4) ++ new Array[Byte](16)).nSamples == null)
    // free bitrate (index 0): the hop length is unknowable → null
    val free = Array(0xff.toByte, 0xfb.toByte, 0x00.toByte, 0x40.toByte) ++
      new Array[Byte](400)
    assert(MediaFormats.probe(free).nSamples == null)
    // MPEG2 (576 samples/frame): 8 kbps @ 22050 → frame length 26
    val m2 = Array(0xff.toByte, 0xf3.toByte, 0x10.toByte, 0x40.toByte) ++
      new Array[Byte](22)
    val p2 = MediaFormats.probe(m2 ++ m2)
    assert(p2.sampleRate == 22050 && p2.nSamples == 2 * 576L, s"$p2")
    // ID3v2-prefixed: tag skipped, walk intact
    val tag = {
      val t = java.nio.ByteBuffer.allocate(10 + 30)
      t.put("ID3".getBytes("US-ASCII")); t.put(3.toByte); t.put(0.toByte)
      t.put(0.toByte); t.put(0.toByte); t.put(0.toByte); t.put(0.toByte)
      t.put(30.toByte)
      t.array()
    }
    assert(MediaFormats.probe(tag ++ b).nSamples == 3 * 1152L)
    // garbage between frames stops the walk at the last whole frame
    val glued = f ++ "junk".getBytes("US-ASCII") ++ f
    assert(MediaFormats.probe(glued).nSamples == 1152L)
  }

  test("WebP: VP8 / VP8L / VP8X dims; hostile and torn headers are unknown") {
    def riff(cc: String, chunk: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(20 + chunk.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(4 + 8 + chunk.length)
      bb.put("WEBP".getBytes("US-ASCII"))
      bb.put(cc.getBytes("US-ASCII")); bb.putInt(chunk.length); bb.put(chunk)
      bb.array()
    }
    // VP8 lossy 320x240: frame tag, start code 9d 01 2a, LE dims
    val vp8 = {
      val c = java.nio.ByteBuffer.allocate(10)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      c.put(0x30.toByte); c.put(0.toByte); c.put(0.toByte)
      c.put(0x9d.toByte); c.put(0x01.toByte); c.put(0x2a.toByte)
      c.putShort(320.toShort); c.putShort(240.toShort)
      riff("VP8 ", c.array())
    }
    val p1 = MediaFormats.probe(vp8)
    assert(p1.format == "webp" && p1.width == 320 && p1.height == 240, s"$p1")
    // scale bits (the top 2 of each 16) are NOT part of the dimension
    val scaled = vp8.clone()
    scaled(27) = (scaled(27) | 0x40).toByte // width |= 1<<14
    val p1s = MediaFormats.probe(scaled)
    assert(p1s.width == 320, s"$p1s")
    // VP8L lossless 640x480: hand-packed 14+14 bits after 0x2f
    // (w-1=639, h-1=479 → bits 0x77C27F → 7F C2 77 00)
    val vp8l = riff("VP8L", Array[Byte](0x2f, 0x7f, 0xc2.toByte, 0x77, 0x00))
    val p2 = MediaFormats.probe(vp8l)
    assert(p2.format == "webp" && p2.width == 640 && p2.height == 480, s"$p2")
    // nonzero version bits are spec-invalid → unknown
    val badVer = vp8l.clone(); badVer(24) = 0x10.toByte
    assert(MediaFormats.probe(badVer).format == "unknown")
    // VP8X extended 100000x65536 (past the 14-bit range): 24-bit LE
    val vp8x = riff("VP8X", Array[Byte](0x10, 0, 0, 0,
      0x9f.toByte, 0x86.toByte, 0x01, 0xff.toByte, 0xff.toByte, 0x00))
    val p3 = MediaFormats.probe(vp8x)
    assert(p3.format == "webp" && p3.width == 100000 && p3.height == 65536, s"$p3")
    // missing VP8 start code / unknown fourcc → unknown
    val noCode = vp8.clone(); noCode(23) = 0
    assert(MediaFormats.probe(noCode).format == "unknown")
    assert(MediaFormats.probe(riff("VP9 ", new Array[Byte](10))).format == "unknown")
    // truncation sweep: every cut parses without throwing, torn = unknown
    for (cut <- 0 to vp8x.length) {
      val p = MediaFormats.probe(vp8x.take(cut))
      assert(cut == vp8x.length || p.format == "unknown", s"cut=$cut $p")
    }
  }

  test("FLAC: STREAMINFO bit unpacking — hand-packed 44.1k stereo 24-bit") {
    val bb = java.nio.ByteBuffer.allocate(42)
    bb.put("fLaC".getBytes("US-ASCII"))
    bb.put(0x80.toByte); bb.put(0.toByte); bb.put(0.toByte); bb.put(34.toByte)
    bb.putShort(4096.toShort); bb.putShort(4096.toShort)
    bb.put(new Array[Byte](6))
    // rate 44100 (20 bits) | channels-1=1 (3) | bits-1=23 (5) | total 123456 (36)
    bb.putLong((44100L << 44) | (1L << 41) | (23L << 36) | 123456L)
    val p = MediaFormats.probe(bb.array())
    assert(p.format == "flac" && p.sampleRate == 44100 && p.channels == 2 &&
      p.bits == 24 && p.nSamples == 123456L, s"$p")
    // sample rate 0 is invalid per spec; non-STREAMINFO first block rejects
    val zr = bb.array().clone()
    zr(18) = 0; zr(19) = 0; zr(20) = (zr(20) & 0x0f).toByte
    assert(MediaFormats.probe(zr).format == "unknown")
    val wrongType = bb.array().clone(); wrongType(4) = 0x81.toByte
    assert(MediaFormats.probe(wrongType).format == "unknown")
  }

  test("MP3: frame-header tables and the ID3v2 skip") {
    def frame(b1: Int, b2: Int, b3: Int) =
      Array(0xff.toByte, b1.toByte, b2.toByte, b3.toByte) ++ new Array[Byte](16)
    // MPEG1 Layer III, 44100 (idx 0), joint stereo
    val p1 = MediaFormats.probe(frame(0xfb, 0x90, 0x40))
    assert(p1.format == "mp3" && p1.sampleRate == 44100 && p1.channels == 2, s"$p1")
    // MPEG2, 24000 (idx 1), mono
    val p2 = MediaFormats.probe(frame(0xf3, 0x94, 0xc0))
    assert(p2.format == "mp3" && p2.sampleRate == 24000 && p2.channels == 1, s"$p2")
    // ID3v2 tag (size 100) then the frame — the skip must land on the sync
    val tag = java.nio.ByteBuffer.allocate(110)
    tag.put("ID3".getBytes("US-ASCII")); tag.put(3.toByte); tag.put(0.toByte)
    tag.put(0.toByte); tag.put(0.toByte); tag.put(0.toByte); tag.put(0.toByte)
    tag.put(100.toByte)
    val tagged = tag.array() ++ frame(0xfb, 0x90, 0x40)
    val p3 = MediaFormats.probe(tagged)
    assert(p3.format == "mp3" && p3.sampleRate == 44100, s"$p3")
    // reserved version / samplerate index / bitrate 1111 are corrupt
    assert(MediaFormats.probe(frame(0xeb, 0x90, 0x40)).format == "unknown") // version reserved
    assert(MediaFormats.probe(frame(0xfb, 0x9c, 0x40)).format == "unknown") // sr idx 3
    assert(MediaFormats.probe(frame(0xfb, 0xf0, 0x40)).format == "unknown") // bitrate 1111
    // an ID3 tag whose size overruns the buffer is unknown, never a throw
    val overrun = tag.array().take(10) ++ new Array[Byte](5)
    assert(MediaFormats.probe(overrun).format == "unknown")
  }

  // ---- MP4 / ISO-BMFF box walk ----------------------------------------

  private def box(tp: String, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
    bb.putInt(8 + body.length); bb.put(tp.getBytes("US-ASCII")); bb.put(body)
    bb.array()
  }
  private def ftyp(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8)
    bb.put("isom".getBytes("US-ASCII")); bb.putInt(0)
    box("ftyp", bb.array())
  }
  private def mvhdV0(timescale: Int, duration: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(100)
    bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.putInt(timescale); bb.putInt(duration)
    box("mvhd", bb.array())
  }
  private def trak(w: Int, h: Int, codec: String, tkhdV1: Boolean = false): Array[Byte] = {
    val tk = java.nio.ByteBuffer.allocate(if (tkhdV1) 96 else 84)
    tk.putInt(if (tkhdV1) 0x01000007 else 7) // version byte leads
    tk.position(if (tkhdV1) 88 else 76)
    tk.putInt(w << 16); tk.putInt(h << 16)
    val sd = java.nio.ByteBuffer.allocate(24)
    sd.putInt(0); sd.putInt(1); sd.putInt(16)
    sd.put(codec.getBytes("US-ASCII")); sd.put(new Array[Byte](8))
    box("trak", box("tkhd", tk.array()) ++
      box("mdia", box("minf", box("stbl", box("stsd", sd.array())))))
  }

  // ---- EXIF / TIFF IFD walk ---------------------------------------------

  private def tiffBlock(little: Boolean, withSub: Boolean): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(98)
      .order(if (little) java.nio.ByteOrder.LITTLE_ENDIAN
             else java.nio.ByteOrder.BIG_ENDIAN)
    bb.put((if (little) "II" else "MM").getBytes("US-ASCII"))
    bb.putShort(42.toShort); bb.putInt(8)
    bb.putShort(4.toShort)
    bb.putShort(0x010f.toShort); bb.putShort(2.toShort); bb.putInt(5); bb.putInt(62)
    bb.putShort(0x0110.toShort); bb.putShort(2.toShort); bb.putInt(3)
    bb.put("M7".getBytes("US-ASCII")); bb.put(0.toByte); bb.put(0.toByte)
    bb.putShort(0x0112.toShort); bb.putShort(3.toShort); bb.putInt(1)
    bb.putShort(6.toShort); bb.putShort(0.toShort)
    bb.putShort(0x8769.toShort); bb.putShort(4.toShort); bb.putInt(1)
    bb.putInt(if (withSub) 68 else 90000) // hostile offset in the no-sub twin
    bb.putInt(0)
    bb.put("CAMX".getBytes("US-ASCII")); bb.put(0.toByte); bb.put(0.toByte)
    bb.putShort(2.toShort)
    bb.putShort(0xa002.toShort); bb.putShort(4.toShort); bb.putInt(1); bb.putInt(640)
    bb.putShort(0xa003.toShort); bb.putShort(4.toShort); bb.putInt(1); bb.putInt(480)
    bb.putInt(0)
    bb.array()
  }

  private def exifJpeg(tiff: Array[Byte]): Array[Byte] = {
    val payload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val bb = java.nio.ByteBuffer.allocate(2 + 4 + payload.length + 2)
    bb.put(Array(0xff, 0xd8, 0xff, 0xe1).map(_.toByte))
    bb.putShort((2 + payload.length).toShort)
    bb.put(payload)
    bb.put(Array(0xff, 0xd9).map(_.toByte))
    bb.array()
  }

  test("EXIF: both byte orders read orientation, make (offset), model (inline), dims") {
    for (little <- Seq(true, false)) {
      val p = ExifFormats.probe(exifJpeg(tiffBlock(little, withSub = true)))
      assert(p.hasExif && p.byteOrder == (if (little) "II" else "MM"), s"$p")
      assert(p.orientation == 6 && p.make == "CAMX" && p.model == "M7", s"$p")
      assert(p.pixelX == 640 && p.pixelY == 480, s"$p")
    }
  }

  test("EXIF: hostile sub-IFD offset, truncation, and absent APP1 never throw") {
    // ExifIFD pointer past the segment: IFD0 fields survive, dims null
    val hostile = ExifFormats.probe(exifJpeg(tiffBlock(little = true, withSub = false)))
    assert(hostile.hasExif && hostile.orientation == 6 && hostile.pixelX == null, s"$hostile")
    // APP1 torn mid-TIFF: never a throw
    val full = exifJpeg(tiffBlock(little = true, withSub = true))
    for (cut <- Seq(6, 14, 20, 40, 70))
      ExifFormats.probe(full.take(cut)) // must not throw
    // a JPEG without APP1 reads has_exif = false
    val plain = java.nio.ByteBuffer.allocate(24)
    plain.put(Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte))
    plain.putShort(18.toShort)
    plain.put("JFIF".getBytes("US-ASCII")); plain.put(new Array[Byte](12))
    plain.put(Array(0xff, 0xd9).map(_.toByte))
    assert(!ExifFormats.probe(plain.array()).hasExif)
    // not a JPEG at all / null / empty
    assert(!ExifFormats.probe("GIF89a??????".getBytes).hasExif)
    assert(!ExifFormats.probe(null).hasExif)
    assert(!ExifFormats.probe(Array[Byte](1)).hasExif)
    // bad TIFF magic
    val badMagic = exifJpeg(tiffBlock(little = true, withSub = true))
    badMagic(14) = 99 // corrupt the 42
    assert(!ExifFormats.probe(badMagic).hasExif)
  }

  test("EXIF: hostile ASCII count 0x7FFFFFFF never throws (off+count overflow)") {
    // patch the Make tag's count (tiff offset 14..17, little-endian int)
    // to Int.MaxValue: off + count wraps negative, which a naive
    // `off + count > end` bounds check would wave through
    val tiff = tiffBlock(little = true, withSub = true)
    tiff(14) = 0xff.toByte; tiff(15) = 0xff.toByte
    tiff(16) = 0xff.toByte; tiff(17) = 0x7f.toByte
    val p = ExifFormats.probe(exifJpeg(tiff)) // must not throw
    assert(p.hasExif && p.make == null, s"$p")
    assert(p.model == "M7" && p.orientation == 6, s"$p") // other tags survive
  }

  test("MP4: ftyp + moov(mvhd, trak) reads duration, tracks, dims, codec") {
    val b = ftyp() ++ box("moov",
      mvhdV0(timescale = 600, duration = 7200) ++
        trak(1920, 1080, "avc1") ++ trak(0, 0, "mp4a"))
    val p = MediaFormats.probeVideo(b)
    assert(p.format == "mp4", s"$p")
    assert(p.durationMs == 12000L, s"7200/600 s = 12000 ms: $p")
    assert(p.nTracks == 2 && p.width == 1920 && p.height == 1080, s"$p")
    assert(p.codec == "avc1", s"$p")
    // the generic probe classifies the same bytes as mp4 with dims
    val g = MediaFormats.probe(b)
    assert(g.format == "mp4" && g.width == 1920 && g.height == 1080, s"$g")
  }

  test("MP4: version-1 boxes — 64-bit mvhd duration, tkhd dims at offset 88") {
    val mv = java.nio.ByteBuffer.allocate(112)
    mv.putInt(0x01000000)       // version 1
    mv.position(20); mv.putInt(1000)   // timescale
    mv.putLong(90000L)                 // 64-bit duration
    val b = ftyp() ++ box("moov",
      box("mvhd", mv.array()) ++ trak(640, 360, "hev1", tkhdV1 = true))
    val p = MediaFormats.probeVideo(b)
    assert(p.durationMs == 90000L && p.width == 640 && p.height == 360 &&
      p.codec == "hev1", s"$p")
  }

  test("MP4: largesize (size = 1 + 64-bit) boxes walk correctly") {
    val inner = mvhdV0(1000, 5000) ++ trak(320, 240, "vp09")
    val bb = java.nio.ByteBuffer.allocate(16 + inner.length)
    bb.putInt(1); bb.put("moov".getBytes("US-ASCII"))
    bb.putLong(16L + inner.length)
    bb.put(inner)
    val p = MediaFormats.probeVideo(ftyp() ++ bb.array())
    assert(p.durationMs == 5000L && p.width == 320 && p.codec == "vp09", s"$p")
  }

  // ---- stts/stsz sample-table walk (probeTracks) -----------------------

  private def fullTrak(trackId: Int, handler: String, ts: Int,
                       stts: Seq[(Int, Int)], stszFixed: Int,
                       stszSizes: Seq[Int], includeStsz: Boolean = true,
                       mdhdV1: Boolean = false,
                       stss: Option[Seq[Int]] = None): Array[Byte] = {
    val tk = java.nio.ByteBuffer.allocate(84)
    tk.putInt(7); tk.putInt(0); tk.putInt(0); tk.putInt(trackId)
    val durUnits = stts.map { case (n, d) => n.toLong * d }.sum
    val mdhd =
      if (mdhdV1) {
        val bb = java.nio.ByteBuffer.allocate(36)
        bb.putInt(0x01000000); bb.putLong(0L); bb.putLong(0L)
        bb.putInt(ts); bb.putLong(durUnits); bb.putInt(0)
        box("mdhd", bb.array())
      } else {
        val bb = java.nio.ByteBuffer.allocate(24)
        bb.putInt(0); bb.putInt(0); bb.putInt(0)
        bb.putInt(ts); bb.putInt(durUnits.toInt); bb.putInt(0)
        box("mdhd", bb.array())
      }
    val hd = java.nio.ByteBuffer.allocate(25)
    hd.putInt(0); hd.putInt(0); hd.put(handler.getBytes("US-ASCII"))
    hd.put(new Array[Byte](13))
    val st = java.nio.ByteBuffer.allocate(8 + stts.length * 8)
    st.putInt(0); st.putInt(stts.length)
    stts.foreach { case (n, d) => st.putInt(n); st.putInt(d) }
    val sz =
      if (stszFixed > 0) {
        val bb = java.nio.ByteBuffer.allocate(12)
        bb.putInt(0); bb.putInt(stszFixed); bb.putInt(stts.map(_._1).sum)
        bb.array()
      } else {
        val bb = java.nio.ByteBuffer.allocate(12 + stszSizes.length * 4)
        bb.putInt(0); bb.putInt(0); bb.putInt(stszSizes.length)
        stszSizes.foreach(bb.putInt)
        bb.array()
      }
    val stssBox = stss.map { syncs =>
      val bb = java.nio.ByteBuffer.allocate(8 + syncs.length * 4)
      bb.putInt(0); bb.putInt(syncs.length)
      syncs.foreach(bb.putInt)
      box("stss", bb.array())
    }.getOrElse(Array.empty[Byte])
    val stbl = box("stbl", box("stts", st.array()) ++ stssBox ++
      (if (includeStsz) box("stsz", sz) else Array.empty[Byte]))
    box("trak", box("tkhd", tk.array()) ++
      box("mdia", mdhd ++ box("hdlr", hd.array()) ++ box("minf", stbl)))
  }

  test("MP4 tracks: stts multi-entry sums, explicit + uniform stsz, bitrate") {
    // video: 10 samples @40 + 5 @50 = 650 units @ ts 1000 → 650 ms;
    // sizes 100..114 → total 1605; bitrate = 1605*8*1000/650 = 19753
    val sizes = (0 until 15).map(i => 100 + i)
    val b = ftyp() ++ box("moov", mvhdV0(1000, 650) ++
      fullTrak(1, "vide", 1000, Seq((10, 40), (5, 50)), 0, sizes) ++
      fullTrak(2, "soun", 8000, Seq((100, 1024)), 256, Seq.empty, mdhdV1 = true))
    val t = MediaFormats.probeTracks(b)
    assert(t.size == 2, s"$t")
    val v = t.head
    assert(v.trackId == 1 && v.handler == "vide" && v.timescale == 1000L, s"$v")
    assert(v.nSamples == 15L && v.sttsDurationMs == 650L &&
      v.mdhdDurationMs == 650L, s"$v")
    assert(v.totalBytes == sizes.sum.toLong, s"$v")
    assert(v.bitrateBps == sizes.sum.toLong * 8 * 1000 / 650, s"$v")
    val a = t(1)
    assert(a.trackId == 2 && a.handler == "soun" && a.timescale == 8000L, s"$a")
    assert(a.nSamples == 100L && a.sttsDurationMs == 100L * 1024 * 1000 / 8000, s"$a")
    assert(a.totalBytes == 25600L &&
      a.bitrateBps == 25600L * 8 * 8000 / (100L * 1024), s"$a")
  }

  test("MP4 tracks: stss sync samples — explicit table, absent = all-sync, torn = null") {
    val sizes = (0 until 15).map(i => 100 + i)
    // explicit keyframes at 1, 5, 9, 13: n_sync 4, max gap 4
    val withStss = ftyp() ++ box("moov", mvhdV0(1000, 650) ++
      fullTrak(1, "vide", 1000, Seq((10, 40), (5, 50)), 0, sizes,
        stss = Some(Seq(1, 5, 9, 13))))
    val v = MediaFormats.probeTracks(withStss).head
    assert(v.nSyncSamples == 4L && v.maxSyncGap == 4L, s"$v")
    // uneven gaps: the MAX wins
    val uneven = ftyp() ++ box("moov", mvhdV0(1000, 650) ++
      fullTrak(1, "vide", 1000, Seq((10, 40), (5, 50)), 0, sizes,
        stss = Some(Seq(1, 2, 9))))
    assert(MediaFormats.probeTracks(uneven).head.maxSyncGap == 7L)
    // ABSENT stss: every sample is a sync sample (ISO 14496-12 §8.6.2)
    val noStss = ftyp() ++ box("moov", mvhdV0(1000, 650) ++
      fullTrak(1, "vide", 1000, Seq((10, 40), (5, 50)), 0, sizes))
    val a = MediaFormats.probeTracks(noStss).head
    assert(a.nSyncSamples == 15L && a.maxSyncGap == 1L, s"$a")
    // non-ascending sync numbers are corrupt: null, not garbage
    val bad = ftyp() ++ box("moov", mvhdV0(1000, 650) ++
      fullTrak(1, "vide", 1000, Seq((10, 40), (5, 50)), 0, sizes,
        stss = Some(Seq(5, 5, 9))))
    val bv = MediaFormats.probeTracks(bad).head
    assert(bv.nSyncSamples == null && bv.maxSyncGap == null, s"$bv")
    // single sync sample: count 1, gap null (no pair to measure)
    val one = ftyp() ++ box("moov", mvhdV0(1000, 650) ++
      fullTrak(1, "vide", 1000, Seq((10, 40), (5, 50)), 0, sizes,
        stss = Some(Seq(1))))
    val ov = MediaFormats.probeTracks(one).head
    assert(ov.nSyncSamples == 1L && ov.maxSyncGap == null, s"$ov")
  }

  test("MP4 tracks: torn tables report null, never a partial sum; no throw") {
    val sizes = (0 until 15).map(i => 100 + i)
    val full = ftyp() ++ box("moov", mvhdV0(1000, 650) ++
      fullTrak(1, "vide", 1000, Seq((10, 40), (5, 50)), 0, sizes))
    // every truncation point parses without throwing
    for (cut <- 8 until full.length by 7) MediaFormats.probeTracks(full.take(cut))
    // a cut INSIDE the stsz size table: stts fields live, total null
    val cutInStsz = full.length - 20
    val torn = MediaFormats.probeTracks(full.take(cutInStsz))
    assert(torn.size == 1 && torn.head.nSamples == 15L &&
      torn.head.totalBytes == null && torn.head.bitrateBps == null, s"$torn")
    // absent stsz: same contract
    val noSz = ftyp() ++ box("moov", mvhdV0(1000, 650) ++
      fullTrak(1, "vide", 1000, Seq((10, 40), (5, 50)), 0, sizes,
        includeStsz = false))
    val got = MediaFormats.probeTracks(noSz)
    assert(got.size == 1 && got.head.totalBytes == null &&
      got.head.sttsDurationMs == 650L, s"$got")
    // hostile declared entry count (table past the box) → stts fields null
    val hostile = full.clone()
    // stts entry_count sits 4 bytes into the stts payload; find the box
    val idx = {
      var k = -1
      for (i <- 0 until hostile.length - 4)
        if (k < 0 && hostile(i) == 's' && hostile(i+1) == 't' &&
            hostile(i+2) == 't' && hostile(i+3) == 's') k = i
      k
    }
    hostile(idx + 8) = 0x7f.toByte // entry_count := huge
    val h = MediaFormats.probeTracks(hostile)
    assert(h.size == 1 && h.head.nSamples == null &&
      h.head.sttsDurationMs == null && h.head.bitrateBps == null, s"$h")
    // not ISO-BMFF at all / null / empty
    assert(MediaFormats.probeTracks("not an mp4 at all...".getBytes).isEmpty)
    assert(MediaFormats.probeTracks(null).isEmpty)
  }

  // ---- stsc/stco/co64 chunk-offset walk (probeChunks) -------------------

  /** A trak whose stbl carries stts + optional stsz/stsc/stco/co64 —
    * hand-assembled independently of the production fixture builder. */
  private def chunkTrak(trackId: Int, handler: String, nSamples: Int,
                        stszFixed: Int, stszSizes: Seq[Int],
                        stscRuns: Seq[(Int, Int)],
                        offsets: Seq[Long], useCo64: Boolean = false,
                        includeStsz: Boolean = true,
                        includeStsc: Boolean = true,
                        includeStco: Boolean = true): Array[Byte] = {
    val tk = java.nio.ByteBuffer.allocate(84)
    tk.putInt(7); tk.putInt(0); tk.putInt(0); tk.putInt(trackId)
    val md = java.nio.ByteBuffer.allocate(24)
    md.putInt(0); md.putInt(0); md.putInt(0); md.putInt(1000)
    md.putInt(nSamples * 40); md.putInt(0)
    val hd = java.nio.ByteBuffer.allocate(25)
    hd.putInt(0); hd.putInt(0); hd.put(handler.getBytes("US-ASCII"))
    hd.put(new Array[Byte](13))
    val st = java.nio.ByteBuffer.allocate(16)
    st.putInt(0); st.putInt(1); st.putInt(nSamples); st.putInt(40)
    val sz =
      if (stszFixed > 0) {
        val bb = java.nio.ByteBuffer.allocate(12)
        bb.putInt(0); bb.putInt(stszFixed); bb.putInt(nSamples)
        bb.array()
      } else {
        val bb = java.nio.ByteBuffer.allocate(12 + stszSizes.length * 4)
        bb.putInt(0); bb.putInt(0); bb.putInt(stszSizes.length)
        stszSizes.foreach(bb.putInt)
        bb.array()
      }
    val sc = java.nio.ByteBuffer.allocate(8 + stscRuns.length * 12)
    sc.putInt(0); sc.putInt(stscRuns.length)
    stscRuns.foreach { case (fc, spc) => sc.putInt(fc); sc.putInt(spc); sc.putInt(1) }
    val co =
      if (useCo64) {
        val bb = java.nio.ByteBuffer.allocate(8 + offsets.length * 8)
        bb.putInt(0); bb.putInt(offsets.length)
        offsets.foreach(bb.putLong)
        box("co64", bb.array())
      } else {
        val bb = java.nio.ByteBuffer.allocate(8 + offsets.length * 4)
        bb.putInt(0); bb.putInt(offsets.length)
        offsets.foreach(o => bb.putInt(o.toInt))
        box("stco", bb.array())
      }
    val stbl = box("stbl", box("stts", st.array()) ++
      (if (includeStsc) box("stsc", sc.array()) else Array.emptyByteArray) ++
      (if (includeStco) co else Array.emptyByteArray) ++
      (if (includeStsz) box("stsz", sz) else Array.emptyByteArray))
    box("trak", box("tkhd", tk.array()) ++
      box("mdia", box("mdhd", md.array()) ++ box("hdlr", hd.array()) ++
        box("minf", stbl)))
  }

  test("MP4 chunks: stsc expansion × stsz sizes → offsets, samples, max span") {
    // 15 samples, runs (1,4)(4,3): chunks of 4,4,4,3; sizes 100..114 →
    // chunk bytes 406,422,438,339; contiguous offsets from 5000
    val sizes = (0 until 15).map(i => 100 + i)
    val offs = Seq(5000L, 5406L, 5828L, 6266L)
    val b = ftyp() ++ box("moov", mvhdV0(1000, 650) ++
      chunkTrak(1, "vide", 15, 0, sizes, Seq((1, 4), (4, 3)), offs))
    val c = MediaFormats.probeChunks(b)
    assert(c.size == 1, s"$c")
    val v = c.head
    assert(v.trackId == 1 && v.handler == "vide", s"$v")
    assert(v.nChunks == 4L && v.firstOffset == 5000L && v.lastOffset == 6266L, s"$v")
    assert(v.chunkSamples == 15L && v.maxChunkBytes == 438L, s"$v")
    // multi-run with VARYING samples-per-chunk: (1,2)(3,5) over 4 chunks
    // = 2,2,5,5 samples = 14 total; uniform 10-byte samples → max 50
    val b2 = ftyp() ++ box("moov", mvhdV0(1000, 650) ++
      chunkTrak(1, "vide", 14, 10, Seq.empty, Seq((1, 2), (3, 5)),
        Seq(100L, 120L, 140L, 190L)))
    val v2 = MediaFormats.probeChunks(b2).head
    assert(v2.nChunks == 4L && v2.chunkSamples == 14L &&
      v2.maxChunkBytes == 50L && v2.lastOffset == 190L, s"$v2")
  }

  test("MP4 chunks: co64 64-bit offsets parse (incl. past 2^32)") {
    val big = 0x1_2345_6789L // > Int.MaxValue: needs the 64-bit width
    val b = ftyp() ++ box("moov", mvhdV0(1000, 650) ++
      chunkTrak(1, "vide", 8, 100, Seq.empty, Seq((1, 4)),
        Seq(big, big + 400L), useCo64 = true))
    val v = MediaFormats.probeChunks(b).head
    assert(v.nChunks == 2L && v.firstOffset == big &&
      v.lastOffset == big + 400L, s"$v")
    assert(v.chunkSamples == 8L && v.maxChunkBytes == 400L, s"$v")
  }

  test("MP4 chunk RANGES: per-chunk rows agree with the summary walk") {
    val sizes = (0 until 15).map(i => 100 + i)
    val offs = Seq(5000L, 5406L, 5828L, 6266L)
    val b = ftyp() ++ box("moov", mvhdV0(1000, 650) ++
      chunkTrak(1, "vide", 15, 0, sizes, Seq((1, 4), (4, 3)), offs))
    val rs = MediaFormats.probeChunkRanges(b)
    assert(rs.map(_.chunk) == Seq(1, 2, 3, 4), s"$rs")
    assert(rs.map(_.offset) == offs, s"$rs")
    assert(rs.map(_.nSamples) == Seq(4L, 4L, 4L, 3L), s"$rs")
    assert(rs.map(_.chunkBytes.longValue()) == Seq(406L, 422L, 438L, 339L), s"$rs")
    // the summary is derivable from the rows (one walk, two views)
    val sum = MediaFormats.probeChunks(b).head
    assert(sum.chunkSamples == rs.map(_.nSamples).sum &&
      sum.maxChunkBytes == rs.map(_.chunkBytes.longValue()).max)
    // no offsets / no mapping → no rows (a plan needs both)
    val noCo = ftyp() ++ box("moov", mvhdV0(1000, 650) ++
      chunkTrak(1, "vide", 15, 0, sizes, Seq((1, 4), (4, 3)), offs,
        includeStco = false))
    assert(MediaFormats.probeChunkRanges(noCo).isEmpty)
    val noSc = ftyp() ++ box("moov", mvhdV0(1000, 650) ++
      chunkTrak(1, "vide", 15, 0, sizes, Seq((1, 4), (4, 3)), offs,
        includeStsc = false))
    assert(MediaFormats.probeChunkRanges(noSc).isEmpty)
    // absent stsz: rows live, byte spans null
    val noSz = ftyp() ++ box("moov", mvhdV0(1000, 650) ++
      chunkTrak(1, "vide", 15, 0, sizes, Seq((1, 4), (4, 3)), offs,
        includeStsz = false))
    val rn = MediaFormats.probeChunkRanges(noSz)
    assert(rn.size == 4 && rn.forall(_.chunkBytes == null), s"$rn")
  }

  test("MP4 chunks: missing/torn/contradictory tables null their fields, never throw") {
    val sizes = (0 until 15).map(i => 100 + i)
    val offs = Seq(5000L, 5406L, 5832L, 6278L)
    def build(stsz: Boolean = true, stsc: Boolean = true, stco: Boolean = true,
              runs: Seq[(Int, Int)] = Seq((1, 4), (4, 3))) =
      ftyp() ++ box("moov", mvhdV0(1000, 650) ++
        chunkTrak(1, "vide", 15, 0, sizes, runs, offs,
          includeStsz = stsz, includeStsc = stsc, includeStco = stco))
    // absent stco: ALL chunk fields null (offsets are the spine)
    val noCo = MediaFormats.probeChunks(build(stco = false)).head
    assert(noCo.nChunks == null && noCo.firstOffset == null &&
      noCo.chunkSamples == null && noCo.maxChunkBytes == null, s"$noCo")
    // absent stsc: offsets live, mapping fields null
    val noSc = MediaFormats.probeChunks(build(stsc = false)).head
    assert(noSc.nChunks == 4L && noSc.firstOffset == 5000L &&
      noSc.chunkSamples == null && noSc.maxChunkBytes == null, s"$noSc")
    // absent stsz: mapping lives, byte span null
    val noSz = MediaFormats.probeChunks(build(stsz = false)).head
    assert(noSz.chunkSamples == 15L && noSz.maxChunkBytes == null, s"$noSz")
    // CONTRADICTORY: stsc maps 4*4=16 samples, stsz declares 15 — the
    // mapping readout stands (that IS the audit) but no byte span is
    // fabricated from a size table it overruns
    val contra = MediaFormats.probeChunks(build(runs = Seq((1, 4)))).head
    assert(contra.chunkSamples == 16L && contra.maxChunkBytes == null, s"$contra")
    // hostile stsc: first entry not chunk 1 / non-ascending → null mapping
    for (bad <- Seq(Seq((2, 4)), Seq((1, 4), (4, 3), (3, 2)))) {
      val h = MediaFormats.probeChunks(build(runs = bad)).head
      assert(h.chunkSamples == null && h.maxChunkBytes == null && h.nChunks == 4L, s"$h")
    }
    // a run pointing past the chunks that arrived → null mapping
    val far = MediaFormats.probeChunks(build(runs = Seq((1, 4), (9, 1)))).head
    assert(far.chunkSamples == null && far.nChunks == 4L, s"$far")
    // truncation sweep: no throw at any cut
    val full = build()
    for (cut <- 8 until full.length by 5) MediaFormats.probeChunks(full.take(cut))
    // non-BMFF / null / empty
    assert(MediaFormats.probeChunks("plain text".getBytes).isEmpty)
    assert(MediaFormats.probeChunks(null).isEmpty)
  }

  test("MP4: truncation and corruption never throw — partial fields stay null") {
    // ftyp alone: container identified, every moov field null
    val p1 = MediaFormats.probeVideo(ftyp())
    assert(p1.format == "mp4" && p1.durationMs == null && p1.nTracks == null &&
      p1.width == null && p1.codec == null, s"$p1")
    // moov truncated mid-trak: mvhd parses, the torn trak is dropped
    val full = ftyp() ++ box("moov", mvhdV0(1000, 3000) ++ trak(100, 50, "avc1"))
    val torn = full.take(full.length - 30)
    val p2 = MediaFormats.probeVideo(torn)
    assert(p2.format == "mp4" && p2.durationMs == 3000L, s"$p2")
    // a hostile child size larger than its parent stops the walk cleanly
    val bad = ftyp() ++ box("moov", Array.fill[Byte](12)(0x7f.toByte))
    assert(MediaFormats.probeVideo(bad).format == "mp4")
    // zero-timescale mvhd yields null duration, not a divide error
    val zts = ftyp() ++ box("moov", mvhdV0(0, 3000))
    assert(MediaFormats.probeVideo(zts).durationMs == null)
    // not ISO-BMFF at all
    assert(MediaFormats.probeVideo("plainly not a video".getBytes).format == "unknown")
    assert(MediaFormats.probeVideo(null).format == "unknown")
    assert(MediaFormats.probeVideo(Array[Byte](1, 2, 3)).format == "unknown")
  }
}
