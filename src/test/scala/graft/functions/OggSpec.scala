package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import MediaFormats.{buildOggPage, probeOgg}

class OggSpec extends AnyFunSuite {

  private def opusHead(channels: Int, preSkip: Int, rate: Int): Array[Byte] = {
    val h = new Array[Byte](19)
    "OpusHead".getBytes("US-ASCII").copyToArray(h)
    h(8) = 1
    h(9) = channels.toByte
    h(10) = (preSkip & 0xff).toByte; h(11) = ((preSkip >> 8) & 0xff).toByte
    var k = 0
    while (k < 4) { h(12 + k) = ((rate >> (8 * k)) & 0xff).toByte; k += 1 }
    h
  }

  private def vorbisHead(channels: Int, rate: Int): Array[Byte] = {
    val h = new Array[Byte](30)
    h(0) = 1
    "vorbis".getBytes("US-ASCII").copyToArray(h, 1)
    h(11) = channels.toByte
    var k = 0
    while (k < 4) { h(12 + k) = ((rate >> (8 * k)) & 0xff).toByte; k += 1 }
    h
  }

  test("page CRC matches an independent bitwise implementation") {
    // bit-at-a-time CRC-32/MPEG-2 style (poly 0x04c11db7, no reflection,
    // zero init/xorout) — written independently of the table in main
    def bitwise(b: Array[Byte]): Int = {
      var r = 0
      b.foreach { x =>
        r ^= (x & 0xff) << 24
        var k = 0
        while (k < 8) {
          r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
          k += 1
        }
      }
      r
    }
    val page = buildOggPage(7L, 0L, 0L, 2, opusHead(2, 312, 48000))
    // the builder wrote the crc at 22..25; recompute both ways with it zeroed
    val zeroed = page.clone()
    (22 to 25).foreach(i => zeroed(i) = 0)
    val stored = (page(22) & 0xff) | ((page(23) & 0xff) << 8) |
      ((page(24) & 0xff) << 16) | ((page(25) & 0xff) << 24)
    assert(bitwise(zeroed) == stored)
    assert(MediaFormats.oggCrc(page, 0, page.length) == stored)
  }

  test("opus: duration from granule minus pre-skip on the 48 kHz clock") {
    val s = 0xABCDL
    val data = Array.tabulate[Byte](40)(_.toByte)
    val file = buildOggPage(s, 0, 0, 2, opusHead(2, 312, 48000)) ++
      buildOggPage(s, 1, 0, 0, "OpusTags".getBytes("US-ASCII")) ++
      buildOggPage(s, 2, 312L + 48L * 1250L, 4, data)
    val o = probeOgg(file)
    assert(o.nBadPages == 0)
    assert(o.streams.size == 1)
    val st = o.streams.head
    assert(st.codec == "opus" && st.channels == 2 && st.sampleRate == 48000)
    assert(st.durationMs == 1250L && st.nPages == 3 && st.eos)
  }

  test("vorbis: duration at the declared rate; header pages are not audio") {
    val s = 5L
    val file = buildOggPage(s, 0, 0, 2, vorbisHead(1, 16000)) ++
      buildOggPage(s, 1, 0, 0, Array[Byte](3) ++ "vorbis".getBytes("US-ASCII"))
    // no data pages: duration must be null, never 0-from-header-granule
    val o0 = probeOgg(file)
    assert(o0.streams.head.durationMs == null && !o0.streams.head.eos)
    val file2 = file ++ buildOggPage(s, 2, 16L * 777L, 4, Array[Byte](1, 2, 3))
    val st = probeOgg(file2).streams.head
    assert(st.codec == "vorbis" && st.sampleRate == 16000 && st.channels == 1)
    assert(st.durationMs == 777L && st.eos)
  }

  test("bit-rot: the CRC gate counts and skips, resync keeps neighbors") {
    val s = 9L
    val p1 = buildOggPage(s, 0, 0, 2, opusHead(1, 0, 48000))
    val p2 = buildOggPage(s, 1, 48L * 100L, 0, Array.fill[Byte](30)(7))
    val p3 = buildOggPage(s, 2, 48L * 900L, 4, Array.fill[Byte](30)(9))
    val rot = (p1 ++ p2 ++ p3).clone()
    val at = p1.length + p2.length + 30 // inside p3's payload
    rot(at) = (rot(at) ^ 0x55).toByte
    val o = probeOgg(rot)
    assert(o.nBadPages == 1)
    val st = o.streams.head
    assert(st.nPages == 2 && st.durationMs == 100L && !st.eos)
  }

  test("truncation sweep: never throws, complete pages only, duration monotone") {
    val s = 3L
    val full = buildOggPage(s, 0, 0, 2, opusHead(2, 0, 48000)) ++
      buildOggPage(s, 1, 48L * 10L, 0, Array.fill[Byte](20)(1)) ++
      buildOggPage(s, 2, 48L * 20L, 0, Array.fill[Byte](20)(2)) ++
      buildOggPage(s, 3, 48L * 30L, 4, Array.fill[Byte](20)(3))
    var step = 0
    var prev = -1L
    while (step <= full.length) {
      val o = probeOgg(java.util.Arrays.copyOfRange(full, 0, step))
      assert(o.nBadPages == 0)
      val d = o.streams.headOption.map(x =>
        if (x.durationMs == null) 0L else x.durationMs.longValue()).getOrElse(0L)
      assert(d >= prev, s"step=$step")
      prev = d
      step += 3
    }
    assert(probeOgg(full).streams.head.durationMs == 30L)
  }

  test("multiplexed streams: per-serial readout from one interleaved file") {
    val a = 1L; val b = 2L
    val file = buildOggPage(a, 0, 0, 2, opusHead(2, 0, 48000)) ++
      buildOggPage(b, 0, 0, 2, vorbisHead(2, 8000)) ++
      buildOggPage(a, 1, 48L * 500L, 4, Array[Byte](1)) ++
      buildOggPage(b, 1, 8L * 400L, 4, Array[Byte](2))
    val o = probeOgg(file)
    assert(o.streams.size == 2)
    val byCodec = o.streams.map(s => s.codec -> s.durationMs).toMap
    assert(byCodec("opus") == 500L && byCodec("vorbis") == 400L)
  }

  test("theora identified; unknown BOS reads codec unknown; garbage no streams") {
    val th = buildOggPage(4L, 0, 0, 2,
      Array[Byte](0x80.toByte) ++ "theora".getBytes("US-ASCII") ++ new Array[Byte](10))
    assert(probeOgg(th).streams.head.codec == "theora")
    val mystery = buildOggPage(6L, 0, 0, 2, Array[Byte](1, 2, 3, 4, 5))
    assert(probeOgg(mystery).streams.head.codec == "unknown")
    assert(probeOgg(null).streams.isEmpty)
    assert(probeOgg("noise but long enough to scan".getBytes("US-ASCII")).streams.isEmpty)
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(Array[Byte](1))
    assert(probeOgg(md5 ++ md5 ++ md5).streams.isEmpty)
  }

  test("multi-segment lacing: a >255-byte packet pages correctly") {
    val s = 8L
    val big = Array.tabulate[Byte](700)(k => (k % 97).toByte)
    val p = buildOggPage(s, 1, 48L * 60L, 0, big)
    // 700 = 2*255 + 190 → 3 lacing values
    assert((p(26) & 0xff) == 3)
    val file = buildOggPage(s, 0, 0, 2, opusHead(1, 0, 48000)) ++ p
    val st = probeOgg(file).streams.head
    assert(st.durationMs == 60L && st.nPages == 2)
  }

  test("generic media_probe dispatches OggS") {
    val s = 2L
    val file = buildOggPage(s, 0, 0, 2, vorbisHead(2, 44100))
    val pr = MediaFormats.probe(file)
    assert(pr.format == "ogg" && pr.channels == 2 && pr.sampleRate == 44100)
  }

  test("ogg tags: both magics, case-insensitive keys, first-key-wins") {
    import MediaFormats.{buildOggComments, probeOggTags}
    val s = 12L
    def file(magic: Array[Byte], head: Array[Byte], comments: Seq[String]) =
      buildOggPage(s, 0, 0, 2, head) ++
        buildOggPage(s, 1, 0, 0, buildOggComments(magic, "vend", comments))
    val opus = file("OpusTags".getBytes("US-ASCII"), opusHead(2, 0, 48000),
      Seq("title=lower wins", "TITLE=second ignored", "Artist=A", "x", "K=V"))
    val t = probeOggTags(opus).head
    assert(t.codec == "opus" && t.vendor == "vend")
    assert(t.title == "lower wins" && t.artist == "A" && t.album == null)
    assert(t.nComments == 5) // malformed 'x' still counts as a complete entry
    val vorb = file(Array[Byte](3) ++ "vorbis".getBytes("US-ASCII"),
      vorbisHead(1, 8000), Seq("ALBUM=B"))
    val v = probeOggTags(vorb).head
    assert(v.codec == "vorbis" && v.album == "B" && v.nComments == 1)
  }

  test("ogg tags: torn comment list keeps complete entries; non-comment page all-null") {
    import MediaFormats.{buildOggComments, probeOggTags}
    val s = 13L
    val block = buildOggComments("OpusTags".getBytes("US-ASCII"), "v",
      Seq("TITLE=T", "ARTIST=A", "ALBUM=Z"))
    var cut = block.length
    while (cut >= 0) {
      val f = buildOggPage(s, 0, 0, 2, opusHead(1, 0, 48000)) ++
        buildOggPage(s, 1, 0, 0, java.util.Arrays.copyOfRange(block, 0, cut))
      val ts = probeOggTags(f)
      assert(ts.size == 1) // never throws, stream always reads
      val t = ts.head
      if (t.nComments != null) assert(t.nComments >= 0 && t.nComments <= 3)
      cut -= 3
    }
    // exactly 4 bytes short: the last comment (ALBUM) drops, rest keep
    val f4 = buildOggPage(s, 0, 0, 2, opusHead(1, 0, 48000)) ++
      buildOggPage(s, 1, 0, 0,
        java.util.Arrays.copyOfRange(block, 0, block.length - 4))
    val t4 = probeOggTags(f4).head
    assert(t4.title == "T" && t4.artist == "A" && t4.album == null &&
      t4.nComments == 2)
    // second page not a comment header: all-null readout, codec stands
    val noTags = buildOggPage(s, 0, 0, 2, opusHead(1, 0, 48000)) ++
      buildOggPage(s, 1, 48L, 4, Array[Byte](9, 9, 9))
    val nt = probeOggTags(noTags).head
    assert(nt.codec == "opus" && nt.vendor == null && nt.nComments == null)
  }

  test("Spark explode path: plants fall out exactly as declared") {
    val spark = graft.operators.SharedSpark.session
    import spark.implicits._
    val docs = Seq(0L, 2L, 3L, 5L, 11L).toDF("doc_id")
    val media = graft.pipeline.Multimodal.synthesizeOggPayloads(docs, "doc_id")
    val got = graft.pipeline.Multimodal.probeOggStreams(media, "payload")
      .select("doc_id", "codec", "duration_ms", "n_pages", "n_bad_pages", "eos")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3), r.getInt(4), r.getBoolean(5))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (2L, "opus", 502L, 4, 0, true),
      (3L, "vorbis", 303L, 4, 0, true),
      (5L, "vorbis", 150L, 3, 0, false),   // torn final page
      (11L, "vorbis", 150L, 3, 1, false))) // CRC-rot final page
  }
}
