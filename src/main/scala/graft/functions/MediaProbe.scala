package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL binary container probing — the byte-level metadata pass a
  * multimodal pipeline runs over 100 TB of blobs BEFORE any GPU decode:
  * identify the format and pull dimensions / audio geometry straight from
  * container headers (what `file`, Pillow's lazy open, and ffprobe's
  * header pass do), needing no codec at all. Filtering "images smaller
  * than 64px" or "audio shorter than 1s" this way reads a few hundred
  * bytes per blob instead of decoding pixels.
  *
  * Formats (headers per the published container specs):
  *  - PNG: 8-byte signature, IHDR width/height (big-endian u32), bit
  *    depth, color type
  *  - JPEG: FFD8 signature, marker walk to the first SOF0/1/2 frame
  *    header → height/width (big-endian u16), components
  *  - GIF: GIF87a/GIF89a, logical-screen width/height (little-endian u16)
  *  - BMP: "BM", BITMAPINFOHEADER width/height (little-endian s32)
  *  - WAV: RIFF/WAVE, fmt chunk → channels, sample rate, bits/sample;
  *    data chunk size → sample count
  *  - FLAC: "fLaC" magic, STREAMINFO block (type 0, 34 bytes) →
  *    sample rate (20 bits), channels (3), bits/sample (5), total
  *    samples (36) from the packed 8-byte field
  *  - MP3: optional ID3v2 tag (syncsafe size, footer flag honored)
  *    skipped, then the first frame header → MPEG version × samplerate
  *    index table, channel mode (bits/sample and duration are not
  *    header-level concepts in MPEG audio → null)
  *  - WebP: RIFF/WEBP, all three flavors — VP8 lossy (start code,
  *    14-bit LE dims), VP8L lossless (packed 14+14-bit dims), VP8X
  *    extended (24-bit LE canvas dims)
  * Unknown / truncated / corrupt payloads yield format "unknown" with
  * null fields — never an exception (a curation pass must survive
  * arbitrary crawled bytes).
  */
object MediaFormats {
  /** (format, width, height, channels, sampleRate, bitsPerSample, nSamples)
    * — image fields null for audio and vice versa. */
  final case class Probe(format: String, width: Integer = null,
                         height: Integer = null, channels: Integer = null,
                         sampleRate: Integer = null, bits: Integer = null,
                         nSamples: java.lang.Long = null)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  def probe(b: Array[Byte]): Probe = {
    if (b == null || b.length < 12) return Probe("unknown")
    if (b.startsWith(PngSig)) parsePng(b)
    else if (u8(b, 0) == 0xff && u8(b, 1) == 0xd8) parseJpeg(b)
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a') parseGif(b)
    else if (b(0) == 'B' && b(1) == 'M') parseBmp(b)
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') parseWav(b)
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P') parseWebp(b)
    else if (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C') parseFlac(b)
    else if ((b(0) == 'I' && b(1) == 'D' && b(2) == '3') ||
      (u8(b, 0) == 0xff && (u8(b, 1) & 0xe0) == 0xe0)) parseMp3(b)
    else if (b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S') {
      // Ogg: the page walk owns the full readout (probeOgg); the
      // generic probe surfaces container identity + first-stream audio
      // shape so mixed-media corpora classify in one pass
      val o = probeOgg(b)
      o.streams.headOption match {
        case Some(s) => Probe("ogg", channels = s.channels,
          sampleRate = s.sampleRate)
        case None => Probe("ogg")
      }
    }
    else if (b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p') {
      // ISO-BMFF: STILL-IMAGE brands (avif/heic — what phone cameras and
      // modern crawls increasingly ship) route to the item-property walk;
      // everything else is the movie path (duration/tracks via probeVideo)
      val brand = fourcc(b, 8)
      if (brand.startsWith("av") || brand.startsWith("he") ||
          brand == "mif1" || brand == "msf1") parseHeifImage(b, brand)
      else {
        val v = probeVideo(b)
        if (v.format == "unknown") Probe("unknown")
        else Probe("mp4", width = v.width, height = v.height)
      }
    }
    else Probe("unknown")
  }

  private def parsePng(b: Array[Byte]): Probe = {
    // signature(8) + chunk length(4) + "IHDR"(4) + width(4) + height(4)
    if (b.length < 26 || !(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
      return Probe("unknown")
    val w = be32(b, 16); val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) Probe("unknown")
    else Probe("png", width = w.toInt, height = h.toInt,
      channels = u8(b, 25) match { // color type → component count
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4; case _ => null
      }, bits = u8(b, 24))
  }

  private def parseJpeg(b: Array[Byte]): Probe = {
    // marker walk: FF D8, then segments FF mk len(be16, incl itself);
    // SOF0/1/2 (C0/C1/C2) carry precision(1) height(2) width(2) ncomp(1).
    // The spec permits any number of 0xFF FILL bytes before a marker —
    // skip them one at a time, never treat a pad byte as a segment.
    var i = 2
    while (i + 9 < b.length) {
      if (u8(b, i) != 0xff) return Probe("unknown")
      var j = i + 1
      while (j < b.length - 8 && u8(b, j) == 0xff) j += 1 // fill bytes
      val mk = u8(b, j)
      i = j - 1
      if (i + 9 >= b.length) return Probe("unknown") // pads ran to the end
      if (mk == 0xd8 || (mk >= 0xd0 && mk <= 0xd7) || mk == 0x01) { i += 2 }
      else if (mk == 0xc0 || mk == 0xc1 || mk == 0xc2) {
        return Probe("jpeg", width = be16(b, i + 7), height = be16(b, i + 5),
          channels = u8(b, i + 9), bits = u8(b, i + 4))
      }
      else if (mk == 0xd9 || mk == 0xda) return Probe("unknown") // EOI/SOS before any SOF
      else {
        val len = be16(b, i + 2)
        if (len < 2) return Probe("unknown") // a segment length below 2 cannot advance
        i += 2 + len
      }
    }
    Probe("unknown")
  }

  private def parseGif(b: Array[Byte]): Probe =
    if (b.length < 10) Probe("unknown")
    else {
      // a zero logical-screen dimension is a corrupt header — same
      // validation convention as the PNG/BMP parsers
      val w = le16(b, 6); val h = le16(b, 8)
      if (w == 0 || h == 0) Probe("unknown") else Probe("gif", width = w, height = h)
    }

  /** WebP (RIFF/WEBP) — the dominant web-crawl image format after JPEG,
    * in all three container flavors per the published bitstream specs:
    * VP8 (lossy — key-frame start code 9d 01 2a, 14-bit LE dims), VP8L
    * (lossless — 0x2f signature, 14+14-bit packed dims, version bits
    * must be 0), VP8X (extended — 24-bit LE canvas dims, the
    * animation/alpha wrapper). Corrupt/torn headers: unknown. */
  private def parseWebp(b: Array[Byte]): Probe = {
    if (b.length < 25) return Probe("unknown")
    val cc = fourcc(b, 12)
    cc match {
      case "VP8 " =>
        // chunk payload at 20: frame tag(3), start code 9d 01 2a,
        // width(le16 & 0x3fff), height(le16 & 0x3fff)
        if (b.length < 30 || u8(b, 23) != 0x9d || u8(b, 24) != 0x01 ||
            u8(b, 25) != 0x2a) return Probe("unknown")
        val w = le16(b, 26) & 0x3fff
        val h = le16(b, 28) & 0x3fff
        if (w == 0 || h == 0) Probe("unknown")
        else Probe("webp", width = w, height = h)
      case "VP8L" =>
        // payload at 20: 0x2f signature, then width-1 (14 bits) and
        // height-1 (14 bits) LSB-first; version bits (3) must be 0
        if (u8(b, 20) != 0x2f) return Probe("unknown")
        val b1 = u8(b, 21); val b2 = u8(b, 22)
        val b3 = u8(b, 23); val b4 = u8(b, 24)
        if (((b4 >> 4) & 7) != 0) return Probe("unknown")
        Probe("webp",
          width = 1 + (((b2 & 0x3f) << 8) | b1),
          height = 1 + (((b4 & 0x0f) << 10) | (b3 << 2) | ((b2 & 0xc0) >> 6)))
      case "VP8X" =>
        // payload at 20: flags(1) reserved(3) canvas w-1 (24-bit LE)
        // h-1 (24-bit LE)
        if (b.length < 30) return Probe("unknown")
        Probe("webp",
          width = 1 + (u8(b, 24) | (u8(b, 25) << 8) | (u8(b, 26) << 16)),
          height = 1 + (u8(b, 27) | (u8(b, 28) << 8) | (u8(b, 29) << 16)))
      case _ => Probe("unknown")
    }
  }

  private def parseBmp(b: Array[Byte]): Probe = {
    if (b.length < 26) return Probe("unknown")
    le32(b, 14) match { // DIB header size discriminates the layout
      case 12 => // BITMAPCOREHEADER (OS/2): u16 dims at 18/20
        val w = le16(b, 18); val h = le16(b, 20)
        if (w <= 0 || h <= 0) Probe("unknown") else Probe("bmp", width = w, height = h)
      case 40 | 52 | 56 | 108 | 124 => // BITMAPINFOHEADER + V2..V5: s32 dims at 18/22
        val w = le32(b, 18); val h = le32(b, 22).toInt
        // height may be negative (top-down rows); magnitude is the dimension
        val hAbs = if (h == Int.MinValue) -1L else math.abs(h).toLong
        if (w <= 0 || w > Int.MaxValue || hAbs <= 0) Probe("unknown")
        else Probe("bmp", width = w.toInt, height = hAbs.toInt)
      case _ => Probe("unknown")
    }
  }

  private def parseWav(b: Array[Byte]): Probe = {
    // chunk walk from offset 12: id(4) size(le32) payload(size, padded).
    // Every step must ADVANCE and stay in bounds: a hostile size field
    // (negative after toInt, or overflowing the walk index) would
    // otherwise hang or throw — the never-throw contract is the point.
    // the index is a Long and le32 yields an UNSIGNED 32-bit Long, so
    // every step advances by >= 8 and can never wrap negative — a hostile
    // 0xFFFFFFF8 size (which as .toInt was -8, a zero-advance hang) just
    // walks past the end and terminates. A declared size beyond the
    // buffer is LEGAL for the final chunk: header-only blobs declare
    // their data payload without carrying it.
    var i = 12L
    var ch: Integer = null; var rate: Long = -1; var bits: Integer = null
    var dataBytes = -1L
    while (i + 8 <= b.length) {
      val id = new String(b, i.toInt, 4, "US-ASCII")
      val size = le32(b, i.toInt + 4)
      if (id == "fmt " && i + 24 <= b.length) {
        ch = le16(b, i.toInt + 10); rate = le32(b, i.toInt + 12); bits = le16(b, i.toInt + 22)
      } else if (id == "data") dataBytes = size
      i += 8 + size + (size & 1)
    }
    if (ch == null || bits == null || ch <= 0 || bits <= 0 ||
      rate <= 0 || rate > Int.MaxValue) Probe("unknown")
    else Probe("wav", channels = ch, sampleRate = rate.toInt, bits = bits,
      nSamples = if (dataBytes < 0) null else java.lang.Long.valueOf(
        dataBytes / math.max(1, ch * bits / 8)))
  }

  private def parseFlac(b: Array[Byte]): Probe = {
    // "fLaC"(4) + block header(4: last-flag|type, be24 length) +
    // STREAMINFO(34): blocks(4) frames(6) then the packed 8 bytes at 18:
    // sampleRate(20) channels-1(3) bits-1(5) totalSamples(36)
    if (b.length < 42) return Probe("unknown")
    if ((u8(b, 4) & 0x7f) != 0) return Probe("unknown") // first block must be STREAMINFO
    val len = (u8(b, 5) << 16) | (u8(b, 6) << 8) | u8(b, 7)
    if (len != 34) return Probe("unknown")
    val sr = (u8(b, 18) << 12) | (u8(b, 19) << 4) | (u8(b, 20) >> 4)
    if (sr == 0) return Probe("unknown") // spec: 0 is invalid
    val ch = ((u8(b, 20) >> 1) & 0x7) + 1
    val bits = (((u8(b, 20) & 1) << 4) | (u8(b, 21) >> 4)) + 1
    val total = ((u8(b, 21) & 0xf).toLong << 32) | (u8(b, 22).toLong << 24) |
      (u8(b, 23) << 16) | (u8(b, 24) << 8) | u8(b, 25)
    Probe("flac", channels = ch, sampleRate = sr, bits = bits,
      nSamples = if (total == 0) null else total) // 0 = "unknown" per spec
  }

  /** (format, durationMs, nTracks, width, height, codec) — the
    * MP4/ISO-BMFF header readout; video fields null when no video track
    * parses. `format = "mp4"` whenever the ftyp box identifies the
    * container even if moov is missing/truncated (header-only blobs and
    * crawl truncations are the NORM; the caller filters on null fields),
    * "unknown" when the bytes are not ISO-BMFF at all. */
  final case class VideoProbe(format: String,
                              durationMs: java.lang.Long = null,
                              nTracks: Integer = null,
                              width: Integer = null, height: Integer = null,
                              codec: String = null)

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** ISO-BMFF (ISO/IEC 14496-12) box walk: ftyp → moov(mvhd, trak(tkhd,
    * …/stbl/stsd)) — duration, track count, video dims (tkhd 16.16
    * fixed), first video sample-entry fourcc. Header-only: no sample
    * data is touched, exactly the pre-GPU-decode pass a crawled-video
    * corpus runs first. Never throws; every size field is read unsigned
    * into a Long and every step must advance, so hostile/truncated
    * sizes terminate the walk instead of hanging it (the WAV-walk
    * discipline). Boxes past a truncation are simply not seen — fields
    * they would have filled stay null. */
  def probeVideo(b: Array[Byte]): VideoProbe = {
    if (b == null || b.length < 16) return VideoProbe("unknown")
    // ftyp must lead (optional free/skip/wide padding tolerated)
    var i = 0L
    var sawFtyp = false
    var durationMs: java.lang.Long = null
    var nTracks = 0
    var sawMoov = false
    var vw: Integer = null; var vh: Integer = null; var vcodec: String = null

    def walk(start: Long, end: Long, onBox: (String, Long, Long) => Unit): Unit =
      boxWalk(b, start, end, onBox)
    def findChild(start: Long, end: Long, tp: String): Option[(Long, Long)] =
      findBox(b, start, end, tp)

    // top level
    walk(0L, b.length.toLong, { (tp, s, e) =>
      tp match {
        case "ftyp" => sawFtyp = true
        case "moov" if sawFtyp =>
          sawMoov = true
          walk(s, e, { (ct, cs, ce) =>
            ct match {
              case "mvhd" if ce - cs >= 20 =>
                val ver = u8(b, cs.toInt)
                val (ts, dur) =
                  if (ver == 1 && ce - cs >= 32)
                    (be32(b, cs.toInt + 20), be64(b, cs.toInt + 24))
                  else (be32(b, cs.toInt + 12), be32(b, cs.toInt + 16))
                if (ts > 0 && dur >= 0 && dur <= Long.MaxValue / 1000L)
                  durationMs = java.lang.Long.valueOf(dur * 1000L / ts)
              case "trak" =>
                nTracks += 1
                var tw = 0; var th = 0
                findChild(cs, ce, "tkhd").foreach { case (ks, ke) =>
                  val ver = u8(b, ks.toInt)
                  val off = if (ver == 1) 88 else 76 // 16.16 width/height
                  if (ke - ks >= off + 8) {
                    tw = (be32(b, ks.toInt + off) >> 16).toInt
                    th = (be32(b, ks.toInt + off + 4) >> 16).toInt
                  }
                }
                if (tw > 0 && th > 0 && vw == null) {
                  vw = tw; vh = th
                  // trak/mdia/minf/stbl/stsd → first sample entry fourcc
                  for {
                    (ms, me) <- findChild(cs, ce, "mdia")
                    (ns, ne) <- findChild(ms, me, "minf")
                    (ss, se) <- findChild(ns, ne, "stbl")
                    (ds, de) <- findChild(ss, se, "stsd")
                    // fullbox(4) + entry_count(4) + entry size(4) + fourcc
                    if de - ds >= 16
                  } vcodec = fourcc(b, ds.toInt + 12)
                }
              case _ =>
            }
          })
        case _ =>
      }
    })
    if (!sawFtyp) VideoProbe("unknown")
    else VideoProbe("mp4", durationMs,
      if (sawMoov) Integer.valueOf(nTracks) else null, vw, vh, vcodec)
  }

  /** AVIF/HEIC still image: dimensions from the item-property chain
    * `meta → iprp → ipco → ispe` (ISO 23008-12). `meta` is a FULLBOX —
    * its children start 4 bytes in (version/flags), the classic walk
    * bug. Multiple `ispe` properties (thumbnails, auxiliaries) are
    * normal: the LARGEST area is the primary image readout — a
    * thumbnail must never masquerade as the picture. Torn files keep
    * the brand identity with null dims (the probeVideo clamp rule). */
  private def parseHeifImage(b: Array[Byte], brand: String): Probe = {
    val fmt =
      if (brand.startsWith("av")) "avif"
      else if (brand.startsWith("he")) "heic"
      else "heif"
    var w: Integer = null
    var h: Integer = null
    var bestArea = -1L
    findBox(b, 0L, b.length.toLong, "meta").foreach { case (ms, me) =>
      if (ms + 4 <= me) findBox(b, ms + 4, me, "iprp").foreach { case (ps, pe) =>
        findBox(b, ps, pe, "ipco").foreach { case (cs, ce) =>
          boxWalk(b, cs, ce, (t, s, e) =>
            if (t == "ispe" && e - s >= 12) {
              val iw = be32(b, s.toInt + 4)
              val ih = be32(b, s.toInt + 8)
              if (iw > 0 && ih > 0 && iw <= Int.MaxValue &&
                  ih <= Int.MaxValue && iw * ih > bestArea) {
                bestArea = iw * ih
                w = Integer.valueOf(iw.toInt)
                h = Integer.valueOf(ih.toInt)
              }
            })
        }
      }
    }
    Probe(fmt, width = w, height = h)
  }

  /** ISO-BMFF child walk over [start, end): calls onBox(fourcc,
    * payloadStart, payloadEnd) per direct child. Size-0 (to-end) and
    * size-1 (64-bit largesize) boxes handled; corrupt sizes terminate;
    * a declared size past the buffer CLAMPS to what arrived (the
    * truncated-download norm — moov commonly trails the file) and inner
    * boxes torn by the same cut clamp recursively. */
  private def boxWalk(b: Array[Byte], start: Long, end: Long,
                      onBox: (String, Long, Long) => Unit): Unit = {
    var p = start
    var steps = 0
    while (p + 8 <= end && steps < 4096) {
      steps += 1
      val size0 = be32(b, p.toInt)
      var hdr = 8L
      var size = size0
      if (size0 == 1L) {
        if (p + 16 > end) return
        size = be64(b, p.toInt + 8); hdr = 16L
      } else if (size0 == 0L) size = end - p // last box runs to the end
      if (size < hdr) return // corrupt size: stop, keep what parsed
      if (p + size > end) {
        onBox(fourcc(b, p.toInt + 4), p + hdr, end)
        return
      }
      onBox(fourcc(b, p.toInt + 4), p + hdr, p + size)
      p += size
    }
  }

  private def findBox(b: Array[Byte], start: Long, end: Long,
                      tp: String): Option[(Long, Long)] = {
    var found: Option[(Long, Long)] = None
    boxWalk(b, start, end, (t, s, e) => if (found.isEmpty && t == tp) found = Some((s, e)))
    found
  }

  /** One media track's SAMPLE-TABLE readout — the frame-accurate pass
    * [[probeVideo]]'s header fields can't give (mvhd duration is the
    * MOVIE's; per-track duration and bitrate live in mdhd + stbl). */
  final case class TrackInfo(trackId: Integer, handler: String,
                             timescale: java.lang.Long,
                             mdhdDurationMs: java.lang.Long,
                             nSamples: java.lang.Long,
                             sttsDurationMs: java.lang.Long,
                             totalBytes: java.lang.Long,
                             bitrateBps: java.lang.Long,
                             nSyncSamples: java.lang.Long = null,
                             maxSyncGap: java.lang.Long = null)

  /** MP4 per-track stts/stsz SAMPLE-TABLE walk (r15 — the r14 verdict's
    * queued item): for each trak, the track id (tkhd), handler fourcc
    * (hdlr: vide/soun/...), media timescale + duration (mdhd, both
    * versions), the frame-accurate sample count and duration summed
    * from the stts time-to-sample table, the total payload bytes from
    * stsz (uniform-size field or the explicit per-sample table), and
    * the bitrate estimate `total·8·timescale DIV Σ(count·delta)`, and
    * the stss SYNC-SAMPLE (keyframe) readout — sync count and the max
    * gap between consecutive sync samples, the seek-granularity /
    * transcode-cost signal; an ABSENT stss means every sample is a
    * sync sample (ISO 14496-12 §8.6.2: n_sync = n_samples, gap 1),
    * while a TORN stss reads null (unknown is never all-sync) —
    * exact integer arithmetic end to end, so the readout hash-gates.
    *
    * Torn-download contract (the [[probeVideo]] discipline): never
    * throws; a field whose box or table bytes did not arrive stays
    * null — a PARTIALLY-readable stts/stsz table reports null, never a
    * partial sum dressed as a total. Hostile entry counts are bounded
    * by the bytes that actually arrived (the declared table must fit
    * inside its box), so no input hangs the walk. Tracks outside a
    * ftyp-led ISO-BMFF container: empty. */
  def probeTracks(b: Array[Byte]): Seq[TrackInfo] = {
    if (b == null || b.length < 16) return Seq.empty
    var sawFtyp = false
    val out = scala.collection.mutable.ArrayBuffer[TrackInfo]()
    boxWalk(b, 0L, b.length.toLong, { (tp, s, e) =>
      tp match {
        case "ftyp" => sawFtyp = true
        case "moov" if sawFtyp =>
          boxWalk(b, s, e, { (ct, cs, ce) =>
            if (ct == "trak") {
              var tid: Integer = null
              findBox(b, cs, ce, "tkhd").foreach { case (ks, ke) =>
                val ver = if (ke - ks >= 1) u8(b, ks.toInt) else -1
                val off = if (ver == 1) 20 else 12 // fullbox + 2 times
                if (ver >= 0 && ke - ks >= off + 4) {
                  val v = be32(b, ks.toInt + off)
                  if (v <= Int.MaxValue) tid = Integer.valueOf(v.toInt)
                }
              }
              var handler: String = null
              var ts: java.lang.Long = null
              var mdhdMs: java.lang.Long = null
              var nSamp: java.lang.Long = null
              var sttsUnits: java.lang.Long = null
              var total: java.lang.Long = null
              var nSync: java.lang.Long = null
              var syncGap: java.lang.Long = null
              findBox(b, cs, ce, "mdia").foreach { case (ms, me) =>
                findBox(b, ms, me, "mdhd").foreach { case (hs, he) =>
                  val ver = if (he - hs >= 1) u8(b, hs.toInt) else -1
                  if (ver == 1 && he - hs >= 32) {
                    val t = be32(b, hs.toInt + 20)
                    val d = be64(b, hs.toInt + 24)
                    if (t > 0) {
                      ts = java.lang.Long.valueOf(t)
                      if (d >= 0 && d <= Long.MaxValue / 1000L)
                        mdhdMs = java.lang.Long.valueOf(d * 1000L / t)
                    }
                  } else if (ver == 0 && he - hs >= 24) {
                    val t = be32(b, hs.toInt + 12)
                    val d = be32(b, hs.toInt + 16)
                    if (t > 0) {
                      ts = java.lang.Long.valueOf(t)
                      mdhdMs = java.lang.Long.valueOf(d * 1000L / t)
                    }
                  }
                }
                findBox(b, ms, me, "hdlr").foreach { case (hs, he) =>
                  if (he - hs >= 12) handler = fourcc(b, hs.toInt + 8)
                }
                for {
                  (ns, ne) <- findBox(b, ms, me, "minf")
                  (ss, se) <- findBox(b, ns, ne, "stbl")
                } {
                  findBox(b, ss, se, "stts").foreach { case (t0, t1) =>
                    if (t1 - t0 >= 8) {
                      val n = be32(b, t0.toInt + 4)
                      // the declared table must FIT in what arrived
                      if (n >= 0 && t0 + 8 + n * 8 <= t1) {
                        var i = 0L; var cnt = 0L; var units = 0L; var ok = true
                        while (i < n && ok) {
                          val c = be32(b, (t0 + 8 + i * 8).toInt)
                          val d = be32(b, (t0 + 12 + i * 8).toInt)
                          cnt += c
                          if (d > 0 && c > Long.MaxValue / d) ok = false
                          else units += c * d
                          if (cnt < 0 || units < 0) ok = false
                          i += 1
                        }
                        if (ok) {
                          nSamp = java.lang.Long.valueOf(cnt)
                          sttsUnits = java.lang.Long.valueOf(units)
                        }
                      }
                    }
                  }
                  var sawStss = false
                  findBox(b, ss, se, "stss").foreach { case (y0, y1) =>
                    sawStss = true
                    if (y1 - y0 >= 8) {
                      val n = be32(b, y0.toInt + 4)
                      if (n >= 0 && y0 + 8 + n * 4 <= y1) {
                        var i = 0L
                        var prev = -1L
                        var maxGap = -1L
                        var ok = true
                        while (i < n && ok) {
                          val v = be32(b, (y0 + 8 + i * 4).toInt)
                          if (prev >= 0) {
                            if (v <= prev) ok = false // must ascend
                            else if (v - prev > maxGap) maxGap = v - prev
                          }
                          prev = v
                          i += 1
                        }
                        if (ok) {
                          nSync = java.lang.Long.valueOf(n)
                          if (maxGap > 0) syncGap = java.lang.Long.valueOf(maxGap)
                        }
                      }
                    }
                  }
                  if (!sawStss && nSamp != null) {
                    // no stss box: every sample IS a sync sample
                    nSync = nSamp
                    if (nSamp >= 2) syncGap = java.lang.Long.valueOf(1L)
                  }
                  findBox(b, ss, se, "stsz").foreach { case (z0, z1) =>
                    if (z1 - z0 >= 12) {
                      val fixed = be32(b, z0.toInt + 4)
                      val n = be32(b, z0.toInt + 8)
                      if (fixed > 0) {
                        if (n >= 0 && (n == 0L || fixed <= Long.MaxValue / n))
                          total = java.lang.Long.valueOf(fixed * n)
                      } else if (n >= 0 && z0 + 12 + n * 4 <= z1) {
                        var i = 0L; var t = 0L; var ok = true
                        while (i < n && ok) {
                          t += be32(b, (z0 + 12 + i * 4).toInt)
                          if (t < 0) ok = false
                          i += 1
                        }
                        if (ok) total = java.lang.Long.valueOf(t)
                      }
                    }
                  }
                }
              }
              val sttsMs: java.lang.Long =
                if (sttsUnits == null || ts == null || ts <= 0 ||
                    sttsUnits > Long.MaxValue / 1000L) null
                else java.lang.Long.valueOf(sttsUnits * 1000L / ts)
              val bitrate: java.lang.Long =
                if (total == null || sttsUnits == null || sttsUnits <= 0 ||
                    ts == null || ts <= 0 ||
                    total > Long.MaxValue / 8L / ts) null
                else java.lang.Long.valueOf(total * 8L * ts / sttsUnits)
              out += TrackInfo(tid, handler, ts, mdhdMs, nSamp, sttsMs,
                total, bitrate, nSync, syncGap)
            }
          })
        case _ =>
      }
    })
    if (!sawFtyp) Seq.empty else out.toSeq
  }

  /** One media track's CHUNK-TABLE readout — the byte-range fetch
    * planning pass: where each track's sample data actually lives. */
  final case class ChunkInfo(trackId: Integer, handler: String,
                             nChunks: java.lang.Long,
                             firstOffset: java.lang.Long,
                             lastOffset: java.lang.Long,
                             chunkSamples: java.lang.Long,
                             maxChunkBytes: java.lang.Long)

  /** MP4 per-track stsc + stco/co64 CHUNK-OFFSET walk (r16 — the last
    * sample-table pieces [[probeTracks]] left out): for each trak, the
    * chunk count and first/last absolute file offsets (stco 32-bit or
    * co64 64-bit — both widths parsed), the TOTAL samples mapped by
    * expanding the stsc sample-to-chunk run-length table across the
    * chunk list (ISO 14496-12 §8.7.4: entry j covers chunks
    * first_chunk_j .. first_chunk_{j+1}-1, the last entry through the
    * end — matching this against stsz's sample count is the
    * consistency audit a fetch planner runs first), and the LARGEST
    * single-chunk byte span (stsc expansion × stsz sizes — the maximum
    * contiguous range one frame-accurate fetch must pull).
    *
    * Torn-table contract (the [[probeTracks]] discipline): never
    * throws; a missing/torn stco/co64 nulls the chunk fields, a
    * missing/torn stsc nulls the mapping fields, a missing stsz or a
    * CONTRADICTORY pair (stsc maps more samples than stsz declares)
    * nulls max_chunk_bytes — partial tables are never dressed as
    * complete plans. All counts are bounded by the bytes that actually
    * arrived (declared tables must fit their boxes), so no input hangs
    * the walk. Non-ISO-BMFF input: empty. */
  def probeChunks(b: Array[Byte]): Seq[ChunkInfo] =
    chunkTables(b).map { t =>
      ChunkInfo(t.tid, t.handler,
        if (t.offsets == null) null
        else java.lang.Long.valueOf(t.offsets.length.toLong),
        if (t.offsets == null || t.offsets.isEmpty) null
        else java.lang.Long.valueOf(t.offsets.head),
        if (t.offsets == null || t.offsets.isEmpty) null
        else java.lang.Long.valueOf(t.offsets.last),
        t.chunkSamples,
        if (t.chunkBytes == null) null
        else java.lang.Long.valueOf(if (t.chunkBytes.isEmpty) 0L
                                    else t.chunkBytes.max))
    }

  /** One chunk's byte range — the row a fetch planner actually issues:
    * chunk ordinal (1-based, the stsc convention), absolute offset,
    * samples inside, and the contiguous byte span (null when stsz is
    * missing/contradictory). */
  final case class ChunkRange(trackId: Integer, handler: String,
                              chunk: Int, offset: Long, nSamples: Long,
                              chunkBytes: java.lang.Long)

  /** The [[probeChunks]] tables EXPLODED per chunk — the concrete
    * byte-range fetch plan. Tracks whose stco/co64 or stsc is
    * missing/torn contribute no rows (no offsets or no mapping = no
    * plan — the torn contract at row granularity). */
  def probeChunkRanges(b: Array[Byte]): Seq[ChunkRange] =
    chunkTables(b).flatMap { t =>
      if (t.offsets == null || t.perChunk == null) Seq.empty
      else t.offsets.indices.map { k =>
        ChunkRange(t.tid, t.handler, k + 1, t.offsets(k), t.perChunk(k),
          if (t.chunkBytes == null) null
          else java.lang.Long.valueOf(t.chunkBytes(k)))
      }
    }

  /** Raw per-trak chunk tables: `perChunk`/`chunkSamples` null when
    * stsc is missing/torn/out-of-range, `chunkBytes` null when stsz is
    * missing or contradicts the stsc expansion. */
  private final case class ChunkTables(tid: Integer, handler: String,
                                       offsets: Array[Long],
                                       perChunk: Array[Long],
                                       chunkBytes: Array[Long],
                                       chunkSamples: java.lang.Long)

  private def chunkTables(b: Array[Byte]): Seq[ChunkTables] = {
    if (b == null || b.length < 16) return Seq.empty
    var sawFtyp = false
    val out = scala.collection.mutable.ArrayBuffer[ChunkTables]()
    boxWalk(b, 0L, b.length.toLong, { (tp, s, e) =>
      tp match {
        case "ftyp" => sawFtyp = true
        case "moov" if sawFtyp =>
          boxWalk(b, s, e, { (ct, cs, ce) =>
            if (ct == "trak") {
              var tid: Integer = null
              findBox(b, cs, ce, "tkhd").foreach { case (ks, ke) =>
                val ver = if (ke - ks >= 1) u8(b, ks.toInt) else -1
                val off = if (ver == 1) 20 else 12
                if (ver >= 0 && ke - ks >= off + 4) {
                  val v = be32(b, ks.toInt + off)
                  if (v <= Int.MaxValue) tid = Integer.valueOf(v.toInt)
                }
              }
              var handler: String = null
              var offsets: Array[Long] = null   // absolute chunk offsets
              var stscRuns: Array[(Long, Long)] = null // (first_chunk, spc)
              var stszFixed = -1L
              var stszSizes: Array[Long] = null
              findBox(b, cs, ce, "mdia").foreach { case (ms, me) =>
                findBox(b, ms, me, "hdlr").foreach { case (hs, he) =>
                  if (he - hs >= 12) handler = fourcc(b, hs.toInt + 8)
                }
                for {
                  (ns, ne) <- findBox(b, ms, me, "minf")
                  (ss, se) <- findBox(b, ns, ne, "stbl")
                } {
                  findBox(b, ss, se, "stco").foreach { case (c0, c1) =>
                    if (c1 - c0 >= 8) {
                      val n = be32(b, c0.toInt + 4)
                      if (n >= 0 && c0 + 8 + n * 4 <= c1)
                        offsets = Array.tabulate(n.toInt)(i =>
                          be32(b, (c0 + 8 + i * 4L).toInt))
                    }
                  }
                  if (offsets == null)
                    findBox(b, ss, se, "co64").foreach { case (c0, c1) =>
                      if (c1 - c0 >= 8) {
                        val n = be32(b, c0.toInt + 4)
                        if (n >= 0 && c0 + 8 + n * 8 <= c1) {
                          val a = Array.tabulate(n.toInt)(i =>
                            be64(b, (c0 + 8 + i * 8L).toInt))
                          // a negative 64-bit offset is hostile, not a file
                          if (a.forall(_ >= 0)) offsets = a
                        }
                      }
                    }
                  findBox(b, ss, se, "stsc").foreach { case (t0, t1) =>
                    if (t1 - t0 >= 8) {
                      val n = be32(b, t0.toInt + 4)
                      if (n >= 0 && t0 + 8 + n * 12 <= t1) {
                        val runs = Array.tabulate(n.toInt) { j =>
                          (be32(b, (t0 + 8 + j * 12L).toInt),
                            be32(b, (t0 + 12 + j * 12L).toInt))
                        }
                        // ISO: first entry starts at chunk 1, strictly
                        // ascending first_chunk — anything else is torn
                        val ok = runs.nonEmpty && runs.head._1 == 1L &&
                          runs.iterator.zip(runs.iterator.drop(1))
                            .forall { case (a2, b2) => a2._1 < b2._1 } &&
                          runs.forall(_._2 >= 0)
                        if (ok) stscRuns = runs
                      }
                    }
                  }
                  findBox(b, ss, se, "stsz").foreach { case (z0, z1) =>
                    if (z1 - z0 >= 12) {
                      val fixed = be32(b, z0.toInt + 4)
                      val n = be32(b, z0.toInt + 8)
                      if (fixed > 0) stszFixed = fixed
                      else if (n >= 0 && z0 + 12 + n * 4 <= z1)
                        stszSizes = Array.tabulate(n.toInt)(i =>
                          be32(b, (z0 + 12 + i * 4L).toInt))
                    }
                  }
                }
              }
              var perChunk: Array[Long] = null
              var chunkBytes: Array[Long] = null
              var chunkSamples: java.lang.Long = null
              if (offsets != null && stscRuns != null &&
                  stscRuns.forall(_._1 <= offsets.length)) {
                // expand runs across the chunk list: per-chunk sample
                // counts (bounded by n_chunks — no declared run can
                // reach past the offsets that actually arrived)
                val nc = offsets.length
                val pc = new Array[Long](nc)
                var j = 0
                var ok = true
                var total = 0L
                while (j < stscRuns.length && ok) {
                  val from = stscRuns(j)._1
                  val until = if (j + 1 < stscRuns.length) stscRuns(j + 1)._1
                              else nc + 1L
                  val spc = stscRuns(j)._2
                  var c = from
                  while (c < until && ok) {
                    pc((c - 1).toInt) = spc
                    total += spc
                    if (total < 0) ok = false
                    c += 1
                  }
                  j += 1
                }
                if (ok) {
                  perChunk = pc
                  chunkSamples = java.lang.Long.valueOf(total)
                  // per-chunk byte spans from stsz
                  if (stszFixed > 0) {
                    if (pc.forall(_ <= Long.MaxValue / stszFixed))
                      chunkBytes = pc.map(_ * stszFixed)
                  } else if (stszSizes != null && total <= stszSizes.length) {
                    val cb = new Array[Long](nc)
                    var s2 = 0
                    var c = 0
                    var ok2 = true
                    while (c < nc && ok2) {
                      var k = 0L
                      var bytes = 0L
                      while (k < pc(c) && ok2) {
                        bytes += stszSizes(s2); s2 += 1; k += 1
                        if (bytes < 0) ok2 = false
                      }
                      cb(c) = bytes
                      c += 1
                    }
                    if (ok2) chunkBytes = cb
                  }
                }
              }
              out += ChunkTables(tid, handler, offsets, perChunk,
                chunkBytes, chunkSamples)
            }
          })
        case _ =>
      }
    })
    if (!sawFtyp) Seq.empty else out.toSeq
  }

  /** ID3v2 tag readout: the big-3 text frames + frame census. */
  final case class Id3Info(hasId3: Boolean, version: Integer,
                           title: String, artist: String, album: String,
                           nFrames: java.lang.Long)

  /** ID3v2.3/2.4 TEXT-FRAME walk (r16 — the audio metadata pass next
    * to the EXIF walk): frames of `id(4) size(4) flags(2) body`, size
    * big-endian plain in v2.3 and SYNCSAFE in v2.4 (the two diverge
    * past 127 bytes — both paths carry real traffic), text frames
    * decoded per their encoding byte (0 ISO-8859-1, 1 UTF-16 w/BOM,
    * 2 UTF-16BE, 3 UTF-8), trailing NULs stripped. TIT2/TPE1/TALB
    * surface as title/artist/album (first occurrence wins); `n_frames`
    * counts every COMPLETE frame.
    *
    * Torn contract (the [[Warc.parse]] discipline for list walks):
    * never throws; the walk stops at the first frame whose declared
    * size runs past the bytes that arrived — complete frames keep
    * their fields, the torn frame contributes nothing. Padding (a NUL
    * where a frame id should be) ends the walk; v2.2 (3-byte ids) is
    * identified by version but not walked. Non-ID3 input:
    * `hasId3 = false`, all fields null. */
  def probeId3(b: Array[Byte]): Id3Info = {
    if (b == null || b.length < 10 ||
        !(b(0) == 'I' && b(1) == 'D' && b(2) == '3'))
      return Id3Info(hasId3 = false, null, null, null, null, null)
    val ver = u8(b, 3)
    val tagSize = ((u8(b, 6) & 0x7f) << 21) | ((u8(b, 7) & 0x7f) << 14) |
      ((u8(b, 8) & 0x7f) << 7) | (u8(b, 9) & 0x7f)
    val end = math.min(b.length.toLong, 10L + tagSize)
    if (ver < 3 || ver > 4)
      return Id3Info(hasId3 = true, Integer.valueOf(ver), null, null, null, null)
    var p = 10L
    var frames = 0L
    var title: String = null
    var artist: String = null
    var album: String = null
    var ok = true
    while (ok && p + 10 <= end) {
      val id = new String(b, p.toInt, 4, "US-ASCII")
      if (!id.forall(c => (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')))
        ok = false // padding or rot: the walk ends
      else {
        val fsize: Long =
          if (ver == 4)
            ((u8(b, p.toInt + 4) & 0x7f).toLong << 21) |
              ((u8(b, p.toInt + 5) & 0x7f) << 14) |
              ((u8(b, p.toInt + 6) & 0x7f) << 7) | (u8(b, p.toInt + 7) & 0x7f)
          else be32(b, p.toInt + 4)
        if (fsize < 0 || p + 10 + fsize > end) ok = false // torn: stop
        else {
          frames += 1
          if (id.charAt(0) == 'T' && fsize >= 1 &&
              (title == null || artist == null || album == null)) {
            val enc = u8(b, p.toInt + 10)
            val off = p.toInt + 11
            val len = (fsize - 1).toInt
            val cs = enc match {
              case 0 => "ISO-8859-1"
              case 1 => "UTF-16"   // BOM-led
              case 2 => "UTF-16BE"
              case 3 => "UTF-8"
              case _ => null
            }
            if (cs != null) {
              var t = new String(b, off, len, cs)
              while (t.nonEmpty && t.charAt(t.length - 1) == '\u0000')
                t = t.substring(0, t.length - 1)
              id match {
                case "TIT2" => if (title == null) title = t
                case "TPE1" => if (artist == null) artist = t
                case "TALB" => if (album == null) album = t
                case _ =>
              }
            }
          }
          p += 10 + fsize
        }
      }
    }
    Id3Info(hasId3 = true, Integer.valueOf(ver), title, artist, album,
      java.lang.Long.valueOf(frames))
  }

  // ---------------------------------------------------------------
  // PNG text-chunk metadata (the EXIF/ID3 counterpart for PNG)
  // ---------------------------------------------------------------

  /** PNG metadata readout: dims from IHDR plus the standard text
    * keywords out of tEXt/zTXt/iTXt chunks, each chunk CRC-verified. */
  final case class PngMeta(hasPng: Boolean, width: Integer, height: Integer,
                           title: String, author: String, description: String,
                           software: String, nTextChunks: Integer,
                           nBadCrc: Integer)

  /** The PNG chunk walk (ISO 15948 §5): length-framed chunks from byte
    * 8, each gated by its own CRC-32 (the standard reflected zlib CRC
    * over type+data — a rotted chunk is COUNTED and SKIPPED, its
    * length framing still trusted so neighbors keep); complete chunks
    * only (a torn tail ends the walk); text decoded from all three
    * forms — tEXt (Latin-1), zTXt (Latin-1 behind a REAL zlib
    * inflate), iTXt (UTF-8, optionally zlib-compressed) — standard
    * keywords Title/Author/Description/Software surfaced, first
    * occurrence wins; an undecodable compressed payload drops that
    * chunk from the text count (never garbage text). Per-chunk 128 MB
    * inflate cap. Never throws. */
  def probePngMeta(b: Array[Byte]): PngMeta = {
    if (b == null || b.length < 8 || !b.startsWith(PngSig))
      return PngMeta(hasPng = false, null, null, null, null, null, null,
        null, null)
    var width: Integer = null
    var height: Integer = null
    var title: String = null
    var author: String = null
    var description: String = null
    var software: String = null
    var nText = 0
    var nBad = 0
    var i = 8
    var done = false
    while (!done && i + 12 <= b.length) {
      val clen = be32(b, i)
      if (clen < 0 || clen > Int.MaxValue - 12 || i + 12 + clen > b.length)
        done = true // torn: complete chunks only
      else {
        val dataOff = i + 8
        val crc = new java.util.zip.CRC32()
        crc.update(b, i + 4, 4 + clen.toInt)
        if (crc.getValue != be32(b, dataOff + clen.toInt)) {
          nBad += 1 // rot: counted, skipped, framing still trusted
        } else {
          val t = new String(b, i + 4, 4, "US-ASCII")
          t match {
            case "IHDR" if clen >= 13 =>
              val w = be32(b, dataOff); val h = be32(b, dataOff + 4)
              if (w > 0 && w <= Int.MaxValue) width = Integer.valueOf(w.toInt)
              if (h > 0 && h <= Int.MaxValue) height = Integer.valueOf(h.toInt)
            case "IEND" => done = true
            case "tEXt" | "zTXt" | "iTXt" =>
              val kv = pngTextChunk(t, b, dataOff, clen.toInt)
              if (kv != null) {
                nText += 1
                kv._1 match {
                  case "Title" => if (title == null) title = kv._2
                  case "Author" => if (author == null) author = kv._2
                  case "Description" => if (description == null) description = kv._2
                  case "Software" => if (software == null) software = kv._2
                  case _ =>
                }
              }
            case _ =>
          }
        }
        i += 12 + clen.toInt
      }
    }
    PngMeta(hasPng = true, width, height, title, author, description,
      software, Integer.valueOf(nText), Integer.valueOf(nBad))
  }

  /** Decode one text chunk's (keyword, value); null when malformed or
    * the compressed payload doesn't inflate to its deflate end. */
  private def pngTextChunk(t: String, b: Array[Byte], off: Int,
                           len: Int): (String, String) = {
    var z = off
    val end = off + len
    while (z < end && b(z) != 0) z += 1
    if (z >= end) return null // no keyword terminator
    val keyword = new String(b, off, z - off, "ISO-8859-1")
    t match {
      case "tEXt" =>
        (keyword, new String(b, z + 1, end - z - 1, "ISO-8859-1"))
      case "zTXt" =>
        if (z + 2 > end || b(z + 1) != 0) return null // method must be 0
        val raw = pngInflate(b, z + 2, end - z - 2)
        if (raw == null) null else (keyword, new String(raw, "ISO-8859-1"))
      case "iTXt" =>
        if (z + 3 > end) return null
        val compFlag = u8(b, z + 1)
        val compMethod = u8(b, z + 2)
        var p = z + 3
        while (p < end && b(p) != 0) p += 1 // language tag
        if (p >= end) return null
        p += 1
        while (p < end && b(p) != 0) p += 1 // translated keyword
        if (p >= end) return null
        p += 1
        if (compFlag == 0)
          (keyword, new String(b, p, end - p, "UTF-8"))
        else if (compFlag == 1 && compMethod == 0) {
          val raw = pngInflate(b, p, end - p)
          if (raw == null) null else (keyword, new String(raw, "UTF-8"))
        } else null
      case _ => null
    }
  }

  private def pngInflate(b: Array[Byte], off: Int, len: Int): Array[Byte] = {
    if (len <= 0) return null
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(b, off, len)
      val bos = new java.io.ByteArrayOutputStream(math.min(len * 4, 1 << 16))
      val buf = new Array[Byte](8192)
      var dead = false
      while (!inf.finished() && !dead) {
        val n = try inf.inflate(buf)
                catch { case _: java.util.zip.DataFormatException => -1 }
        if (n < 0) dead = true
        else if (n == 0) { if (inf.needsInput() || inf.needsDictionary()) dead = true }
        else if (bos.size().toLong + n > (128L << 20)) dead = true
        else bos.write(buf, 0, n)
      }
      if (dead || !inf.finished()) null else bos.toByteArray
    } finally inf.end()
  }

  /** One PNG chunk (the exporter twin): length + type + data + the
    * real CRC the walk must verify. */
  def buildPngChunk(ctype: String, data: Array[Byte]): Array[Byte] = {
    require(ctype.length == 4, "chunk type is 4 chars")
    val out = new Array[Byte](12 + data.length)
    var k = 0
    while (k < 4) { out(k) = ((data.length >> (8 * (3 - k))) & 0xff).toByte; k += 1 }
    ctype.getBytes("US-ASCII").copyToArray(out, 4)
    System.arraycopy(data, 0, out, 8, data.length)
    val crc = new java.util.zip.CRC32()
    crc.update(out, 4, 4 + data.length)
    val c = crc.getValue
    k = 0
    while (k < 4) { out(8 + data.length + k) = ((c >> (8 * (3 - k))) & 0xff).toByte; k += 1 }
    out
  }

  /** Splice chunks into a real PNG immediately before its IEND. */
  def pngInsertChunks(png: Array[Byte], chunks: Seq[Array[Byte]]): Array[Byte] = {
    var i = 8
    var at = -1
    while (at < 0 && i + 12 <= png.length) {
      val clen = be32(png, i)
      if (png(i + 4) == 'I' && png(i + 5) == 'E' && png(i + 6) == 'N' &&
          png(i + 7) == 'D') at = i
      else if (clen < 0 || i + 12 + clen > png.length) at = png.length
      else i += 12 + clen.toInt
    }
    if (at < 0) at = png.length
    png.take(at) ++ chunks.flatten ++ png.drop(at)
  }

  // ---------------------------------------------------------------
  // Ogg (RFC 3533) — the container Opus/Vorbis audio ships in
  // ---------------------------------------------------------------

  /** One logical stream's readout: codec from its BOS packet, duration
    * from the LAST CRC-verified data-page granule (null when no data
    * page with a positive granule arrived — header pages carry granule
    * 0, and unknown is never a duration). */
  final case class OggStream(serial: Long, codec: String, channels: Integer,
                             sampleRate: Integer, durationMs: java.lang.Long,
                             nPages: Int, eos: Boolean)
  final case class OggInfo(nBadPages: Int, streams: Seq[OggStream])

  /** CRC-32, poly 0x04c11db7, no reflection, zero init/xorout — the
    * Ogg page checksum (NOT the zip CRC). */
  private val oggCrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var k = 0
      while (k < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        k += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  /** Page CRC over `len` bytes at `off`, the stored crc field (bytes
    * 22..25 of the page) read as zero per RFC 3533 §6. */
  private[functions] def oggCrc(b: Array[Byte], off: Int, len: Int): Int = {
    var r = 0
    var i = 0
    while (i < len) {
      val v = if (i >= 22 && i <= 25) 0 else b(off + i) & 0xff
      r = (r << 8) ^ oggCrcTable(((r >>> 24) ^ v) & 0xff)
      i += 1
    }
    r
  }

  /** The Ogg page walk: complete, CRC-VERIFIED pages only (a bad
    * checksum is COUNTED and the walk resyncs at the next capture
    * pattern — the demuxer discipline; a torn tail ends the walk at the
    * last complete page). Per logical stream (serial): codec identified
    * from the BOS packet head (`OpusHead`, `\x01vorbis`,
    * `\x80theora`), channels/rate from the same header, duration from
    * the max data-page granule — Opus at the 48 kHz granule clock minus
    * pre-skip, Vorbis at its declared sample rate, both exact integer
    * floor-div; EOS reports whether the stream's closing page arrived
    * (a torn download loses it — completeness is visible, not
    * guessed). Never throws. */
  /** The shared CRC-gated page iteration: `f(serial, htype, granule,
    * payloadOff, payloadLen)` per complete verified page in document
    * order; returns the bad-page count. The resync/torn discipline
    * documented on [[probeOgg]] lives here. */
  private def walkOggPages(b: Array[Byte])
      (f: (Long, Int, Long, Int, Int) => Unit): Int = {
    if (b == null) return 0
    var nBad = 0
    var i = 0
    var done = false
    while (!done && i + 27 <= b.length) {
      if (b(i) == 'O' && b(i + 1) == 'g' && b(i + 2) == 'g' &&
          b(i + 3) == 'S' && u8(b, i + 4) == 0) {
        val nsegs = u8(b, i + 26)
        if (i + 27 + nsegs > b.length) done = true // torn header: walk ends
        else {
          var body = 0
          var k = 0
          while (k < nsegs) { body += u8(b, i + 27 + k); k += 1 }
          val total = 27 + nsegs + body
          if (i + total > b.length) done = true // torn body: complete pages only
          else if (oggCrc(b, i, total) != le32(b, i + 22).toInt) {
            nBad += 1
            i += 1 // resync at the next capture pattern
          } else {
            val htype = u8(b, i + 5)
            val granule = le32(b, i + 6) | (le32(b, i + 10) << 32)
            val serial = le32(b, i + 14)
            f(serial, htype, granule, i + 27 + nsegs, body)
            i += total
          }
        }
      } else i += 1
    }
    nBad
  }

  def probeOgg(b: Array[Byte]): OggInfo = {
    if (b == null || b.length < 27) return OggInfo(0, Seq.empty)
    final class Acc {
      var codec: String = "unknown"
      var channels: Integer = null
      var rate: Integer = null
      var preSkip: Int = 0
      var lastGranule: Long = -1L
      var nPages: Int = 0
      var eos: Boolean = false
    }
    val accs = scala.collection.mutable.LinkedHashMap[Long, Acc]()
    val nBad = walkOggPages(b) { (serial, htype, granule, p, body) =>
      {
        val acc = accs.getOrElseUpdate(serial, new Acc)
        acc.nPages += 1
        if ((htype & 4) != 0) acc.eos = true
        if ((htype & 2) != 0) {
              // BOS: the first packet head names the codec
              if (body >= 19 && b(p) == 'O' && b(p + 1) == 'p' &&
                  b(p + 2) == 'u' && b(p + 3) == 's' && b(p + 4) == 'H' &&
                  b(p + 5) == 'e' && b(p + 6) == 'a' && b(p + 7) == 'd') {
                acc.codec = "opus"
                acc.channels = Integer.valueOf(u8(b, p + 9))
                acc.preSkip = le16(b, p + 10)
                acc.rate = Integer.valueOf(le32(b, p + 12).toInt)
              } else if (body >= 16 && u8(b, p) == 1 && b(p + 1) == 'v' &&
                  b(p + 2) == 'o' && b(p + 3) == 'r' && b(p + 4) == 'b' &&
                  b(p + 5) == 'i' && b(p + 6) == 's') {
                acc.codec = "vorbis"
                acc.channels = Integer.valueOf(u8(b, p + 11))
                acc.rate = Integer.valueOf(le32(b, p + 12).toInt)
              } else if (body >= 7 && u8(b, p) == 0x80 && b(p + 1) == 't' &&
                  b(p + 2) == 'h' && b(p + 3) == 'e' && b(p + 4) == 'o' &&
                  b(p + 5) == 'r' && b(p + 6) == 'a') {
                acc.codec = "theora"
              }
            } else if (granule > 0 && granule > acc.lastGranule) {
              acc.lastGranule = granule
            }
      }
    }
    val streams = accs.map { case (serial, a) =>
      val dur: java.lang.Long =
        if (a.lastGranule < 0) null
        else a.codec match {
          case "opus" =>
            val s = math.max(0L, a.lastGranule - a.preSkip)
            java.lang.Long.valueOf(Math.floorDiv(s * 1000L, 48000L))
          case "vorbis" if a.rate != null && a.rate.intValue() > 0 =>
            java.lang.Long.valueOf(
              Math.floorDiv(a.lastGranule * 1000L, a.rate.longValue()))
          case _ => null
        }
      OggStream(serial, a.codec, a.channels, a.rate, dur, a.nPages, a.eos)
    }.toSeq
    OggInfo(nBad, streams)
  }

  /** One stream's comment-header readout (the ID3 twin for the Ogg
    * world): vendor + the standard TITLE/ARTIST/ALBUM keys +
    * complete-comment count. */
  final case class OggTags(serial: Long, codec: String, vendor: String,
                           title: String, artist: String, album: String,
                           nComments: Integer)

  /** Vorbis-comment / OpusTags metadata walk: per logical stream the
    * SECOND verified page's packet — `OpusTags` or `\x03vorbis` — is
    * the comment header (the protocol's fixed packet order), carrying
    * `vendor_len u32 | vendor | n u32 | (len u32 | "KEY=value")…` all
    * little-endian, values UTF-8. Complete-comments-only: a declared
    * length past the bytes that arrived drops THAT comment and ends
    * the walk (a torn tag list keeps what landed — `n_comments` counts
    * complete entries, never the declaration); keys match
    * case-insensitively per spec; a stream whose second page is not a
    * comment header reads all-null with `n_comments` null. Rides the
    * same CRC-gated page walk as [[probeOgg]]. */
  def probeOggTags(b: Array[Byte]): Seq[OggTags] = {
    if (b == null || b.length < 27) return Seq.empty
    final class Acc {
      var codec: String = "unknown"
      var pageIdx: Int = 0
      var tagsOff: Int = -1
      var tagsLen: Int = 0
    }
    val accs = scala.collection.mutable.LinkedHashMap[Long, Acc]()
    walkOggPages(b) { (serial, htype, _, p, body) =>
      val acc = accs.getOrElseUpdate(serial, new Acc)
      if ((htype & 2) != 0 && body >= 8) {
        if (b(p) == 'O' && b(p + 1) == 'p' && b(p + 2) == 'u' &&
            b(p + 3) == 's' && b(p + 4) == 'H') acc.codec = "opus"
        else if (u8(b, p) == 1 && b(p + 1) == 'v') acc.codec = "vorbis"
      } else if (acc.pageIdx == 1) { acc.tagsOff = p; acc.tagsLen = body }
      acc.pageIdx += 1
    }
    accs.map { case (serial, a) =>
      // the comment block starts after the packet magic
      val magic =
        if (a.tagsOff >= 0 && a.tagsLen >= 8 && b(a.tagsOff) == 'O' &&
            b(a.tagsOff + 1) == 'p' && b(a.tagsOff + 2) == 'u' &&
            b(a.tagsOff + 3) == 's' && b(a.tagsOff + 4) == 'T' &&
            b(a.tagsOff + 5) == 'a' && b(a.tagsOff + 6) == 'g' &&
            b(a.tagsOff + 7) == 's') 8
        else if (a.tagsOff >= 0 && a.tagsLen >= 7 && u8(b, a.tagsOff) == 3 &&
            b(a.tagsOff + 1) == 'v' && b(a.tagsOff + 2) == 'o' &&
            b(a.tagsOff + 3) == 'r' && b(a.tagsOff + 4) == 'b' &&
            b(a.tagsOff + 5) == 'i' && b(a.tagsOff + 6) == 's') 7
        else -1
      if (magic < 0) OggTags(serial, a.codec, null, null, null, null, null)
      else {
        val end = a.tagsOff + a.tagsLen
        var q = a.tagsOff + magic
        var vendor: String = null
        var title: String = null
        var artist: String = null
        var album: String = null
        var n = 0
        if (q + 4 <= end) {
          val vlen = le32(b, q).toInt
          q += 4
          if (vlen >= 0 && q + vlen <= end) {
            vendor = new String(b, q, vlen, "UTF-8")
            q += vlen
            if (q + 4 <= end) {
              val declared = le32(b, q)
              q += 4
              var k = 0L
              var ok = true
              while (ok && k < declared && q + 4 <= end) {
                val clen = le32(b, q).toInt
                q += 4
                if (clen < 0 || q + clen > end) ok = false // torn: keep complete
                else {
                  val c = new String(b, q, clen, "UTF-8")
                  q += clen
                  n += 1
                  val eq = c.indexOf('=')
                  if (eq > 0) {
                    val key = c.substring(0, eq).toUpperCase(java.util.Locale.ROOT)
                    val v = c.substring(eq + 1)
                    key match {
                      case "TITLE" => if (title == null) title = v
                      case "ARTIST" => if (artist == null) artist = v
                      case "ALBUM" => if (album == null) album = v
                      case _ =>
                    }
                  }
                  k += 1
                }
              }
            }
          }
        }
        OggTags(serial, a.codec, vendor, title, artist, album,
          Integer.valueOf(n))
      }
    }.toSeq
  }

  /** The comment block bytes (the exporter twin of [[probeOggTags]]):
    * magic + vendor + the KEY=value list, little-endian lengths. */
  def buildOggComments(magic: Array[Byte], vendor: String,
                       comments: Seq[String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le32w(v: Int): Unit = {
      var k = 0
      while (k < 4) { bos.write((v >> (8 * k)) & 0xff); k += 1 }
    }
    bos.write(magic, 0, magic.length)
    val vb = vendor.getBytes("UTF-8")
    le32w(vb.length); bos.write(vb, 0, vb.length)
    le32w(comments.size)
    comments.foreach { c =>
      val cb = c.getBytes("UTF-8")
      le32w(cb.length); bos.write(cb, 0, cb.length)
    }
    bos.toByteArray
  }

  /** One Ogg page (the exporter twin): header + lacing + payload with
    * the real RFC 3533 checksum — what [[probeOgg]] must verify. */
  def buildOggPage(serial: Long, seq: Long, granule: Long, htype: Int,
                   payload: Array[Byte]): Array[Byte] = {
    require(payload.length < 255 * 255, "single-packet builder")
    val full = payload.length / 255
    val segs = Array.fill[Byte](full)(255.toByte) :+ (payload.length % 255).toByte
    val page = new Array[Byte](27 + segs.length + payload.length)
    page(0) = 'O'; page(1) = 'g'; page(2) = 'g'; page(3) = 'S'
    page(4) = 0; page(5) = htype.toByte
    var k = 0
    while (k < 8) { page(6 + k) = ((granule >> (8 * k)) & 0xff).toByte; k += 1 }
    k = 0
    while (k < 4) {
      page(14 + k) = ((serial >> (8 * k)) & 0xff).toByte
      page(18 + k) = ((seq >> (8 * k)) & 0xff).toByte
      k += 1
    }
    page(26) = segs.length.toByte
    System.arraycopy(segs, 0, page, 27, segs.length)
    System.arraycopy(payload, 0, page, 27 + segs.length, payload.length)
    val c = oggCrc(page, 0, page.length)
    k = 0
    while (k < 4) { page(22 + k) = ((c >> (8 * k)) & 0xff).toByte; k += 1 }
    page
  }

  private def parseMp3(b: Array[Byte]): Probe = {
    // optional ID3v2: "ID3" ver(2) flags(1) syncsafe-size(4); footer flag
    // (0x10) adds 10 more. Then the 4-byte frame header.
    var i = 0
    if (b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((u8(b, 6) & 0x7f) << 21) | ((u8(b, 7) & 0x7f) << 14) |
        ((u8(b, 8) & 0x7f) << 7) | (u8(b, 9) & 0x7f)
      i = 10 + size + (if ((u8(b, 5) & 0x10) != 0) 10 else 0)
    }
    if (i < 0 || i + 3 >= b.length) return Probe("unknown")
    if (u8(b, i) != 0xff || (u8(b, i + 1) & 0xe0) != 0xe0) return Probe("unknown")
    val verBits = (u8(b, i + 1) >> 3) & 3 // 0=MPEG2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    if (verBits == 1) return Probe("unknown")
    if (((u8(b, i + 1) >> 1) & 3) == 0) return Probe("unknown") // reserved layer
    val srIdx = (u8(b, i + 2) >> 2) & 3
    if (srIdx == 3) return Probe("unknown") // reserved samplerate index
    if (((u8(b, i + 2) >> 4) & 0xf) == 0xf) return Probe("unknown") // bad bitrate index
    val sr = verBits match {
      case 3 => Array(44100, 48000, 32000)(srIdx)
      case 2 => Array(22050, 24000, 16000)(srIdx)
      case _ => Array(11025, 12000, 8000)(srIdx)
    }
    val mode = (u8(b, i + 3) >> 6) & 3 // 3 = mono
    Probe("mp3", channels = if (mode == 3) 1 else 2, sampleRate = sr,
      nSamples = mp3SampleCount(b, i))
  }

  /** CBR/VBR-correct Layer III FRAME WALK (r16 — the duration estimate
    * the single-header read can't give): hop frame to frame by each
    * frame's OWN header-declared length (144000·kbps/rate + padding for
    * MPEG1; 72000·kbps/rate for MPEG2/2.5), counting COMPLETE frames ×
    * samples-per-frame (1152 MPEG1 / 576 MPEG2/2.5). A torn tail keeps
    * the frames that fully arrived (the WARC-walk discipline); a free-
    * bitrate or malformed header stops the hop — zero complete frames
    * reads null, never a fabricated duration. Duration follows as
    * n_samples·1000/sample_rate on the caller's side. */
  private def mp3SampleCount(b: Array[Byte], start: Int): java.lang.Long = {
    // O(1) VBR shortcut first: a Xing (VBR) / Info (CBR) header in the
    // FIRST frame's side-info region declares the TOTAL frame count —
    // exact for VBR files the CBR hop would mis-estimate, and no walk
    // at all. Offset = 4 + side-info size (MPEG1: 17 mono / 32 else;
    // MPEG2/2.5: 9 mono / 17 else); tag, flags(4 BE), frames(4 BE)
    // when flags bit 0 is set.
    if (start + 4 <= b.length && u8(b, start) == 0xff &&
        (u8(b, start + 1) & 0xe0) == 0xe0) {
      val ver = (u8(b, start + 1) >> 3) & 3
      val mono = ((u8(b, start + 3) >> 6) & 3) == 3
      if (ver != 1) {
        val side = if (ver == 3) { if (mono) 17 else 32 }
                   else { if (mono) 9 else 17 }
        val x = start + 4 + side
        if (x + 12 <= b.length) {
          val tag = new String(b, x, 4, "US-ASCII")
          if (tag == "Xing" || tag == "Info") {
            val flags = be32(b, x + 4)
            if ((flags & 1L) != 0) {
              val fr = be32(b, x + 8)
              val spf = if (ver == 3) 1152L else 576L
              if (fr > 0) return java.lang.Long.valueOf(fr * spf)
            }
          }
        }
      }
    }
    var p = start
    var frames = 0L
    var samples = 0L
    var ok = true
    while (ok && p + 4 <= b.length) {
      if (u8(b, p) != 0xff || (u8(b, p + 1) & 0xe0) != 0xe0) ok = false
      else {
        val ver = (u8(b, p + 1) >> 3) & 3
        val layer = (u8(b, p + 1) >> 1) & 3
        val bIdx = (u8(b, p + 2) >> 4) & 0xf
        val sIdx = (u8(b, p + 2) >> 2) & 3
        if (ver == 1 || layer != 1 || bIdx == 0 || bIdx == 15 || sIdx == 3)
          ok = false // reserved / non-LayerIII / free or bad bitrate: no hop
        else {
          val rate = ver match {
            case 3 => Array(44100, 48000, 32000)(sIdx)
            case 2 => Array(22050, 24000, 16000)(sIdx)
            case _ => Array(11025, 12000, 8000)(sIdx)
          }
          val kbps =
            if (ver == 3)
              Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)(bIdx)
            else
              Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)(bIdx)
          val pad = (u8(b, p + 2) >> 1) & 1
          val flen = (if (ver == 3) 144000L else 72000L) * kbps / rate + pad
          if (flen <= 4 || p + flen > b.length) ok = false // torn tail: stop
          else {
            frames += 1
            samples += (if (ver == 3) 1152L else 576L)
            p += flen.toInt
          }
        }
      }
    }
    if (frames == 0) null else java.lang.Long.valueOf(samples)
  }
}

/** id3_tags(binary) → struct<has_id3, version, title, artist, album,
  * n_frames> — [[MediaFormats.probeId3]] as a scalar expression (pure
  * map; tag-only reads, audio frames never touched). */
case class Id3Probe(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def nullSafeEval(input: Any): Any = {
    val t = MediaFormats.probeId3(input.asInstanceOf[Array[Byte]])
    InternalRow(t.hasId3, t.version,
      if (t.title == null) null else UTF8String.fromString(t.title),
      if (t.artist == null) null else UTF8String.fromString(t.artist),
      if (t.album == null) null else UTF8String.fromString(t.album),
      t.nFrames)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"id3_tags expects BINARY, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("has_id3", BooleanType, nullable = false),
    StructField("version", IntegerType, nullable = true),
    StructField("title", StringType, nullable = true),
    StructField("artist", StringType, nullable = true),
    StructField("album", StringType, nullable = true),
    StructField("n_frames", LongType, nullable = true)))
  override protected def withNewChildInternal(newChild: Expression): Id3Probe =
    copy(child = newChild)
  override def prettyName: String = "id3_tags"
}

/** ogg_streams(binary) → struct<n_bad_pages, streams: array<struct<
  * serial, codec, channels, sample_rate, duration_ms, n_pages, eos>>> —
  * [[MediaFormats.probeOgg]] as a scalar expression: CRC-verified page
  * walk, per-logical-stream readout, empty streams on non-Ogg bytes.
  * Pure map. */
case class OggProbe(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def nullSafeEval(input: Any): Any = {
    val o = MediaFormats.probeOgg(input.asInstanceOf[Array[Byte]])
    InternalRow(o.nBadPages, new GenericArrayData(o.streams.map { s =>
      InternalRow(s.serial, UTF8String.fromString(s.codec),
        if (s.channels == null) null else s.channels.intValue(),
        if (s.sampleRate == null) null else s.sampleRate.intValue(),
        if (s.durationMs == null) null else s.durationMs.longValue(),
        s.nPages, s.eos)
    }.toArray[Any]))
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ogg_streams expects BINARY, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_bad_pages", IntegerType, nullable = false),
    StructField("streams", ArrayType(StructType(Seq(
      StructField("serial", LongType, nullable = false),
      StructField("codec", StringType, nullable = false),
      StructField("channels", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("n_pages", IntegerType, nullable = false),
      StructField("eos", BooleanType, nullable = false))),
      containsNull = false), nullable = false)))
  override protected def withNewChildInternal(newChild: Expression): OggProbe =
    copy(child = newChild)
  override def prettyName: String = "ogg_streams"
}

/** png_meta(binary) → struct<has_png, width, height, title, author,
  * description, software, n_text_chunks, n_bad_crc> —
  * [[MediaFormats.probePngMeta]] as a scalar expression: per-chunk
  * CRC gate, all three text-chunk forms. Pure map. */
case class PngMetaProbe(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def nullSafeEval(input: Any): Any = {
    val m = MediaFormats.probePngMeta(input.asInstanceOf[Array[Byte]])
    def s(x: String) = if (x == null) null else UTF8String.fromString(x)
    def iv(x: Integer) = if (x == null) null else x.intValue()
    InternalRow(m.hasPng, iv(m.width), iv(m.height), s(m.title),
      s(m.author), s(m.description), s(m.software), iv(m.nTextChunks),
      iv(m.nBadCrc))
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"png_meta expects BINARY, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("has_png", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("title", StringType, nullable = true),
    StructField("author", StringType, nullable = true),
    StructField("description", StringType, nullable = true),
    StructField("software", StringType, nullable = true),
    StructField("n_text_chunks", IntegerType, nullable = true),
    StructField("n_bad_crc", IntegerType, nullable = true)))
  override protected def withNewChildInternal(newChild: Expression): PngMetaProbe =
    copy(child = newChild)
  override def prettyName: String = "png_meta"
}

/** ogg_tags(binary) → array<struct<serial, codec, vendor, title,
  * artist, album, n_comments>> — [[MediaFormats.probeOggTags]] as a
  * scalar expression: one element per logical stream, complete
  * comments only. Pure map. */
case class OggTagsProbe(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def nullSafeEval(input: Any): Any = {
    val ts = MediaFormats.probeOggTags(input.asInstanceOf[Array[Byte]])
    new GenericArrayData(ts.map { t =>
      def s(x: String) = if (x == null) null else UTF8String.fromString(x)
      InternalRow(t.serial, UTF8String.fromString(t.codec), s(t.vendor),
        s(t.title), s(t.artist), s(t.album),
        if (t.nComments == null) null else t.nComments.intValue())
    }.toArray[Any])
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ogg_tags expects BINARY, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("serial", LongType, nullable = false),
    StructField("codec", StringType, nullable = false),
    StructField("vendor", StringType, nullable = true),
    StructField("title", StringType, nullable = true),
    StructField("artist", StringType, nullable = true),
    StructField("album", StringType, nullable = true),
    StructField("n_comments", IntegerType, nullable = true))),
    containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): OggTagsProbe =
    copy(child = newChild)
  override def prettyName: String = "ogg_tags"
}

/** media_probe(binary) → struct<format, width, height, channels,
  * sample_rate, bits_per_sample, n_samples> — [[MediaFormats.probe]] as a
  * scalar expression (pure map over the blob column; header-only reads). */
case class MediaProbe(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def nullSafeEval(input: Any): Any = {
    val p = MediaFormats.probe(input.asInstanceOf[Array[Byte]])
    InternalRow(UTF8String.fromString(p.format), p.width, p.height,
      p.channels, p.sampleRate, p.bits,
      if (p.nSamples == null) null else p.nSamples.longValue())
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"media_probe expects BINARY, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("bits_per_sample", IntegerType, nullable = true),
    StructField("n_samples", LongType, nullable = true)))
  override protected def withNewChildInternal(newChild: Expression): MediaProbe =
    copy(child = newChild)
  override def prettyName: String = "media_probe"
}

/** video_probe(binary) → struct<format, duration_ms, n_tracks, width,
  * height, codec> — [[MediaFormats.probeVideo]] as a scalar expression:
  * the MP4/ISO-BMFF twin of media_probe (pure map, header-only; no
  * sample data read). */
case class VideoProbe(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def nullSafeEval(input: Any): Any = {
    val p = MediaFormats.probeVideo(input.asInstanceOf[Array[Byte]])
    InternalRow(UTF8String.fromString(p.format),
      if (p.durationMs == null) null else p.durationMs.longValue(),
      p.nTracks, p.width, p.height,
      if (p.codec == null) null else UTF8String.fromString(p.codec))
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"video_probe expects BINARY, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("duration_ms", LongType, nullable = true),
    StructField("n_tracks", IntegerType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("codec", StringType, nullable = true)))
  override protected def withNewChildInternal(newChild: Expression): VideoProbe =
    copy(child = newChild)
  override def prettyName: String = "video_probe"
}

/** video_tracks(binary) → array<struct<track_id, handler, timescale,
  * mdhd_duration_ms, n_samples, stts_duration_ms, total_bytes,
  * bitrate_bps>> — [[MediaFormats.probeTracks]] as a scalar expression
  * (pure map; metadata-only reads, sample data never touched). Empty
  * array on non-ISO-BMFF input; per-field nulls on torn boxes. */
case class VideoTracksProbe(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def nullSafeEval(input: Any): Any = {
    val tracks = MediaFormats.probeTracks(input.asInstanceOf[Array[Byte]])
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      tracks.map { t =>
        InternalRow(t.trackId,
          if (t.handler == null) null else UTF8String.fromString(t.handler),
          t.timescale, t.mdhdDurationMs, t.nSamples, t.sttsDurationMs,
          t.totalBytes, t.bitrateBps, t.nSyncSamples, t.maxSyncGap)
      }.toArray[Any])
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"video_tracks expects BINARY, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("track_id", IntegerType, nullable = true),
    StructField("handler", StringType, nullable = true),
    StructField("timescale", LongType, nullable = true),
    StructField("mdhd_duration_ms", LongType, nullable = true),
    StructField("n_samples", LongType, nullable = true),
    StructField("stts_duration_ms", LongType, nullable = true),
    StructField("total_bytes", LongType, nullable = true),
    StructField("bitrate_bps", LongType, nullable = true),
    StructField("n_sync_samples", LongType, nullable = true),
    StructField("max_sync_gap", LongType, nullable = true))),
    containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): VideoTracksProbe =
    copy(child = newChild)
  override def prettyName: String = "video_tracks"
}

/** video_chunks(binary) → array<struct<track_id, handler, n_chunks,
  * first_offset, last_offset, chunk_samples, max_chunk_bytes>> —
  * [[MediaFormats.probeChunks]] as a scalar expression: the stsc +
  * stco/co64 byte-range fetch-planning readout (pure map; metadata-only
  * reads, sample data never touched). Empty array on non-ISO-BMFF
  * input; per-field nulls on missing/torn/contradictory tables. */
case class VideoChunksProbe(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def nullSafeEval(input: Any): Any = {
    val chunks = MediaFormats.probeChunks(input.asInstanceOf[Array[Byte]])
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      chunks.map { c =>
        InternalRow(c.trackId,
          if (c.handler == null) null else UTF8String.fromString(c.handler),
          c.nChunks, c.firstOffset, c.lastOffset, c.chunkSamples,
          c.maxChunkBytes)
      }.toArray[Any])
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"video_chunks expects BINARY, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("track_id", IntegerType, nullable = true),
    StructField("handler", StringType, nullable = true),
    StructField("n_chunks", LongType, nullable = true),
    StructField("first_offset", LongType, nullable = true),
    StructField("last_offset", LongType, nullable = true),
    StructField("chunk_samples", LongType, nullable = true),
    StructField("max_chunk_bytes", LongType, nullable = true))),
    containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): VideoChunksProbe =
    copy(child = newChild)
  override def prettyName: String = "video_chunks"
}

/** video_chunk_ranges(binary) → array<struct<track_id, handler, chunk,
  * offset, n_samples, chunk_bytes>> — [[MediaFormats.probeChunkRanges]]
  * as a scalar expression: the per-chunk byte-range FETCH PLAN (pure
  * map; metadata-only reads). Tracks without offsets or mapping
  * contribute no rows; chunk_bytes null when stsz is
  * missing/contradictory. */
case class VideoChunkRangesProbe(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def nullSafeEval(input: Any): Any = {
    val rs = MediaFormats.probeChunkRanges(input.asInstanceOf[Array[Byte]])
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      rs.map { r =>
        InternalRow(r.trackId,
          if (r.handler == null) null else UTF8String.fromString(r.handler),
          r.chunk, r.offset, r.nSamples, r.chunkBytes)
      }.toArray[Any])
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"video_chunk_ranges expects BINARY, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("track_id", IntegerType, nullable = true),
    StructField("handler", StringType, nullable = true),
    StructField("chunk", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("chunk_bytes", LongType, nullable = true))),
    containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): VideoChunkRangesProbe =
    copy(child = newChild)
  override def prettyName: String = "video_chunk_ranges"
}
