package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{GraftShim => E}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC (ISO 28500) crawl-archive records — the container Common Crawl
  * and every self-hosted fetch fleet actually ship, and therefore the
  * FIRST parse a crawl-to-corpus pipeline runs. The record grammar is
  * byte-level and public: `WARC/1.x CRLF`, header lines `Name: value
  * CRLF`, a blank line, exactly `Content-Length` payload bytes, then
  * CRLF CRLF before the next record.
  *
  * Spark-first shape: a WARC member is a BYTE STREAM whose record
  * boundaries are only discoverable by walking it, so the unit of
  * parallelism is the FILE/blob (exactly how Common Crawl distributes —
  * ~1 GB gzip members; one task per member is the ecosystem-standard
  * split), and the per-blob walk is a pure scalar expression:
  * `warc_records(binary)` → array of typed record structs, exploded by
  * [[records]]. No mapPartitions, no driver parsing — the walk rides
  * whole-stage-adjacent codegen like the media probes.
  *
  * Torn-download contract (the [[graft.functions.MediaFormats]]
  * discipline): never throws; parsing stops cleanly at the first
  * malformed or truncated record (a record is returned only when its
  * ENTIRE declared payload and trailing CRLFs arrived — a partial
  * payload is never dressed as a complete fetch), so a torn blob yields
  * the records that fully landed. Hostile Content-Length values are
  * Long-checked against the buffer, header/record counts are bounded by
  * byte consumption — no input hangs the walk. */
object Warc {

  final case class Record(warcType: String, targetUri: String,
                          contentType: String, contentLength: Long,
                          payload: Array[Byte])

  private val MaxHeaderLine = 8192

  /** Decompression-bomb ceiling PER RECORD (128 MB of inflated payload —
    * far above any sane record, far below heap). The cap is deliberately
    * per-record, NOT per-member: real Common Crawl members are ~1 GB gzip
    * inflating to several GB of small records, so a whole-member cap
    * would silently drop the source's flagship input (the r15 finding).
    * A record whose DECLARED length exceeds the cap is skipped and
    * COUNTED (never thrown — the torn/hostile contract), visible through
    * [[WarcScan]]'s `n_dropped`. */
  private[sources] val MaxRecordInflated = 128L << 20

  /** The byte walk: complete records parsed from one WARC member —
    * [[parseWithStats]] without the drop accounting. */
  def parse(raw: Array[Byte]): Seq[Record] = parseWithStats(raw)._1

  /** STREAMING record walk over one WARC member: gzip members (1f 8b
    * magic — a `.warc.gz` is a CONCATENATION of per-record gzip members,
    * exactly how Common Crawl ships) inflate INCREMENTALLY through a
    * rolling buffer, so peak memory is one record (≤ `maxRecordBytes` +
    * header slack), never the whole inflated member — a 1 GB member of
    * small records walks in bounded space no matter what it inflates to.
    *
    * Returns (complete records, n_dropped) where `n_dropped` counts
    * records whose declared Content-Length exceeded `maxRecordBytes`
    * (skipped in O(1) memory, the walk continues behind them). Torn
    * members still stop cleanly at the first incomplete record — torn is
    * NOT counted as dropped (nothing was declared complete); a mid-skip
    * tear IS counted (the oversize record was declared). Gzip tail
    * corruption keeps the records that fully inflated. */
  def parseWithStats(raw: Array[Byte],
                     maxRecordBytes: Long = MaxRecordInflated): (Seq[Record], Long) = {
    if (raw == null || raw.length < 12) return (Seq.empty, 0L)
    val in: java.io.InputStream =
      if ((raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b)
        try new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(raw), 65536)
        catch { case _: java.io.IOException => return (Seq.empty, 0L) }
      else new java.io.ByteArrayInputStream(raw)
    walk(in, maxRecordBytes)
  }

  /** The incremental walk over an inflating stream. Rolling buffer:
    * `buf[start, end)` holds unconsumed bytes; `fillOnce` compacts and
    * grows on demand (growth is bounded by the per-record cap because
    * oversize records are SKIPPED, never buffered). */
  private def walk(in: java.io.InputStream,
                   maxRecordBytes: Long): (Seq[Record], Long) = {
    val out = scala.collection.mutable.ArrayBuffer[Record]()
    var dropped = 0L
    var buf = new Array[Byte](65536)
    var start = 0
    var end = 0
    var eof = false

    def avail: Int = end - start
    def fillOnce(): Unit = {
      if (start > 0 && (end == buf.length || start == end)) {
        System.arraycopy(buf, start, buf, 0, end - start)
        end -= start; start = 0
      }
      if (end == buf.length)
        buf = java.util.Arrays.copyOf(buf, buf.length * 2)
      // a hostile/torn gzip tail mid-stream ends the walk but KEEPS the
      // records that fully inflated (the old whole-blob inflate was
      // all-or-nothing; streaming is exactly what makes partial keep safe)
      val r = try in.read(buf, end, buf.length - end)
              catch { case _: java.io.IOException => -1 }
      if (r < 0) eof = true else end += r
    }
    def ensure(n: Long): Boolean = {
      while (avail < n && !eof) fillOnce()
      avail >= n
    }
    // relative index of the CR of the next CRLF within MaxHeaderLine, or -1
    def lineEnd(): Int = {
      var i = 0
      while (i <= MaxHeaderLine) {
        if (!ensure(i + 2L)) return -1
        if (buf(start + i) == '\r' && buf(start + i + 1) == '\n') return i
        i += 1
      }
      -1
    }
    // one CRLF-terminated line consumed off the front, or null
    def readLine(): String = {
      val e = lineEnd()
      if (e < 0) null
      else { val s = new String(buf, start, e, "UTF-8"); start += e + 2; s }
    }
    // advance past n bytes (buffered first, then read-and-discard — an
    // oversize skip inflates but never RETAINS); false if the stream
    // ended short (the skipped record was itself torn)
    def consume(n: Long): Boolean = {
      var left = n
      val b = math.min(left, avail.toLong).toInt
      start += b; left -= b
      while (left > 0 && !eof) {
        start = 0; end = 0
        val r = try in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
                catch { case _: java.io.IOException => -1 }
        if (r < 0) eof = true else left -= r
      }
      left == 0
    }

    var go = true
    while (go) {
      go = false
      if (ensure(12)) {
        val ver = readLine()
        if (ver != null && (ver == "WARC/1.0" || ver == "WARC/1.1")) {
          var warcType: String = null
          var uri: String = null
          var ctype: String = null
          var clen = -1L
          var headersOk = true
          var inHeaders = true
          var lines = 0
          while (inHeaders && headersOk && lines < 256) {
            lines += 1
            val line = readLine()
            if (line == null) headersOk = false
            else if (line.isEmpty) inHeaders = false
            else {
              val colon = line.indexOf(':')
              if (colon <= 0) headersOk = false
              else {
                val name = line.substring(0, colon).trim.toLowerCase
                val value = line.substring(colon + 1).trim
                name match {
                  case "warc-type" => warcType = value
                  case "warc-target-uri" => uri = value
                  case "content-type" => ctype = value
                  case "content-length" =>
                    clen = try value.toLong catch { case _: Exception => -1L }
                  case _ =>
                }
              }
            }
          }
          if (headersOk && !inHeaders && clen >= 0 && clen <= Long.MaxValue - 4) {
            if (clen > maxRecordBytes) {
              // declared oversize: skip + COUNT, keep walking behind it
              dropped += 1
              go = consume(clen + 4)
            } else if (ensure(clen + 4) &&
                buf(start + clen.toInt) == '\r' &&
                buf(start + clen.toInt + 1) == '\n' &&
                buf(start + clen.toInt + 2) == '\r' &&
                buf(start + clen.toInt + 3) == '\n') {
              // a record COMPLETES only if the declared payload and the
              // trailing CRLF CRLF fully arrived
              out += Record(warcType, uri, ctype, clen,
                java.util.Arrays.copyOfRange(buf, start, start + clen.toInt))
              start += clen.toInt + 4
              go = true
            }
          }
        }
      }
    }
    (out.toSeq, dropped)
  }

  /** Explode [[WarcRecords]] over a payload column: one row per COMPLETE
    * record — blobs with no parseable records yield no rows (the
    * torn/garbage contract). Pure map + explode; stream-safe. */
  def records(blobs: DataFrame, payloadCol: String): DataFrame =
    blobs.withColumn("__r",
        explode(E.column(WarcRecords(E.expression(col(payloadCol))))))
      .select(blobs.columns.filterNot(_ == payloadCol).map(col).toSeq :+ col("__r.*"): _*)

  /** Read a directory of WARC members (one blob per file via Spark's
    * binaryFile source — the one-task-per-member split Common Crawl's
    * ~1 GB gzip members distribute as) and explode records. */
  def read(spark: SparkSession, path: String): DataFrame =
    records(spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content").as("payload")), "payload")

  /** Serialize rows into spec-exact WARC bytes — the builder half of the
    * round-trip gate (and a real exporter: corpus → WARC interchange).
    * One member per input row group is the caller's repartition choice;
    * this builds ONE member from (type, uri, payload) rows. */
  def buildMember(records: Seq[(String, String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    records.foreach { case (tp, uri, payload) =>
      val hdr = new StringBuilder()
        .append("WARC/1.0\r\n")
        .append(s"WARC-Type: $tp\r\n")
        .append(s"WARC-Target-URI: $uri\r\n")
        .append("Content-Type: text/plain\r\n")
        .append(s"Content-Length: ${payload.length}\r\n")
        .append("\r\n")
      bos.write(hdr.toString.getBytes("US-ASCII"))
      bos.write(payload)
      bos.write("\r\n\r\n".getBytes("US-ASCII"))
    }
    bos.toByteArray
  }

  /** [[buildMember]] as per-record gzip members concatenated — the
    * `.warc.gz` layout Common Crawl ships (each record its own gzip
    * member, so record-level random access survives compression). */
  def buildMemberGz(records: Seq[(String, String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(buildMember(Seq(r)))
      gz.finish()
    }
    bos.toByteArray
  }

  /** Per-blob scan accounting over a payload column: one row per blob
    * with `n_records` (complete), `n_dropped` (declared-oversize skips)
    * and `payload_bytes` (sum of complete Content-Lengths) — the LOUD
    * half of the per-record cap: a pipeline that gates `n_dropped > 0`
    * (or just sums it next to its row counts) can never mistake a
    * cap-tripped crawl for an empty one. Pure map; stream-safe. */
  def scanStats(blobs: DataFrame, payloadCol: String,
                maxRecordBytes: Long = MaxRecordInflated): DataFrame =
    blobs.withColumn("__s",
        E.column(WarcScan(E.expression(col(payloadCol)), maxRecordBytes)))
      .select(blobs.columns.filterNot(_ == payloadCol).map(col).toSeq :+ col("__s.*"): _*)

  /** Split [[HttpResponse]] over a payload column (typically the
    * `payload` of a `response` record): status, content_type, body —
    * non-HTTP payloads yield null fields (the caller filters). */
  def httpSplit(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("__h", E.column(HttpResponse(E.expression(col(payloadCol)))))
      .select(df.columns.filterNot(_ == payloadCol).map(col).toSeq :+ col("__h.*"): _*)

  /** WARC members whose response payloads are full HTTP responses over
    * id-derived HTML — the crawl-chain fixture: status 200 text/html
    * with a script-wrapped body for most ids, a 404 on id%29==0, an
    * application/pdf (junk bytes) on id%29==3. All members complete
    * (torn/garbage plants live in [[synthesizeWarcPayloads]]). */
  def synthesizeWarcHttpPayloads(docs: DataFrame, idCol: String,
                                 textCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)].map { case (id, text) =>
        val uri = s"https://example.com/page/$id"
        val (status, ctype, body) =
          if (id % 29 == 0) (404, "text/html", "not found".getBytes("UTF-8"))
          else if (id % 29 == 3)
            (200, "application/pdf",
              ("%PDF-1.4 " + id.toString).getBytes("UTF-8"))
          else
            (200, "text/html; charset=utf-8",
              (s"<html><head><script>var v=$id;</script></head><body><p>" +
                text + "</p>&nbsp;tail</body></html>").getBytes("UTF-8"))
        val http = (s"HTTP/1.1 $status X\r\nContent-Type: $ctype\r\n" +
          s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII") ++ body
        (id, buildMember(Seq(("response", uri, http))))
      }.toDF("doc_id", "payload")
  }

  /** Dechunk a `Transfer-Encoding: chunked` stream from `off`:
    * (bytes of the COMPLETE chunks, complete-chunk count, reached the
    * 0-terminator?). Complete-chunks-only: a size line or chunk body
    * that didn't fully arrive ends the walk — what landed is returned,
    * the `terminated` flag says whether the entity is whole. Chunk
    * extensions (`;…`) skipped, trailers ignored, hostile sizes
    * Long-checked. Never throws. */
  private[sources] def dechunk(b: Array[Byte], off: Int): (Array[Byte], Int, Boolean) = {
    val bos = new java.io.ByteArrayOutputStream()
    var p = off
    var n = 0
    var term = false
    var ok = true
    def hexVal(c: Byte): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else -1
    while (ok && !term) {
      var q = p
      var size = 0L
      var digits = 0
      while (q < b.length && hexVal(b(q)) >= 0 && digits <= 8) {
        size = size * 16 + hexVal(b(q)); q += 1; digits += 1
      }
      if (digits == 0 || digits > 8) ok = false
      else {
        // skip any chunk extension up to the CRLF (bounded)
        val extEnd = q + 1024
        while (q + 1 < b.length && q < extEnd &&
          !(b(q) == '\r' && b(q + 1) == '\n')) q += 1
        if (!(q + 1 < b.length && b(q) == '\r' && b(q + 1) == '\n')) ok = false
        else {
          q += 2
          if (size == 0) term = true // trailers ignored
          else if (q.toLong + size + 2 > b.length) ok = false // incomplete
          else {
            val e = q + size.toInt
            if (!(b(e) == '\r' && b(e + 1) == '\n')) ok = false
            else { bos.write(b, q, size.toInt); n += 1; p = e + 2 }
          }
        }
      }
    }
    (bos.toByteArray, n, term)
  }

  /** Whole-entity gunzip, fully-decoded-or-null: a `Content-Encoding:
    * gzip` body either inflates to its stream end (CRC verified by the
    * JDK reader) or reads null — a truncated or bit-rotted entity is
    * never dressed as text. 128 MB cap (the per-unit convention). */
  private[sources] def gunzipEntity(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 18) return null
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      val bos = new java.io.ByteArrayOutputStream(math.min(b.length * 4, 1 << 20))
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      var dead = false
      while (n >= 0 && !dead) {
        if (bos.size().toLong + n > MaxRecordInflated) dead = true
        else { bos.write(buf, 0, n); n = in.read(buf) }
      }
      in.close()
      if (dead) null else bos.toByteArray
    } catch { case _: java.io.IOException => null }
  }

  /** Resolve the charset an HTML/text HTTP body must decode with —
    * the HTML5 precedence a crawl text pass actually needs: 1) the
    * `charset=` parameter on the Content-Type header, 2) a BOM, 3) a
    * `<meta charset=…>` / `<meta http-equiv=content-type …>` tag in
    * the first 1024 bytes, 4) the windows-1252 legacy default. The
    * HTML5 ALIAS RULE is applied: `iso-8859-1`/`latin1`/`us-ascii`
    * labels decode as windows-1252 (browsers never decode true
    * Latin-1 — 0x80–0x9F are cp1252's €, œ, –, …), an unknown label
    * falls through to the next source. Returns (java charset label
    * lowercased, source ∈ header|bom|meta|default, bytes to skip). */
  private[sources] def resolveCharset(contentType: String,
                                      body: Array[Byte]): (String, String, Int) = {
    def mapLabel(l: String): String = l.toLowerCase(java.util.Locale.ROOT) match {
      case "utf-8" | "utf8" => "utf-8"
      case "iso-8859-1" | "latin1" | "us-ascii" | "ascii" |
           "windows-1252" | "cp1252" => "windows-1252"
      case "utf-16" | "utf-16be" => "utf-16be"
      case "utf-16le" => "utf-16le"
      case "iso-8859-15" | "latin9" => "iso-8859-15"
      case _ => null
    }
    val headerRe = "(?i)charset\\s*=\\s*\"?([A-Za-z0-9._:-]+)\"?".r
    if (contentType != null) {
      headerRe.findFirstMatchIn(contentType)
        .map(m => mapLabel(m.group(1))).filter(_ != null) match {
        case Some(cs) => return (cs, "header", 0)
        case None =>
      }
    }
    if (body != null && body.length >= 2) {
      if (body.length >= 3 && (body(0) & 0xff) == 0xef &&
          (body(1) & 0xff) == 0xbb && (body(2) & 0xff) == 0xbf)
        return ("utf-8", "bom", 3)
      if ((body(0) & 0xff) == 0xfe && (body(1) & 0xff) == 0xff)
        return ("utf-16be", "bom", 2)
      if ((body(0) & 0xff) == 0xff && (body(1) & 0xff) == 0xfe)
        return ("utf-16le", "bom", 2)
    }
    if (body != null && body.length > 0) {
      val win = new String(body, 0, math.min(body.length, 1024), "ISO-8859-1")
        .toLowerCase(java.util.Locale.ROOT)
      val metaRe = "<meta\\s+charset\\s*=\\s*[\"']?([a-z0-9._:-]+)".r
      val equivRe = ("<meta[^>]*http-equiv\\s*=\\s*[\"']?content-type[\"']?" +
        "[^>]*content\\s*=\\s*[\"'][^\"']*charset=([a-z0-9._:-]+)").r
      val hit = metaRe.findFirstMatchIn(win).map(_.group(1))
        .orElse(equivRe.findFirstMatchIn(win).map(_.group(1)))
        .map(mapLabel).filter(_ != null)
      hit match {
        case Some(cs) => return (cs, "meta", 0)
        case None =>
      }
    }
    ("windows-1252", "default", 0)
  }

  private[sources] def javaCharset(label: String): java.nio.charset.Charset =
    label match {
      case "utf-8" => java.nio.charset.StandardCharsets.UTF_8
      case "windows-1252" => java.nio.charset.Charset.forName("windows-1252")
      case "utf-16be" => java.nio.charset.StandardCharsets.UTF_16BE
      case "utf-16le" => java.nio.charset.StandardCharsets.UTF_16LE
      case "iso-8859-15" => java.nio.charset.Charset.forName("ISO-8859-15")
      case _ => java.nio.charset.StandardCharsets.UTF_8
    }

  /** [[HttpText]] over a payload column: the full wire-to-string pass
    * (dechunk → gunzip → charset-resolve → decode). */
  def httpText(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("__h", E.column(HttpText(E.expression(col(payloadCol)))))
      .select(df.columns.filterNot(_ == payloadCol).map(col).toSeq :+ col("__h.*"): _*)

  /** WARC members exercising the CHARSET precedence ladder — the
    * [[httpText]] fixture, id%6 routes: 0 utf-8 via header (full
    * unicode), 1 windows-1252 via header (€ œ – live in 0x80–0x9F),
    * 2 the HTML5 ALIAS RULE (bytes are cp1252, the header LIES
    * `iso-8859-1` — browsers decode cp1252 and so must we, or € reads
    * as a control char), 3 `<meta charset>` with no header param,
    * 4 no declaration anywhere → the windows-1252 legacy default,
    * 5 a UTF-8 BOM with no header/meta. Plant: id%37==0 md5 garbage
    * (no record). */
  def synthesizeWarcHttpCharsetPayloads(docs: DataFrame,
                                        idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val payload =
        if (id % 37 == 0)
          java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes("US-ASCII")) ++ new Array[Byte](8)
        else {
          val route = (id % 6).toInt
          val (ctype, body) = route match {
            case 0 => ("text/html; charset=utf-8",
              s"Café № δοκιμή 😀 $id".getBytes("UTF-8"))
            case 1 => ("text/html; charset=windows-1252",
              s"Café œuvre €99 – dash $id".getBytes("windows-1252"))
            case 2 => ("text/html; charset=iso-8859-1",
              s"Alias € äöü $id".getBytes("windows-1252"))
            case 3 => ("text/html",
              s"""<meta charset="utf-8"><p>Mütze δ $id</p>""".getBytes("UTF-8"))
            case 4 => ("text/html",
              s"Plain fallback ± $id".getBytes("windows-1252"))
            case _ => ("text/html",
              Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
                s"Bom ✓ $id".getBytes("UTF-8"))
          }
          val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n" +
            s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII") ++ body
          buildMember(Seq(("response", s"https://example.com/cs/$id", http)))
        }
      (id, payload)
    }.toDF("doc_id", "payload")
  }

  /** Split + DECODE an HTTP response body ([[HttpBody]]): status,
    * content type, the transfer/content encodings applied in protocol
    * order (dechunk, then gunzip), the complete-chunk count, and a
    * loud `truncated` flag when the entity didn't fully decode. */
  def httpBody(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("__h", E.column(HttpBody(E.expression(col(payloadCol)))))
      .select(df.columns.filterNot(_ == payloadCol).map(col).toSeq :+ col("__h.*"): _*)

  /** WARC members whose HTTP bodies carry the real wire encodings —
    * the [[httpBody]] fixture: id%4 routes the doc text through plain
    * (0), chunked with 100-CHAR chunks (1), gzip (2), or gzip-then-
    * chunked-in-4 (3 — the protocol order: CE compresses the entity,
    * TE frames the transfer). Plants: id%37==0 md5 garbage (no
    * record), id%37==5 on chunked routes the LAST chunk arrives half
    * (complete chunks keep, terminator lost), id%37==11 on gzip routes
    * one flipped byte mid-stream (the gzip CRC refuses: body null,
    * never corrupt text). */
  def synthesizeWarcHttpEncodedPayloads(docs: DataFrame, idCol: String,
                                        textCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)].map { case (id, text) =>
        val payload =
          if (id % 37 == 0)
            java.security.MessageDigest.getInstance("MD5")
              .digest(id.toString.getBytes("US-ASCII")) ++ new Array[Byte](8)
          else {
            val enc = (id % 4).toInt
            val raw = text.getBytes("UTF-8")
            val gz: Array[Byte] =
              if (enc >= 2) {
                val bos = new java.io.ByteArrayOutputStream()
                val g = new java.util.zip.GZIPOutputStream(bos)
                g.write(raw); g.close()
                val out = bos.toByteArray
                if (id % 37 == 11) { // bit-rot mid-stream
                  out(out.length / 2) = (out(out.length / 2) ^ 0x55).toByte
                }
                out
              } else null
            val torn = id % 37 == 5 && (enc == 1 || enc == 3)
            val body: Array[Byte] = enc match {
              case 0 => raw
              case 1 =>
                val bos = new java.io.ByteArrayOutputStream()
                chunkStreamInto(bos, text.grouped(100)
                  .map(_.getBytes("UTF-8")).toSeq, torn)
                bos.toByteArray
              case 2 => gz
              case _ =>
                val q = (gz.length + 3) / 4
                val bos = new java.io.ByteArrayOutputStream()
                chunkStreamInto(bos, gz.grouped(q).toSeq, torn)
                bos.toByteArray
            }
            val hdrs = new StringBuilder(s"HTTP/1.1 200 OK\r\n")
            hdrs.append("Content-Type: text/plain; charset=utf-8\r\n")
            if (enc >= 2) hdrs.append("Content-Encoding: gzip\r\n")
            if (enc == 1 || enc == 3)
              hdrs.append("Transfer-Encoding: chunked\r\n")
            hdrs.append("\r\n")
            val http = hdrs.toString.getBytes("US-ASCII") ++ body
            buildMember(Seq(("response", s"https://example.com/data/$id", http)))
          }
        (id, payload)
      }.toDF("doc_id", "payload")
  }

  /** [[synthesizeWarcHttpEncodedPayloads]]'s chunk framer (shared so
    * the torn rule is written once): complete chunks, then for a torn
    * stream the last chunk's size line with only HALF its data. */
  private def chunkStreamInto(bos: java.io.ByteArrayOutputStream,
                              parts: Seq[Array[Byte]], torn: Boolean): Unit = {
    def w(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val upto = if (torn) parts.length - 1 else parts.length
    parts.take(upto).foreach { c =>
      w(c.length.toHexString + "\r\n")
      bos.write(c, 0, c.length)
      w("\r\n")
    }
    if (torn) {
      val last = parts.last
      w(last.length.toHexString + "\r\n")
      bos.write(last, 0, last.length / 2) // half arrived, no CRLF
    } else w("0\r\n\r\n")
  }

  /** [[synthesizeWarcHttpPayloads]] with the `application/pdf` plant
    * upgraded to a REAL document: id%29==3 ships the doc text as an
    * actual [[Pdf]] (FlateDecode on odd ids), id%29==7 ships pdf-typed
    * JUNK (the torn-download shape the extractor must refuse), id%29==0
    * keeps the 404 — the chain-v3 fixture where the pdf branch is
    * extracted instead of dropped. */
  def synthesizeWarcHttpPdfPayloads(docs: DataFrame, idCol: String,
                                    textCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)].map { case (id, text) =>
        val uri = s"https://example.com/page/$id"
        val (status, ctype, body) =
          if (id % 29 == 0) (404, "text/html", "not found".getBytes("UTF-8"))
          else if (id % 29 == 3)
            (200, "application/pdf",
              Pdf.build(text, deflatePages = id % 2 == 1))
          else if (id % 29 == 7)
            (200, "application/pdf",
              java.security.MessageDigest.getInstance("MD5")
                .digest(id.toString.getBytes("US-ASCII")) ++ new Array[Byte](16))
          else
            (200, "text/html; charset=utf-8",
              (s"<html><head><script>var v=$id;</script></head><body><p>" +
                text + "</p>&nbsp;tail</body></html>").getBytes("UTF-8"))
        val http = (s"HTTP/1.1 $status X\r\nContent-Type: $ctype\r\n" +
          s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII") ++ body
        (id, buildMember(Seq(("response", uri, http))))
      }.toDF("doc_id", "payload")
  }

  /** Spec-valid WARC members with id-derived records — the
    * [[graft.pipeline.Multimodal.synthesizeMp4SampleTablePayloads]]
    * convention for the crawl container: every non-corrupt id carries a
    * `response` record whose payload is the document text (UTF-8), odd
    * ids add a `metadata` record (`fetch=<id>`). Plants: id%37==0 md5
    * garbage (no records), id%37==5 the response TORN mid-payload
    * (declared length past the bytes that arrived — no complete record,
    * the torn-download contract). */
  def synthesizeWarcPayloads(docs: DataFrame, idCol: String,
                             textCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)].map { case (id, text) =>
        val payload =
          if (id % 37 == 0)
            java.security.MessageDigest.getInstance("MD5")
              .digest(id.toString.getBytes("US-ASCII")) ++ new Array[Byte](8)
          else {
            val uri = s"https://example.com/doc/$id"
            val resp = Seq(("response", uri, text.getBytes("UTF-8")))
            val meta =
              if (id % 2 == 1) Seq(("metadata", uri, s"fetch=$id".getBytes("UTF-8")))
              else Seq.empty
            val full = buildMember(resp ++ meta)
            if (id % 37 == 5) full.take(full.length - math.min(full.length, 24))
            else full
          }
        (id, payload)
      }.toDF("doc_id", "payload")
  }
}

/** http_response(binary) → struct<status, content_type, body> — the
  * layer INSIDE a WARC response record: `HTTP/1.x NNN reason CRLF`,
  * header lines, blank line, body (the WARC record already delimits
  * the response, so the body is simply the remaining bytes). Null on
  * anything that is not an HTTP response head — the caller's filter.
  * Together with [[WarcRecords]] and
  * [[graft.pipeline.TextAnalysis.stripMarkup]] this completes the
  * crawl-to-prose chain: member → record → HTTP body → clean text. */
case class HttpResponse(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b == null || b.length < 14) return null
    val head = new String(b, 0, math.min(b.length, 7), "US-ASCII")
    if (head != "HTTP/1.") return null
    // status line: HTTP/1.x SP NNN ...
    var i = 7
    while (i < b.length && b(i) != ' ' && b(i) != '\r') i += 1
    if (i + 4 > b.length || b(i) != ' ') return null
    val st = new String(b, i + 1, 3, "US-ASCII")
    if (!st.forall(_.isDigit)) return null
    val status = st.toInt
    // headers until CRLF CRLF (bounded by byte consumption)
    var ctype: String = null
    var p = {
      var j = i
      while (j + 1 < b.length && !(b(j) == '\r' && b(j + 1) == '\n')) j += 1
      j + 2
    }
    var inHeaders = true
    var ok = true
    var lines = 0
    while (inHeaders && ok && lines < 256) {
      lines += 1
      var j = p
      while (j + 1 < b.length && !(b(j) == '\r' && b(j + 1) == '\n')) j += 1
      if (j + 1 >= b.length) ok = false
      else if (j == p) { inHeaders = false; p = j + 2 } // blank line
      else {
        val line = new String(b, p, j - p, "UTF-8")
        val colon = line.indexOf(':')
        if (colon > 0 &&
            line.substring(0, colon).trim.equalsIgnoreCase("content-type"))
          ctype = line.substring(colon + 1).trim
        p = j + 2
      }
    }
    if (!ok || inHeaders) return null
    InternalRow(status,
      if (ctype == null) null else UTF8String.fromString(ctype),
      java.util.Arrays.copyOfRange(b, p, b.length))
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"http_response expects BINARY, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("status", IntegerType, nullable = false),
    StructField("content_type", StringType, nullable = true),
    StructField("body", BinaryType, nullable = false)))
  override protected def withNewChildInternal(newChild: Expression): HttpResponse =
    copy(child = newChild)
  override def prettyName: String = "http_response"
}

/** http_body(binary) → struct<status, content_type, was_chunked,
  * was_gzip, n_chunks, truncated, body> — [[HttpResponse]] plus the
  * WIRE DECODING a raw capture actually needs (Common Crawl strips
  * these; raw proxy/pcap-derived captures do not): `Transfer-Encoding:
  * chunked` dechunked complete-chunks-only ([[Warc.dechunk]]), then
  * `Content-Encoding: gzip` inflated fully-or-null
  * ([[Warc.gunzipEntity]]) — protocol order: CE compressed the entity,
  * TE framed the transfer, so decode unframes then decompresses.
  * `truncated` is the loud flag: the chunk stream missed its
  * 0-terminator, or the gzip stream refused (torn/bit-rot — its CRC is
  * the gate). Null on non-HTTP bytes. Pure map. */
case class HttpBody(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b == null || b.length < 14) return null
    val head = new String(b, 0, math.min(b.length, 7), "US-ASCII")
    if (head != "HTTP/1.") return null
    var i = 7
    while (i < b.length && b(i) != ' ' && b(i) != '\r') i += 1
    if (i + 4 > b.length || b(i) != ' ') return null
    val st = new String(b, i + 1, 3, "US-ASCII")
    if (!st.forall(_.isDigit)) return null
    val status = st.toInt
    var ctype: String = null
    var te: String = null
    var ce: String = null
    var p = {
      var j = i
      while (j + 1 < b.length && !(b(j) == '\r' && b(j + 1) == '\n')) j += 1
      j + 2
    }
    var inHeaders = true
    var ok = true
    var lines = 0
    while (inHeaders && ok && lines < 256) {
      lines += 1
      var j = p
      while (j + 1 < b.length && !(b(j) == '\r' && b(j + 1) == '\n')) j += 1
      if (j + 1 >= b.length) ok = false
      else if (j == p) { inHeaders = false; p = j + 2 }
      else {
        val line = new String(b, p, j - p, "UTF-8")
        val colon = line.indexOf(':')
        if (colon > 0) {
          val k = line.substring(0, colon).trim
          val v = line.substring(colon + 1).trim
          if (k.equalsIgnoreCase("content-type")) ctype = v
          else if (k.equalsIgnoreCase("transfer-encoding")) te = v
          else if (k.equalsIgnoreCase("content-encoding")) ce = v
        }
        p = j + 2
      }
    }
    if (!ok || inHeaders) return null
    val chunked = te != null &&
      te.toLowerCase(java.util.Locale.ROOT).contains("chunked")
    val gzip = ce != null && (ce.equalsIgnoreCase("gzip") ||
      ce.equalsIgnoreCase("x-gzip"))
    val (framed, nChunks, term) =
      if (chunked) Warc.dechunk(b, p)
      else (java.util.Arrays.copyOfRange(b, p, b.length), -1, true)
    val decoded = if (gzip) Warc.gunzipEntity(framed) else framed
    val truncated = !term || (gzip && decoded == null)
    InternalRow(status,
      if (ctype == null) null else UTF8String.fromString(ctype),
      chunked, gzip,
      if (chunked) nChunks else null,
      truncated, decoded)
  }

  // non-HTTP payloads read as a NULL struct whatever the child's
  // nullability (the PdfRead rule)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"http_body expects BINARY, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("status", IntegerType, nullable = false),
    StructField("content_type", StringType, nullable = true),
    StructField("was_chunked", BooleanType, nullable = false),
    StructField("was_gzip", BooleanType, nullable = false),
    StructField("n_chunks", IntegerType, nullable = true),
    StructField("truncated", BooleanType, nullable = false),
    StructField("body", BinaryType, nullable = true)))
  override protected def withNewChildInternal(newChild: Expression): HttpBody =
    copy(child = newChild)
  override def prettyName: String = "http_body"
}

/** http_text(binary) → struct<status, content_type, charset,
  * charset_source, text> — the full wire-to-string pass: [[HttpBody]]'s
  * decode (dechunk → gunzip) followed by [[Warc.resolveCharset]]'s
  * HTML5 precedence (header param → BOM → meta tag → windows-1252
  * default, with the iso-8859-1→cp1252 alias rule) and the actual
  * charset decode. `text` is null when the entity didn't fully decode
  * (truncated chunks / refused gzip) — wire damage never becomes
  * mojibake. Null struct on non-HTTP bytes. Pure map. */
case class HttpText(child: Expression)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val bodyExpr = HttpBody(child)

  override def nullSafeEval(input: Any): Any = {
    val inner = bodyExpr.nullSafeEval(input)
    if (inner == null) return null
    val row = inner.asInstanceOf[InternalRow]
    val status = row.getInt(0)
    val ctype = if (row.isNullAt(1)) null else row.getUTF8String(1).toString
    val truncated = row.getBoolean(5)
    val body = if (row.isNullAt(6)) null else row.getBinary(6)
    val (cs, src, skip) = Warc.resolveCharset(ctype, body)
    val text =
      if (body == null || truncated) null
      else {
        val s = new String(body, skip, body.length - skip, Warc.javaCharset(cs))
        // a BOM that survived a UTF-16 "utf-16" label decode is noise
        if (s.nonEmpty && s.charAt(0) == '\uFEFF') s.substring(1) else s
      }
    InternalRow(status,
      if (ctype == null) null else UTF8String.fromString(ctype),
      UTF8String.fromString(cs), UTF8String.fromString(src),
      if (text == null) null else UTF8String.fromString(text))
  }

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"http_text expects BINARY, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("status", IntegerType, nullable = false),
    StructField("content_type", StringType, nullable = true),
    StructField("charset", StringType, nullable = false),
    StructField("charset_source", StringType, nullable = false),
    StructField("text", StringType, nullable = true)))
  override protected def withNewChildInternal(newChild: Expression): HttpText =
    copy(child = newChild)
  override def prettyName: String = "http_text"
}

/** warc_records(binary) → array<struct<warc_type, target_uri,
  * content_type, content_length, payload>> — [[Warc.parseWithStats]] as
  * a scalar expression (pure map; complete records only, torn blobs stop
  * clean, declared-oversize records skipped — [[WarcScan]] carries the
  * drop count for callers that must account for them). */
case class WarcRecords(child: Expression,
                       maxRecordBytes: Long = Warc.MaxRecordInflated)
    extends UnaryExpression with CodegenFallback {

  override def nullSafeEval(input: Any): Any = {
    val recs = Warc.parseWithStats(input.asInstanceOf[Array[Byte]], maxRecordBytes)._1
    new GenericArrayData(recs.map { r =>
      InternalRow(
        if (r.warcType == null) null else UTF8String.fromString(r.warcType),
        if (r.targetUri == null) null else UTF8String.fromString(r.targetUri),
        if (r.contentType == null) null else UTF8String.fromString(r.contentType),
        r.contentLength, r.payload)
    }.toArray[Any])
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"warc_records expects BINARY, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false))),
    containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): WarcRecords =
    copy(child = newChild)
  override def prettyName: String = "warc_records"
}

/** warc_scan(binary) → struct<n_records, n_dropped, payload_bytes> —
  * the [[Warc.parseWithStats]] accounting as a scalar expression: how
  * many records completed, how many DECLARED-OVERSIZE records the
  * per-record cap skipped (the loud trail the r15 whole-member cap
  * lacked), and the completed payload volume. Same walk as
  * [[WarcRecords]], so the two columns always agree. */
case class WarcScan(child: Expression,
                    maxRecordBytes: Long = Warc.MaxRecordInflated)
    extends UnaryExpression with CodegenFallback {

  override def nullSafeEval(input: Any): Any = {
    val (recs, dropped) =
      Warc.parseWithStats(input.asInstanceOf[Array[Byte]], maxRecordBytes)
    InternalRow(recs.size.toLong, dropped, recs.map(_.contentLength).sum)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"warc_scan expects BINARY, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_records", LongType, nullable = false),
    StructField("n_dropped", LongType, nullable = false),
    StructField("payload_bytes", LongType, nullable = false)))
  override protected def withNewChildInternal(newChild: Expression): WarcScan =
    copy(child = newChild)
  override def prettyName: String = "warc_scan"
}
