package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{GraftShim => E}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** TAR archive source (POSIX ustar, the layout every corpus dump tool
  * writes) — 512-byte header blocks with octal size fields, content
  * padded to block boundaries, two zero blocks as the end marker.
  * `.tar.gz` members inflate INCREMENTALLY through the same rolling
  * discipline as [[Warc]] — peak memory is one entry, never the whole
  * inflated archive.
  *
  * Torn/hostile contract: never throws. A header block that fails its
  * own CHECKSUM (sum of header bytes with the chksum field read as
  * spaces — the v7/ustar self-check) stops the walk; an entry whose
  * content blocks did not fully arrive is NOT emitted (complete
  * entries only); an entry whose declared size exceeds
  * [[Tar.MaxEntryBytes]] (128 MB) is LISTED with null content and its
  * blocks skipped in O(1) memory — visible, never silent. Octal fields
  * parse leniently (leading spaces/NULs) but a non-octal size stops
  * the walk. */
object Tar {

  final case class Entry(name: String, size: Long, typeflag: String,
                         content: Array[Byte])

  /** Per-entry decompression/materialization ceiling (the
    * [[Warc.MaxRecordInflated]] convention). */
  private[sources] val MaxEntryBytes = 128L << 20

  def parse(raw: Array[Byte]): Seq[Entry] = parse(raw, MaxEntryBytes)

  def parse(raw: Array[Byte], maxEntryBytes: Long): Seq[Entry] = {
    if (raw == null || raw.length < 512 &&
        !(raw != null && raw.length >= 2 &&
          (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b)) return Seq.empty
    val in: java.io.InputStream =
      if ((raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b)
        try new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(raw), 65536)
        catch { case _: java.io.IOException => return Seq.empty }
      else new java.io.ByteArrayInputStream(raw)
    walk(in, maxEntryBytes)
  }

  /** Fill `buf` completely from the stream; bytes actually read (may be
    * short at a torn tail; IOException reads as torn). */
  private def readFully(in: java.io.InputStream, buf: Array[Byte]): Int = {
    var off = 0
    var eof = false
    while (off < buf.length && !eof) {
      val n = try in.read(buf, off, buf.length - off)
              catch { case _: java.io.IOException => -1 }
      if (n < 0) eof = true else off += n
    }
    off
  }

  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var i = off
    val end = off + len
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    if (i == end) return -1L
    var v = 0L
    var any = false
    while (i < end && b(i) >= '0' && b(i) <= '7' && v >= 0) {
      v = v * 8 + (b(i) - '0'); any = true; i += 1
    }
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    if (!any || i != end || v < 0) -1L else v
  }

  private def walk(in: java.io.InputStream,
                   maxEntryBytes: Long): Seq[Entry] = {
    val out = scala.collection.mutable.ArrayBuffer[Entry]()
    val hdr = new Array[Byte](512)
    var go = true
    while (go) {
      go = false
      if (readFully(in, hdr) == 512 && !hdr.forall(_ == 0)) {
        // checksum self-check: header bytes summed with the chksum
        // field (148..155) read as ASCII spaces
        var sum = 0L
        var i = 0
        while (i < 512) {
          sum += (if (i >= 148 && i < 156) 0x20 else hdr(i) & 0xff)
          i += 1
        }
        val declared = octal(hdr, 148, 8)
        val size = octal(hdr, 124, 12)
        if (declared >= 0 && declared == sum && size >= 0) {
          var nameEnd = 0
          while (nameEnd < 100 && hdr(nameEnd) != 0) nameEnd += 1
          val name = new String(hdr, 0, nameEnd, "UTF-8")
          val tf = (hdr(156) & 0xff) match {
            case 0 => "0"
            case c => String.valueOf(c.toChar)
          }
          val padded = ((size + 511) / 512) * 512
          if (size > maxEntryBytes) {
            // LISTED, content withheld; blocks skipped in O(1) memory
            var left = padded
            val sink = new Array[Byte](65536)
            var short = false
            while (left > 0 && !short) {
              val want = math.min(left, sink.length.toLong).toInt
              val n = try in.read(sink, 0, want)
                      catch { case _: java.io.IOException => -1 }
              if (n < 0) short = true else left -= n
            }
            if (!short) { out += Entry(name, size, tf, null); go = true }
          } else {
            val block = new Array[Byte](padded.toInt)
            if (readFully(in, block) == padded.toInt) {
              out += Entry(name, size, tf,
                java.util.Arrays.copyOfRange(block, 0, size.toInt))
              go = true
            } // short content: torn — the entry is NOT emitted
          }
        }
      }
    }
    out.toSeq
  }

  /** Explode [[TarRead]] over a payload column: one row per complete
    * entry (content null for over-cap entries). Pure map + explode;
    * stream-safe. */
  def read(blobs: DataFrame, payloadCol: String): DataFrame =
    blobs.withColumn("__t",
        explode(E.column(TarRead(E.expression(col(payloadCol))))))
      .select(blobs.columns.filterNot(_ == payloadCol).map(col).toSeq :+ col("__t.*"): _*)

  /** Deterministic ustar builder — the exporter half of the round-trip
    * gate: regular-file entries, mtime pinned to 0, mode 0644. */
  def build(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, content) =>
      val hdr = new Array[Byte](512)
      val nb = name.getBytes("UTF-8")
      require(nb.length <= 100, s"tar entry name too long: $name")
      System.arraycopy(nb, 0, hdr, 0, nb.length)
      def putOctal(v: Long, off: Int, len: Int): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val p = "0" * (len - 1 - s.length) + s
        System.arraycopy(p.getBytes("US-ASCII"), 0, hdr, off, len - 1)
        hdr(off + len - 1) = 0
      }
      putOctal(420L, 100, 8)  // mode 0644
      putOctal(0L, 108, 8); putOctal(0L, 116, 8) // uid gid
      putOctal(content.length.toLong, 124, 12)
      putOctal(0L, 136, 12)   // mtime
      hdr(156) = '0'          // regular file
      System.arraycopy("ustar".getBytes("US-ASCII"), 0, hdr, 257, 5)
      hdr(263) = '0'; hdr(264) = '0'
      java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
      var sum = 0L
      hdr.foreach(b => sum += (b & 0xff))
      val cs = java.lang.Long.toOctalString(sum)
      val csp = "0" * (6 - cs.length) + cs
      System.arraycopy(csp.getBytes("US-ASCII"), 0, hdr, 148, 6)
      hdr(154) = 0; hdr(155) = ' '
      bos.write(hdr)
      bos.write(content)
      val pad = (512 - content.length % 512) % 512
      bos.write(new Array[Byte](pad))
    }
    bos.write(new Array[Byte](1024)) // end marker
    bos.toByteArray
  }

  /** [[build]] gzip-compressed — the `.tar.gz` shape dumps ship. */
  def buildGz(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(build(entries))
    gz.finish()
    bos.toByteArray
  }

  /** TAR blobs with id-derived entries over the documents table — the
    * [[Zip.synthesizeZipPayloads]] convention: every non-plant id
    * carries `doc_<id>.txt` (the document text) and `meta_<id>.txt`
    * (`id=<id>`); ODD ids ship as `.tar.gz` (the gunzip walk), even as
    * plain tar. Plants: id%37==0 md5 garbage (no valid header — no
    * entries), id%37==5 TORN 100 bytes into the SECOND header (plain
    * tar regardless of parity so the cut point is byte-exact): the doc
    * entry survives, the meta entry is gone. */
  def synthesizeTarPayloads(docs: DataFrame, idCol: String,
                            textCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)].map { case (id, text) =>
        val payload =
          if (id % 37 == 0)
            java.security.MessageDigest.getInstance("MD5")
              .digest(id.toString.getBytes("US-ASCII")) ++ new Array[Byte](500)
          else {
            val es = Seq(
              (s"doc_$id.txt", text.getBytes("UTF-8")),
              (s"meta_$id.txt", s"id=$id".getBytes("UTF-8")))
            if (id % 37 == 5) {
              val t = text.getBytes("UTF-8").length
              val cut = 512 + ((t + 511) / 512) * 512 + 100
              build(es).take(cut)
            } else if (id % 2 == 1) buildGz(es)
            else build(es)
          }
        (id, payload)
      }.toDF("doc_id", "payload")
  }
}

/** tar_read(binary) → array<struct<name, size, typeflag, content>> —
  * [[Tar.parse]] as a scalar expression (pure map; complete entries
  * only, over-cap entries listed with null content, torn archives stop
  * clean). */
case class TarRead(child: Expression,
                   maxEntryBytes: Long = Tar.MaxEntryBytes)
    extends UnaryExpression with CodegenFallback {

  override def nullSafeEval(input: Any): Any = {
    val es = Tar.parse(input.asInstanceOf[Array[Byte]], maxEntryBytes)
    new GenericArrayData(es.map { en =>
      InternalRow(UTF8String.fromString(en.name), en.size,
        UTF8String.fromString(en.typeflag), en.content)
    }.toArray[Any])
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tar_read expects BINARY, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("typeflag", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true))),
    containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): TarRead =
    copy(child = newChild)
  override def prettyName: String = "tar_read"
}
