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

/** ZIP archive source (PKWARE APPNOTE layout) — the other container
  * scraped corpora actually ship (dataset dumps, code archives, doc
  * bundles). The parse is the CENTRAL DIRECTORY walk every real unzip
  * runs: find the end-of-central-directory record by scanning back from
  * the blob's tail (bounded by the max 64 KB comment), walk the CD
  * entries for names/methods/sizes/CRCs/local offsets — header-only, no
  * decompression — then extract individual entries on demand: STORED
  * (method 0) slices bytes, DEFLATED (method 8) inflates through the
  * JDK's raw `Inflater`, a REAL decode.
  *
  * Torn/hostile contract (the [[Warc]] discipline): never throws. A blob
  * without a valid EOCD (garbage, or a torn tail — the EOCD lives at the
  * END, so a truncated download loses the index) yields no entries; a CD
  * entry that doesn't fit the arrived bytes stops the walk at the last
  * complete entry; extraction returns null unless the entry fully
  * checks out — local header magic, declared sizes in bounds, inflated
  * length equal to the declared size AND CRC32 equal to the declared
  * CRC (a torn or bit-rotted stream is never dressed as content). A
  * declared uncompressed size past [[Zip.MaxEntryBytes]] (128 MB)
  * extracts as null — the per-ENTRY decompression-bomb cap; the entry
  * table still lists its declared size, so a caller gates loudly.
  * ZIP64 (r16): EOCD64 + locator and the 0x0001 extra field resolve
  * the 0xFFFF/0xFFFFFFFF markers, so >4 GB archives and >65535-entry
  * directories list correctly; a marker with no resolving extra stays
  * hostile and extracts null. */
object Zip {

  final case class Entry(name: String, method: Int, compressedSize: Long,
                         uncompressedSize: Long, crc32: Long, offset: Long)

  /** Per-entry decompression-bomb ceiling (the [[Warc.MaxRecordInflated]]
    * convention: per unit of work, never per archive). */
  private[sources] val MaxEntryBytes = 128L << 20

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xff).toLong | ((b(i + 1) & 0xff).toLong << 8) |
      ((b(i + 2) & 0xff).toLong << 16) | ((b(i + 3) & 0xff).toLong << 24)
  private def le64(b: Array[Byte], i: Int): Long =
    le32(b, i) | (le32(b, i + 4) << 32)

  /** The central-directory walk: complete entries listed from one blob.
    * Empty on garbage / torn-tail (no EOCD) / hostile counts. ZIP64
    * (r16): 0xFFFF/0xFFFFFFFF markers in the classic EOCD route
    * through the EOCD64 locator (PK66 via PK67 immediately before the
    * EOCD) for the real entry count and CD offset, and per-entry
    * 0xFFFFFFFF size/offset markers resolve from the 0x0001 extra
    * field — so >4 GB archives and >65535-entry directories list
    * correctly; an unresolvable marker stays hostile (extract null). */
  def entries(b: Array[Byte]): Seq[Entry] = {
    if (b == null || b.length < 22) return Seq.empty
    // EOCD: PK\5\6 scanned back across the max comment span
    var e = -1
    var i = b.length - 22
    val lo = math.max(0, b.length - 22 - 65535)
    while (e < 0 && i >= lo) {
      if (b(i) == 'P' && b(i + 1) == 'K' && b(i + 2) == 5 && b(i + 3) == 6 &&
          // the comment length must CLOSE the blob exactly — guards
          // against PK\5\6 appearing inside entry data
          i + 22 + le16(b, i + 20) == b.length) e = i
      else i -= 1
    }
    if (e < 0) return Seq.empty
    var total: Long = le16(b, e + 10)
    var cdOff: Long = le32(b, e + 16)
    if ((total == 0xffffL || cdOff == 0xffffffffL) && e >= 20) {
      // ZIP64: the locator sits immediately before the classic EOCD
      val loc = e - 20
      if (b(loc) == 'P' && b(loc + 1) == 'K' && b(loc + 2) == 6 &&
          b(loc + 3) == 7) {
        val z = le64(b, loc + 8)
        if (z >= 0 && z + 56 <= loc && b(z.toInt) == 'P' &&
            b(z.toInt + 1) == 'K' && b(z.toInt + 2) == 6 &&
            b(z.toInt + 3) == 6) {
          val t64 = le64(b, z.toInt + 32)
          val c64 = le64(b, z.toInt + 48)
          if (t64 >= 0 && c64 >= 0) { total = t64; cdOff = c64 }
        }
      }
    }
    if (cdOff < 0 || cdOff > b.length - 46 && total > 0) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[Entry]()
    var p = cdOff
    var k = 0
    var ok = true
    while (ok && k < total) {
      if (p + 46 > e || !(b(p.toInt) == 'P' && b(p.toInt + 1) == 'K' &&
          b(p.toInt + 2) == 1 && b(p.toInt + 3) == 2)) ok = false
      else {
        val q = p.toInt
        val method = le16(b, q + 10)
        val crc = le32(b, q + 16)
        val csize = le32(b, q + 20)
        val usize = le32(b, q + 24)
        val nlen = le16(b, q + 28)
        val xlen = le16(b, q + 30)
        val clen = le16(b, q + 32)
        val off = le32(b, q + 42)
        if (p + 46 + nlen + xlen + clen > e) ok = false
        else {
          // ZIP64 per-entry markers: the 0x0001 extra field carries the
          // real 64-bit values (order: usize, csize, offset — only the
          // marked ones appear); unresolved markers stay hostile
          var usz = usize
          var csz = csize
          var off2 = off
          if ((usz == 0xffffffffL || csz == 0xffffffffL ||
              off2 == 0xffffffffL) && xlen > 0) {
            var xp = q + 46 + nlen
            val xend = xp + xlen
            while (xp + 4 <= xend) {
              val xid = le16(b, xp)
              val xsz = le16(b, xp + 2)
              if (xid == 1 && xp + 4 + xsz <= xend) {
                var dp = xp + 4
                val dend = xp + 4 + xsz
                if (usz == 0xffffffffL && dp + 8 <= dend) {
                  val v = le64(b, dp); dp += 8
                  if (v >= 0) usz = v
                }
                if (csz == 0xffffffffL && dp + 8 <= dend) {
                  val v = le64(b, dp); dp += 8
                  if (v >= 0) csz = v
                }
                if (off2 == 0xffffffffL && dp + 8 <= dend) {
                  val v = le64(b, dp); dp += 8
                  if (v >= 0) off2 = v
                }
              }
              xp += 4 + xsz
            }
          }
          out += Entry(new String(b, q + 46, nlen, "UTF-8"), method,
            csz, usz, crc, off2)
          p += 46 + nlen + xlen + clen
          k += 1
        }
      }
    }
    out.toSeq
  }

  /** Extract ONE entry's bytes by its CD record: local-header check,
    * STORED slice or raw-DEFLATE inflate, length + CRC32 verified
    * against the directory's declaration — null on any mismatch. */
  def extract(b: Array[Byte], entry: Entry): Array[Byte] = {
    if (b == null || entry == null) return null
    val off = entry.offset
    if (off < 0 || off + 30 > b.length) return null
    val q = off.toInt
    if (!(b(q) == 'P' && b(q + 1) == 'K' && b(q + 2) == 3 && b(q + 3) == 4))
      return null
    val nlen = le16(b, q + 26)
    val xlen = le16(b, q + 28)
    val dataOff = off + 30 + nlen + xlen
    val csize = entry.compressedSize
    val usize = entry.uncompressedSize
    if (usize < 0 || usize > MaxEntryBytes || csize < 0 ||
        usize == 0xffffffffL || csize == 0xffffffffL ||
        dataOff + csize > b.length) return null
    val raw =
      if (entry.method == 0) {
        if (csize != usize) return null
        java.util.Arrays.copyOfRange(b, dataOff.toInt, (dataOff + csize).toInt)
      } else if (entry.method == 8) {
        val inf = new java.util.zip.Inflater(true) // raw deflate
        try {
          inf.setInput(b, dataOff.toInt, csize.toInt)
          val out = new Array[Byte](usize.toInt)
          var done = 0
          var stalled = false
          while (done < usize && !inf.finished() && !stalled) {
            val n = try inf.inflate(out, done, (usize - done).toInt)
                    catch { case _: java.util.zip.DataFormatException => -1 }
            if (n <= 0) stalled = true else done += n
          }
          // the stream must produce EXACTLY the declared bytes
          if (done != usize || (!inf.finished() && {
            // probe: any further output means the declaration lied
            val probe = new Array[Byte](1)
            (try inf.inflate(probe) catch {
              case _: java.util.zip.DataFormatException => -1
            }) > 0
          })) null
          else out
        } finally inf.end()
      } else return null // unsupported method: null, never garbage
    if (raw == null) return null
    val crc = new java.util.zip.CRC32()
    crc.update(raw)
    if (crc.getValue != entry.crc32) null else raw
  }

  /** Extract by NAME (first match in the directory). */
  def extract(b: Array[Byte], name: String): Array[Byte] =
    entries(b).find(_.name == name).map(extract(b, _)).orNull

  /** Explode [[ZipEntries]] over a payload column: one row per complete
    * central-directory entry — blobs without a valid EOCD yield no rows
    * (the torn/garbage contract). Pure map + explode; stream-safe. */
  def list(blobs: DataFrame, payloadCol: String): DataFrame =
    blobs.withColumn("__z",
        explode(E.column(ZipEntries(E.expression(col(payloadCol))))))
      .select(blobs.columns.filterNot(_ == payloadCol).map(col).toSeq :+ col("__z.*"): _*)

  /** [[list]] plus the extracted content per entry: `content` is null
    * when the entry fails the verified-extract contract (torn stream,
    * CRC/size mismatch, unsupported method, over-cap). Pure map +
    * explode of (entry × verified bytes); stream-safe. */
  def read(blobs: DataFrame, payloadCol: String): DataFrame =
    blobs.withColumn("__z",
        explode(E.column(ZipRead(E.expression(col(payloadCol))))))
      .select(blobs.columns.filterNot(_ == payloadCol).map(col).toSeq :+ col("__z.*"): _*)

  /** Deterministic ZIP builder — the exporter half of the round-trip
    * gate: (name, content, stored?) entries through the JDK writer,
    * entry times pinned so bytes replay. */
  def build(entries: Seq[(String, Array[Byte], Boolean)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (name, content, stored) =>
      val ze = new java.util.zip.ZipEntry(name)
      ze.setTime(315532800000L) // 1980-01-01: the DOS-time floor, replayable
      if (stored) {
        ze.setMethod(java.util.zip.ZipOutputStream.STORED)
        ze.setSize(content.length.toLong)
        ze.setCompressedSize(content.length.toLong)
        val c = new java.util.zip.CRC32(); c.update(content)
        ze.setCrc(c.getValue)
      } else ze.setMethod(java.util.zip.ZipOutputStream.DEFLATED)
      zos.putNextEntry(ze)
      zos.write(content)
      zos.closeEntry()
    }
    zos.finish()
    bos.toByteArray
  }

  /** ZIP blobs with id-derived entries over the documents table — the
    * [[Warc.synthesizeWarcPayloads]] convention for this container:
    * every non-plant id carries `doc_<id>.txt` (the document text —
    * STORED on even ids, DEFLATED on odd: both extract paths gated) and
    * `meta_<id>.txt` (`id=<id>`, STORED). Plants: id%37==0 md5 garbage
    * (no EOCD → no entries), id%37==5 TORN tail (last 30 bytes cut —
    * the EOCD is gone, so the index correctly reads as lost). */
  def synthesizeZipPayloads(docs: DataFrame, idCol: String,
                            textCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)].map { case (id, text) =>
        val payload =
          if (id % 37 == 0)
            java.security.MessageDigest.getInstance("MD5")
              .digest(id.toString.getBytes("US-ASCII")) ++ new Array[Byte](8)
          else {
            val full = build(Seq(
              (s"doc_$id.txt", text.getBytes("UTF-8"), id % 2 == 0),
              (s"meta_$id.txt", s"id=$id".getBytes("UTF-8"), true)))
            if (id % 37 == 5) full.take(full.length - 30) else full
          }
        (id, payload)
      }.toDF("doc_id", "payload")
  }
}

/** zip_entries(binary) → array<struct<name, method, compressed_size,
  * uncompressed_size, crc32, offset>> — [[Zip.entries]] as a scalar
  * expression (pure map; header-only central-directory walk, nothing
  * decompressed). */
case class ZipEntries(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def nullSafeEval(input: Any): Any = {
    val es = Zip.entries(input.asInstanceOf[Array[Byte]])
    new GenericArrayData(es.map { en =>
      InternalRow(UTF8String.fromString(en.name), en.method,
        en.compressedSize, en.uncompressedSize, en.crc32, en.offset)
    }.toArray[Any])
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"zip_entries expects BINARY, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("method", IntegerType, nullable = false),
    StructField("compressed_size", LongType, nullable = false),
    StructField("uncompressed_size", LongType, nullable = false),
    StructField("crc32", LongType, nullable = false),
    StructField("offset", LongType, nullable = false))),
    containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): ZipEntries =
    copy(child = newChild)
  override def prettyName: String = "zip_entries"
}

/** zip_read(binary) → array<struct<name, method, uncompressed_size,
  * content>> — entry table × VERIFIED extraction ([[Zip.extract]]:
  * local-header check, STORED slice / raw-DEFLATE inflate, length +
  * CRC32 gated); `content` null when the entry fails the contract. */
case class ZipRead(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val es = Zip.entries(b)
    new GenericArrayData(es.map { en =>
      InternalRow(UTF8String.fromString(en.name), en.method,
        en.uncompressedSize, Zip.extract(b, en))
    }.toArray[Any])
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"zip_read expects BINARY, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("method", IntegerType, nullable = false),
    StructField("uncompressed_size", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true))),
    containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): ZipRead =
    copy(child = newChild)
  override def prettyName: String = "zip_read"
}
