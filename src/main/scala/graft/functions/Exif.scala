package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** EXIF/TIFF metadata probing — the second header-only pass a crawled
  * image corpus runs after [[MediaProbe]]'s container walk: orientation
  * (the tag that silently rotates a quarter of phone photos — any
  * pixel-level dedup/embedding pass must normalize it first), camera
  * make/model (device-level provenance and dedup blocking keys), and
  * the EXIF pixel dimensions (cross-check against the container's SOF
  * dims — a mismatch is a re-encode/crop signal). Byte-walk per the
  * TIFF 6.0 + EXIF 2.3 specs: JPEG APP1 segment → "Exif\0\0" → TIFF
  * header (II/MM byte order, magic 42, IFD0 offset) → IFD0 entries
  * (tag, type, count, value-or-offset) → the ExifIFD sub-directory for
  * the pixel dims. No codec, no thumbnail decode.
  *
  * Corrupt/truncated/absent EXIF never throws: `has_exif = false`,
  * every field null (the crawl contract shared with the container
  * probe). Every offset is bounds-checked and the IFD walk is
  * depth-1 + entry-capped, so hostile offsets terminate. */
object ExifFormats {

  final case class Exif(hasExif: Boolean, byteOrder: String = null,
                        orientation: Integer = null, make: String = null,
                        model: String = null, pixelX: Integer = null,
                        pixelY: Integer = null)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  def probe(b: Array[Byte]): Exif = {
    if (b == null || b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8)
      return Exif(hasExif = false)
    // APP1 marker walk (the parseJpeg discipline: skip fill bytes, every
    // segment length must advance)
    var i = 2
    while (i + 4 <= b.length) {
      if (u8(b, i) != 0xff) return Exif(hasExif = false)
      var j = i + 1
      while (j < b.length - 1 && u8(b, j) == 0xff) j += 1
      val mk = u8(b, j)
      i = j - 1
      if (i + 4 > b.length) return Exif(hasExif = false)
      if (mk == 0xd8 || (mk >= 0xd0 && mk <= 0xd7) || mk == 0x01) { i += 2 }
      else if (mk == 0xd9 || mk == 0xda) return Exif(hasExif = false)
      else {
        val len = ((u8(b, i + 2) << 8) | u8(b, i + 3))
        if (len < 2) return Exif(hasExif = false)
        if (mk == 0xe1 && i + 2 + len <= b.length && len >= 10 &&
          b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' &&
          b(i + 7) == 'f' && b(i + 8) == 0 && b(i + 9) == 0)
          return parseTiff(b, i + 10, i + 2 + len)
        i += 2 + len
      }
    }
    Exif(hasExif = false)
  }

  /** TIFF block in [base, end). */
  private def parseTiff(b: Array[Byte], base: Int, end: Int): Exif = {
    if (base + 8 > end) return Exif(hasExif = false)
    val little =
      if (b(base) == 'I' && b(base + 1) == 'I') true
      else if (b(base) == 'M' && b(base + 1) == 'M') false
      else return Exif(hasExif = false)
    def u16(i: Int): Int =
      if (i + 2 > end) -1
      else if (little) u8(b, i) | (u8(b, i + 1) << 8)
      else (u8(b, i) << 8) | u8(b, i + 1)
    def u32(i: Int): Long =
      if (i + 4 > end) -1L
      else if (little)
        u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
          (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
      else
        (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
          (u8(b, i + 2) << 8) | u8(b, i + 3)
    if (u16(base + 2) != 42) return Exif(hasExif = false)
    val ifd0 = u32(base + 4)
    if (ifd0 < 8 || base + ifd0 + 2 > end) return Exif(hasExif = true)

    var orientation: Integer = null
    var make: String = null
    var model: String = null
    var pixelX: Integer = null
    var pixelY: Integer = null

    def readAscii(off: Int, count: Int): String = {
      // overflow-free bounds: a hostile count of 0x7FFFFFFF makes
      // off + count wrap negative and slip past an `off+count > end`
      // form, so compare against the remaining span instead; 65535 is
      // the APP1 segment ceiling, so any larger declared count is junk
      if (count <= 0 || count > 65535 || off < 0 || off > end ||
          count > end - off) return null
      val raw = new String(b, off, count, "US-ASCII")
      val nul = raw.indexOf('\u0000')
      if (nul >= 0) raw.substring(0, nul) else raw
    }

    // one IFD: returns the ExifIFD pointer if seen (IFD0 only)
    def walkIfd(off: Int, sub: Boolean): Long = {
      var exifPtr = -1L
      val n = u16(off)
      if (n < 0) return -1L
      val entries = math.min(n, 64) // entry cap: hostile counts terminate
      var e = 0
      while (e < entries) {
        val p = off + 2 + e * 12
        if (p + 12 > end) return exifPtr
        val tag = u16(p)
        val typ = u16(p + 2)
        val cnt = u32(p + 4)
        // SHORT (3) value sits in the first 2 bytes of the value field,
        // LONG (4) in all 4 — both endian-ordered; ASCII (2) is an
        // offset unless count <= 4
        def shortOrLong: Integer =
          if (typ == 3) { val v = u16(p + 8); if (v < 0) null else Integer.valueOf(v) }
          else if (typ == 4) { val v = u32(p + 8); if (v < 0 || v > Int.MaxValue) null else Integer.valueOf(v.toInt) }
          else null
        tag match {
          case 0x0112 if !sub => orientation = shortOrLong
          case 0x010f if !sub && typ == 2 =>
            make = if (cnt <= 4) readAscii(p + 8, cnt.toInt)
                   else readAscii(base + u32(p + 8).toInt, cnt.toInt)
          case 0x0110 if !sub && typ == 2 =>
            model = if (cnt <= 4) readAscii(p + 8, cnt.toInt)
                    else readAscii(base + u32(p + 8).toInt, cnt.toInt)
          case 0x8769 if !sub && typ == 4 => exifPtr = u32(p + 8)
          case 0xa002 if sub => pixelX = shortOrLong
          case 0xa003 if sub => pixelY = shortOrLong
          case _ =>
        }
        e += 1
      }
      exifPtr
    }

    val exifPtr = walkIfd(base + ifd0.toInt, sub = false)
    if (exifPtr >= 8 && base + exifPtr + 2 <= end)
      walkIfd(base + exifPtr.toInt, sub = true)
    Exif(hasExif = true, byteOrder = if (little) "II" else "MM",
      orientation = orientation, make = make, model = model,
      pixelX = pixelX, pixelY = pixelY)
  }
}

/** exif_probe(binary) → struct<has_exif, byte_order, orientation, make,
  * model, pixel_x, pixel_y> — [[ExifFormats.probe]] as a scalar
  * expression (pure map, header-only). */
case class ExifProbe(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def nullSafeEval(input: Any): Any = {
    val p = ExifFormats.probe(input.asInstanceOf[Array[Byte]])
    InternalRow(p.hasExif,
      if (p.byteOrder == null) null else UTF8String.fromString(p.byteOrder),
      p.orientation,
      if (p.make == null) null else UTF8String.fromString(p.make),
      if (p.model == null) null else UTF8String.fromString(p.model),
      p.pixelX, p.pixelY)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"exif_probe expects BINARY, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("has_exif", BooleanType, nullable = false),
    StructField("byte_order", StringType, nullable = true),
    StructField("orientation", IntegerType, nullable = true),
    StructField("make", StringType, nullable = true),
    StructField("model", StringType, nullable = true),
    StructField("pixel_x", IntegerType, nullable = true),
    StructField("pixel_y", IntegerType, nullable = true)))
  override protected def withNewChildInternal(newChild: Expression): ExifProbe =
    copy(child = newChild)
  override def prettyName: String = "exif_probe"
}
