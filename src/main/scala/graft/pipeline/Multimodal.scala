package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata.
  *
  * The Spark-side architecture is real — binary columns, typed Datasets,
  * partition-batched decode, metadata schemas, partition sizing — while the
  * actual media decode is a clearly-marked DETERMINISTIC FAKE (this
  * container has no image/audio codecs). Swapping `fakeDecode` for a real
  * decoder (e.g. a JNI/FFI call) changes nothing upstream or downstream.
  *
  * Scale notes: decode runs via mapPartitions so codec state is reused
  * per-partition (not per-row); payloads stay off the driver; metadata-only
  * downstream stages never touch the binary column again (column pruning).
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)
  case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
                       width: Int, height: Int, n_frames: Int)

  /** Synthesize a binary payload column from text (stand-in for real blob
    * ingestion; deterministic: UTF-8 bytes). */
  def synthesizePayloads(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      concat(lit("image/fake-"), (col(idCol) % 3).cast("string")).as("media_type"))

  /** ======= STUB: deterministic fake decoder =======
    * A real implementation would parse the container format; the fake
    * derives metadata purely from payload bytes so tests + oracles are
    * exact. Batch shape (Iterator → Iterator) is the real contract. */
  private def fakeDecode(rows: Iterator[MediaRow]): Iterator[MediaMeta] =
    rows.map { r =>
      val n = r.payload.length.toLong
      MediaMeta(r.doc_id, r.media_type, n,
        width = (16 + n % 640).toInt,
        height = (16 + (n * 7) % 480).toInt,
        n_frames = (1 + n % 5).toInt)
    }

  /** Decode payloads to typed metadata via partition-batched processing. */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(fakeDecode)
  }

  /** ======= STUB decode + REAL perceptual hash =======
    * Difference hash (dHash) per image: decode to a 9×8 grayscale grid,
    * then bit (r,c) = 1 iff grid(r,c+1) > grid(r,c) — near-identical
    * images flip only the bits whose local gradient changed, so visual
    * near-dups sit at small hamming distance. The GRID is the stub (a
    * deterministic arithmetic fake — no codecs in this container; a real
    * decoder swaps into `fakeGray` and nothing downstream changes); the
    * hash math, the batch shape, and the [[Dedup.hamming64Pairs]] radius
    * join downstream are the real pipeline. Bit 63 is reserved ZERO (63
    * comparison bits) so the fingerprint stays non-negative in engines
    * without unsigned 64-bit — the blocking is indifferent. Output:
    * `doc_id, dhash`. */
  def grayDHash(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val g = fakeGray(r.doc_id)
        var dh = 0L
        var b = 0
        while (b < 63) {
          val (row, c) = (b / 8, b % 8)
          if (g(row * 9 + c + 1) > g(row * 9 + c)) dh |= (1L << b)
          b += 1
        }
        (r.doc_id, dh)
      }
    }.toDF("doc_id", "dhash")
  }

  /** The fake 9×8 grayscale decode: docs in the same group of 8 share a
    * base image; each doc perturbs ONE cell by its in-group index —
    * planted near-dups at hamming ≤ 2 per perturbed neighbor, exactly
    * what a thumbnail/re-encode pass produces. Replayable in SQL (the
    * oracle recomputes this arithmetic), which a real pixel decode would
    * not be — that is the point of the stub. */
  private def fakeGray(docId: Long): Array[Int] =
    Array.tabulate(72) { k =>
      val base = (((docId / 8) * 31 + k * 131) % 251).toInt
      if (k == (docId % 72).toInt) base + (docId % 8).toInt else base
    }

  /** ======= STUB: resize =======
    * Real impl: scaled pixel buffer. Fake: metadata-only transform with the
    * same signature/flow. */
  def resize(spark: SparkSession, meta: Dataset[MediaMeta], maxW: Int, maxH: Int): Dataset[MediaMeta] = {
    import spark.implicits._
    meta.map { m =>
      val scale = math.min(1.0, math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
      m.copy(width = math.max(1, math.floor(m.width * scale).toInt),
             height = math.max(1, math.floor(m.height * scale).toInt))
    }
  }

  /** ======= STUB: frame sampling ======= one row per sampled frame. */
  def sampleFrames(spark: SparkSession, meta: Dataset[MediaMeta], everyNth: Int): DataFrame = {
    import spark.implicits._
    meta.flatMap(m => (0 until m.n_frames by everyNth).map(f => (m.doc_id, f, m.width, m.height)))
      .toDF("doc_id", "frame", "width", "height")
  }

  // ======= REAL container probing (not a stub) ==========================
  // graft.functions.MediaProbe parses actual PNG/JPEG/GIF/BMP/WAV headers
  // byte-for-byte per the container specs — no codec involved, which is
  // exactly the point: the 100 TB metadata/filter pass reads headers only.

  /** Spec-valid container payloads (PNG IHDR / WAV RIFF headers with
    * geometry derived from the id) — header-only blobs standing in for
    * real crawled bytes: [[probeMeta]] reads ONLY headers, so everything
    * it touches is real. CRC trailers are zeroed (a full PNG writer would
    * CRC32 the chunk; the probe, like every header prober, ignores it). */
  def synthesizeContainerPayloads(docs: DataFrame, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val payload =
        if (id % 3 != 2) pngHeader((16 + id % 640).toInt, (16 + (id * 7) % 480).toInt)
        else wavHeader((1 + id % 2).toInt, (8000 + (id % 8) * 4000).toInt, 16, 100 + id % 1000)
      (id, payload)
    }.toDF("doc_id", "payload")
  }

  /** Spec-valid FLAC / MP3 headers derived from the id — the audio twin
    * of [[synthesizeContainerPayloads]] (even ids FLAC, odd ids MP3;
    * every 6th MP3 carries an ID3v2 tag so the skip path is exercised).
    * Geometry is pure id arithmetic, so an oracle recomputes it exactly. */
  def synthesizeAudioPayloads(docs: DataFrame, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val payload =
        if (id % 2 == 0)
          flacHeader(channels = (1 + (id % 4) / 2).toInt,
            rate = (8000 + (id % 8) * 4000).toInt, bits = 16,
            totalSamples = 1000 + id % 5000)
        else
          mp3Header(srIdx = (id % 3).toInt, mono = id % 4 == 1,
            id3Pad = if (id % 6 == 1) (id % 100).toInt else -1)
      (id, payload)
    }.toDF("doc_id", "payload")
  }

  private def flacHeader(channels: Int, rate: Int, bits: Int,
                         totalSamples: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + 34)
    bb.put("fLaC".getBytes("US-ASCII"))
    bb.put(0x80.toByte) // last-metadata-block flag + type 0 (STREAMINFO)
    bb.put(0.toByte); bb.put(0.toByte); bb.put(34.toByte) // be24 length
    bb.putShort(4096.toShort); bb.putShort(4096.toShort)  // min/max block
    bb.put(new Array[Byte](6))                            // min/max frame (unknown)
    // packed 64 bits: rate(20) channels-1(3) bits-1(5) totalSamples(36)
    bb.putLong((rate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bits - 1).toLong << 36) | (totalSamples & 0xfffffffffL))
    bb.put(new Array[Byte](16))                           // md5 of raw audio (zeroed)
    bb.array() // 42 bytes exactly: 4 magic + 4 block header + 34 STREAMINFO
  }

  private def mp3Header(srIdx: Int, mono: Boolean, id3Pad: Int): Array[Byte] = {
    val tag = if (id3Pad < 0) Array.empty[Byte] else {
      val t = java.nio.ByteBuffer.allocate(10 + id3Pad)
      t.put("ID3".getBytes("US-ASCII"))
      t.put(3.toByte); t.put(0.toByte) // v2.3
      t.put(0.toByte)                  // flags: no footer
      // syncsafe size (7 bits per byte)
      t.put(((id3Pad >> 21) & 0x7f).toByte); t.put(((id3Pad >> 14) & 0x7f).toByte)
      t.put(((id3Pad >> 7) & 0x7f).toByte); t.put((id3Pad & 0x7f).toByte)
      t.array() // pad bytes already zeroed
    }
    // MPEG1 Layer III, no CRC; bitrate index 9 (128 kbps); mode in bits 6-7
    val frame = Array(0xff.toByte, 0xfb.toByte,
      ((9 << 4) | (srIdx << 2)).toByte,
      (if (mono) 0xc0 else 0x40).toByte)
    tag ++ frame ++ new Array[Byte](16) // a few post-header bytes like real frames
  }

  private def pngHeader(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + 4 + 13 + 4) // sig + len + IHDR + fields + crc
    bb.put(graft.functions.MediaFormats.PngSig)
    bb.putInt(13)
    bb.put("IHDR".getBytes("US-ASCII"))
    bb.putInt(w); bb.putInt(h)
    bb.put(8.toByte)  // bit depth
    bb.put(6.toByte)  // color type 6 = RGBA
    bb.put(0.toByte); bb.put(0.toByte); bb.put(0.toByte)
    bb.putInt(0)      // CRC zeroed (see scaladoc)
    bb.array()
  }

  private def wavHeader(channels: Int, rate: Int, bits: Int, nSamples: Long): Array[Byte] = {
    val dataBytes = (nSamples * channels * bits / 8).toInt
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + 16 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataBytes)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1.toShort)                       // PCM
    bb.putShort(channels.toShort)
    bb.putInt(rate)
    bb.putInt(rate * channels * bits / 8)        // byte rate
    bb.putShort((channels * bits / 8).toShort)   // block align
    bb.putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataBytes)
    bb.array()                                    // header-only: sample payload omitted
  }

  /** Expand [[graft.functions.MediaProbe]] over a payload column: one
    * header-only pure-map pass → typed metadata columns. */
  def probeMeta(media: DataFrame, payloadCol: String): DataFrame = {
    import org.apache.spark.sql.graftshim.{GraftShim => E}
    media.withColumn("__p",
        E.column(graft.functions.MediaProbe(E.expression(col(payloadCol)))))
      .select(media.columns.filterNot(_ == payloadCol).map(col).toSeq :+ col("__p.*"): _*)
  }
}
