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
}
