package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata.
  *
  * The decode path is REAL: payloads are actual PNG/GIF containers built
  * by the JDK's own encoders, and every decode goes through
  * `javax.imageio` (PNG/JPEG/GIF/BMP/TIFF readers ship with this JVM) —
  * pixels, frame counts, and dimensions all come off the real decoder.
  * Determinism for the hash-gated oracles comes from the BUILDERS: the
  * synthesized images carry id-derived geometry and pixel content, and
  * lossless containers (gray PNG) round-trip those pixels exactly, so a
  * SQL oracle replays the arithmetic the builder used while the query
  * under test runs the full encode → decode → measure pipeline.
  *
  * Scale notes: decode runs via mapPartitions so decoder state is reused
  * per-partition (not per-row); payloads stay off the driver; metadata-only
  * downstream stages never touch the binary column again (column pruning).
  * ImageIO's disk cache is disabled (`setUseCache(false)`) — blob decode
  * must never page through executor-local tmp files.
  */
object Multimodal {

  case class MediaBlob(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
                       width: Int, height: Int, n_frames: Int)

  javax.imageio.ImageIO.setUseCache(false)

  // ======= REAL image builders (JDK encoders; id-derived content) =======

  /** Per-doc REAL image payloads with id-derived geometry: even ids → a
    * grayscale PNG (1 frame), odd ids → an animated GIF with `1 + id % 4`
    * frames — both written by the JDK's own `ImageWriter`s, so the decode
    * side exercises genuine container parsing. Geometry is pure id
    * arithmetic (w = 16 + id%64, h = 16 + (id·7)%48), which is what makes
    * the decoded metadata oracle-replayable. */
  def synthesizeImagePayloads(docs: DataFrame, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = (16 + id % 64).toInt
        val h = (16 + (id * 7) % 48).toInt
        val payload =
          if (id % 2 == 0) encodePng(grayImage(w, h, (id % 251).toInt))
          else encodeGif((0 until (1 + id % 4).toInt)
            .map(f => grayImage(w, h, ((id + f * 17) % 251).toInt)))
        (id, payload)
      }
    }.toDF("doc_id", "payload")
  }

  /** Per-doc REAL JPEGs — the dominant crawl format. Same id-derived
    * geometry as [[synthesizeImagePayloads]] (w = 16 + id%64,
    * h = 16 + (id·7)%48, 1 frame), content a smooth diagonal gradient
    * `luma(x,y) = (x·3 + y·5 + id·11) % 240` (JPEG-friendly — no hard
    * edges to ring on), written by the JDK's own JPEG encoder at its
    * default quality. JPEG is LOSSY: pixel metrics off these payloads
    * are deterministic (same encoder, same input, same bytes) but NOT
    * SQL-replayable — pixel queries over them declare rows-only with
    * tolerance SPECS (dHash within a hamming band of the planted
    * gradient's, mean luma within a band), while header metadata
    * (dims/format/frame count) survives the codec exactly and
    * hash-gates. */
  def synthesizeJpegPayloads(docs: DataFrame, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = (16 + id % 64).toInt
        val h = (16 + (id * 7) % 48).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, ((x * 3 + y * 5 + id * 11) % 240).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        (id, bos.toByteArray)
      }
    }.toDF("doc_id", "payload")
  }

  /** Per-doc REAL grayscale PNGs whose pixels carry the deterministic
    * 9×8 grid `gridCell(id, k)` replicated ×4 (36×32 px) — docs in the
    * same group of 8 share a base image and each doc perturbs ONE cell,
    * planting near-dups at small hamming distance, exactly what a
    * thumbnail/re-encode pass produces. Gray PNG is lossless, so
    * [[grayDHash]]'s real decode + box downsample recovers the grid
    * EXACTLY and the dHash oracle replays the grid arithmetic in SQL. */
  def synthesizeGridPayloads(docs: DataFrame, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val img = new java.awt.image.BufferedImage(
          36, 32, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < 32) {
          var x = 0
          while (x < 36) {
            raster.setSample(x, y, 0, gridCell(id, (y / 4) * 9 + (x / 4)))
            x += 1
          }
          y += 1
        }
        (id, encodePng(img))
      }
    }.toDF("doc_id", "payload")
  }

  /** The planted 9×8 grid value at cell k (row-major over 72 cells):
    * base mod 248 keeps `base + perturbation ≤ 254`, inside 8-bit gray.
    * Mirrored verbatim by the `multimodal_phash_pairs` oracle. */
  private[pipeline] def gridCell(docId: Long, k: Int): Int = gridCellAt(docId, 0, k)

  /** Frame-f variant: the perturbed cell ADVANCES with the frame index —
    * consecutive frames of one doc are near-identical (≤ 4 dHash bits),
    * the video re-encode shape. Frame 0 ≡ [[gridCell]]. Mirrored by the
    * `multimodal_frame_phash` oracle. */
  private[pipeline] def gridCellAt(docId: Long, f: Int, k: Int): Int = {
    val base = (((docId / 8) * 31 + k * 131) % 248).toInt
    if (k == ((docId + f) % 72).toInt) base + (docId % 8).toInt else base
  }

  /** Animated-GIF twin of [[synthesizeGridPayloads]]: `1 + id % 3` frames,
    * frame f carrying `gridCellAt(id, f, ·)` ×4-replicated. Frames use an
    * EXPLICIT 256-gray indexed palette — a GIF stores palette indices
    * verbatim (lossless for indexed images), and the JDK writer preserves
    * a pre-indexed image's palette, so per-frame decode recovers each
    * grid exactly (spec-pinned); letting the writer quantize a
    * ComponentColorModel gray image instead would put palette choice —
    * and thus bit-exactness — outside the builder's control. */
  def synthesizeGridGifPayloads(docs: DataFrame, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      val grays = Array.tabulate(256)(_.toByte)
      val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
      ids.map { id =>
        val frames = (0 until (1 + id % 3).toInt).map { f =>
          val img = new java.awt.image.BufferedImage(
            36, 32, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
          val raster = img.getRaster
          var y = 0
          while (y < 32) {
            var x = 0
            while (x < 36) {
              raster.setSample(x, y, 0, gridCellAt(id, f, (y / 4) * 9 + (x / 4)))
              x += 1
            }
            y += 1
          }
          img
        }
        (id, encodeGif(frames))
      }
    }.toDF("doc_id", "payload")
  }

  private def grayImage(w: Int, h: Int, v: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, v); x += 1 }
      y += 1
    }
    img
  }

  private[pipeline] def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Animated GIF via the JDK writer's sequence API — one image
    * descriptor per frame, which is what `getNumImages(true)` counts. */
  private def encodeGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    baos.toByteArray
  }

  // ======= REAL decoders (javax.imageio; mapPartitions decode seam) =====

  /** Open a reader positioned on the payload. Caller must `dispose()`.
    * Returns null when no installed reader claims the bytes. */
  private def openReader(payload: Array[Byte]): javax.imageio.ImageReader = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    if (!readers.hasNext) { iis.close(); return null }
    val r = readers.next()
    r.setInput(iis, false, false)
    r
  }

  /** REAL header-level decode: format name, dimensions, and frame count
    * straight from the JDK reader (`getNumImages(true)` walks every GIF
    * image descriptor; pixels are NOT decoded — this is the cheap
    * metadata pass). Undecodable payloads fail LOUDLY: a curation
    * pipeline routes unknown blobs through [[probeMeta]]'s sniffing
    * instead of silently inventing metadata for them. */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaBlob].mapPartitions { rows =>
      rows.map(r => metaOf(r.doc_id, r.payload))
    }
  }

  /** RESOLUTION / ASPECT-RATIO screen (r11) — the geometry gate every
    * image-training recipe applies before pixels are even touched
    * (LAION-style: drop thumbnails below a minimum side, drop banner
    * strips with extreme aspect ratios): REAL header decode
    * ([[decodeMeta]]) → pure integer verdicts with first-failing-rule
    * attribution (`too_small` → `extreme_aspect`, the tolerant-decode
    * accounting convention — every drop names its rule).
    *
    * Output: `doc_id, width, height, min_side, aspect_pct
    * (= max·100 DIV min), reject_reason (NULL = kept), keep`.
    * Plan: the decoder seam is the one mapPartitions pass; the verdict
    * is codegen'd column logic — stream-safe, no shuffle. */
  def resolutionScreen(spark: SparkSession, media: DataFrame,
                       minSide: Int = 24, maxAspectPct: Long = 250): DataFrame = {
    require(minSide >= 1 && maxAspectPct >= 100,
      s"need minSide >= 1 and maxAspectPct >= 100, got $minSide/$maxAspectPct")
    decodeMeta(spark, media).toDF()
      .select(col("doc_id"), col("width"), col("height"))
      .withColumn("min_side", least(col("width"), col("height")))
      .withColumn("aspect_pct",
        expr("CAST(greatest(width, height) * 100 DIV least(width, height) AS BIGINT)"))
      .withColumn("reject_reason",
        when(col("min_side") < minSide, lit("too_small"))
          .when(col("aspect_pct") > maxAspectPct, lit("extreme_aspect")))
      .withColumn("keep", col("reject_reason").isNull)
  }

  /** Thrown where NO installed decoder claims the bytes — a subclass of
    * IllegalArgumentException so the loud paths keep their documented
    * exception type, but distinguishable by the tolerant twins' error
    * classifier (a claimed reader choking mid-decode with its own IAE
    * must NOT class as "no_reader"). */
  private final class NoReaderException(msg: String)
    extends IllegalArgumentException(msg)

  private def metaOf(docId: Long, payload: Array[Byte]): MediaMeta = {
    val reader = openReader(payload)
    if (reader == null)
      throw new NoReaderException(s"doc $docId: no installed ImageIO reader claims payload")
    try {
      val fmt = reader.getFormatName.toLowerCase
      MediaMeta(docId, s"image/$fmt", payload.length.toLong,
        reader.getWidth(0), reader.getHeight(0),
        reader.getNumImages(true))
    } finally reader.dispose()
  }

  /** REAL per-frame sampling: every `everyNth` image descriptor of the
    * container (GIF animation frames; PNG = the single frame 0), with
    * the frame's own decoded dimensions. One output row per kept frame. */
  def sampleFrames(spark: SparkSession, media: DataFrame, everyNth: Int): DataFrame = {
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaBlob].mapPartitions { rows =>
      rows.flatMap { r =>
        val reader = openReader(r.payload)
        require(reader != null, s"doc ${r.doc_id}: no installed ImageIO reader claims payload")
        try {
          val n = reader.getNumImages(true)
          (0 until n by everyNth).map { f =>
            (r.doc_id, f, reader.getWidth(f), reader.getHeight(f))
          }
        } finally reader.dispose()
      }
    }.toDF("doc_id", "frame", "width", "height")
  }

  /** Decode a payload to an 8-bit luma (grayscale) pixel matrix.
    * Gray rasters read their sample directly; color pixels reduce by the
    * integer Rec-601-style luma `(77R + 150G + 29B) >> 8` — the weights
    * sum to 256, so an R=G=B gray encoded as RGB recovers its gray value
    * EXACTLY (pinned by spec). */
  private[pipeline] def decodeLuma(payload: Array[Byte]): Array[Array[Int]] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    // ImageIO.read returns null exactly when no installed reader claims
    // the bytes (decode failures of a claimed reader THROW instead)
    if (img == null) throw new NoReaderException("undecodable image payload")
    lumaOf(img)
  }

  private def lumaOf(img: java.awt.image.BufferedImage): Array[Array[Int]] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val out = Array.ofDim[Int](h, w)
    if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) {
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y)(x) = raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
    } else {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          out(y)(x) = (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff)
            + 29 * (rgb & 0xff)) >> 8
          x += 1
        }
        y += 1
      }
    }
    out
  }

  /** Integer box-average downsample of a luma matrix to a `gw×gh` grid:
    * cell (r,c) averages pixels x ∈ [c·W/9, (c+1)·W/9), y likewise
    * (floor-division boundaries; an empty range clamps to one pixel so
    * tiny images — the 1×1 tracking pixel — still produce a grid).
    * `floor(sum/area)` is EXACT on uniform blocks, which is how the
    * ×4-replicated grid payloads recover their grid bit-for-bit. */
  private[pipeline] def boxGrid(luma: Array[Array[Int]], gw: Int, gh: Int): Array[Int] = {
    val h = luma.length
    val w = luma(0).length
    Array.tabulate(gh * gw) { k =>
      val (r, c) = (k / gw, k % gw)
      // x0 < w and x1 <= w hold for any w >= 1 (and likewise for y), so
      // the empty-range clamp to one pixel needs no further bounds checks
      val x0 = c * w / gw
      val x1 = math.max(x0 + 1, (c + 1) * w / gw)
      val y0 = r * h / gh
      val y1 = math.max(y0 + 1, (r + 1) * h / gh)
      var sum = 0L
      var y = y0
      while (y < y1) {
        var x = x0
        while (x < x1) { sum += luma(y)(x); x += 1 }
        y += 1
      }
      (sum / ((y1 - y0) * (x1 - x0))).toInt
    }
  }

  /** REAL difference hash (dHash): decode pixels with `javax.imageio`,
    * integer-box-downsample to a 9×8 luma grid, then bit (r,c) = 1 iff
    * grid(r,c+1) > grid(r,c) — near-identical images flip only the bits
    * whose local gradient changed, so visual near-dups sit at small
    * hamming distance, feeding the same [[Dedup.hamming64Pairs]] Manku
    * radius join the text simhash path uses. Bit 63 is reserved ZERO (63
    * comparison bits) so the fingerprint stays non-negative in engines
    * without unsigned 64-bit. Output: `doc_id, dhash`. */
  def grayDHash(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaBlob].mapPartitions { rows =>
      rows.map { r =>
        (r.doc_id, dhashOf(boxGrid(decodeLuma(r.payload), gw = 9, gh = 8)))
      }
    }.toDF("doc_id", "dhash")
  }

  /** REAL per-image luma statistics off the full decoded pixel raster —
    * the classic pre-training image-curation filter pass ("drop
    * near-black frames", "drop flat/solid images", "drop blown-out
    * scans") computed from actual pixels in pure integer arithmetic:
    * `luma_min/max` (range 0 = solid color), `luma_mean` (floor of the
    * pixel sum over w·h). Output: `doc_id, width, height, luma_min,
    * luma_max, luma_mean`. On the ×4-replicated grid payloads the stats
    * equal the planted grid's (uniform blocks), so the oracle replays
    * the builder arithmetic while the query decodes real pixels. */
  def imageStats(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaBlob].mapPartitions { rows =>
      rows.map { r => val s = statsOf(decodeLuma(r.payload)); (r.doc_id, s._1, s._2, s._3, s._4, s._5) }
    }.toDF("doc_id", "width", "height", "luma_min", "luma_max", "luma_mean")
  }

  private def statsOf(luma: Array[Array[Int]]): (Int, Int, Int, Int, Long) = {
    val h = luma.length
    val w = luma(0).length
    var mn = 255; var mx = 0; var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = luma(y)(x)
        if (v < mn) mn = v
        if (v > mx) mx = v
        sum += v
        x += 1
      }
      y += 1
    }
    (w, h, mn, mx, sum / (w.toLong * h))
  }

  /** REAL Sobel gradient energy off the full decoded raster — the
    * blur/flat screen of the image-curation battery (a sharp image has
    * high local gradient; a defocused or solid frame collapses toward
    * zero — the standard cheap "drop blurry scans before the GPU sees
    * them" pass). Classic 3×3 Sobel over interior pixels, energy =
    * Σ(|Gx| + |Gy|), all integer (|G| ≤ 8·255·2 per pixel — long-safe to
    * gigapixel rasters); `mean_grad = energy DIV interior` normalizes
    * across sizes. Images too small for an interior (the 1×1 tracking
    * pixel) read 0/0, not an error. Output: `doc_id, width, height,
    * edge_energy, mean_grad`. On the replicated-grid payloads the
    * decoded raster IS the planted grid ×4, so the oracle replays the
    * builder arithmetic at pixel level while the query runs the real
    * encode→decode→convolve pipeline. */
  def sobelEnergy(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaBlob].mapPartitions { rows =>
      rows.map { r => val s = sobelOf(decodeLuma(r.payload)); (r.doc_id, s._1, s._2, s._3, s._4) }
    }.toDF("doc_id", "width", "height", "edge_energy", "mean_grad")
  }

  private def sobelOf(luma: Array[Array[Int]]): (Int, Int, Long, Long) = {
    val h = luma.length
    val w = luma(0).length
    var sum = 0L
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val gx = (luma(y - 1)(x + 1) + 2 * luma(y)(x + 1) + luma(y + 1)(x + 1)) -
          (luma(y - 1)(x - 1) + 2 * luma(y)(x - 1) + luma(y + 1)(x - 1))
        val gy = (luma(y + 1)(x - 1) + 2 * luma(y + 1)(x) + luma(y + 1)(x + 1)) -
          (luma(y - 1)(x - 1) + 2 * luma(y - 1)(x) + luma(y - 1)(x + 1))
        sum += math.abs(gx) + math.abs(gy)
        x += 1
      }
      y += 1
    }
    val interior = (w - 2).toLong * (h - 2)
    (w, h, sum, if (interior > 0) sum / interior else 0L)
  }

  /** REAL per-frame dHash over animated containers — the video-style
    * frame-level near-dup pass: every image descriptor decodes through
    * the same luma → 9×8 box grid → dHash chain as [[grayDHash]], one
    * row per frame, ready for [[Dedup.hamming64Pairs]] over
    * `(doc_id·1000 + frame)` keys or cross-video frame matching.
    * Output: `doc_id, frame, dhash`. */
  def frameDHash(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaBlob].mapPartitions { rows =>
      rows.flatMap { r =>
        val reader = openReader(r.payload)
        require(reader != null, s"doc ${r.doc_id}: no installed ImageIO reader claims payload")
        try {
          val n = reader.getNumImages(true)
          (0 until n).map { f =>
            val img = reader.read(f)
            val luma = lumaOf(img)
            (r.doc_id, f, dhashOf(boxGrid(luma, gw = 9, gh = 8)))
          }
        } finally reader.dispose()
      }
    }.toDF("doc_id", "frame", "dhash")
  }

  private def dhashOf(g: Array[Int]): Long = {
    var dh = 0L
    var b = 0
    while (b < 63) {
      val (row, c) = (b / 8, b % 8)
      if (g(row * 9 + c + 1) > g(row * 9 + c)) dh |= (1L << b)
      b += 1
    }
    dh
  }

  /** REAL bounded-box resize: decode → nearest-neighbor downscale to fit
    * `maxW×maxH` (never upscales) → re-encode as gray PNG. Target
    * dimensions are PURE INTEGER arithmetic — when the width binds
    * (`maxW·h0 ≥ maxH·w0` decides which side is tight), `tw = maxW,
    * th = h0·maxW DIV w0`, and symmetrically — so a SQL oracle replays
    * them exactly; nearest-neighbor samples `in(x·w0 DIV tw, y·h0 DIV
    * th)`, which recovers replicated-grid content exactly (spec).
    * Output: `doc_id, payload (new PNG), width, height`. */
  def resizePixels(spark: SparkSession, media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    require(maxW >= 1 && maxH >= 1, s"bounds must be >= 1, got ${maxW}x$maxH")
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaBlob].mapPartitions { rows =>
      rows.map { r =>
        val luma = decodeLuma(r.payload)
        val h0 = luma.length
        val w0 = luma(0).length
        val (tw, th) =
          if (w0 <= maxW && h0 <= maxH) (w0, h0)
          else if (maxW.toLong * h0 <= maxH.toLong * w0)
            (maxW, math.max(1, (h0.toLong * maxW / w0).toInt))
          else
            (math.max(1, (w0.toLong * maxH / h0).toInt), maxH)
        val img = new java.awt.image.BufferedImage(
          tw, th, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < th) {
          var x = 0
          while (x < tw) {
            raster.setSample(x, y, 0, luma(y * h0 / th)(x * w0 / tw))
            x += 1
          }
          y += 1
        }
        (r.doc_id, encodePng(img), tw, th)
      }
    }.toDF("doc_id", "payload", "width", "height")
  }

  // ======= REAL PCM audio stats (WAV data chunk; no codec needed) =======

  /** Per-doc REAL WAV files (RIFF header + interleaved 16-bit LE PCM
    * frames) with id-derived geometry AND samples: channels `1 + id%2`,
    * rate `8000 + (id%8)·4000`, `64 + id%129` frames; sample
    * `s(ch, i) = ((id·2663 + ch·7919 + i·104729) % 65536) − 32768`,
    * forced to 32767 every 37th frame so the clipping counter always has
    * real work. Pure id arithmetic → the stats oracle replays it. */
  def synthesizeWavPcmPayloads(docs: DataFrame, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val channels = (1 + id % 2).toInt
        val rate = (8000 + (id % 8) * 4000).toInt
        val nFrames = (64 + id % 129).toInt
        val dataBytes = nFrames * channels * 2
        val bb = java.nio.ByteBuffer.allocate(12 + 8 + 16 + 8 + dataBytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataBytes)
        bb.put("WAVE".getBytes("US-ASCII"))
        bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
        bb.putShort(1.toShort)
        bb.putShort(channels.toShort)
        bb.putInt(rate)
        bb.putInt(rate * channels * 2)
        bb.putShort((channels * 2).toShort)
        bb.putShort(16.toShort)
        bb.put("data".getBytes("US-ASCII")); bb.putInt(dataBytes)
        var i = 0
        while (i < nFrames) {
          var ch = 0
          while (ch < channels) {
            bb.putShort(pcmSample(id, ch, i).toShort)
            ch += 1
          }
          i += 1
        }
        (id, bb.array())
      }
    }.toDF("doc_id", "payload")
  }

  /** The planted sample value — mirrored verbatim by the
    * `multimodal_pcm_stats` oracle. */
  private[pipeline] def pcmSample(id: Long, ch: Int, i: Int): Int =
    if (i % 37 == 0) 32767
    else (((id * 2663 + ch * 7919L + i * 104729L) % 65536) - 32768).toInt

  /** WAV builder with PLANTED silence structure: `id%7` leading zero
    * frames, `id%5` trailing zeros, and a mid-stream quiet run of
    * `id%9` frames at offset 40 whose samples are small-but-NONZERO
    * (`(id+ch)%200 − 100`, inside any sane threshold) — so
    * [[pcmSilence]]'s threshold semantics, not just zero-detection, are
    * exercised; everything else is the loud [[pcmSilenceSample]]
    * formula. Pure id arithmetic, replayed by the oracle. */
  def synthesizeWavSilencePayloads(docs: DataFrame, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val channels = (1 + id % 2).toInt
        val nFrames = (80 + id % 100).toInt
        val dataBytes = nFrames * channels * 2
        val bb = java.nio.ByteBuffer.allocate(12 + 8 + 16 + 8 + dataBytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataBytes)
        bb.put("WAVE".getBytes("US-ASCII"))
        bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
        bb.putShort(1.toShort)
        bb.putShort(channels.toShort)
        bb.putInt(16000)
        bb.putInt(16000 * channels * 2)
        bb.putShort((channels * 2).toShort)
        bb.putShort(16.toShort)
        bb.put("data".getBytes("US-ASCII")); bb.putInt(dataBytes)
        var i = 0
        while (i < nFrames) {
          var ch = 0
          while (ch < channels) {
            bb.putShort(pcmSilenceSample(id, ch, i, nFrames).toShort)
            ch += 1
          }
          i += 1
        }
        (id, bb.array())
      }
    }.toDF("doc_id", "payload")
  }

  /** Planted-silence sample — mirrored verbatim by the
    * `multimodal_pcm_silence` oracle. */
  private[pipeline] def pcmSilenceSample(id: Long, ch: Int, i: Int, n: Int): Int =
    if (i < id % 7 || i >= n - id % 5) 0
    else if (i >= 40 && i < 40 + id % 9) ((id + ch) % 200 - 100).toInt
    else (((id * 2663 + ch * 7919L + i * 104729L) % 65536) - 32768).toInt

  /** REAL per-channel PCM statistics off the WAV data chunk — the
    * pre-transcode audio filter pass (silence, clipping, hot masters)
    * that needs NO codec, just the container walk [[graft.functions.MediaProbe]]
    * already does plus the sample bytes. Integer arithmetic throughout:
    * `peak_abs = max|s|`, `sum_sq = Σs²` (exact in BIGINT to ~2·10¹²
    * frames), `clip_ppm = 10⁶·#{s ∈ {−32768, 32767}} DIV n` — RMS is
    * `sqrt(sum_sq/n)` for anyone who wants the float, but the GATE stays
    * integer. 16-bit PCM only (the overwhelming interchange format);
    * anything else fails loudly. Output: `doc_id, channel, n_samples,
    * peak_abs, sum_sq, clip_ppm`. */
  /** Real RIFF chunk walk shared by the PCM passes: fmt → geometry,
    * data → sample window; 16-bit PCM only (loud otherwise); extra
    * chunks and odd-length padding handled per the RIFF spec. */
  private case class WavPcm(channels: Int, dataOff: Int, nFrames: Int)
  private def walkWav(docId: Long, b: Array[Byte]): WavPcm = {
    require(b.length >= 44 &&
      new String(b, 0, 4, "US-ASCII") == "RIFF" &&
      new String(b, 8, 4, "US-ASCII") == "WAVE",
      s"doc $docId: not a RIFF/WAVE payload")
    var channels = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    var off = 12
    def le16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def le32(i: Int): Int = le16(i) | (le16(i + 2) << 16)
    while (off + 8 <= b.length && (channels == 0 || dataOff < 0)) {
      val cid = new String(b, off, 4, "US-ASCII")
      val len = le32(off + 4)
      if (cid == "fmt ") {
        channels = le16(off + 10)
        bits = le16(off + 22)
      } else if (cid == "data") {
        dataOff = off + 8
        dataLen = math.min(len, b.length - dataOff)
      }
      off += 8 + len + (len & 1)
    }
    require(channels > 0 && dataOff >= 0, s"doc $docId: missing fmt/data chunk")
    require(bits == 16, s"doc $docId: only 16-bit PCM supported, got $bits")
    WavPcm(channels, dataOff, dataLen / (channels * 2))
  }

  private def sampleAt(b: Array[Byte], w: WavPcm, frame: Int, ch: Int): Int = {
    val p = w.dataOff + (frame * w.channels + ch) * 2
    (((b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)).toShort).toInt
  }

  def pcmStats(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaBlob].mapPartitions { rows =>
      rows.flatMap { r =>
        val w = walkWav(r.doc_id, r.payload)
        (0 until w.channels).map { ch =>
          var i = 0
          var peak = 0L; var sumSq = 0L; var nClip = 0L
          while (i < w.nFrames) {
            val s = sampleAt(r.payload, w, i, ch)
            val a = math.abs(s.toLong)
            if (a > peak) peak = a
            sumSq += s.toLong * s
            if (s == 32767 || s == -32768) nClip += 1
            i += 1
          }
          (r.doc_id, ch, w.nFrames.toLong, peak, sumSq,
            if (w.nFrames == 0) 0L else nClip * 1000000L / w.nFrames)
        }
      }
    }.toDF("doc_id", "channel", "n_samples", "peak_abs", "sum_sq", "clip_ppm")
  }

  /** REAL per-channel silence analysis — the trim/VAD-prep pass a speech
    * corpus runs before any transcoder: a frame is silent when
    * `|s| < threshold`; per channel the pass reports total silent frames,
    * the LEADING and TRAILING silent runs (the trim points), and the
    * longest interior run (a dead-air splice detector). One linear scan
    * over the data chunk, integer arithmetic only. Output: `doc_id,
    * channel, n_samples, n_silent, lead_silent, tail_silent, max_run`. */
  def pcmSilence(spark: SparkSession, media: DataFrame,
                 threshold: Int = 256): DataFrame = {
    require(threshold >= 1 && threshold <= 32768,
      s"threshold must be in [1, 32768], got $threshold")
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaBlob].mapPartitions { rows =>
      rows.flatMap { r =>
        val w = walkWav(r.doc_id, r.payload)
        (0 until w.channels).map { ch =>
          var i = 0
          var nSilent = 0L; var run = 0L; var maxRun = 0L
          var lead = -1L; var lastLoud = -1L
          while (i < w.nFrames) {
            val silent = math.abs(sampleAt(r.payload, w, i, ch)) < threshold
            if (silent) {
              nSilent += 1
              run += 1
              if (run > maxRun) maxRun = run
            } else {
              run = 0
              if (lead < 0) lead = i.toLong
              lastLoud = i.toLong
            }
            i += 1
          }
          val n = w.nFrames.toLong
          (r.doc_id, ch, n, nSilent,
            if (lead < 0) n else lead,
            if (lastLoud < 0) n else n - 1 - lastLoud,
            maxRun)
        }
      }
    }.toDF("doc_id", "channel", "n_samples", "n_silent",
      "lead_silent", "tail_silent", "max_run")
  }

  // ======= corrupt-tolerant decode twins (crawl-scale contract) =========
  // The loud decoders above are the curated-fixture contract: a payload
  // that SHOULD decode and doesn't is a pipeline bug and must stop the
  // job. At crawl scale the opposite holds — ONE truncated image in a
  // 100 TB batch must not kill the run — so each decode pass has a
  // tolerant twin mirroring the JSONL/CSV sources' corrupt-retention
  // convention: one output row per input, survivors carrying their
  // metric columns with `_corrupt` NULL, rejects carrying NULL metrics
  // with `_corrupt` = a deterministic error class, so the reject stream
  // is ACCOUNTED and groupable (count by class, quarantine by id)
  // instead of silently dropped or fatally thrown. Error classes:
  //   "no_reader" — no installed decoder claims the bytes (for WAV:
  //                 "bad_wav" — RIFF structure/PCM-format violations);
  //   otherwise   — the decoder exception's class name (a truncated
  //                 PNG IDAT reads "IIOException" from the JDK reader,
  //                 spec-pinned), deterministic for a given JVM family.
  // `n_bytes` stays populated on rejects (payload length needs no
  // decode, and reject SIZE is part of the accounting).

  /** Error class for a failed image decode: only the dedicated
    * [[NoReaderException]] (no installed reader claims the bytes) maps
    * to "no_reader" — a CLAIMED reader choking mid-decode with its own
    * IllegalArgumentException (the JDK JPEG reader does this on some
    * malformed CMYK images) keeps its class name, so the reject
    * accounting never attributes decode chokes to missing decoders. */
  private def imageErrorClass(e: Throwable): String = e match {
    case _: NoReaderException => "no_reader"
    case other => other.getClass.getSimpleName
  }

  /** Tolerant twin of [[decodeMeta]]. Output: `doc_id, media_type,
    * n_bytes, width, height, n_frames, _corrupt`. Note a payload can
    * pass THIS pass and still reject in a pixel pass: a PNG truncated
    * after its IHDR carries valid header metadata over missing image
    * data — run the stats/dHash tolerant twins to quarantine those. */
  def decodeMetaTolerant(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaBlob].mapPartitions { rows =>
      rows.map { r =>
        try {
          val m = metaOf(r.doc_id, r.payload)
          (r.doc_id, Option(m.media_type), m.n_bytes, Option(m.width),
            Option(m.height), Option(m.n_frames), Option.empty[String])
        } catch { case scala.util.control.NonFatal(e) =>
          (r.doc_id, Option.empty[String], r.payload.length.toLong,
            Option.empty[Int], Option.empty[Int], Option.empty[Int],
            Option(imageErrorClass(e)))
        }
      }
    }.toDF("doc_id", "media_type", "n_bytes", "width", "height", "n_frames", "_corrupt")
  }

  /** Tolerant twin of [[imageStats]]. Output: `doc_id, width, height,
    * luma_min, luma_max, luma_mean, _corrupt`. */
  def imageStatsTolerant(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaBlob].mapPartitions { rows =>
      rows.map { r =>
        try {
          val s = statsOf(decodeLuma(r.payload))
          (r.doc_id, Option(s._1), Option(s._2), Option(s._3), Option(s._4),
            Option(s._5), Option.empty[String])
        } catch { case scala.util.control.NonFatal(e) =>
          (r.doc_id, Option.empty[Int], Option.empty[Int], Option.empty[Int],
            Option.empty[Int], Option.empty[Long], Option(imageErrorClass(e)))
        }
      }
    }.toDF("doc_id", "width", "height", "luma_min", "luma_max", "luma_mean", "_corrupt")
  }

  /** Tolerant twin of [[grayDHash]]. Output: `doc_id, dhash, _corrupt`. */
  def grayDHashTolerant(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaBlob].mapPartitions { rows =>
      rows.map { r =>
        try (r.doc_id,
          Option(dhashOf(boxGrid(decodeLuma(r.payload), gw = 9, gh = 8))),
          Option.empty[String])
        catch { case scala.util.control.NonFatal(e) =>
          (r.doc_id, Option.empty[Long], Option(imageErrorClass(e)))
        }
      }
    }.toDF("doc_id", "dhash", "_corrupt")
  }

  /** Tolerant twin of [[sobelEnergy]]. Output: `doc_id, width, height,
    * edge_energy, mean_grad, _corrupt`. */
  def sobelEnergyTolerant(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaBlob].mapPartitions { rows =>
      rows.map { r =>
        try {
          val s = sobelOf(decodeLuma(r.payload))
          (r.doc_id, Option(s._1), Option(s._2), Option(s._3), Option(s._4),
            Option.empty[String])
        } catch { case scala.util.control.NonFatal(e) =>
          (r.doc_id, Option.empty[Int], Option.empty[Int], Option.empty[Long],
            Option.empty[Long], Option(imageErrorClass(e)))
        }
      }
    }.toDF("doc_id", "width", "height", "edge_energy", "mean_grad", "_corrupt")
  }

  /** Tolerant twin of [[pcmSilence]]: survivors emit one row per channel,
    * a reject exactly ONE row with channel NULL (the pcmStats contract).
    * Output: `doc_id, channel, n_samples, n_silent, lead_silent,
    * tail_silent, max_run, _corrupt`. */
  def pcmSilenceTolerant(spark: SparkSession, media: DataFrame,
                         threshold: Int = 256): DataFrame = {
    require(threshold >= 1 && threshold <= 32768,
      s"threshold must be in [1, 32768], got $threshold")
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaBlob].mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val w = walkWav(r.doc_id, r.payload)
          (0 until w.channels).map { ch =>
            var i = 0
            var nSilent = 0L; var run = 0L; var maxRun = 0L
            var lead = -1L; var lastLoud = -1L
            while (i < w.nFrames) {
              val silent = math.abs(sampleAt(r.payload, w, i, ch)) < threshold
              if (silent) {
                nSilent += 1
                run += 1
                if (run > maxRun) maxRun = run
              } else {
                run = 0
                if (lead < 0) lead = i.toLong
                lastLoud = i.toLong
              }
              i += 1
            }
            val n = w.nFrames.toLong
            (r.doc_id, Option(ch), Option(n), Option(nSilent),
              Option(if (lead < 0) n else lead),
              Option(if (lastLoud < 0) n else n - 1 - lastLoud),
              Option(maxRun), Option.empty[String])
          }
        } catch { case scala.util.control.NonFatal(e) =>
          val cls = e match {
            case _: IllegalArgumentException => "bad_wav"
            case other => other.getClass.getSimpleName
          }
          Seq((r.doc_id, Option.empty[Int], Option.empty[Long], Option.empty[Long],
            Option.empty[Long], Option.empty[Long], Option.empty[Long], Option(cls)))
        }
      }
    }.toDF("doc_id", "channel", "n_samples", "n_silent",
      "lead_silent", "tail_silent", "max_run", "_corrupt")
  }

  /** Tolerant twin of [[pcmStats]]: survivors emit one row per channel
    * as the loud pass does; a reject emits exactly ONE row with channel
    * NULL (the channel count is itself decode output). RIFF-structure /
    * format violations (the loud pass's `require`s) class as "bad_wav".
    * Output: `doc_id, channel, n_samples, peak_abs, sum_sq, clip_ppm,
    * _corrupt`. */
  def pcmStatsTolerant(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaBlob].mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val w = walkWav(r.doc_id, r.payload)
          (0 until w.channels).map { ch =>
            var i = 0
            var peak = 0L; var sumSq = 0L; var nClip = 0L
            while (i < w.nFrames) {
              val s = sampleAt(r.payload, w, i, ch)
              val a = math.abs(s.toLong)
              if (a > peak) peak = a
              sumSq += s.toLong * s
              if (s == 32767 || s == -32768) nClip += 1
              i += 1
            }
            (r.doc_id, Option(ch), Option(w.nFrames.toLong), Option(peak),
              Option(sumSq),
              Option(if (w.nFrames == 0) 0L else nClip * 1000000L / w.nFrames),
              Option.empty[String])
          }
        } catch { case scala.util.control.NonFatal(e) =>
          val cls = e match {
            case _: IllegalArgumentException => "bad_wav"
            case other => other.getClass.getSimpleName
          }
          Seq((r.doc_id, Option.empty[Int], Option.empty[Long],
            Option.empty[Long], Option.empty[Long], Option.empty[Long],
            Option(cls)))
        }
      }
    }.toDF("doc_id", "channel", "n_samples", "peak_abs", "sum_sq", "clip_ppm", "_corrupt")
  }

  // ======= REAL container probing (header-only; no pixel decode) ========
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

  /** Spec-valid WebP payloads in all three container flavors derived
    * from the id (r16 — web crawls are heavily WebP, and the crawl
    * chain meets it right after the WARC walk): VP8 lossy on id%3==0
    * (key-frame start code + 14-bit LE dims), VP8L lossless on id%3==1
    * (0x2f signature + packed 14+14-bit dims), VP8X extended on
    * id%3==2 (24-bit LE canvas dims — values past the 14-bit range
    * prove the width). Plants: id%31==0 md5 garbage (not RIFF),
    * id%31==11 TORN at 23 bytes (RIFF/WEBP magic intact, dimension
    * bytes missing) — both read "unknown" with null dims. */
  def synthesizeWebpPayloads(docs: DataFrame, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val payload =
        if (id % 31 == 0)
          java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes("US-ASCII")) ++ new Array[Byte](8)
        else {
          val full = (id % 3) match {
            case 0 => webpVp8((16 + id % 300).toInt, (16 + (id * 7) % 200).toInt)
            case 1 => webpVp8l((16 + id % 300).toInt, (16 + (id * 7) % 200).toInt)
            case _ => webpVp8x((1000 + id % 5000).toInt, (800 + (id * 3) % 4000).toInt)
          }
          if (id % 31 == 11) full.take(23) else full
        }
      (id, payload)
    }.toDF("doc_id", "payload")
  }

  /** RIFF/WEBP wrapper: "RIFF" riff_size(le32) "WEBP" fourcc
    * chunk_size(le32) chunk bytes. */
  private def webpRiff(cc: String, chunk: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(20 + chunk.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(4 + 8 + chunk.length)
    bb.put("WEBP".getBytes("US-ASCII"))
    bb.put(cc.getBytes("US-ASCII")); bb.putInt(chunk.length); bb.put(chunk)
    bb.array()
  }

  /** VP8 lossy: 3-byte frame tag, 9d 01 2a start code, 14-bit LE dims
    * (scale bits 0). */
  private def webpVp8(w: Int, h: Int): Array[Byte] = {
    val c = java.nio.ByteBuffer.allocate(10)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    c.put(0x30.toByte); c.put(0.toByte); c.put(0.toByte)
    c.put(0x9d.toByte); c.put(0x01.toByte); c.put(0x2a.toByte)
    c.putShort(w.toShort); c.putShort(h.toShort)
    webpRiff("VP8 ", c.array())
  }

  /** VP8L lossless: 0x2f signature, then width-1/height-1 as 14+14
    * bits LSB-first (alpha + version bits 0). */
  private def webpVp8l(w: Int, h: Int): Array[Byte] = {
    val bits = (w - 1) | ((h - 1) << 14)
    webpRiff("VP8L", Array[Byte](0x2f.toByte,
      (bits & 0xff).toByte, ((bits >> 8) & 0xff).toByte,
      ((bits >> 16) & 0xff).toByte, ((bits >> 24) & 0xff).toByte))
  }

  /** VP8X extended: flags(1) reserved(3) canvas w-1/h-1 as 24-bit LE. */
  private def webpVp8x(w: Int, h: Int): Array[Byte] = {
    val wm = w - 1; val hm = h - 1
    webpRiff("VP8X", Array[Byte](0x10.toByte, 0, 0, 0,
      (wm & 0xff).toByte, ((wm >> 8) & 0xff).toByte, ((wm >> 16) & 0xff).toByte,
      (hm & 0xff).toByte, ((hm >> 8) & 0xff).toByte, ((hm >> 16) & 0xff).toByte))
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

  /** Spec-valid MP4/ISO-BMFF headers with id-derived geometry — the
    * video twin of [[synthesizeContainerPayloads]]: ftyp + moov(mvhd +
    * video trak(tkhd 16.16 dims + mdia/minf/stbl/stsd codec entry)
    * [+ audio trak]). Pure id arithmetic throughout so an oracle
    * recomputes every field: timescale 1000 with duration units
    * 1000 + (id·13) % 60000 (= duration_ms exactly), dims
    * (160 + id%32·8) × (90 + (id·3)%40·4), codec cycling
    * avc1/hev1/vp09, a second (audio, mp4a, zero-dim) track on odd ids.
    * Corruption plants for the tolerant contract: id%41 == 0 → md5
    * garbage (not ISO-BMFF at all → "unknown"), id%41 == 7 → truncated
    * after ftyp (container identified, every moov field null). */
  def synthesizeMp4Payloads(docs: DataFrame, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val payload =
        if (id % 41 == 0)
          java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes("US-ASCII")) ++ new Array[Byte](8)
        else if (id % 41 == 7) mp4Ftyp()
        else {
          val w = (160 + (id % 32) * 8).toInt
          val h = (90 + ((id * 3) % 40) * 4).toInt
          val durUnits = 1000 + (id * 13) % 60000
          val codec = (id % 3) match {
            case 0 => "avc1"; case 1 => "hev1"; case _ => "vp09"
          }
          val vtrak = mp4Trak(trackId = 1, w = w, h = h, codec = codec)
          val traks =
            if (id % 2 == 1) vtrak ++ mp4Trak(trackId = 2, w = 0, h = 0, codec = "mp4a")
            else vtrak
          mp4Ftyp() ++ mp4Box("moov", mp4Mvhd(timescale = 1000, duration = durUnits) ++ traks)
        }
      (id, payload)
    }.toDF("doc_id", "payload")
  }

  private def mp4Box(tp: String, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
    bb.putInt(8 + body.length)
    bb.put(tp.getBytes("US-ASCII"))
    bb.put(body)
    bb.array()
  }

  private def mp4Ftyp(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.put("isom".getBytes("US-ASCII")) // major brand
    bb.putInt(512)                      // minor version
    bb.put("isom".getBytes("US-ASCII")) // compatible brands
    bb.put("mp42".getBytes("US-ASCII"))
    mp4Box("ftyp", bb.array())
  }

  private def mp4Mvhd(timescale: Int, duration: Long): Array[Byte] = {
    // version-0 mvhd: ver/flags(4) creation(4) modification(4)
    // timescale(4) duration(4) rate(4) volume(2) reserved(10)
    // matrix(36) predefined(24) next_track_id(4) = 100 bytes
    val bb = java.nio.ByteBuffer.allocate(100)
    bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.putInt(timescale); bb.putInt(duration.toInt)
    bb.putInt(0x00010000) // rate 1.0
    bb.putShort(0x0100.toShort) // volume 1.0
    bb.put(new Array[Byte](10))
    bb.put(mp4IdentityMatrix())
    bb.put(new Array[Byte](24))
    bb.putInt(3) // next track id
    mp4Box("mvhd", bb.array())
  }

  private def mp4IdentityMatrix(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(36)
    bb.putInt(0x00010000); bb.putInt(0); bb.putInt(0)
    bb.putInt(0); bb.putInt(0x00010000); bb.putInt(0)
    bb.putInt(0); bb.putInt(0); bb.putInt(0x40000000)
    bb.array()
  }

  private def mp4Trak(trackId: Int, w: Int, h: Int, codec: String): Array[Byte] = {
    // version-0 tkhd: ver/flags(4) creation(4) modification(4)
    // track_id(4) reserved(4) duration(4) reserved(8) layer(2)
    // alternate(2) volume(2) reserved(2) matrix(36) width(4, 16.16)
    // height(4, 16.16) = 84 bytes
    val tk = java.nio.ByteBuffer.allocate(84)
    tk.putInt(7) // ver 0, flags: enabled | in movie | in preview
    tk.putInt(0); tk.putInt(0)
    tk.putInt(trackId); tk.putInt(0); tk.putInt(0)
    tk.put(new Array[Byte](8))
    tk.putShort(0); tk.putShort(0)
    tk.putShort(if (w == 0) 0x0100.toShort else 0) // audio tracks carry volume
    tk.putShort(0)
    tk.put(mp4IdentityMatrix())
    tk.putInt(w << 16); tk.putInt(h << 16)
    // stsd: ver/flags(4) entry_count(4) + one 16-byte sample entry
    // (size(4) fourcc(4) reserved(6) data_reference_index(2))
    val sd = java.nio.ByteBuffer.allocate(8 + 16)
    sd.putInt(0); sd.putInt(1)
    sd.putInt(16); sd.put(codec.getBytes("US-ASCII"))
    sd.put(new Array[Byte](6)); sd.putShort(1.toShort)
    val stbl = mp4Box("stbl", mp4Box("stsd", sd.array()))
    val minf = mp4Box("minf", stbl)
    val mdia = mp4Box("mdia", minf)
    mp4Box("trak", mp4Box("tkhd", tk.array()) ++ mdia)
  }

  /** MP4 payloads with FULL per-track sample tables (r15 — the
    * [[synthesizeMp4Payloads]] sibling for the stts/stsz walk): every
    * non-corrupt id carries a video track (TWO-entry stts — the
    * multi-entry sum is the point — plus an explicit per-sample stsz
    * table), odd ids add an audio track (single-entry stts + the
    * UNIFORM-size stsz path). mdhd alternates version 0/1 (id%5==0 →
    * v1) — same values either way, both parse paths exercised; the
    * video track carries an stss keyframe table (sync every 4+id%6
    * samples), the audio track NONE (the ISO absent-stss = all-sync
    * default path). r16: both tracks also carry the stsc/stco/co64
    * CHUNK tables for [[graft.functions.MediaFormats.probeChunks]] —
    * video chunks of 4+id%3 samples laid out contiguously from offset
    * 4096+id%512 (stco on even ids, co64 on odd — both widths
    * exercised), audio chunks of 8 from offset 1<<20. Plants:
    * id%41==0 md5 garbage (no rows), id%41==7 ftyp-only truncation (no
    * rows), id%41==13 video stsz ABSENT (the torn-table contract:
    * total_bytes/bitrate null while the stts fields stay live — and
    * max_chunk_bytes null while the chunk offsets stay live),
    * id%41==19 video CHUNK TABLES absent (all chunk fields null while
    * the stts/stsz readout stays live — per-table independence). */
  def synthesizeMp4SampleTablePayloads(docs: DataFrame, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val payload =
        if (id % 41 == 0)
          java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes("US-ASCII")) ++ new Array[Byte](8)
        else if (id % 41 == 7) mp4Ftyp()
        else {
          val tsV = (600 + (id % 4) * 200).toInt
          val n1 = (12 + id % 24).toInt
          val d1 = (40 + id % 20).toInt
          val n2 = (8 + (id * 3) % 16).toInt
          val sizes = (0 until (n1 + n2)).map(i => (200 + ((id + i * 7) % 100)).toInt)
          val mdhdV1 = id % 5 == 0
          val kf = (4 + id % 6).toInt // keyframe every kf samples
          val syncs = (1 to (n1 + n2) by kf).toSeq
          val vtrak = mp4TrakSampled(trackId = 1, handler = "vide",
            timescale = tsV, stts = Seq((n1, d1), (n2, d1 + 10)),
            stszFixed = 0, stszSizes = sizes, includeStsz = id % 41 != 13,
            mdhdV1 = mdhdV1, stss = Some(syncs),
            chunks = if (id % 41 == 19) None
                     else Some(((4 + id % 3).toInt, 4096L + id % 512, id % 2 == 1)))
          val traks =
            if (id % 2 == 1) {
              val nA = (50 + id % 40).toInt
              vtrak ++ mp4TrakSampled(trackId = 2, handler = "soun",
                timescale = 8000, stts = Seq((nA, 1024)),
                stszFixed = (128 + id % 64).toInt, stszSizes = Seq.empty,
                includeStsz = true, mdhdV1 = mdhdV1,
                chunks = Some((8, 1L << 20, false)))
            } else vtrak
          mp4Ftyp() ++ mp4Box("moov",
            mp4Mvhd(timescale = 1000, duration = 1000 + (id * 13) % 60000) ++ traks)
        }
      (id, payload)
    }.toDF("doc_id", "payload")
  }

  /** One trak with a full mdia: mdhd (v0 or v1), hdlr, and an stbl
    * carrying stsd + stts + (optionally) stsz + (optionally, r16) the
    * stsc/stco/co64 chunk tables — the fixture builder for
    * [[graft.functions.MediaFormats.probeTracks]] and
    * [[graft.functions.MediaFormats.probeChunks]]. `chunks` is
    * (samples_per_chunk, base_offset, use_co64): offsets are laid out
    * CONTIGUOUSLY from the base (each chunk starts where the previous
    * one's sample bytes end — the single-mdat layout real muxers
    * write), chunk byte sizes from `stszSizes`/`stszFixed` regardless
    * of whether the stsz box itself ships (the absent-stsz plant still
    * needs real offsets). */
  private def mp4TrakSampled(trackId: Int, handler: String, timescale: Int,
                             stts: Seq[(Int, Int)], stszFixed: Int,
                             stszSizes: Seq[Int], includeStsz: Boolean,
                             mdhdV1: Boolean,
                             stss: Option[Seq[Int]] = None,
                             chunks: Option[(Int, Long, Boolean)] = None): Array[Byte] = {
    val tk = java.nio.ByteBuffer.allocate(84)
    tk.putInt(7); tk.putInt(0); tk.putInt(0)
    tk.putInt(trackId); tk.putInt(0); tk.putInt(0)
    tk.put(new Array[Byte](8))
    tk.putShort(0); tk.putShort(0); tk.putShort(0); tk.putShort(0)
    tk.put(mp4IdentityMatrix())
    tk.putInt(0); tk.putInt(0) // dims: the sample walk reads only track_id
    val durUnits = stts.map { case (n, d) => n.toLong * d }.sum
    val mdhd =
      if (mdhdV1) {
        // v1: ver/flags(4) creation(8) modification(8) timescale(4)
        // duration(8) lang+predefined(4) = 36
        val bb = java.nio.ByteBuffer.allocate(36)
        bb.putInt(0x01000000)
        bb.putLong(0L); bb.putLong(0L)
        bb.putInt(timescale); bb.putLong(durUnits)
        bb.putInt(0)
        mp4Box("mdhd", bb.array())
      } else {
        // v0: ver/flags(4) creation(4) modification(4) timescale(4)
        // duration(4) lang+predefined(4) = 24
        val bb = java.nio.ByteBuffer.allocate(24)
        bb.putInt(0); bb.putInt(0); bb.putInt(0)
        bb.putInt(timescale); bb.putInt(durUnits.toInt)
        bb.putInt(0)
        mp4Box("mdhd", bb.array())
      }
    // hdlr: ver/flags(4) pre_defined(4) handler(4) reserved(12) name(1)
    val hd = java.nio.ByteBuffer.allocate(25)
    hd.putInt(0); hd.putInt(0); hd.put(handler.getBytes("US-ASCII"))
    hd.put(new Array[Byte](13))
    val sttsBody = java.nio.ByteBuffer.allocate(8 + stts.length * 8)
    sttsBody.putInt(0); sttsBody.putInt(stts.length)
    stts.foreach { case (n, d) => sttsBody.putInt(n); sttsBody.putInt(d) }
    val stszBody =
      if (stszFixed > 0) {
        val bb = java.nio.ByteBuffer.allocate(12)
        bb.putInt(0); bb.putInt(stszFixed)
        bb.putInt(stts.map(_._1).sum)
        bb.array()
      } else {
        val bb = java.nio.ByteBuffer.allocate(12 + stszSizes.length * 4)
        bb.putInt(0); bb.putInt(0); bb.putInt(stszSizes.length)
        stszSizes.foreach(bb.putInt)
        bb.array()
      }
    val sd = java.nio.ByteBuffer.allocate(8 + 16)
    sd.putInt(0); sd.putInt(1); sd.putInt(16)
    sd.put((if (handler == "vide") "avc1" else "mp4a").getBytes("US-ASCII"))
    sd.put(new Array[Byte](6)); sd.putShort(1.toShort)
    val stssBox = stss.map { syncs =>
      val bb = java.nio.ByteBuffer.allocate(8 + syncs.length * 4)
      bb.putInt(0); bb.putInt(syncs.length)
      syncs.foreach(bb.putInt)
      mp4Box("stss", bb.array())
    }.getOrElse(Array.empty[Byte])
    val chunkBoxes = chunks.map { case (spc, base, useCo64) =>
      val n = stts.map(_._1).sum
      val nc = (n + spc - 1) / spc
      val rem = n % spc
      // stsc: one uniform run, plus a shorter trailing run when the
      // last chunk is partial (first entry MUST start at chunk 1)
      val entries =
        if (nc <= 1) Seq((1, n))
        else if (rem == 0) Seq((1, spc))
        else Seq((1, spc), (nc, rem))
      val sc = java.nio.ByteBuffer.allocate(8 + entries.length * 12)
      sc.putInt(0); sc.putInt(entries.length)
      entries.foreach { case (fc, s2) => sc.putInt(fc); sc.putInt(s2); sc.putInt(1) }
      def sampleSize(i: Int): Long =
        if (stszFixed > 0) stszFixed.toLong else stszSizes(i).toLong
      val chunkBytes = (0 until nc).map { k =>
        (k * spc until math.min(n, (k + 1) * spc)).map(sampleSize).sum
      }
      val offs = chunkBytes.scanLeft(base)(_ + _).take(nc)
      val co =
        if (useCo64) {
          val bb = java.nio.ByteBuffer.allocate(8 + nc * 8)
          bb.putInt(0); bb.putInt(nc)
          offs.foreach(bb.putLong)
          mp4Box("co64", bb.array())
        } else {
          val bb = java.nio.ByteBuffer.allocate(8 + nc * 4)
          bb.putInt(0); bb.putInt(nc)
          offs.foreach(o => bb.putInt(o.toInt))
          mp4Box("stco", bb.array())
        }
      mp4Box("stsc", sc.array()) ++ co
    }.getOrElse(Array.empty[Byte])
    val stblChildren = mp4Box("stsd", sd.array()) ++
      mp4Box("stts", sttsBody.array()) ++ stssBox ++ chunkBoxes ++
      (if (includeStsz) mp4Box("stsz", stszBody) else Array.empty[Byte])
    val mdia = mp4Box("mdia",
      mdhd ++ mp4Box("hdlr", hd.array()) ++ mp4Box("minf", mp4Box("stbl", stblChildren)))
    mp4Box("trak", mp4Box("tkhd", tk.array()) ++ mdia)
  }

  /** Expand [[graft.functions.VideoTracksProbe]] over a payload column:
    * one row per parsed track — docs whose payload carries no parseable
    * tracks yield no rows (the corrupt/truncated contract). Pure map +
    * explode; metadata-only reads. */
  def probeVideoTracks(media: DataFrame, payloadCol: String): DataFrame = {
    import org.apache.spark.sql.graftshim.{GraftShim => E}
    media.withColumn("__t",
        explode(E.column(graft.functions.VideoTracksProbe(E.expression(col(payloadCol))))))
      .select(media.columns.filterNot(_ == payloadCol).map(col).toSeq :+ col("__t.*"): _*)
  }

  /** Expand [[graft.functions.VideoChunksProbe]] over a payload column:
    * one row per parsed track's chunk-table readout — the byte-range
    * fetch-planning twin of [[probeVideoTracks]]. Pure map + explode;
    * metadata-only reads. */
  def probeVideoChunks(media: DataFrame, payloadCol: String): DataFrame = {
    import org.apache.spark.sql.graftshim.{GraftShim => E}
    media.withColumn("__c",
        explode(E.column(graft.functions.VideoChunksProbe(E.expression(col(payloadCol))))))
      .select(media.columns.filterNot(_ == payloadCol).map(col).toSeq :+ col("__c.*"): _*)
  }

  /** Expand [[graft.functions.VideoChunkRangesProbe]] over a payload
    * column: one row per (track, chunk) — the concrete byte-range fetch
    * plan. Pure map + explode; metadata-only reads. */
  def probeVideoChunkRanges(media: DataFrame, payloadCol: String): DataFrame = {
    import org.apache.spark.sql.graftshim.{GraftShim => E}
    media.withColumn("__r",
        explode(E.column(graft.functions.VideoChunkRangesProbe(E.expression(col(payloadCol))))))
      .select(media.columns.filterNot(_ == payloadCol).map(col).toSeq :+ col("__r.*"): _*)
  }

  /** Expand [[graft.functions.VideoProbe]] over a payload column: the
    * MP4 twin of [[probeMeta]] — one header-only pure-map pass. */
  def probeVideoMeta(media: DataFrame, payloadCol: String): DataFrame = {
    import org.apache.spark.sql.graftshim.{GraftShim => E}
    media.withColumn("__p",
        E.column(graft.functions.VideoProbe(E.expression(col(payloadCol)))))
      .select(media.columns.filterNot(_ == payloadCol).map(col).toSeq :+ col("__p.*"): _*)
  }

  /** Spec-valid JPEG+APP1(EXIF) payloads with id-derived tags — the
    * EXIF twin of [[synthesizeMp4Payloads]]: TIFF block (II on even ids,
    * MM on odd — BOTH byte orders exercised), IFD0 with Make (ASCII by
    * offset), Model (ASCII inline), Orientation (SHORT 1 + id%8), and
    * the ExifIFD sub-directory carrying LONG pixel dims. Corruption
    * plants: id%43 == 0 → md5 garbage (not a JPEG), id%43 == 9 → a
    * valid JFIF JPEG with NO APP1 (the has_exif = false path on real
    * images). */
  def synthesizeExifJpegPayloads(docs: DataFrame, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val payload =
        if (id % 43 == 0)
          java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes("US-ASCII")) ++ new Array[Byte](8)
        else if (id % 43 == 9) {
          val bb = java.nio.ByteBuffer.allocate(2 + 2 + 2 + 16 + 2)
          bb.put(Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte))
          bb.putShort(18.toShort)
          bb.put("JFIF".getBytes("US-ASCII")); bb.put(new Array[Byte](12))
          bb.put(Array(0xff, 0xd9).map(_.toByte))
          bb.array()
        } else exifJpeg(
          little = id % 2 == 0,
          orientation = (1 + id % 8).toInt,
          make = s"CAM${id % 5}",
          model = s"M${id % 3}",
          px = (320 + (id % 17) * 16).toInt,
          py = (200 + (id * 5 % 23) * 8).toInt)
      (id, payload)
    }.toDF("doc_id", "payload")
  }

  private def exifJpeg(little: Boolean, orientation: Int, make: String,
                       model: String, px: Int, py: Int): Array[Byte] = {
    // TIFF block: hdr(8) + IFD0(2 + 4*12 + 4 = 54 → ends 62) +
    // make string (5 + 1 pad → subIFD at 68) + ExifIFD(2 + 2*12 + 4 = 30)
    val tiff = java.nio.ByteBuffer.allocate(98)
      .order(if (little) java.nio.ByteOrder.LITTLE_ENDIAN
             else java.nio.ByteOrder.BIG_ENDIAN)
    tiff.put((if (little) "II" else "MM").getBytes("US-ASCII"))
    tiff.putShort(42.toShort)
    tiff.putInt(8) // IFD0 offset
    tiff.putShort(4.toShort) // entry count (tags ascending per spec)
    // 0x010F Make: ASCII count 5 ("CAM?\0") by offset 62
    tiff.putShort(0x010f.toShort); tiff.putShort(2.toShort)
    tiff.putInt(5); tiff.putInt(62)
    // 0x0110 Model: ASCII count 3 ("M?\0") inline (<= 4 bytes, no swap)
    tiff.putShort(0x0110.toShort); tiff.putShort(2.toShort)
    tiff.putInt(3)
    tiff.put(model.getBytes("US-ASCII")) // 2 chars
    tiff.put(0.toByte); tiff.put(0.toByte) // NUL terminator + field pad
    // 0x0112 Orientation: SHORT inline (left-justified in the field)
    tiff.putShort(0x0112.toShort); tiff.putShort(3.toShort)
    tiff.putInt(1); tiff.putShort(orientation.toShort); tiff.putShort(0.toShort)
    // 0x8769 ExifIFD pointer → 68
    tiff.putShort(0x8769.toShort); tiff.putShort(4.toShort)
    tiff.putInt(1); tiff.putInt(68)
    tiff.putInt(0) // next-IFD terminator
    tiff.put(make.getBytes("US-ASCII")) // 4 chars at 62
    tiff.put(0.toByte); tiff.put(0.toByte) // NUL terminator + pad -> 68
    tiff.putShort(2.toShort) // ExifIFD entry count
    tiff.putShort(0xa002.toShort); tiff.putShort(4.toShort)
    tiff.putInt(1); tiff.putInt(px)
    tiff.putShort(0xa003.toShort); tiff.putShort(4.toShort)
    tiff.putInt(1); tiff.putInt(py)
    tiff.putInt(0) // next-IFD terminator
    val exifPayload = "Exif".getBytes("US-ASCII") ++
      Array[Byte](0, 0) ++ tiff.array()
    val bb = java.nio.ByteBuffer.allocate(2 + 4 + exifPayload.length + 2)
    bb.put(Array(0xff, 0xd8, 0xff, 0xe1).map(_.toByte))
    bb.putShort((2 + exifPayload.length).toShort) // marker lengths stay BE
    bb.put(exifPayload)
    bb.put(Array(0xff, 0xd9).map(_.toByte))
    bb.array()
  }

  /** Expand [[graft.functions.ExifProbe]] over a payload column: one
    * header-only pure-map pass → typed EXIF columns. */
  def probeExifMeta(media: DataFrame, payloadCol: String): DataFrame = {
    import org.apache.spark.sql.graftshim.{GraftShim => E}
    media.withColumn("__p",
        E.column(graft.functions.ExifProbe(E.expression(col(payloadCol)))))
      .select(media.columns.filterNot(_ == payloadCol).map(col).toSeq :+ col("__p.*"): _*)
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

  /** ID3v2-prefixed MULTI-FRAME MP3 payloads (r16 — the fixture for the
    * Layer III frame-walk duration estimate): MPEG1 Layer III, sample
    * rate by id%3, bitrate index 1+id%14 (32..320 kbps), 3+id%7
    * identical complete frames (each a real header + zero audio bytes
    * at its header-declared length 144000·kbps/rate), mono on id%4==1,
    * an ID3v2 tag with id%50 pad bytes on odd ids (the skip path).
    * Plants: id%29==0 md5 garbage ('unknown'), id%29==4 TORN 10 bytes
    * into the last frame — the walk keeps the complete frames. */
  def synthesizeMp3FramePayloads(docs: DataFrame, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val payload =
        if (id % 29 == 0)
          java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes("US-ASCII")) ++ new Array[Byte](8)
        else {
          val srIdx = (id % 3).toInt
          val rate = Array(44100, 48000, 32000)(srIdx)
          val bIdx = (1 + id % 14).toInt
          val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
            160, 192, 224, 256, 320)(bIdx)
          val flen = (144000L * kbps / rate).toInt // padding bit 0
          val nf = (3 + id % 7).toInt
          val hdr = Array(0xff.toByte, 0xfb.toByte,
            ((bIdx << 4) | (srIdx << 2)).toByte,
            (if (id % 4 == 1) 0xc0 else 0x40).toByte)
          val frame = hdr ++ new Array[Byte](flen - 4)
          val tag =
            if (id % 2 == 1) {
              val pad = (id % 50).toInt
              val t = java.nio.ByteBuffer.allocate(10 + pad)
              t.put("ID3".getBytes("US-ASCII"))
              t.put(3.toByte); t.put(0.toByte); t.put(0.toByte)
              t.put(((pad >> 21) & 0x7f).toByte); t.put(((pad >> 14) & 0x7f).toByte)
              t.put(((pad >> 7) & 0x7f).toByte); t.put((pad & 0x7f).toByte)
              t.array()
            } else Array.empty[Byte]
          val full = tag ++ Array.fill(nf)(frame).flatten
          if (id % 29 == 4) full.take(full.length - 10) else full
        }
      (id, payload)
    }.toDF("doc_id", "payload")
  }

  /** ID3v2-TAGGED MP3 payloads (r16 — the text-frame walk fixture):
    * v2.3 plain-size frames on even ids, v2.4 SYNCSAFE sizes on odd
    * (the TIT2 body is padded past 127 bytes so the two size encodings
    * actually diverge), TIT2/TPE1/TALB/TCON frames with id-derived
    * strings, encoding byte 0 (ISO-8859-1) on even ids and 3 (UTF-8)
    * on odd. Plants: id%31==0 md5 garbage (has_id3 false), id%31==11
    * TORN 5 bytes into the TALB frame (title/artist keep, album null,
    * n_frames = 2 — complete frames only). */
  def synthesizeId3Payloads(docs: DataFrame, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val payload =
        if (id % 31 == 0)
          java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes("US-ASCII")) ++ new Array[Byte](8)
        else {
          val v4 = id % 2 == 1
          val enc = if (v4) 3 else 0
          def frame(fid: String, text: String): Array[Byte] = {
            val body = Array(enc.toByte) ++ text.getBytes("UTF-8")
            val h = java.nio.ByteBuffer.allocate(10)
            h.put(fid.getBytes("US-ASCII"))
            val n = body.length
            if (v4) { // syncsafe
              h.put(((n >> 21) & 0x7f).toByte); h.put(((n >> 14) & 0x7f).toByte)
              h.put(((n >> 7) & 0x7f).toByte); h.put((n & 0x7f).toByte)
            } else h.putInt(n)
            h.putShort(0)
            h.array() ++ body
          }
          val f1 = frame("TIT2", s"Title $id" + "!" * 140)
          val f2 = frame("TPE1", s"Artist ${id % 7}")
          val f3 = frame("TALB", s"Album ${id % 5}")
          val f4 = frame("TCON", s"Genre ${id % 3}")
          val frames = f1 ++ f2 ++ f3 ++ f4
          val hdr = java.nio.ByteBuffer.allocate(10)
          hdr.put("ID3".getBytes("US-ASCII"))
          hdr.put((if (v4) 4 else 3).toByte); hdr.put(0.toByte)
          hdr.put(0.toByte)
          val n = frames.length
          hdr.put(((n >> 21) & 0x7f).toByte); hdr.put(((n >> 14) & 0x7f).toByte)
          hdr.put(((n >> 7) & 0x7f).toByte); hdr.put((n & 0x7f).toByte)
          val full = hdr.array() ++ frames
          if (id % 31 == 11)
            full.take(10 + f1.length + f2.length + 5)
          else full
        }
      (id, payload)
    }.toDF("doc_id", "payload")
  }

  /** Expand [[graft.functions.Id3Probe]] over a payload column: the
    * audio-metadata twin of [[probeExifMeta]] — one pure-map pass. */
  def probeId3Meta(media: DataFrame, payloadCol: String): DataFrame = {
    import org.apache.spark.sql.graftshim.{GraftShim => E}
    media.withColumn("__i",
        E.column(graft.functions.Id3Probe(E.expression(col(payloadCol)))))
      .select(media.columns.filterNot(_ == payloadCol).map(col).toSeq :+ col("__i.*"): _*)
  }

  /** One row per CRC-verified logical Ogg stream ([[graft.functions
    * .OggProbe]] exploded): codec/channels/rate/duration/page counts
    * plus the file-level bad-page count — non-Ogg blobs yield no rows.
    * Pure map + generator; stream-safe. */
  def probeOggStreams(media: DataFrame, payloadCol: String): DataFrame = {
    import org.apache.spark.sql.graftshim.{GraftShim => E}
    media.withColumn("__o",
        E.column(graft.functions.OggProbe(E.expression(col(payloadCol)))))
      .withColumn("__s", explode(col("__o.streams")))
      .select(media.columns.filterNot(_ == payloadCol).map(col).toSeq ++
        Seq(col("__o.n_bad_pages").as("n_bad_pages"), col("__s.*")): _*)
  }

  /** Expand [[graft.functions.PngMetaProbe]] over a payload column:
    * the image-side metadata twin of the EXIF and ID3 walks — one
    * pure-map pass. */
  def probePngMeta(media: DataFrame, payloadCol: String): DataFrame = {
    import org.apache.spark.sql.graftshim.{GraftShim => E}
    media.withColumn("__p",
        E.column(graft.functions.PngMetaProbe(E.expression(col(payloadCol)))))
      .select(media.columns.filterNot(_ == payloadCol).map(col).toSeq :+
        col("__p.*"): _*)
  }

  /** REAL PNGs (ImageIO-encoded gray images, `16+id%16 × 12+id%8`)
    * with text chunks spliced in before IEND, every chunk carrying its
    * real CRC: even ids tEXt Title + zTXt Description (a REAL zlib
    * deflate the walk must inflate), odd ids iTXt Title (zlib-
    * compressed when id%4==1) + tEXt Author; id%3==0 adds tEXt
    * Software. Plants: id%37==0 md5 garbage (`has_png` false),
    * id%37==5 BIT-ROT in the Title chunk's data (its CRC catches it:
    * counted bad, title null, neighbors keep). */
  def synthesizePngMetaPayloads(docs: DataFrame, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.functions.MediaFormats.{buildPngChunk, pngInsertChunks}
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val payload =
        if (id % 37 == 0)
          java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes("US-ASCII")) ++ new Array[Byte](16)
        else {
          val png = encodePng(grayImage((16 + id % 16).toInt,
            (12 + id % 8).toInt, (id % 256).toInt))
          def deflateBytes(raw: Array[Byte]): Array[Byte] = {
            val d = new java.util.zip.Deflater(6)
            d.setInput(raw); d.finish()
            val bos = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
            d.end()
            bos.toByteArray
          }
          def latin(s: String) = s.getBytes("ISO-8859-1")
          val titleChunk =
            if (id % 2 == 0)
              buildPngChunk("tEXt", latin("Title") ++ Array[Byte](0) ++
                latin(s"Image $id"))
            else {
              val head = latin("Title") ++ Array[Byte](0,
                if (id % 4 == 1) 1 else 0, 0) ++
                latin("") ++ Array[Byte](0) ++ latin("") ++ Array[Byte](0)
              val text = s"Image $id".getBytes("UTF-8")
              buildPngChunk("iTXt",
                head ++ (if (id % 4 == 1) deflateBytes(text) else text))
            }
          val second =
            if (id % 2 == 0)
              buildPngChunk("zTXt", latin("Description") ++ Array[Byte](0, 0) ++
                deflateBytes(latin(s"Desc ${id % 5}")))
            else
              buildPngChunk("tEXt", latin("Author") ++ Array[Byte](0) ++
                latin(s"Author ${id % 7}"))
          val extra =
            if (id % 3 == 0)
              Seq(buildPngChunk("tEXt", latin("Software") ++ Array[Byte](0) ++
                latin(s"graft ${id % 9}")))
            else Seq.empty
          val rotTitle =
            if (id % 37 == 5) {
              val r = titleChunk.clone()
              r(10) = (r(10) ^ 0x55).toByte // inside the chunk data
              r
            } else titleChunk
          pngInsertChunks(png, Seq(rotTitle, second) ++ extra)
        }
      (id, payload)
    }.toDF("doc_id", "payload")
  }

  /** One row per logical Ogg stream's COMMENT HEADER ([[graft.functions
    * .OggTagsProbe]] exploded): vendor + TITLE/ARTIST/ALBUM +
    * complete-comment count — the ID3 twin for the Ogg world. Pure
    * map + generator; stream-safe. */
  def probeOggTags(media: DataFrame, payloadCol: String): DataFrame = {
    import org.apache.spark.sql.graftshim.{GraftShim => E}
    media.withColumn("__t", explode(
        E.column(graft.functions.OggTagsProbe(E.expression(col(payloadCol))))))
      .select(media.columns.filterNot(_ == payloadCol).map(col).toSeq :+
        col("__t.*"): _*)
  }

  /** AVIF/HEIC still images with id-derived geometry — ISO-BMFF ftyp
    * (brand `avif` on even ids, `heic` on odd) + the `meta(fullbox) →
    * iprp → ipco → ispe` item-property chain; id%3==0 adds an 8×8
    * THUMBNAIL ispe BEFORE the primary (largest-area selection gated —
    * a thumbnail must never masquerade as the picture). Plants:
    * id%37==0 md5 garbage ('unknown'), id%37==5 TORN inside the ipco
    * header (brand identity keeps, dims null). */
  def synthesizeHeifPayloads(docs: DataFrame, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val payload =
        if (id % 37 == 0)
          java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes("US-ASCII")) ++ new Array[Byte](16)
        else {
          def be32a(v: Long): Array[Byte] = Array(
            ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
            ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
          def bx(tp: String, payload: Array[Byte]): Array[Byte] =
            be32a(8L + payload.length) ++ tp.getBytes("US-ASCII") ++ payload
          val brand = if (id % 2 == 0) "avif" else "heic"
          val ftyp = bx("ftyp", brand.getBytes("US-ASCII") ++ be32a(0) ++
            brand.getBytes("US-ASCII") ++ "mif1".getBytes("US-ASCII"))
          val w = 64 + id % 64
          val h = 48 + id % 32
          val primary = bx("ispe", be32a(0) ++ be32a(w) ++ be32a(h))
          val thumb =
            if (id % 3 == 0) bx("ispe", be32a(0) ++ be32a(8) ++ be32a(8))
            else Array.emptyByteArray
          val ipco = bx("ipco", thumb ++ primary)
          val iprp = bx("iprp", ipco)
          val meta = bx("meta", be32a(0) ++ iprp)
          val full = ftyp ++ meta ++
            bx("mdat", Array.fill(16)((id % 251).toByte))
          if (id % 37 == 5)
            full.take(full.indexOfSlice("ipco".getBytes("US-ASCII")) + 2)
          else full
        }
      (id, payload)
    }.toDF("doc_id", "payload")
  }

  /** Real Ogg files with id-derived streams — BOS header page (Opus on
    * even ids at the 48 kHz granule clock with pre-skip 312, Vorbis on
    * odd at `8000·(1+id%3)` Hz), a granule-0 comment/tags page, and TWO
    * data pages whose granules land the durations on exact
    * milliseconds: partial 250 ms (opus) / 150 ms (vorbis), final
    * `500+id` / `300+id` ms, EOS on the last page. Every page carries
    * the real RFC 3533 checksum. Plants: id%37==0 md5 garbage (no
    * streams), id%37==5 TORN 10 bytes before the end (the final
    * data+EOS page incomplete → duration reads the partial page, eos
    * false), id%37==11 BIT-ROT in the final page's payload (checksum
    * catches it: counted bad, skipped — same partial readout, never a
    * corrupt duration). */
  def synthesizeOggPayloads(docs: DataFrame, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.functions.MediaFormats.buildOggPage
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val payload =
        if (id % 37 == 0)
          java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes("US-ASCII")) ++ new Array[Byte](16)
        else {
          val serial = 0x47AF0000L + id
          val opus = id % 2 == 0
          val head =
            if (opus) {
              val h = new Array[Byte](19)
              "OpusHead".getBytes("US-ASCII").copyToArray(h)
              h(8) = 1 // version
              h(9) = 2 // channels
              h(10) = (312 & 0xff).toByte; h(11) = (312 >> 8).toByte // pre-skip
              var k = 0
              while (k < 4) { h(12 + k) = ((48000 >> (8 * k)) & 0xff).toByte; k += 1 }
              h
            } else {
              val h = new Array[Byte](30)
              h(0) = 1
              "vorbis".getBytes("US-ASCII").copyToArray(h, 1)
              h(11) = (1 + id % 3).toByte // channels
              val rate = 8000 * (1 + id % 3)
              var k = 0
              while (k < 4) { h(12 + k) = ((rate >> (8 * k)) & 0xff).toByte; k += 1 }
              h
            }
          // real comment headers (r16 ogg_tags): standard keys; the
          // id%37==17 plant cuts the block 4 bytes short BEFORE paging
          // (page CRC stays valid — the damage is inside the packet),
          // so the LAST comment's declared length no longer fits and
          // the complete-comments contract must drop exactly it
          val tagsFull =
            if (opus) graft.functions.MediaFormats.buildOggComments(
              "OpusTags".getBytes("US-ASCII"), "graft",
              Seq(s"TITLE=Track $id", s"ARTIST=Artist ${id % 7}"))
            else graft.functions.MediaFormats.buildOggComments(
              Array[Byte](3) ++ "vorbis".getBytes("US-ASCII"), "graft",
              Seq(s"TITLE=Track $id", s"ARTIST=Artist ${id % 7}",
                s"ALBUM=Album ${id % 5}"))
          val tags =
            if (id % 37 == 17) tagsFull.take(tagsFull.length - 4) else tagsFull
          val data = Array.tabulate[Byte](64)(k => ((k * 7 + id) % 251).toByte)
          val (g1, g2) =
            if (opus) (312L + 48L * 250L, 312L + 48L * (500L + id))
            else {
              val kHz = 8L * (1 + id % 3)
              (kHz * 150L, kHz * (300L + id))
            }
          val p1 = buildOggPage(serial, 0, 0, 2, head) // BOS, granule 0
          val p2 = buildOggPage(serial, 1, 0, 0, tags) // header: granule 0
          val p3 = buildOggPage(serial, 2, g1, 0, data)
          val p4 = buildOggPage(serial, 3, g2, 4, data) // EOS
          val full = p1 ++ p2 ++ p3 ++ p4
          if (id % 37 == 5) full.take(full.length - 10)
          else if (id % 37 == 11) {
            val rot = full.clone()
            val at = full.length - 20 // inside p4's payload
            rot(at) = (rot(at) ^ 0x55).toByte
            rot
          } else full
        }
      (id, payload)
    }.toDF("doc_id", "payload")
  }

  /** Xing/Info-headed MP3 payloads (r16 — the O(1) VBR frame-count
    * fixture): the first frame carries a Xing header in its side-info
    * region (17 bytes mono / 32 stereo — both exercised via id%4==1)
    * declaring 1000+id%9000 total frames, followed by just TWO physical
    * frames — the declared count wins without any walk. Plants:
    * id%29==0 md5 garbage ('unknown'), id%29==4 Xing with the frames
    * FLAG CLEAR (the declared count must be ignored → the walk counts
    * the 3 physical frames). */
  def synthesizeMp3XingPayloads(docs: DataFrame, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val payload =
        if (id % 29 == 0)
          java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes("US-ASCII")) ++ new Array[Byte](8)
        else {
          val srIdx = (id % 3).toInt
          val rate = Array(44100, 48000, 32000)(srIdx)
          val mono = id % 4 == 1
          val flen = (144000L * 128 / rate).toInt
          val hdr = Array(0xff.toByte, 0xfb.toByte,
            ((9 << 4) | (srIdx << 2)).toByte,
            (if (mono) 0xc0 else 0x40).toByte)
          val first = java.nio.ByteBuffer.allocate(flen)
          first.put(hdr)
          first.position(4 + (if (mono) 17 else 32))
          first.put("Xing".getBytes("US-ASCII"))
          first.putInt(if (id % 29 == 4) 0 else 1) // flags: frames bit
          first.putInt((1000 + id % 9000).toInt)
          val frame = hdr ++ new Array[Byte](flen - 4)
          first.array() ++ frame ++ frame
        }
      (id, payload)
    }.toDF("doc_id", "payload")
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
