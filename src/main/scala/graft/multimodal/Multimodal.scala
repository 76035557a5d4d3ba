package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media row: opaque binary payload + typed metadata. This is the
  * 100 TB multimodal table shape: content is an opaque BINARY column
  * (never parsed by Catalyst), metadata is a typed struct that filters,
  * partition-prunes and joins like any other column. */
case class MediaRow(
    media_id: Long,
    modality: String, // image | audio | video
    content: Array[Byte],
    format: String,
    width: Int,
    height: Int,
    n_frames: Int)

case class MediaFeatures(
    media_id: Long,
    modality: String,
    n_bytes: Long,
    /** decoder-read unit count (pixels / samples / frame-pixels) the
      * histogram was normalized by — lets a consumer recover exact bin
      * counts (`round(f_i * n_units)`) without re-decoding or joining
      * metadata back in */
    n_units: Long,
    features: Array[Float])

/** One sampled decoded frame: `sample_idx` is the dense 0..take-1 output
  * position, `frame_idx` the decoder frame it was drawn from, geometry is
  * decoder-read, and `frame` is the standalone PNG re-encode. */
case class MediaFrame(media_id: Long, sample_idx: Int, frame_idx: Int,
    frame_w: Int, frame_h: Int, frame: Array[Byte])

/**
 * ====== CODECS ======
 * The IMAGE path is real: PNG encode/decode through the JDK's
 * `javax.imageio` (no external libraries), features from actual decoded
 * pixels. The AUDIO path is real too: WAV (PCM) encode/decode through
 * the JDK's `javax.sound.sampled`, features from actual decoded samples.
 * The VIDEO path is real for the one multi-frame container the JDK can
 * both write and demux — animated GIF ([[MediaCodecs.encodeGif]] /
 * [[MediaCodecs.decodeGifFrames]], exercised end-to-end by
 * `multimodal_video_frames`, whose oracle pins decoder-read geometry, and
 * pixel-lossless by spec). Feature extraction, frame cataloging, AND
 * frame sampling ([[MultimodalOps.sampleVideoFrames]], oracle-checked by
 * `multimodal_frames` against decoder-read counts and geometry) all
 * decode REAL payloads on every modality — no stubs remain. Containers
 * the JDK cannot demux (mkv/mp4 — no media libraries here) would slot in
 * as another `decode*Frames` body behind the same schema, batch shape,
 * and partition-by-modality plumbing the specs pin.
 */
object MediaCodecs {
  // raster-only AWT work; never touch a display
  System.setProperty("java.awt.headless", "true")

  /** Deterministic synthetic PNG: pixel (x, y) of media `id` is a fixed
    * arithmetic function of (id, x, y), encoded through the real JDK PNG
    * writer. Gives the image modality true decodable payloads without any
    * media files in the container. */
  def encodePng(id: Long, width: Int, height: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((id * 17 + x * 11 + y * 3) % 256).toInt
        val b = ((id * 5 + x * 2 + y * 23) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL image decode (javax.imageio: PNG/BMP/JPEG/GIF) + feature
    * extraction: a 16-bin luminance histogram over the decoded pixels,
    * normalized by pixel count. Throws on undecodable bytes — an image
    * row with a corrupt payload is a data error, not a feature. */
  def decodeImageFeatures(bytes: Array[Byte]): Array[Float] =
    normalized(decodeImageHistogram(bytes))

  /** Integer bin COUNTS of [[decodeImageFeatures]] (exact; sums to the
    * decoded pixel count). */
  def decodeImageHistogram(bytes: Array[Byte]): Array[Long] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image payload (${bytes.length} bytes)")
    val hist = new Array[Long](16)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        hist(lum >> 4) += 1L
        x += 1
      }
      y += 1
    }
    hist
  }

  private def normalized(hist: Array[Long]): Array[Float] = {
    val n = math.max(hist.sum, 1L).toFloat
    hist.map(_ / n)
  }

  /** Deterministic synthetic WAV: 16-bit mono PCM at 8 kHz whose sample i
    * for media `id` is a fixed arithmetic function of (id, i), encoded
    * through the real JDK WAV writer. */
  def encodeWav(id: Long, nSamples: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (((id * 131 + i.toLong * 7919) % 65536) - 32768).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      stream, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL audio decode (javax.sound.sampled: WAV/PCM) + feature
    * extraction: a 16-bin histogram over the decoded 16-bit sample
    * amplitudes, normalized by sample count. Throws on undecodable
    * payloads. */
  def decodeAudioFeatures(bytes: Array[Byte]): Array[Float] =
    normalized(decodeAudioHistogram(bytes))

  /** Integer bin COUNTS of [[decodeAudioFeatures]] (exact; sums to the
    * decoded sample count). */
  def decodeAudioHistogram(bytes: Array[Byte]): Array[Long] = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"expected 16-bit mono PCM, got $fmt")
      val pcm = in.readAllBytes()
      val n = pcm.length / 2
      val hist = new Array[Long](16)
      var i = 0
      while (i < n) {
        val lo = pcm(2 * i) & 0xff
        val hi = pcm(2 * i + 1).toInt
        val sample = (hi << 8) | lo // little-endian signed 16-bit
        hist(((sample + 32768) >> 12) & 0xf) += 1L
        i += 1
      }
      hist
    } finally in.close()
  }

  /**
   * Integer-exact 64-block energy fingerprint over DECODED 16-bit PCM:
   * the audio analog of [[aHash64]] — samples split into 64 blocks
   * (`bk = i*64/n`), bit k set iff block k's mean |amplitude| exceeds
   * the global mean, compared cross-multiplied so no float appears and
   * the fingerprint is bit-exact reproducible from the sample values
   * (which is what lets the DuckDB oracle verify the REAL decode path
   * from the generator formula alone). Two 32-bit halves, like aHash64.
   */
  def audioFingerprint64(bytes: Array[Byte]): (Long, Long) = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"expected 16-bit mono PCM, got $fmt")
      val pcm = in.readAllBytes()
      val n = pcm.length / 2
      val blockSum = new Array[Long](64)
      val blockN = new Array[Long](64)
      var totalSum = 0L
      var i = 0
      while (i < n) {
        val lo = pcm(2 * i) & 0xff
        val hi = pcm(2 * i + 1).toInt
        val amp = math.abs((hi << 8) | lo).toLong
        val k = i * 64 / n
        blockSum(k) += amp; blockN(k) += 1; totalSum += amp
        i += 1
      }
      var fpHi = 0L; var fpLo = 0L
      var k = 0
      while (k < 64) {
        if (blockSum(k) * n > totalSum * blockN(k)) {
          if (k >= 32) fpHi |= 1L << (k - 32) else fpLo |= 1L << k
        }
        k += 1
      }
      (fpHi, fpLo)
    } finally in.close()
  }

  /** Frame-level activity segmentation (VAD shape) over DECODED 16-bit
    * PCM: 160-sample frames (20 ms at 8 kHz), a frame is ACTIVE iff its
    * mean |amplitude| exceeds the clip's global mean — compared
    * cross-multiplied so no float appears and the segmentation is
    * bit-exact reproducible from the sample values (same discipline as
    * [[audioFingerprint64]], which is what lets the DuckDB oracle verify
    * the REAL decode path from the generator formula). Returns
    * (n_frames, n_active, n_spans, longest_span) where spans are maximal
    * runs of consecutive active frames — the speech-segment extents an
    * audio curation pipeline keeps. */
  def audioVad(bytes: Array[Byte], frameLen: Int = 160): (Int, Int, Int, Int) = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"expected 16-bit mono PCM, got $fmt")
      val pcm = in.readAllBytes()
      val n = pcm.length / 2
      val nFrames = (n + frameLen - 1) / frameLen
      val fSum = new Array[Long](nFrames)
      val fN = new Array[Long](nFrames)
      var totalSum = 0L
      var i = 0
      while (i < n) {
        val lo = pcm(2 * i) & 0xff
        val hi = pcm(2 * i + 1).toInt
        val amp = math.abs((hi << 8) | lo).toLong
        val k = i / frameLen
        fSum(k) += amp; fN(k) += 1; totalSum += amp
        i += 1
      }
      var nActive = 0; var nSpans = 0; var longest = 0; var cur = 0
      var k = 0
      while (k < nFrames) {
        if (fSum(k) * n > totalSum * fN(k)) {
          if (cur == 0) nSpans += 1
          cur += 1; nActive += 1
          if (cur > longest) longest = cur
        } else cur = 0
        k += 1
      }
      (nFrames, nActive, nSpans, longest)
    } finally in.close()
  }

  /** REAL multi-frame video container encode: animated GIF through the
    * JDK GIF sequence writer (the one video-ish container the JDK can
    * both write and demux; no external codec libraries exist here).
    * Frames are 8-bit grayscale — at most 256 distinct colors, so GIF's
    * palette is exact and the round-trip is LOSSLESS: decoded samples
    * equal the generator formula, which the spec pins. */
  def encodeGif(id: Long, width: Int, height: Int, nFrames: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            raster.setSample(x, y, 0, grayPixel(id, f, x, y))
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), writer.getDefaultWriteParam)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  /** The deterministic frame-pixel generator [[encodeGif]] writes and the
    * spec checks decoded samples against. */
  def grayPixel(id: Long, frame: Int, x: Int, y: Int): Int =
    ((id * 31 + frame * 41 + x * 7 + y * 13) % 256).toInt

  /**
   * Integer-exact 8×8 block-mean average hash (aHash) over a DECODED
   * image: integer luminance `(r*299 + g*587 + b*114) / 1000` per pixel,
   * the image partitioned into an 8×8 grid (`bx = x*8/w`), bit k
   * (`k = by*8 + bx`) set iff block k's mean luminance exceeds the
   * global mean. The comparison is cross-multiplied
   * (`blockSum * totalPixels > totalSum * blockPixels`) so there is no
   * float anywhere — the hash is bit-exact reproducible by any engine
   * from the pixel values, which is what lets the DuckDB oracle verify
   * the REAL decode path from the pixel formula alone. Returned as two
   * 32-bit halves (hi = bits 63..32) so the values stay positive in
   * engines without unsigned 64-bit.
   */
  def aHash64(img: java.awt.image.BufferedImage): (Long, Long) = {
    val w = img.getWidth; val h = img.getHeight
    val blockSum = new Array[Long](64)
    val blockN = new Array[Long](64)
    var totalSum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        val k = (y * 8 / h) * 8 + (x * 8 / w)
        blockSum(k) += lum; blockN(k) += 1; totalSum += lum
        x += 1
      }
      y += 1
    }
    val total = w.toLong * h
    var hi = 0L; var lo = 0L
    var k = 0
    while (k < 64) {
      if (blockSum(k) * total > totalSum * blockN(k)) {
        if (k >= 32) hi |= 1L << (k - 32) else lo |= 1L << k
      }
      k += 1
    }
    (hi, lo)
  }

  /** Difference hash (dHash): 8 rows × 9 columns of block mean
    * luminances, bit (r,c) = mean(r,c) > mean(r,c+1) — the horizontal
    * GRADIENT sign, robust to global brightness/contrast shifts that
    * flip every aHash bit at once (the classic aHash failure mode a
    * re-encode with gamma correction triggers). Same integer discipline
    * as [[aHash64]]: block sums compared cross-multiplied by block
    * pixel counts, so no float appears and the 64 bits are bit-exact
    * reproducible from the pixel values alone. */
  def dHash64(img: java.awt.image.BufferedImage): (Long, Long) = {
    val w = img.getWidth; val h = img.getHeight
    val blockSum = new Array[Long](72)
    val blockN = new Array[Long](72)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        val k = (y * 8 / h) * 9 + (x * 9 / w)
        blockSum(k) += lum; blockN(k) += 1
        x += 1
      }
      y += 1
    }
    var hi = 0L; var lo = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val a = r * 9 + c; val b = a + 1
        if (blockSum(a) * blockN(b) > blockSum(b) * blockN(a)) {
          val idx = r * 8 + c
          if (idx >= 32) hi |= 1L << (idx - 32) else lo |= 1L << idx
        }
        c += 1
      }
      r += 1
    }
    (hi, lo)
  }

  /** REAL video demux: the JDK GIF reader, one decoded image per frame.
    * This is the actual parse-the-container path — frame count and
    * geometry come from the DECODER, not from metadata. */
  def decodeGifFrames(bytes: Array[Byte]): Seq[java.awt.image.BufferedImage] = {
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis)
      (0 until reader.getNumImages(true)).map(reader.read)
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** REAL video feature extraction: demux the GIF container and average
    * the 16-bin luminance histogram over every decoded frame's pixels
    * (normalized by total pixels across frames, so bins sum to 1). */
  def decodeVideoFeatures(bytes: Array[Byte]): Array[Float] =
    normalized(decodeVideoHistogram(bytes))

  /** Integer bin COUNTS of [[decodeVideoFeatures]] (exact; sums to the
    * decoded pixel count across all frames). */
  def decodeVideoHistogram(bytes: Array[Byte]): Array[Long] = {
    val frames = decodeGifFrames(bytes)
    require(frames.nonEmpty, "not a decodable multi-frame container")
    val hist = new Array[Long](16)
    frames.foreach { img =>
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          hist((img.getRGB(x, y) & 0xff) >> 4) += 1L
          x += 1
        }
        y += 1
      }
    }
    hist
  }

  /** Re-encode one decoded frame as a standalone PNG — the portable
    * per-frame payload a downstream vision model consumes. The frame is
    * normalized to direct RGB first: GIF frames arrive indexed-color,
    * and palette images don't survive a PNG round-trip bit-exact on the
    * JDK writer (palette reordering); the RGB normalize + PNG pair is
    * lossless. */
  def encodeFramePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val norm = new java.awt.image.BufferedImage(
      img.getWidth, img.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = norm.createGraphics()
    g.drawImage(img, 0, 0, null)
    g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(norm, "png", out)
    out.toByteArray
  }
}

/**
 * Multimodal column operators. Scale design:
 *  - content stays an opaque BINARY column end to end — only metadata is
 *    scanned for pruning/filtering (`ReadSchema` excludes `content`
 *    unless the operator touches it);
 *  - decode runs in `mapPartitions` so per-partition setup (a real codec
 *    context, a model session) is paid once per task, not per row —
 *    the same batch shape Arrow/pandas UDFs give Python pipelines;
 *  - codec stages are spread across the session's full parallelism BY
 *    MEDIA ID before any encode/decode map (r17 optimization): the
 *    documents scan is byte-small (1-2 input splits) and a
 *    modality-keyed repartition has <= 3 distinct keys, so both the
 *    encode map and every downstream decode ran on <= 3 of the 32
 *    cores — guide §2.5's "synthetic partitioning keys with too few
 *    distinct values", measured as the whole multimodal family
 *    serializing on one task per modality. media_id is unique, so the
 *    hash spread is even at any scale.
 */
object MultimodalOps {

  /** Spread the pre-encode media frame across the session's cores by
    * media_id before per-row codec work. Unconditional: a partition-count
    * guard lies here (a byte-small parquet reports one split per core
    * but every ROW sits in the single non-empty split), and what crosses
    * this shuffle is the metadata row — the payload bytes are GENERATED
    * after it — so the spread costs ~KB/row while the codec work it
    * parallelizes is the family's entire budget. */
  private def spreadById(df: DataFrame): DataFrame =
    // explicit partition count: a keyed repartition WITHOUT one is fair
    // game for AQE's coalescing (the pre-encode rows are ~KB, so the
    // advisory size folds the exchange to one partition and the codec
    // stage serializes again); a user-specified count is respected
    df.repartition(df.sparkSession.sparkContext.defaultParallelism,
      col("media_id"))

  /** The metadata half of the media derivation: pure columnar arithmetic
    * (modality/format routing, dimensions), no codec work — consumable by
    * metadata-only queries without paying encode, and exactly replicable
    * by a SQL oracle. */
  def mediaMeta(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("content"),
      element_at(array(lit("png"), lit("wav"), lit("gif")),
        (col("doc_id") % 3 + 1).cast("int")).as("format"),
      (col("n_chars") % 64 + 16).cast("int").as("width"),
      (col("n_chars") % 48 + 16).cast("int").as("height"),
      (col("n_chars") % 30 + 1).cast("int").as("n_frames"))

  /** Derive a deterministic media table from `documents` (the container
    * ships no media files). Image rows carry REAL PNG payloads (JDK PNG
    * writer), audio rows REAL WAV payloads (JDK WAV writer), and video
    * rows REAL animated-GIF payloads (JDK GIF sequence writer) — all
    * decodable by any standard library. */
  def fromDocuments(docs: DataFrame, onlyModality: Option[String] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = mediaMeta(docs)
    // modality restriction applies BEFORE the encode map: a filter placed
    // after mapPartitions cannot push through the opaque typed map, so a
    // frames-only consumer would otherwise pay PNG/WAV encode for every
    // image/audio row it immediately drops
    spreadById(onlyModality.fold(base)(m => base.filter(col("modality") === m)))
      .as[MediaRow]
      .mapPartitions { rows =>
        // encoder state is per-partition; each modality pays only its own
        rows.map { r =>
          r.modality match {
            case "image" =>
              r.copy(content = MediaCodecs.encodePng(r.media_id, r.width, r.height))
            case "audio" =>
              r.copy(content =
                MediaCodecs.encodeWav(r.media_id, 256 + (r.media_id % 512).toInt))
            case _ =>
              r.copy(content = MediaCodecs.encodeGif(
                r.media_id, r.width, r.height, math.min(r.n_frames, 6)))
          }
        }
      }
      .toDF()
  }

  /** Batch feature extraction over the binary column. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "modality", "content", "format", "width", "height", "n_frames")
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition setup for a real codec/model would happen HERE, once
        rows.map { r =>
          val counts = r.modality match {
            case "image" => MediaCodecs.decodeImageHistogram(r.content)
            case "audio" => MediaCodecs.decodeAudioHistogram(r.content)
            case "video" => MediaCodecs.decodeVideoHistogram(r.content)
            case other => throw new IllegalArgumentException(
              s"no codec for modality '$other' (media ${r.media_id})")
          }
          val n = math.max(counts.sum, 1L)
          MediaFeatures(r.media_id, r.modality, r.content.length.toLong,
            n, counts.map(_ / n.toFloat))
        }
      }
  }

  /** The REAL video path end to end: encode each video row as an animated
    * GIF (per-partition codec work, frame count capped for bounded encode
    * cost) and demux it back through the JDK GIF reader. The emitted
    * geometry is read from the DECODER — matching it against the
    * metadata-derived formula proves the container was actually parsed,
    * which is exactly what the SQL oracle of `multimodal_video_frames`
    * checks. Pixel-level losslessness is pinned by MultimodalSpec. */
  /**
   * Perceptual-hash catalog of the image corpus: encode (the ingest-side
   * codec), REAL `javax.imageio` PNG decode, then the integer-exact 8×8
   * block-mean aHash ([[MediaCodecs.aHash64]]) per image — the
   * image-dedup signature a multimodal pipeline buckets on (equal hashes
   * = exact/near-identical content; hamming-close hashes = near-dup
   * candidates, banded exactly like text SimHash). One decode per row in
   * mapPartitions, modality-filtered BEFORE the codec work.
   */
  def imageHashCatalog(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fromDocuments(docs, Some("image")).as[MediaRow]
      .map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.content))
        require(img != null, s"undecodable image payload (media ${r.media_id})")
        val (hi, lo) = MediaCodecs.aHash64(img)
        (r.media_id, hi, lo)
      }
      .toDF("media_id", "ahash_hi", "ahash_lo")
  }

  /** Gradient-hash catalog ([[MediaCodecs.dHash64]]) over the same REAL
    * PNG decodes — the brightness-shift-robust companion signature to
    * [[imageHashCatalog]]; pipelines bucket on BOTH (a pair is a near-dup
    * candidate if either hash is hamming-close). */
  def imageDHashCatalog(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fromDocuments(docs, Some("image")).as[MediaRow]
      .map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.content))
        require(img != null, s"undecodable image payload (media ${r.media_id})")
        val (hi, lo) = MediaCodecs.dHash64(img)
        (r.media_id, hi, lo)
      }
      .toDF("media_id", "dhash_hi", "dhash_lo")
  }

  /** Audio-dedup signatures: encode (ingest-side codec), REAL
    * `javax.sound` WAV decode, then the integer-exact 64-block energy
    * fingerprint ([[MediaCodecs.audioFingerprint64]]) per clip — same
    * bucketing role as [[imageHashCatalog]] for the audio modality. */
  def audioFingerprintCatalog(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fromDocuments(docs, Some("audio")).as[MediaRow]
      .map { r =>
        val (hi, lo) = MediaCodecs.audioFingerprint64(r.content)
        (r.media_id, hi, lo)
      }
      .toDF("media_id", "fp_hi", "fp_lo")
  }

  /** Per-clip activity segmentation ([[MediaCodecs.audioVad]]) over REAL
    * WAV decodes — the speech-extent audit an audio curation pipeline
    * runs before transcription (keep clips with speech, drop silence). */
  def audioVadCatalog(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fromDocuments(docs, Some("audio")).as[MediaRow]
      .map { r =>
        val (nf, na, ns, ls) = MediaCodecs.audioVad(r.content)
        (r.media_id, nf, na, ns, ls)
      }
      .toDF("media_id", "n_frames", "n_active", "n_spans", "longest_span")
  }

  /** Per-FRAME perceptual hashes over the REAL GIF demux — the signal
    * behind scene-change detection (consecutive-frame hamming) and
    * frame-level near-dup lookup. One decode pass; each decoded frame
    * runs the same integer-exact [[MediaCodecs.aHash64]] as still
    * images (gray frames: lum == sample exactly, so the oracle
    * re-derives every bit from the generator formula). */
  def videoFrameHashCatalog(docs: DataFrame, maxFrames: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spreadById(mediaMeta(docs).filter(col("modality") === "video")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map(r => r.copy(content = MediaCodecs.encodeGif(
          r.media_id, r.width, r.height, math.min(r.n_frames, maxFrames))))
      }
      .flatMap { r =>
        MediaCodecs.decodeGifFrames(r.content).zipWithIndex.map {
          case (img, i) =>
            val (hi, lo) = MediaCodecs.aHash64(img)
            (r.media_id, i, hi, lo)
        }
      }
      .toDF("media_id", "frame_idx", "hash_hi", "hash_lo")
  }

  def videoFrameCatalog(docs: DataFrame, maxFrames: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spreadById(mediaMeta(docs).filter(col("modality") === "video")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map(r => r.copy(content = MediaCodecs.encodeGif(
          r.media_id, r.width, r.height, math.min(r.n_frames, maxFrames))))
      }
      .flatMap { r =>
        MediaCodecs.decodeGifFrames(r.content).zipWithIndex.map {
          case (img, i) => (r.media_id, i, img.getWidth, img.getHeight)
        }
      }
      .toDF("media_id", "frame_idx", "frame_w", "frame_h")
  }

  /** REAL frame sampling — the frame-extract step of a multimodal
    * training-data pipeline: demux each video's GIF container through the
    * JDK reader, pick up to `n` evenly spaced DECODED frames (the same
    * `i·nFrames/take` spacing a video pipeline uses for keyframe
    * thumbnails), and re-encode each selected frame as a standalone PNG
    * payload. One decode per row inside `mapPartitions`-backed Dataset
    * ops, modality-filtered BEFORE any codec work; frame index and
    * geometry come from the DECODER, so the `multimodal_frames` oracle
    * (which re-derives them from the generator's metadata formulas)
    * proves the container was actually parsed. */
  def sampleVideoFrames(docs: DataFrame, n: Int, maxFrames: Int = 6): Dataset[MediaFrame] = {
    val spark = docs.sparkSession
    import spark.implicits._
    sampledDecodedFrames(docs, n, maxFrames) { (r, i, idx, img) =>
      MediaFrame(r.media_id, i, idx, img.getWidth, img.getHeight,
        MediaCodecs.encodeFramePng(img))
    }
  }

  /** The geometry-only half of [[sampleVideoFrames]]: same demux, same
    * evenly-spaced sample selection, NO PNG re-encode. `multimodal_frames`
    * projects the payload away, so building it there paid ~3 s of encoder
    * work per bench run for bytes nobody read — a consumer that wants the
    * payload calls [[sampleVideoFrames]] (whose pixel-exactness
    * MultimodalSpec pins); a consumer that wants the frame catalog calls
    * this and the encode never runs. */
  def sampleVideoFrameGeometry(docs: DataFrame, n: Int, maxFrames: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    sampledDecodedFrames(docs, n, maxFrames) { (r, i, idx, img) =>
      (r.media_id, i, idx, img.getWidth, img.getHeight)
    }.toDF("media_id", "sample_idx", "frame_idx", "frame_w", "frame_h")
  }

  /** Shared demux + evenly-spaced frame selection behind both sampled
    * variants: one GIF decode pass per video row, modality-filtered
    * before any codec work; `build` sees the DECODED frame so indices
    * and geometry always come from the parser. */
  private def sampledDecodedFrames[T: org.apache.spark.sql.Encoder](
      docs: DataFrame, n: Int, maxFrames: Int)(
      build: (MediaRow, Int, Int, java.awt.image.BufferedImage) => T): Dataset[T] = {
    val spark = docs.sparkSession
    import spark.implicits._
    spreadById(mediaMeta(docs).filter(col("modality") === "video")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map(r => r.copy(content = MediaCodecs.encodeGif(
          r.media_id, r.width, r.height, math.min(r.n_frames, maxFrames))))
      }
      .flatMap { r =>
        val frames = MediaCodecs.decodeGifFrames(r.content)
        val take = math.min(n, frames.size)
        (0 until take).map { i =>
          val idx = (i.toLong * frames.size / take).toInt
          build(r, i, idx, frames(idx))
        }
      }
  }
}
