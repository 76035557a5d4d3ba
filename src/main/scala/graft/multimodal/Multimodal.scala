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
    features: Array[Float])

case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

/**
 * ====== STUB CODECS ======
 * This container has no image/audio/video libraries, so the *decode*
 * step is a clearly-marked deterministic fake: where a real pipeline
 * would call an image decoder / resampler / frame demuxer, these
 * functions derive features from raw bytes. Everything AROUND the stub —
 * schema, binary columns, per-partition batch shape, explode plumbing,
 * partition-by-modality — is the real Spark design and is what the
 * specs test. Swapping in a real codec changes only these function
 * bodies.
 */
object MediaCodecs {
  /** STUB for image/audio decode + feature extraction: a 16-bin byte
    * histogram normalized to a unit-ish vector. Deterministic in input
    * bytes. A real implementation would decode pixels and run a model. */
  def decodeFeaturesStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
    val n = math.max(bytes.length, 1).toFloat
    hist.map(_ / n)
  }

  /** STUB frame demuxer: treats the payload as fixed-size "frames" and
    * returns `n` evenly spaced ones. A real implementation would call a
    * video demuxer; the even-spacing *selection logic* is real. */
  def sampleFramesStub(bytes: Array[Byte], frameSize: Int, n: Int): Seq[Array[Byte]] = {
    val nFrames = math.max(bytes.length / math.max(frameSize, 1), 1)
    val take = math.min(n, nFrames)
    (0 until take).map { i =>
      val idx = (i.toLong * nFrames / take).toInt
      val from = idx * frameSize
      bytes.slice(from, math.min(from + frameSize, bytes.length))
    }
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
 *  - media tables are partitioned by modality: codec work is uniform
 *    within a partition, and a cluster can size executors per modality.
 */
object MultimodalOps {

  /** Derive a deterministic media table from `documents` (the container
    * has no real media files; payload bytes are the document text — an
    * arbitrary-but-real binary source shipped with the test data). */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("content"),
      element_at(array(lit("png"), lit("wav"), lit("mkv")),
        (col("doc_id") % 3 + 1).cast("int")).as("format"),
      (col("n_chars") % 64 + 16).cast("int").as("width"),
      (col("n_chars") % 48 + 16).cast("int").as("height"),
      (col("n_chars") % 30 + 1).cast("int").as("n_frames"))
      // modality-partitioned layout: uniform codec work per partition
      .repartition(col("modality"))

  /** Batch feature extraction over the binary column. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "modality", "content", "format", "width", "height", "n_frames")
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition setup for a real codec/model would happen HERE, once
        rows.map { r =>
          MediaFeatures(r.media_id, r.modality, r.content.length.toLong,
            MediaCodecs.decodeFeaturesStub(r.content))
        }
      }
  }

  /** Sample up to `n` frames from each video row; one output row per frame. */
  def sampleFrames(media: DataFrame, frameSize: Int, n: Int): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("modality") === "video")
      .select("media_id", "modality", "content", "format", "width", "height", "n_frames")
      .as[MediaRow]
      .flatMap { r =>
        MediaCodecs.sampleFramesStub(r.content, frameSize, n).zipWithIndex.map {
          case (f, i) => MediaFrame(r.media_id, i, f)
        }
      }
  }
}
