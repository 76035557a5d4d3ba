package graft.streaming

import graft.multimodal.{MediaCodecs, MediaRow}
import org.apache.spark.sql.DataFrame

/**
 * Ingest-time media validation — the gate a multimodal pipeline runs
 * BEFORE admitting a payload to the catalog: actually decode every blob
 * with the REAL codec for its modality and quarantine what doesn't
 * decode (truncated uploads, wrong-container bytes, codec bombs), with
 * the decoder-read unit count as the admission receipt.
 *
 * One function serves batch backfill and the streaming ingest path: the
 * gate is a STATELESS per-row map (decode, flag, count), so the same
 * `Dataset.map` plan runs under a batch scan or a micro-batch source
 * with no watermark and no state store — parity is structural, and
 * pinned by `MultimodalStreamsSpec`.
 *
 * Scale shape: decode cost is map-side and embarrassingly parallel; a
 * corrupt payload costs only its failed header parse (flagged, never
 * thrown — one bad upload must not kill a 100 TB backfill). Nothing
 * shuffles; the catalog write downstream is the only exchange.
 */
object MultimodalStreams {

  /** Decode-validate each media payload: `ok` = the modality's real
    * codec accepted it; `n_units` = decoder-read units (pixels for
    * images, samples for audio, summed frame pixels for video), 0 when
    * quarantined. */
  def mediaIngestGate(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].map { r =>
      val (ok, units) = try {
        r.modality match {
          case "image" =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.content))
            if (img == null) (false, 0L)
            else (true, img.getWidth.toLong * img.getHeight)
          case "audio" =>
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.content))
            try {
              val pcm = in.readAllBytes()
              (true, (pcm.length / 2).toLong)
            } finally in.close()
          case _ =>
            val frames = MediaCodecs.decodeGifFrames(r.content)
            if (frames.isEmpty) (false, 0L)
            else (true, frames.map(f => f.getWidth.toLong * f.getHeight).sum)
        }
      } catch { case scala.util.control.NonFatal(_) => (false, 0L) }
      (r.media_id, r.modality, ok, units)
    }.toDF("media_id", "modality", "ok", "n_units")
  }
}
