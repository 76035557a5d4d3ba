package graft.queries

import graft.QueryPack
import graft.multimodal.MultimodalOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Multimodal pipeline surface. Image (javax.imageio PNG), audio
 * (javax.sound WAV) and video (animated-GIF demux) decode are all REAL
 * JDK codec work — see [[graft.multimodal.MediaCodecs]]. Pixel/sample
 * features have no SQL-expressible oracle (rows-only + specs), but the
 * metadata rollup, the stub-demuxer slice arithmetic, and the
 * decoder-read video frame geometry ARE oracle-checked.
 */
object MultimodalQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(
    // Binary-column feature extraction -> per-modality rollup.
    "multimodal_features" -> ((s, dir) => {
      val media = MultimodalOps.fromDocuments(t(s, dir, "documents"))
      MultimodalOps.extractFeatures(media).toDF()
        .select(col("media_id"), col("modality"), col("n_bytes"),
          // order-independent: decimal sum of the first histogram bin
          element_at(col("features"), 1).cast(DecimalType(18, 9)).as("f0"))
        .groupBy(col("modality"))
        .agg(count(lit(1)).as("n_media"),
          sum(col("n_bytes")).as("total_bytes"),
          round6(sum(col("f0")).cast("double")).as("f0_sum"))
        .orderBy(col("modality"))
    }),

    // Metadata-only rollup: counts and dimension stats per (modality,
    // format) — reads NO payload bytes (the metadata half prunes the
    // content column entirely; at 100 TB this is the catalog query that
    // must never touch the binary data).
    "multimodal_meta_stats" -> ((s, dir) =>
      MultimodalOps.mediaMeta(t(s, dir, "documents"))
        .groupBy(col("modality"), col("format"))
        .agg(count(lit(1)).as("n_media"),
          sum(col("width").cast("long")).as("total_width"),
          max(col("height")).as("max_height"),
          min(col("n_frames")).as("min_frames"))
        .orderBy(col("modality"))),

    // REAL video demux: per-doc animated GIFs (JDK GIF writer) parsed
    // back through the JDK GIF reader; frame index and geometry come
    // from the DECODER, and the oracle derives the same values from the
    // metadata formula — a decode that didn't actually parse the
    // container could not match it.
    "multimodal_video_frames" -> ((s, dir) =>
      MultimodalOps.videoFrameCatalog(t(s, dir, "documents"))
        .orderBy(col("media_id"), col("frame_idx"))),

    // Frame sampling over the OPAQUE container path (a container with no
    // JDK demuxer, e.g. mkv/mp4 — here exercised on the raw mediaMeta
    // payload): one row per sampled frame with its byte length.
    // Oracle-checked: the demuxer BODY is a stub, but its selection
    // arithmetic (evenly spaced bounded slices) is a pure function of the
    // payload byte length, so DuckDB replicates the exact output. (The
    // REAL demux path is multimodal_video_frames above.)
    "multimodal_frames" -> ((s, dir) => {
      val media = MultimodalOps.mediaMeta(t(s, dir, "documents"))
      MultimodalOps.sampleFrames(media, frameSize = 32, n = 4).toDF()
        .select(col("media_id"), col("frame_idx"), length(col("frame")).as("frame_bytes"))
        .orderBy(col("media_id"), col("frame_idx"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    // videoFrameCatalog caps frames at 6; dims/frame-count formulas match
    // mediaMeta. The decoder must reproduce all three.
    "multimodal_video_frames" ->
      """WITH v AS (
        |  SELECT doc_id AS media_id,
        |    CAST(n_chars % 64 + 16 AS INTEGER) AS frame_w,
        |    CAST(n_chars % 48 + 16 AS INTEGER) AS frame_h,
        |    least(n_chars % 30 + 1, 6) AS nf
        |  FROM documents WHERE doc_id % 3 = 2
        |)
        |SELECT media_id, CAST(unnest(range(nf)) AS INTEGER) AS frame_idx,
        |  frame_w, frame_h
        |FROM v ORDER BY media_id, frame_idx""".stripMargin,
    "multimodal_meta_stats" ->
      """WITH m AS (
        |  SELECT
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |    CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'gif' END AS format,
        |    CAST(n_chars % 64 + 16 AS INTEGER) AS width,
        |    CAST(n_chars % 48 + 16 AS INTEGER) AS height,
        |    CAST(n_chars % 30 + 1 AS INTEGER) AS n_frames
        |  FROM documents
        |)
        |SELECT modality, format, count(*) AS n_media,
        |  CAST(sum(width) AS BIGINT) AS total_width,
        |  max(height) AS max_height, min(n_frames) AS min_frames
        |FROM m GROUP BY modality, format ORDER BY modality""".stripMargin,
    // video modality = doc_id % 3 == 2 (fromDocuments' element_at mapping);
    // payload = text bytes; frameSize 32, up to 4 evenly spaced frames
    "multimodal_frames" ->
      """WITH v AS (
        |  SELECT doc_id AS media_id, strlen(text) AS len FROM documents
        |  WHERE doc_id % 3 = 2
        |), f AS (
        |  SELECT media_id, len,
        |    greatest(len // 32, 1) AS n_frames,
        |    least(4, greatest(len // 32, 1)) AS take
        |  FROM v
        |), idx AS (
        |  SELECT media_id, len, n_frames, take,
        |    unnest(range(take)) AS frame_idx
        |  FROM f
        |)
        |SELECT media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |  CAST(least((frame_idx * n_frames // take) * 32 + 32, len)
        |    - (frame_idx * n_frames // take) * 32 AS INTEGER) AS frame_bytes
        |FROM idx ORDER BY media_id, frame_idx""".stripMargin
  )
}
